package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans of selected queries — the plan-review
  * loop: confirm filters reach the parquet scan (PushedFilters), schemas
  * are pruned (ReadSchema), small sides broadcast, codegen spans are wide.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_tpch_agg", "q04_fk_traversal", "q11_eav_filter")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
