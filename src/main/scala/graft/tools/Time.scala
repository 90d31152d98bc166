package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries: `Time <sfDir> <name> [name...]`.
  * Runs each query twice (cold + warm) so JIT/IO effects are visible.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q01_tpch_agg")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm the JVM

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = fn(spark, sfDir).count()
        println(f"$n%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($cnt rows)")
      }
    }
    spark.stop()
  }
}
