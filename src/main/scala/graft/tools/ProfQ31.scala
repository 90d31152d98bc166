package graft.tools

import org.apache.spark.sql.SparkSession

/** q31 drift adjudication (round-14 ask #2): steady-state component
  * timings of the get-ladder query — fixture window chain vs the three
  * get() probes — to name the regression mechanism.
  */
object ProfQ31 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val q = graft.queries.LifecycleQueries.queries("q31_get_ladder")
    (1 to 5).foreach { i =>
      time(s"q31 full run $i") { q(spark, sfDir).collect() }
    }
    spark.stop()
  }
}
