package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Bisect the m04 audio pass: encode-only vs encode+parse. */
object ProfAudio {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/testdata-local/sf1.0"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    docs.persist(); docs.count()

    def time(label: String)(body: => Any): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        body
        println(f"$label%-22s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }

    import graft.ext.Multimodal
    time("encode-only")(
      Multimodal.encodeWavs(docs, "doc_id", "text").queryExecution.toRdd.count())
    time("encode+parse")(
      Multimodal.decodeAudioMeta(Multimodal.encodeWavs(docs, "doc_id", "text"),
        "doc_id", "audio").queryExecution.toRdd.count())
    spark.stop()
  }
}
