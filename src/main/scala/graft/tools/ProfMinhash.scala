package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-bisect the portable minhash pipeline: times (1) signature
  * materialization, (2) banding + candidate join, (3) the full pipeline,
  * separately, so a regression can be pinned to a stage.
  */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/testdata-local/sf1.0"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val corpus = graft.queries.TextQueries.corpusWithNearDups(spark, sfDir)
    corpus.persist(); corpus.count()

    def time(label: String)(body: => Any): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        body
        println(f"$label%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }

    import graft.ext.Dedup
    // stage 1: shingle strings + md5 mods + signature
    val withSig = corpus
      .select(col("doc_id").as("id"), split(trim(col("text")), "\\s+").as("tk"))
      .select(col("id"), Dedup.shinglesFromTokens(col("tk"), 3).as("sh"))
      .select(col("id"), col("sh"),
        transform(col("sh"),
          x => pmod(conv(substring(md5(x), 1, 15), 16, 10).cast("long"), lit(Dedup.MinhashP)))
          .as("hmod"))
      .select(col("id"), col("sh"), Dedup.minhashSigFromMods(col("hmod"), 16).as("sig"))
    time("1-signatures")(withSig.queryExecution.toRdd.count())
    time("1a-shingles-only")(
      corpus.select(col("doc_id").as("id"), split(trim(col("text")), "\\s+").as("tk"))
        .select(col("id"), Dedup.shinglesFromTokens(col("tk"), 3).as("sh"))
        .queryExecution.toRdd.count())
    time("1b-md5mods")(
      corpus.select(col("doc_id").as("id"), split(trim(col("text")), "\\s+").as("tk"))
        .select(col("id"), Dedup.shinglesFromTokens(col("tk"), 3).as("sh"))
        .select(col("id"),
          transform(col("sh"),
            x => pmod(conv(substring(md5(x), 1, 15), 16, 10).cast("long"), lit(Dedup.MinhashP)))
            .as("hmod"))
        .queryExecution.toRdd.count())
    time("3-full-portable")(
      Dedup.minhashPairsPortable(corpus, "doc_id", "text").queryExecution.toRdd.count())
    time("3-full-fast")(
      Dedup.minhashPairs(corpus, "doc_id", "text", k = 16, bands = 8, threshold = 0.8)
        .queryExecution.toRdd.count())
    spark.stop()
  }
}
