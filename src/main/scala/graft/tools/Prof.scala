package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for pipeline hotspots. */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val mutated = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        expr("substr(text, instr(text, ' ') + 1)").as("text"))
    val corpus = docs.unionByName(mutated)

    time("shingle hashes only") {
      corpus.select(col("doc_id"), graft.ext.Dedup.tokenHashes(col("text")).as("th"))
        .select(graft.ext.Dedup.shingleHashesFromTokenHashes(col("th"), 3).as("sh"))
        .selectExpr("sum(size(sh))").collect()
    }
    time("shingle hashes + minhash sig") {
      corpus.select(col("doc_id"), graft.ext.Dedup.tokenHashes(col("text")).as("th"))
        .select(graft.ext.Dedup.shingleHashesFromTokenHashes(col("th"), 3).as("sh"))
        .select(graft.ext.Dedup.minhashSignature(col("sh"), 16).as("sig"))
        .selectExpr("sum(size(sig))").collect()
    }
    time("full minhashPairs") {
      graft.ext.Dedup.minhashPairs(corpus, "doc_id", "text").count()
    }
    spark.stop()
  }
}
