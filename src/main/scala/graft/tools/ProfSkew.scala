package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated b10 skew-stress probe: sf corpus + one 50k-identical cluster
  * through star-edge candidates + CC, timed over 3 runs.
  */
object ProfSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/testdata-local/sf1.0"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val base = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
      val cluster = spark.range(50000).select((col("id") + 1000000L).as("doc_id"),
        lit("the same boilerplate license header repeated across every corpus mirror").as("text"))
      val edges = graft.ext.Dedup.minhashClusterEdges(
        base.unionByName(cluster), "doc_id", "text", k = 16, bands = 8)
      val cc = graft.ext.Dedup.connectedComponents(edges)
      val planted = cc.filter(col("id") >= 1000000L).select("cluster_id").distinct().count()
      println(f"run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s (planted components: $planted)")
    }
    spark.stop()
  }
}
