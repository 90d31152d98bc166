package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Regenerate the d06 golden-snapshot fixture (sf0.001) after any
  * INTENDED simhash change: pairs at hamming<=6 plus planted/background
  * composition stats printed for the contract assertions.
  */
object GenFixture {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").appName("genfix").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val corpus = graft.queries.TextQueries.corpusWithNearDups(spark, dir)
    val out = graft.ext.Dedup.simhashCandidates(corpus, "doc_id", "text")
      .filter(col("hamming") <= 6)
      .orderBy("id_a", "id_b")
      .select("id_a", "id_b", "hamming")
      .collect()
    val planted = out.count(r => r.getLong(1) == r.getLong(0) + graft.queries.TextQueries.DupOffset)
    println(s"pairs=${out.length} planted=$planted")
    val w = new java.io.PrintWriter("src/test/resources/d06_simhash_sf0001.csv")
    w.println("id_a,id_b,hamming")
    out.foreach(r => w.println(s"${r.getLong(0)},${r.getLong(1)},${r.get(2)}"))
    w.close()
    // contract stats: how many planted pairs exist and are recalled
    val nPlantedTotal = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 7 === 0).count()
    println(s"plantedTotal=$nPlantedTotal recalled=$planted")
    spark.stop()
  }
}
