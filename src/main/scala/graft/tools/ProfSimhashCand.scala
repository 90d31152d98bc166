package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the simhash CANDIDATE set (pre-hamming-filter distinct pairs)
  * at a given sf dir, for both the legacy fixed 4×15 plan and the
  * cardinality-adaptive plan — the evidence line for SCALING.md: adaptive
  * banding must keep sf1.0/sf0.1 candidate growth ~linear (the round-8
  * verdict measured 17.8× for 10× data under the fixed plan).
  */
object ProfSimhashCand {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = graft.queries.TextQueries.corpusWithNearDups(spark, sfDir)
    val n = corpus.count()
    val (bands, bw) = graft.ext.Dedup.simhashBandPlan(n, 60, 15, 30)
    val fixed = graft.ext.Dedup.simhashCandidatesPortable(
      corpus, "doc_id", "text", bandPlan = Some((4, 15))).count()
    // the round-12 ceiling (maxWidth 20) pinned for comparison — at
    // n > ~65k docs it saturates and per-bucket load grows linearly
    val ceiling20 = graft.ext.Dedup.simhashCandidatesPortable(
      corpus, "doc_id", "text", bandPlan = Some((3, 20))).count()
    val adaptive = graft.ext.Dedup.simhashCandidatesPortable(
      corpus, "doc_id", "text").count()
    println(s"""{"sf_dir":"$sfDir","n_docs":$n,"plan_bands":$bands,"plan_width":$bw,""" +
      s""""cand_fixed_4x15":$fixed,"cand_ceiling_3x20":$ceiling20,"cand_adaptive":$adaptive}""")
    spark.stop()
  }
}
