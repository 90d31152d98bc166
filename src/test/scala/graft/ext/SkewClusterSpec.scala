package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Star-edge candidate generation (`minhashClusterEdges`) — the skew-safe
  * clustering path: linear edge count on pathological duplicate clusters,
  * and component-equivalent to the clique pipeline on ordinary corpora.
  */
class SkewClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def nearDupCorpus = {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("doc_id", "text")
    val mutated = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        expr("substr(text, instr(text, ' ') + 1)").as("text"))
    docs.unionByName(mutated)
  }

  private def componentSets(cc: org.apache.spark.sql.DataFrame): Set[Set[Long]] =
    cc.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet

  test("star edges stay linear on a pathological duplicate cluster") {
    val base = nearDupCorpus
    val cluster = spark.range(5000).select((col("id") + 1000000L).as("doc_id"),
      lit("the same boilerplate license header repeated across every corpus mirror").as("text"))
    val edges = Dedup.minhashClusterEdges(
      base.unionByName(cluster), "doc_id", "text", k = 16, bands = 8)
    // linear, not quadratic: the 5000-doc cluster contributes 4999 star
    // edges (one per member), not 12.5M clique pairs
    val clusterEdges = edges.filter(col("id_b") >= 1000000L).count()
    assert(clusterEdges == 4999, s"expected 4999 star edges, got $clusterEdges")
    val planted = Dedup.connectedComponents(edges)
      .filter(col("id") >= 1000000L).select("cluster_id").distinct().collect()
    assert(planted.length == 1 && planted.head.getLong(0) == 1000000L,
      "planted cluster must resolve to one component labeled by its min id")
  }

  test("verified star edges resolve the same components as the clique pipeline") {
    val corpus = nearDupCorpus
    val clique = Dedup.minhashPairs(corpus, "doc_id", "text",
      k = 16, bands = 8, threshold = 0.8)
    val star = Dedup.minhashClusterEdges(corpus, "doc_id", "text",
      k = 16, bands = 8, verifyThreshold = Some(0.8))
    val ccClique = componentSets(Dedup.connectedComponents(clique))
    val ccStar = componentSets(Dedup.connectedComponents(star))
    assert(ccStar == ccClique,
      s"star/clique component mismatch: onlyStar=${(ccStar -- ccClique).take(3)} " +
        s"onlyClique=${(ccClique -- ccStar).take(3)}")
  }

  test("unverified star edges respect band semantics (every member links to its bucket rep)") {
    val corpus = nearDupCorpus
    val edges = Dedup.minhashClusterEdges(corpus, "doc_id", "text", k = 16, bands = 8)
    // every emitted edge shares at least one band bucket — spot-check via
    // the pair pipeline's candidate superset at the same operating point
    assert(edges.filter(col("id_a") >= col("id_b")).count() == 0,
      "rep must always be the bucket min id")
    assert(edges.count() > 0)
  }
}
