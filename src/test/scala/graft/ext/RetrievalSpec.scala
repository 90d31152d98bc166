package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "spark shuffle shuffle shuffle join"),   // tf(shuffle)=3, short
    (2L, "shuffle " + ("filler " * 50) + "join"), // tf(shuffle)=1, long
    (3L, "join join scan"),                       // no query term but join
    (4L, "scan filter project"),                  // no match at all
    (5L, "shuffle join")                          // both terms, shortest
  ).toDF("doc_id", "text")

  test("BM25: tf saturation + length norm rank the right doc first") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("shuffle"), topK = 3).collect()
    // docs 1, 2, 5 match; doc 1 (tf 3, short) beats doc 5 (tf 1, shortest)
    // beats doc 2 (tf 1, 52 tokens of length penalty)
    assert(top.map(_.getLong(0)).toSeq === Seq(1L, 5L, 2L))
    assert(top.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L))
    // scores strictly decreasing
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse && scores.distinct.size === 3)
  }

  test("multi-term query sums per-term contributions; rarer term weighs more") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("shuffle", "scan"), topK = 5).collect()
    assert(top.map(_.getLong(0)).toSet === Set(1L, 2L, 3L, 4L, 5L))
    // 'scan' (df 2) has higher idf than 'shuffle' (df 3): doc 4 (scan only)
    // must outrank doc 2 (shuffle only, long)
    val rank = top.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rank(4L) < rank(2L))
  }

  test("rrfFuse: both-list ids outrank single-list ids; absent side adds 0") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val fused = Retrieval.rrfFuse(a, b, "doc_id", topK = 4).collect()
    // 20 in both lists: 1/62 + 1/61 beats every single-list score
    assert(fused.head.getLong(0) === 20L)
    assert(fused.map(_.getLong(0)).toSet === Set(10L, 20L, 30L, 40L))
    assert(math.abs(fused.head.getDouble(1) - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    // ranks are 1..4 in fused-score order
    assert(fused.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("topK cuts after rounding; matching is case-insensitive") {
    assert(Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("SHUFFLE"), topK = 2)
      .count() === 2)
    val e = intercept[IllegalArgumentException](
      Retrieval.bm25TopK(corpus, "doc_id", "text", Nil, topK = 1))
    assert(e.getMessage.contains("empty query"))
  }
}
