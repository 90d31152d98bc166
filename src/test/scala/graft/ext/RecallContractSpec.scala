package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.tools.EmbRecallContract

/** Per-commit pin of the e11 banded-LSH recall contract (round-16
  * verdict ask #3): EmbRecallContract ran only as a manually-invoked
  * scale tool (sf1.0/sf10, SCALING.md), so a change to
  * `Similarity.lshBandBits` or the band planning could silently degrade
  * recall between probe runs. This spec runs the SAME run/check core at
  * the sf0.001 fixture (500 vecs, nBases = 50): the hard assertions
  * (exact-dup fraction == 1.0, below-threshold leakage == 0) are
  * scale-independent, and the boundary levels still sit inside the
  * closed-form envelope at the small-n tolerance max(0.08, 5σ).
  */
class RecallContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("e11 recall contract holds at the sf0.001 fixture") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val res = EmbRecallContract.run(spark, emb)
    assert(res.nBases == 50)
    // adaptive width at this corpus (500 + 250 plants): 2^w >= 16*750
    assert(res.bandBits == graft.ext.Similarity.lshBandBits(res.nCorpus))
    EmbRecallContract.check(res) // throws with the violated level if broken
    // the contract rows are real measurements, not vacuous zeros
    val exact = res.rows.find(_.cosine == 1.0).get
    assert(exact.observed == 1.0)
    assert(res.rows.filter(r => r.above && r.cosine < 1.0)
      .forall(r => r.closedForm > 0.05 && r.closedForm < 0.999))
  }

  test("plant-id stride clears the id space (degenerate-fixture guards)") {
    import spark.implicits._
    // 10 vectors: nBases floors at 1 (used to divide by zero — ADVICE)
    val tiny = (0L until 10L).map(i =>
      (i, Array.tabulate(64)(d => math.sin(i * 3.7 + d).toFloat))).toDF("vec_id", "embedding")
    val res = EmbRecallContract.run(spark, tiny, maxBases = 1000)
    assert(res.nBases == 1)
    EmbRecallContract.check(res)
    // an id space reaching the plant offset must be rejected, not corrupt counts
    val off = graft.queries.TextQueries.DupOffset
    val clash = Seq((off + 1L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](EmbRecallContract.run(spark, clash))
    assert(e.getMessage.contains("plant offset"))
  }
}
