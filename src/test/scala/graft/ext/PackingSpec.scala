package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("next-fit packing: cumulative-end boundary rule, one shard") {
    // ids chosen ≡ 0 (mod 1 shard); capacity 10
    val docs = Seq((1L, 6L), (2L, 5L), (3L, 4L), (4L, 3L), (5L, 2L))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(docs, "doc_id", col("n_tokens"),
      capacity = 10, nShards = 1)
      .orderBy("doc_id").collect()
    // order by tokens desc: 6,5,4,3,2 → cum 6,11,15,18,20 → bins 1,2,2,2,2
    val byId = packed.map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(byId(1L) === ((6L, 1L)))
    assert(byId(2L) === ((11L, 2L))) // crosses the boundary -> lands in bin 2
    assert(byId(3L) === ((15L, 2L)))
    assert(byId(5L) === ((20L, 2L)))
  }

  test("shards pack independently; every doc appears exactly once") {
    val docs = (1L to 100L).map(i => (i, (i % 7) + 1)).toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(docs, "doc_id", col("n_tokens"),
      capacity = 16, nShards = 4)
    assert(packed.count() === 100)
    assert(packed.select("doc_id").distinct().count() === 100)
    // shard is doc_id mod nShards
    assert(packed.filter(col("shard") =!= pmod(col("doc_id"), lit(4)).cast("int")).count() === 0)
    // within a shard, cum_tokens is the running total of the desc order
    val s0 = packed.filter(col("shard") === 0)
      .orderBy(col("n_tokens").desc, col("doc_id"))
      .select("n_tokens", "cum_tokens").as[(Long, Long)].collect()
    assert(s0.map(_._1).scanLeft(0L)(_ + _).drop(1).toSeq === s0.map(_._2).toSeq)
  }

  test("binFill: padding counts the gap to capacity, overflow pads zero") {
    val docs = Seq((1L, 9L), (2L, 9L), (3L, 2L)).toDF("doc_id", "n_tokens")
    // desc: 9,9,2 → cum 9,18,20 → bins 1,2,2 ; bin1 = 9 tokens, bin2 = 11
    val fill = Packing.binFill(
      Packing.packSequences(docs, "doc_id", col("n_tokens"), 10, 1), 10)
      .orderBy("bin_id").collect()
    assert(fill.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      === Seq((1L, 1L, 9L, 1L), (2L, 2L, 11L, 0L)))
  }
}
