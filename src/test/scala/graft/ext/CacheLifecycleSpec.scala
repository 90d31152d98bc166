package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the owned persist lifecycle of the signature-cached pipelines
  * (round-6 verdict "What's wrong" #1): after an LSH/bloom operator
  * returns, no corpus-sized MEMORY_AND_DISK frame may remain registered
  * in the Dataset cache manager, and once the caller drops the result
  * the checkpoint blocks are reclaimed by the ContextCleaner — repeated
  * invocations in a long-lived session must not accumulate cached state.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("doc_id", "text")
    val mutated = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        expr("substr(text, instr(text, ' ') + 1)").as("text"))
    docs.unionByName(mutated)
  }

  /** Dataset-level caches (the signature-frame persists) left registered. */
  private def datasetCacheEmpty: Boolean =
    spark.sharedState.cacheManager.isEmpty

  /** RDD blocks (incl. localCheckpoint results) drain once unreferenced:
    * poke the ContextCleaner with a GC and wait bounded time.
    */
  private def awaitNoPersistentRdds(): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.sparkContext.getPersistentRDDs.nonEmpty && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(200)
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"persistent RDDs leaked: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("LSH pipelines release their signature caches on return") {
    // start clean so leaks are attributable to the operators under test
    spark.sharedState.cacheManager.clearCache()
    awaitNoPersistentRdds()

    var n = 0L
    n = Dedup.minhashPairs(corpus, "doc_id", "text", k = 16, bands = 8, threshold = 0.8).count()
    assert(n > 0 && datasetCacheEmpty, "minhashPairs left a Dataset cache registered")
    n = Dedup.minhashPairsPortable(corpus, "doc_id", "text", k = 16, bands = 4, threshold = 0.4).count()
    assert(n > 0 && datasetCacheEmpty, "minhashPairsPortable left a Dataset cache registered")
    n = Dedup.simhashCandidates(corpus, "doc_id", "text").filter(col("hamming") <= 6).count()
    assert(n > 0 && datasetCacheEmpty, "simhashCandidates left a Dataset cache registered")
    n = Dedup.simhashCandidatesPortable(corpus, "doc_id", "text").filter(col("hamming") <= 6).count()
    assert(n > 0 && datasetCacheEmpty, "simhashCandidatesPortable left a Dataset cache registered")

    // all results dropped above: the checkpointed pair frames must drain
    awaitNoPersistentRdds()
  }

  test("connectedComponents retains only the final labels checkpoint") {
    // Round-11 verdict: CC leaked ~2 checkpointed RDDs per pointer-jump
    // round (never unpersisted), and bench entries after b07 paid the
    // accumulated block-manager pressure. Contract now: after the result
    // is materialized, at most ONE persistent RDD (the returned labels
    // checkpoint) remains, regardless of iteration count.
    spark.sharedState.cacheManager.clearCache()
    awaitNoPersistentRdds()

    // scoped in a def so the result reference dies on return and the
    // ContextCleaner can drain the one legitimate checkpoint below
    def run(): Unit = {
      // 200 chains of diameter 20 -> multiple jump rounds
      val edges = spark.range(0, 4000).filter(col("id") % 20 =!= 19)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val cc = Dedup.connectedComponents(edges)
      assert(cc.select("cluster_id").distinct().count() == 200)
      val live = spark.sparkContext.getPersistentRDDs
      assert(live.size <= 1,
        s"CC leaked per-round checkpoints: ${live.size} persistent RDDs remain")
    }
    run()
    // once the caller drops the result, everything drains
    awaitNoPersistentRdds()
  }

  test("connectedComponents stats stay bounded across rounds (no BigInteger blowup)") {
    // Dataset.localCheckpoint rewrites the ORIGIN plan's statistics onto
    // the checkpoint leaf; in the CC loop a round's size estimate is a
    // product over the previous leaf's (the jump SQUARES it), so the
    // estimate's bit-length doubled every round — by ~10 rounds the
    // driver stalled in multi-megabit BigInteger multiplications inside
    // stats estimation (surfaced by the sf10 tier). The manual re-wrap
    // keeps every round's leaf at the default estimate: the returned
    // plan's sizeInBytes must stay a SMALL number, independent of
    // iteration count.
    val edges = spark.range(0, 4000).filter(col("id") % 400 =!= 399)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b")) // diameter-400 chains
    val cc = Dedup.connectedComponents(edges)
    assert(cc.select("cluster_id").distinct().count() == 10)
    val bits = cc.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(bits < 512,
      s"CC result carries a $bits-bit size estimate — per-round stats are compounding again")
  }

  test("bloom-routed ingest dedup releases the candidate sliver on both paths") {
    spark.sharedState.cacheManager.clearCache()
    awaitNoPersistentRdds()

    val corpusDocs = spark.range(0, 2000)
      .select(col("id"), md5(col("id").cast("string")).as("content"))
    val keys = corpusDocs.select(md5(col("content")).as("k"))
    val bloom = Dedup.corpusKeyBloom(keys, "k", 2000L)
    val batch = spark.range(1500, 3000)
      .select(col("id"), md5(col("id").cast("string")).as("content"))

    // broadcast path
    val nNew = Dedup.newDocsAgainstKeys(keys, "k", batch, "content", bloom).count()
    assert(nNew == 1000, s"expected 1000 new docs, got $nNew")
    assert(datasetCacheEmpty, "broadcast path left the sliver cache registered")

    // forced fallback path (cap of 1 key): shuffled anti-join, same answer
    val nFb = Dedup.newDocsAgainstKeys(keys, "k", batch, "content", bloom,
      maxBroadcastKeys = 1L).count()
    assert(nFb == 1000, s"fallback path expected 1000 new docs, got $nFb")
    assert(datasetCacheEmpty, "fallback path left the sliver cache registered")

    awaitNoPersistentRdds()
  }
}
