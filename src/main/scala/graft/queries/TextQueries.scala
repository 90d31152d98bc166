package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity, TextOps}

/** Training-data-pipeline queries over `documents` and `embeddings`:
  * dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search
  * (brute-force + LSH ANN), and text analysis (tokens, quality, langid,
  * fingerprints). SQL-expressible ops carry DuckDB oracles; the
  * hash-pipeline ops are deterministic but oracle-free (rows-only check).
  */
object TextQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Synthetic-copy id offset for planted near-dups. Must clear the real
    * doc/vec id space at EVERY tier: the old 100000 collided with genuine
    * doc_ids once the corpus passed 100k docs (sf10's 500k), making the
    * planted copy share an id with an unrelated real document — Spark
    * kept both corpus rows while the recursive oracle's UNION collapsed
    * them (d17), and duplicate-id grouping picked between two different
    * texts (d18). 10^9 leaves three more decades of headroom; ids are
    * int64 end-to-end so the sum can't overflow either engine.
    */
  private[graft] val DupOffset = 1000000000L

  /** documents ∪ a mutated copy (first token dropped) of every 7th doc —
    * guaranteed near-duplicates so the near-dup pipelines have signal.
    */
  private[graft] def corpusWithNearDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val mutated = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + DupOffset).as("doc_id"),
        expr("substr(text, instr(text, ' ') + 1)").as("text"))
    docs.unionByName(mutated)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d22_sequence_pack" -> ((spark, dir) => {
      // greedy next-fit packing into 2048-token bins across 8 shards;
      // the oracle replays the same shard + cumsum + boundary rule
      val docs = t(spark, dir, "documents")
      graft.ext.Packing.packSequences(docs, "doc_id",
          TextOps.tokenCount(col("text")), capacity = 2048, nShards = 8)
        .orderBy("doc_id")
    }),

    "d01_exact_dedup" -> ((spark, dir) => {
      Dedup.exact(t(spark, dir, "documents"), "doc_id", "text")
        .select("doc_id", "keeper_id", "is_dup")
        .orderBy("doc_id")
    }),

    "d02_token_stats" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
      docs.select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.subwordCount(col("text")).as("n_subwords"),
          (length(regexp_replace(trim(col("text")), "\\s+", "")).cast("double") /
            TextOps.tokenCount(col("text"))).as("mean_token_len"))
        .orderBy("doc_id")
    }),

    "d03_fingerprint" -> ((spark, dir) => {
      t(spark, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    }),

    "d04_quality_score" -> ((spark, dir) => {
      TextOps.qualityColumns(t(spark, dir, "documents"), "text")
        .select("doc_id", "n_tokens", "stopword_ratio", "quality_ok")
        .orderBy("doc_id")
    }),

    // xxhash64 fast path at a VERIFIED operating point: 8 bands x 2 rows,
    // verify threshold 0.8 puts band recall for admissible pairs at
    // 1-(1-j^2)^8 >= 0.9996, so WHICH hash family generated the
    // candidates cannot change the verified pair set — the portable-md5
    // pipeline replica is therefore a valid DuckDB oracle for this query
    // (confirmed pair-identical at sf0.001/0.01/0.1). d09 keeps the
    // low-threshold (0.4) operating point where banding recall is
    // genuinely probabilistic and the oracle must share the hash family.
    "d05_minhash_lsh" -> ((spark, dir) => {
      Dedup.minhashPairs(corpusWithNearDups(spark, dir), "doc_id", "text",
          k = 16, bands = 8, threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),

    "d07_langid" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
      // train profiles on a deterministic 40% sample — the model converges
      // with far less text than the corpus; classification stays full
      val trainSet = docs.filter(col("doc_id") % 5 < 2)
      TextOps.langId(trainSet, docs, "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang").as("actual_lang")), "doc_id")
        .select(col("doc_id"), col("predicted_lang"), col("actual_lang"),
          (col("predicted_lang") === col("actual_lang")).as("correct"))
        .orderBy("doc_id")
    }),

    "e01_knn_cosine" -> ((spark, dir) => {
      val emb = t(spark, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        .orderBy("query_id", "rank")
    }),

    "e03_embedding_dedup" -> ((spark, dir) => {
      // embeddings ∪ slightly-perturbed copies of every 10th vector: the
      // planted near-dups (sim ≈ 0.995) must surface, background (≤0.6) not
      val emb = t(spark, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      val perturbed = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + DupOffset).as("vec_id"),
          concat(array(element_at(col("e"), 1) + 0.1), slice(col("e"), 2, 63)).as("e"))
      Dedup.embeddingCosinePairs(emb.unionByName(perturbed), "vec_id", "e", threshold = 0.95)
        .orderBy("id_a", "id_b")
    }),

    "e05_embedding_dedup_lsh" -> ((spark, dir) => {
      // the linear-scale near-dup path: same planted corpus as e03, but
      // candidates come from shared LSH buckets instead of all pairs
      val emb = t(spark, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      val perturbed = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + DupOffset).as("vec_id"),
          concat(array(element_at(col("e"), 1) + 0.1), slice(col("e"), 2, 63)).as("e"))
      Dedup.embeddingCosinePairsLSH(emb.unionByName(perturbed), "vec_id", "e",
          dim = 64, nBits = 8, threshold = 0.95)
        .orderBy("id_a", "id_b")
    }),

    "e11_embedding_dedup_banded" -> ((spark, dir) => {
      // the scale-true banded form of e05 (the sf100 probe measured the
      // fixed 256-bucket e05 going quadratic at 2.2M vectors): 4 bands x
      // 16 bits pinned so the oracle replays the exact layout; the
      // production default sizes bits adaptively (lshBandBits)
      val emb = t(spark, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      val perturbed = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + DupOffset).as("vec_id"),
          concat(array(element_at(col("e"), 1) + 0.1), slice(col("e"), 2, 63)).as("e"))
      Dedup.embeddingCosinePairsLSHBanded(emb.unionByName(perturbed), "vec_id", "e",
          dim = 64, threshold = 0.95, bands = 4, bitsPerBand = Some(16))
        .orderBy("id_a", "id_b")
    }),

    "e06_pq_adc" -> ((spark, dir) => {
      // PQ with iters=0: codebooks ARE the 16 lowest-id vectors'
      // sub-slices, so the whole encode + ADC scan is SQL-replayable;
      // ranking rounds distances like e01 (cross-engine float ties)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val books = graft.ext.Quantization.fit(emb, "vec_id", "embedding", m = 8, k = 16, iters = 0)
      val encoded = graft.ext.Quantization.encode(emb, "vec_id", "embedding", books)
      graft.ext.Quantization.adcTopK(encoded, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", books, topK = 10, roundDist = Some(6))
        .orderBy("query_id", "rank")
    }),

    "e02_ann_lsh" -> ((spark, dir) => {
      val emb = t(spark, dir, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          dim = 64, k = 10, nBits = 12)
        .orderBy("query_id", "rank")
    }),

    "e04_ann_ivf" -> ((spark, dir) => {
      val emb = t(spark, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nCentroids = 16, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    "d10_simhash_portable" -> ((spark, dir) => {
      Dedup.simhashCandidatesPortable(corpusWithNearDups(spark, dir), "doc_id", "text")
        .filter(col("hamming") <= 6)
        .orderBy("id_a", "id_b")
    }),

    // the 128-bit (2x60 portable words) signature tier: twice the bands
    // at the same width, so guaranteed recall improves at every corpus
    // size while the widest plan's saturation moves out ten decades;
    // hamming cutoff doubles with the signature (12 vs d10's 6)
    "d28_simhash128_portable" -> ((spark, dir) => {
      Dedup.simhash128CandidatesPortable(corpusWithNearDups(spark, dir), "doc_id", "text")
        .filter(col("hamming") <= 12)
        .orderBy("id_a", "id_b")
    }),

    "d09_minhash_portable" -> ((spark, dir) => {
      Dedup.minhashPairsPortable(corpusWithNearDups(spark, dir), "doc_id", "text",
          k = 16, bands = 4, threshold = 0.4)
        .orderBy("id_a", "id_b")
    }),

    "d08_ngram_jaccard" -> ((spark, dir) => {
      // exact 3-gram Jaccard on deterministic candidate pairs: every
      // planted (doc, mutated-doc) pair + a low-similarity background pair
      val corpus = corpusWithNearDups(spark, dir)
      val docs = t(spark, dir, "documents")
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + DupOffset).as("id_b"))
      val background = docs.filter(col("doc_id") % 50 === 0 && col("doc_id") > 0)
        .select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"))
      Dedup.ngramJaccard(planted.unionByName(background), corpus, "doc_id", "text")
        .orderBy("id_a", "id_b")
    }),

    // Broder containment on planted PARTIAL copies: every 9th doc gets a
    // half-length prefix copy — containment_b ~ 1 (the half lives inside
    // the original) while containment_a ~ 0.5, the asymmetry symmetric
    // Jaccard cannot express
    "d30_ngram_containment" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
      val halves = docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 3 * DupOffset).as("doc_id"),
          expr("substring(text, 1, cast(length(text) / 2 as int))").as("text"))
      val corpus = docs.select("doc_id", "text").unionByName(halves)
      val pairs = docs.filter(col("doc_id") % 9 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 3 * DupOffset).as("id_b"))
      Dedup.ngramContainment(pairs, corpus, "doc_id", "text")
        .orderBy("id_a", "id_b")
    }),

    "d13_chunking" -> ((spark, dir) => {
      // sliding 24-token windows, stride 16 (8-token overlap) — small
      // enough that the ~30-token synthetic docs produce multiple chunks
      TextOps.chunkColumns(t(spark, dir, "documents"), "doc_id", "text",
          chunkSize = 24, stride = 16)
        .orderBy("doc_id", "chunk_idx")
    }),

    "d14_tfidf" -> ((spark, dir) => {
      TextOps.tfidfTopTerms(t(spark, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")
    }),

    "d15_hash_split" -> ((spark, dir) => {
      TextOps.hashSplit(t(spark, dir, "documents").select("doc_id", "lang"),
          "doc_id", salt = "v1", fractions = Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select("doc_id", "lang", "split_bucket", "split")
        .orderBy("doc_id")
    }),

    "d16_bigram_logprob" -> ((spark, dir) => {
      // train the bigram LM on the %5<2 slice (like langid), score all
      val docs = t(spark, dir, "documents")
      TextOps.bigramLogProb(docs.filter(col("doc_id") % 5 < 2), docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "d12_repetition" -> ((spark, dir) => {
      // Gopher repetition rules over a corpus where %19 docs are doubled
      // (planted repetition, same derivation in the oracle)
      val docs = t(spark, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 19 === 0, concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
      TextOps.repetitionColumns(docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "d11_pii_detect" -> ((spark, dir) => {
      // the synthetic corpus carries no digits, so PII-shaped strings are
      // planted deterministically from doc_id (same derivation in the
      // oracle); the detector itself is the real regex scrub pass
      TextOps.piiColumns(corpusWithPii(spark, dir), "text")
        .select("doc_id", "n_emails", "n_phones", "n_ssn", "n_ipv4", "has_pii", "redacted")
        .orderBy("doc_id")
    })
  )

  /** Documents with deterministic PII-shaped plants: emails on %7, dashed
    * phones on %11, SSN-form ids on %13, IPv4 hosts on %17 — every value
    * derived from doc_id so the DuckDB oracle can replant identically.
    */
  private[graft] def corpusWithPii(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val id = col("doc_id")
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    docs.withColumn("text", concat(
      col("text"),
      when(id % 7 === 0, concat(lit(" contact user"), s(id), lit("@example.com"))).otherwise(lit("")),
      when(id % 11 === 0, concat(lit(" call 555-"), s(id % 900 + 100), lit("-"), s(id % 9000 + 1000))).otherwise(lit("")),
      when(id % 13 === 0, concat(lit(" id "), s(id % 900 + 100), lit("-"), s(id % 90 + 10), lit("-"), s(id % 9000 + 1000))).otherwise(lit("")),
      when(id % 17 === 0, concat(lit(" host 10."), s(id % 256), lit("."), s((id * 7) % 256), lit("."), s(id % 250 + 1))).otherwise(lit(""))))
  }

  /** corpus CTE body shared by d08/d09 oracles (docs + planted near-dups). */
  private val corpusSql =
    s"""SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + $DupOffset, substr(text, instr(text, ' ') + 1)
      |  FROM documents WHERE doc_id % 7 = 0""".stripMargin

  val oracle: Map[String, String] = Map(
    "d22_sequence_pack" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |         CAST(doc_id % 8 AS INT) AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |         CAST(sum(n_tokens) OVER (PARTITION BY shard
        |           ORDER BY n_tokens DESC, doc_id ASC
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM d)
        |SELECT doc_id, shard, n_tokens, cum_tokens,
        |       CAST(ceil(CAST(cum_tokens AS DOUBLE) / 2048) AS BIGINT) AS bin_id
        |FROM c ORDER BY doc_id""".stripMargin,

    "d15_hash_split" ->
      // same md5 bucket math: first 8 hex digits of md5(id || 'v1') mod 100
      """SELECT doc_id, lang,
        |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'v1'), 1, 8)) AS BIGINT) % 100 AS BIGINT) AS split_bucket,
        |  CASE
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'v1'), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
        |    WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'v1'), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
        |    ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "d16_bigram_logprob" ->
      // add-one-smoothed bigram LM trained on doc_id % 5 < 2; <s> pads
      // the start; unseen bigrams fall back to ln(1/V)
      """WITH tr AS (
        |  SELECT doc_id, list_prepend('<s>', string_split_regex(trim(text), '\s+')) AS p
        |  FROM documents WHERE doc_id % 5 < 2),
        |trb AS (
        |  SELECT p[i] AS prev, p[i+1] AS term
        |  FROM (SELECT p, unnest(range(1, len(p))) AS i FROM tr)),
        |counts AS (SELECT prev, term, count(*) AS c FROM trb GROUP BY 1, 2),
        |pt AS (SELECT prev, sum(c) AS prev_total FROM counts GROUP BY 1),
        |v AS (SELECT count(DISTINCT term) AS vocab FROM counts),
        |model AS (
        |  SELECT prev, term,
        |    ln((c + 1.0) / (prev_total + (SELECT vocab FROM v))) AS logp
        |  FROM counts JOIN pt USING (prev)),
        |sc AS (
        |  SELECT doc_id, list_prepend('<s>', string_split_regex(trim(text), '\s+')) AS p
        |  FROM documents),
        |scb AS (
        |  SELECT doc_id, p[i] AS prev, p[i+1] AS term
        |  FROM (SELECT doc_id, p, unnest(range(1, len(p))) AS i FROM sc))
        |SELECT doc_id,
        |  round(avg(coalesce(m.logp, ln(1.0 / (SELECT vocab FROM v)))), 9) AS avg_logp,
        |  CAST(count(*) AS BIGINT) AS n_bigrams
        |FROM scb LEFT JOIN model m USING (prev, term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "d13_chunking" ->
      // nChunks = 1 + ceil(max(n-24,0)/16); chunk k = toks[16k+1 : 16k+24]
      """WITH b AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
        |    len(string_split_regex(trim(text), '\s+')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    unnest(range(0, CAST(ceil(greatest(n - 24, 0) / 16.0) AS BIGINT) + 1)) AS chunk_idx,
        |    toks
        |  FROM b)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(len(toks[chunk_idx*16+1 : chunk_idx*16+24]) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(toks[chunk_idx*16+1 : chunk_idx*16+24], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "d14_tfidf" ->
      // smoothed idf = ln((N+1)/(df+1)) + 1, top 3 terms per doc by
      // (tfidf desc, term asc)
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY 1, 2),
        |dfreq AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df,
        |    ln((CAST((SELECT count(DISTINCT doc_id) FROM documents) AS DOUBLE) + 1.0)
        |      / (count(*) + 1.0)) + 1.0 AS idf
        |  FROM tf GROUP BY term),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |    round(tf.tf * dfreq.idf, 9) AS tfidf
        |  FROM tf JOIN dfreq USING (term)),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS INTEGER) AS rank FROM scored)
        |SELECT doc_id, rank, term, tf, df, tfidf
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "d12_repetition" ->
      // mirrors TextOps.repetitionColumns: 8-token lines, word bigrams,
      // Gopher thresholds; DuckDB range() is stop-exclusive where Spark
      // sequence() is inclusive, hence range(0, ceil) / range(1, n)
      """WITH corpus AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 19 = 0 THEN text || ' ' || text ELSE text END AS text
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM corpus),
        |b2 AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |    length(array_to_string(toks, ' ')) AS norm_len
        |  FROM base),
        |lines AS (
        |  SELECT doc_id, unnest(list_transform(range(0, CAST(ceil(n / 8.0) AS BIGINT)),
        |    i -> array_to_string(toks[i*8+1 : i*8+8], ' '))) AS line
        |  FROM b2),
        |lcnt AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY 1, 2),
        |lagg AS (
        |  SELECT doc_id, sum(c) AS n_lines, count(*) AS n_dist,
        |    sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) AS dup_chars
        |  FROM lcnt GROUP BY 1),
        |bigr AS (
        |  SELECT doc_id, unnest(list_transform(range(1, n), i -> toks[i] || ' ' || toks[i+1])) AS bg
        |  FROM b2 WHERE n >= 2),
        |bcnt AS (SELECT doc_id, bg, count(*) AS c FROM bigr GROUP BY 1, 2),
        |btop AS (
        |  SELECT doc_id, bg, c FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bg) AS rn
        |    FROM bcnt) WHERE rn = 1),
        |m AS (
        |  SELECT b2.doc_id,
        |    CAST(lagg.n_lines AS BIGINT) AS n_lines,
        |    round(1.0 - CAST(lagg.n_dist AS DOUBLE) / lagg.n_lines, 9) AS dup_line_frac,
        |    round(CAST(lagg.dup_chars AS DOUBLE) / b2.norm_len, 9) AS dup_line_char_frac,
        |    coalesce(btop.bg, '') AS top_bigram,
        |    round(CASE WHEN coalesce(btop.c, 0) > 1
        |      THEN CAST(btop.c * length(btop.bg) AS DOUBLE) / b2.norm_len
        |      ELSE 0.0 END, 9) AS top_bigram_char_frac
        |  FROM b2 JOIN lagg ON b2.doc_id = lagg.doc_id
        |  LEFT JOIN btop ON b2.doc_id = btop.doc_id)
        |SELECT *,
        |  dup_line_frac < 0.30 AND dup_line_char_frac < 0.20 AND top_bigram_char_frac < 0.20
        |    AS repetition_ok
        |FROM m ORDER BY doc_id""".stripMargin,

    "d11_pii_detect" ->
      // replants the deterministic PII strings, then replays the same
      // regex counts/redaction (RE2 and Java regex agree on these shapes)
      """WITH corpus AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0 THEN ' id ' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 90 + 10 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END ||
        |    CASE WHEN doc_id % 17 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 + 1 AS VARCHAR) ELSE '' END
        |    AS text
        |  FROM documents),
        |counted AS (
        |  SELECT doc_id, text,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |    CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        |    CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
        |    CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4
        |  FROM corpus)
        |SELECT doc_id, n_emails, n_phones, n_ssn, n_ipv4,
        |  n_emails + n_phones + n_ssn + n_ipv4 > 0 AS has_pii,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |        '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
        |      '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted
        |FROM counted ORDER BY doc_id""".stripMargin,

    "d09_minhash_portable" -> Dedup.minhashPortableOracleSql(corpusSql),
    // valid for the xxhash64 path because at bands=8/threshold=0.8 the
    // hash family cannot change the verified pair set (see query note)
    "d05_minhash_lsh" -> Dedup.minhashPortableOracleSql(corpusSql,
      k = 16, bands = 8, threshold = 0.8),
    "e02_ann_lsh" -> Similarity.lshOracleSql(dim = 64, nBits = 12, k = 10, queryMaxId = 5),

    "e06_pq_adc" ->
      // replica of Quantization with iters=0: codebook c of subspace s is
      // vecs-by-id[c].e[s*8+1 : s*8+8]; assignment = argmin L2^2 with
      // lowest-code tie-break; ADC dist = sum of per-subspace table
      // lookups, rounded to 6 before ranking
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cd AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code, e
        |       FROM base ORDER BY vec_id LIMIT 16),
        |d2s AS (
        |  SELECT b.vec_id, t.s, c.code,
        |    sum((b.e[t.s*8+j.j] - c.e[t.s*8+j.j]) * (b.e[t.s*8+j.j] - c.e[t.s*8+j.j])) AS d2
        |  FROM base b, range(0, 8) t(s), cd c, range(1, 9) j(j)
        |  GROUP BY 1, 2, 3),
        |assign AS (
        |  SELECT vec_id, s, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn
        |    FROM d2s) WHERE rn = 1),
        |qt AS (
        |  SELECT q.vec_id AS query_id, t.s, c.code,
        |    sum((q.e[t.s*8+j.j] - c.e[t.s*8+j.j]) * (q.e[t.s*8+j.j] - c.e[t.s*8+j.j])) AS d2
        |  FROM base q, range(0, 8) t(s), cd c, range(1, 9) j(j)
        |  WHERE q.vec_id < 5
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT qt.query_id, a.vec_id AS neighbor_id, round(sum(qt.d2), 6) AS approx_dist
        |  FROM assign a JOIN qt ON a.s = qt.s AND a.code = qt.code
        |  WHERE a.vec_id <> qt.query_id
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY approx_dist, neighbor_id) AS BIGINT) AS rank FROM scored)
        |SELECT query_id, neighbor_id, approx_dist, rank
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "e05_embedding_dedup_lsh" -> Similarity.lshPairsOracleSql(
      s"""SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + $DupOffset, list_prepend(e[1] + 0.1, e[2:])
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |  WHERE vec_id % 10 = 0""".stripMargin,
      dim = 64, nBits = 8, threshold = 0.95),

    "e11_embedding_dedup_banded" -> Similarity.lshBandedPairsOracleSql(
      s"""SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + $DupOffset, list_prepend(e[1] + 0.1, e[2:])
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
        |  WHERE vec_id % 10 = 0""".stripMargin,
      dim = 64, bands = 4, w = 16, threshold = 0.95),

    "d07_langid" ->
      // replica of TextOps.langId: top-40 trigram profiles per language
      // trained on doc_id % 5 < 2, argmax overlap (ties -> greater lang)
      """WITH train AS (
        |  SELECT lang, ' ' || lower(trim(text)) || ' ' AS norm
        |  FROM documents WHERE doc_id % 5 < 2),
        |tg AS (SELECT lang, unnest(
        |    CASE WHEN length(norm) >= 3
        |         THEN list_transform(range(1, length(norm) - 1), i -> substr(norm, i, 3))
        |         ELSE [norm] END) AS trigram
        |  FROM train),
        |counts AS (SELECT lang, trigram, count(*) AS c FROM tg GROUP BY lang, trigram),
        |prof AS (SELECT lang, trigram FROM (
        |    SELECT lang, trigram,
        |      row_number() OVER (PARTITION BY lang ORDER BY c DESC, trigram) AS rn
        |    FROM counts) WHERE rn <= 40),
        |proflist AS (SELECT lang, list(trigram) AS tgs FROM prof GROUP BY lang),
        |dtg AS (SELECT doc_id, lang AS actual_lang, list_distinct(
        |    CASE WHEN length(norm) >= 3
        |         THEN list_transform(range(1, length(norm) - 1), i -> substr(norm, i, 3))
        |         ELSE [norm] END) AS t
        |  FROM (SELECT doc_id, lang, ' ' || lower(trim(text)) || ' ' AS norm FROM documents)),
        |scores AS (SELECT doc_id, actual_lang, p.lang,
        |    len(list_intersect(dtg.t, p.tgs)) AS overlap
        |  FROM dtg CROSS JOIN proflist p),
        |best AS (SELECT doc_id, actual_lang, lang AS predicted_lang,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, lang DESC) AS rn
        |  FROM scores)
        |SELECT doc_id, predicted_lang, actual_lang,
        |  predicted_lang = actual_lang AS correct
        |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "d10_simhash_portable" -> Dedup.simhashPortableOracleSql(corpusSql, maxHamming = 6),
    "d28_simhash128_portable" -> Dedup.simhash128PortableOracleSql(corpusSql, maxHamming = 12),
    "d01_exact_dedup" ->
      """SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
        |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,

    "d02_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
        |       t -> greatest(1, CAST(ceil(length(t) / 4.0) AS BIGINT)))) AS BIGINT) AS n_subwords,
        |  CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |    / len(string_split_regex(trim(text), '\s+')) AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "d03_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "d04_quality_score" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |         t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |      / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio,
        |    CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
        |      / len(string_split_regex(trim(text), '\s+')) AS mtl
        |  FROM documents)
        |SELECT doc_id, n_tokens, stopword_ratio,
        |  (n_tokens >= 20 AND n_tokens <= 100000 AND mtl >= 2 AND mtl <= 12) AS quality_ok
        |FROM q ORDER BY doc_id""".stripMargin,

    "e03_embedding_dedup" ->
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |pert AS (SELECT vec_id + $DupOffset AS vec_id, list_prepend(e[1] + 0.1, e[2:]) AS e
        |         FROM base WHERE vec_id % 10 = 0),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        |sims AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |                list_cosine_similarity(a.e, b.e) AS s
        |         FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(s, 4) AS sim FROM sims
        |WHERE s >= 0.95 ORDER BY id_a, id_b""".stripMargin,

    "e04_ann_ivf" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cent AS (SELECT vec_id AS cid, e AS ce FROM base WHERE vec_id < 16),
        |assign AS (
        |  SELECT b.vec_id, c.cid, b.e,
        |    row_number() OVER (PARTITION BY b.vec_id
        |      ORDER BY round(list_cosine_similarity(b.e, c.ce), 6) DESC, c.cid) AS rn
        |  FROM base b CROSS JOIN cent c),
        |cells AS (SELECT vec_id AS neighbor_id, cid, e AS ne FROM assign WHERE rn = 1),
        |qprobe AS (SELECT vec_id AS query_id, cid, e AS qe FROM assign
        |           WHERE vec_id < 5 AND rn <= 2),
        |sims AS (
        |  SELECT q.query_id, c.neighbor_id,
        |    round(list_cosine_similarity(c.ne, q.qe), 6) AS sim
        |  FROM cells c JOIN qprobe q USING (cid)
        |  WHERE c.neighbor_id <> q.query_id),
        |ranked AS (SELECT query_id, neighbor_id, sim,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank FROM sims)
        |SELECT query_id, neighbor_id, sim, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "d08_ngram_jaccard" ->
      raw"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + $DupOffset, substr(text, instr(text, ' ') + 1)
        |  FROM documents WHERE doc_id % 7 = 0),
        |toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM corpus),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(tk) >= 3
        |       THEN list_distinct(list_transform(range(1, len(tk) - 1),
        |            i -> array_to_string(tk[i:i+2], ' ')))
        |       ELSE [array_to_string(tk, ' ')] END AS s
        |  FROM toks),
        |pairs AS (
        |  SELECT doc_id AS id_a, doc_id + $DupOffset AS id_b
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id - 1, doc_id FROM documents WHERE doc_id % 50 = 0 AND doc_id > 0)
        |SELECT p.id_a, p.id_b,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
        |FROM pairs p
        |JOIN sh a ON a.doc_id = p.id_a
        |JOIN sh b ON b.doc_id = p.id_b
        |ORDER BY id_a, id_b""".stripMargin,

    "d30_ngram_containment" ->
      raw"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + ${3 * DupOffset}, substr(text, 1, len(text) // 2)
        |  FROM documents WHERE doc_id % 9 = 0),
        |toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM corpus),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(tk) >= 3
        |       THEN list_distinct(list_transform(range(1, len(tk) - 1),
        |            i -> array_to_string(tk[i:i+2], ' ')))
        |       ELSE [array_to_string(tk, ' ')] END AS s
        |  FROM toks),
        |pairs AS (
        |  SELECT doc_id AS id_a, doc_id + ${3 * DupOffset} AS id_b
        |  FROM documents WHERE doc_id % 9 = 0)
        |SELECT p.id_a, p.id_b,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s), 4) AS containment_a,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s), 4) AS containment_b
        |FROM pairs p
        |JOIN sh a ON a.doc_id = p.id_a
        |JOIN sh b ON b.doc_id = p.id_b
        |ORDER BY id_a, id_b""".stripMargin,

    "e01_knn_cosine" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |sims AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(c.e, q.e) AS sim
        |  FROM n q JOIN n c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5),
        |ranked AS (
        |  SELECT query_id, neighbor_id, round(sim, 6) AS sim,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |         ORDER BY round(sim, 6) DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM sims)
        |SELECT query_id, neighbor_id, sim, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  )
}
