package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Sampling, Similarity, TextOps}

/** Corpus-curation queries: duplicate-cluster resolution (connected
  * components over candidate pairs), benchmark decontamination, exact
  * domain-mix sampling, C4-style cross-doc line dedup, and semantic
  * cluster pruning. All oracle-checked in DuckDB (the CC oracle is a
  * recursive CTE; the rest replay the same deterministic derivations).
  */
object MixQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Planted-copy id offset — shared with [[TextQueries.DupOffset]] so
    * every synthetic near-dup family clears the real id space at every
    * tier (the sf10 gate caught the old 100000 colliding with genuine
    * doc_ids past 100k docs).
    */
  private val Off = TextQueries.DupOffset

  /** 8-token boilerplate line prepended to every 3rd doc for d20 — the
    * repeated-across-corpus header that line dedup must strip everywhere
    * but its first occurrence.
    */
  private val Header = "alpha beta gamma delta epsilon zeta eta theta"

  /** 30-token license block appended to every 25th doc for d26 — a gram
    * family whose df sits far above any natural gram at every tier, so
    * the per-gram pair budget's star tier is what resolves it.
    */
  private val Lic = (1 to 30).map(i => f"lic$i%02d").mkString(" ")

  /** DuckDB CTE: the d26/d27 planted corpus (license block on every 25th
    * doc). Interpolated into oracle templates before stripMargin.
    */
  private def plantedCorpusCte: String =
    """corpus AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 25 = 0 THEN text || ' """ + Lic + """' ELSE text END AS text
      |  FROM documents)"""

  /** DuckDB CTE chain replaying the budgeted `substringSpans` run over
    * `corpus` (13-gram windows, cap 100000, pair budget 8: exact
    * all-pairs at df <= 8, star-to-canonical above) ending in a `spans`
    * CTE with the operator's output columns. The oracle keys grams with
    * DuckDB's `md5` while the operator keys them with `xxhash64` — the
    * gram hash is a pure join/group key that never reaches the span
    * output, so any collision-free hash yields identical spans (the
    * operator switched to 8-byte keys in r18 for ~3× less shuffle at
    * corpus scale). Shared by d26 (emits the spans) and d27 (cuts
    * them). Plain string — no interpolator — so the `\s+` regex
    * survives verbatim.
    */
  private def budgetSpanCtes: String =
    """toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM corpus),
      |grams AS (
      |  SELECT doc_id, i AS pos, md5(array_to_string(l[i+1:i+13], ' ')) AS gh
      |  FROM toks, unnest(range(len(l) - 12)) AS t(i)
      |  WHERE len(l) >= 13),
      |kept AS (
      |  SELECT g.doc_id, g.pos, g.gh, d.df
      |  FROM grams g JOIN (SELECT gh, count(*) AS df FROM grams
      |                     GROUP BY gh HAVING count(*) <= 100000) d USING (gh)),
      |dense AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
      |  FROM kept a JOIN kept b ON a.gh = b.gh AND a.doc_id < b.doc_id
      |  WHERE a.df <= 8),
      |canon AS (
      |  SELECT k.gh, m.m_doc, min(k.pos) AS m_pos
      |  FROM kept k JOIN (SELECT gh, min(doc_id) AS m_doc FROM kept
      |                    WHERE df > 8 GROUP BY gh) m
      |    ON k.gh = m.gh AND k.doc_id = m.m_doc
      |  GROUP BY k.gh, m.m_doc),
      |star AS (
      |  SELECT c.m_doc AS doc_a, k.doc_id AS doc_b, c.m_pos AS pos_a, k.pos AS pos_b
      |  FROM kept k JOIN canon c ON k.gh = c.gh
      |  WHERE k.df > 8 AND k.doc_id > c.m_doc),
      |pairs AS (SELECT * FROM dense UNION ALL SELECT * FROM star),
      |isl AS (
      |  SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
      |         pos_a - row_number() OVER (
      |           PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS island
      |  FROM pairs),
      |spans AS (
      |  SELECT doc_a, doc_b,
      |         CAST(min(pos_a) AS BIGINT) AS start_a,
      |         CAST(min(pos_b) AS BIGINT) AS start_b,
      |         CAST(max(pos_a) - min(pos_a) + 13 AS BIGINT) AS len_tokens
      |  FROM isl GROUP BY doc_a, doc_b, diag, island)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e10_hybrid_rrf" -> ((spark, dir) => {
      // hybrid search: sparse BM25 candidates + dense brute-force ANN
      // candidates (query = vector 3) fused by reciprocal-rank — pure
      // rank arithmetic, both sides top-15, fused top-10
      val docs = t(spark, dir, "documents")
      val emb = t(spark, dir, "embeddings")
      val sparse = graft.ext.Retrieval.bm25TopK(docs, "doc_id", "text",
        queryTerms = Seq("shuffle", "merge", "window"), topK = 15, roundScore = Some(6))
      val dense = graft.ext.Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") === 3), "vec_id", "embedding", k = 15)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.ext.Retrieval.rrfFuse(sparse.select("doc_id", "rank"), dense, "doc_id", topK = 10)
        .orderBy("rank")
    }),

    "e09_bm25_topk" -> ((spark, dir) => {
      // lexical top-k: BM25 over whitespace tokens, Lucene-smoothed idf;
      // score rounds to 6 before the cut (e01 precedent) so the rank is
      // float-order stable across engines
      graft.ext.Retrieval.bm25TopK(t(spark, dir, "documents"), "doc_id", "text",
          queryTerms = Seq("shuffle", "merge", "window"), topK = 15,
          roundScore = Some(6))
        .orderBy("rank")
    }),

    "d17_dup_clusters" -> ((spark, dir) => {
      // candidate pairs chain: doc -> +DupOffset copy (%7 docs) ->
      // +2*DupOffset copy (%14 docs); resolution must group chains
      // transitively and pick the min id as canonical
      val docs = t(spark, dir, "documents").select("doc_id")
      val m1 = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + Off).as("doc_id"))
      val m2 = docs.filter(col("doc_id") % 14 === 0)
        .select((col("doc_id") + 2 * Off).as("doc_id"))
      val corpus = docs.unionByName(m1).unionByName(m2)
      val pairs = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + Off).as("id_b"))
        .unionByName(docs.filter(col("doc_id") % 14 === 0)
          .select((col("doc_id") + Off).as("id_a"), (col("doc_id") + 2 * Off).as("id_b")))
      Dedup.resolveDuplicates(corpus, pairs, "doc_id")
        .select("doc_id", "cluster_id", "is_canonical")
        .orderBy("doc_id")
    }),

    "d18_decontaminate" -> ((spark, dir) => {
      // eval set = every 10th doc; the corpus contains those docs verbatim
      // plus near-dup copies of %7 docs, so %70 copies contaminate too
      val corpus = TextQueries.corpusWithNearDups(spark, dir)
      val evalSet = t(spark, dir, "documents")
        .filter(col("doc_id") % 10 === 0).select("doc_id", "text")
      TextOps.decontaminate(corpus, evalSet, "doc_id", "text", n = 8, threshold = 0.1)
        .orderBy("doc_id")
    }),

    "d19_domain_mix" -> ((spark, dir) => {
      Sampling.domainMix(t(spark, dir, "documents").select("doc_id", "lang"),
          "doc_id", "lang",
          targets = Seq("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15),
          salt = "mix1")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // DSIR-style data selection: English docs are the target corpus;
    // every document scores by the mean integer-scaled posterior of its
    // hashed unigram buckets; keep the 50 most target-like
    "d23_dsir_topk" -> ((spark, dir) => {
      Sampling.importanceTopK(t(spark, dir, "documents"),
        "text", "doc_id", isTarget = col("lang") === "en", k = 50)
    }),

    // temperature-scaled mixture (alpha = 1/2, mT5-style low-resource
    // upweighting): integer sqrt weights keep the quota math bit-equal
    // across engines; keep half the corpus, ranked by the same md5
    // order as d19
    "d29_temperature_mix" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
      Sampling.temperatureMix(docs, "doc_id", "source",
          totalKeep = docs.count() / 2, salt = "tmp1")
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    // map-only twin of d29 (the 100 TB path): the same sqrt-weight
    // quotas become per-domain hash-bucket acceptance rates — a scan +
    // filter with no per-domain sort. Deterministic (md5-bucket
    // thresholds), so it gets the same hash-match bar as the rank tier.
    "d31_temperature_mix_threshold" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
      Sampling.temperatureMixThreshold(docs, "doc_id", "source",
          totalKeep = docs.count() / 2, salt = "tmp1")
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    // map-only twin of d19: quota/count acceptance rates over the same
    // md5(id||salt) bucket, same targets/salt as the exact-quota tier
    "d32_domain_mix_threshold" -> ((spark, dir) => {
      Sampling.domainMixThreshold(t(spark, dir, "documents").select("doc_id", "lang"),
          "doc_id", "lang",
          targets = Seq("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15),
          salt = "mix1")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // map-only twin of d25: curriculum KEY (bucket*nTiers + tier) — no
    // rank window; sorting by the key approximates the round-robin mix
    "d33_curriculum_key" -> ((spark, dir) => {
      Sampling.curriculumKeyMapOnly(
        t(spark, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", thresholds = Seq(500, 1000, 2000), salt = "cur1")
        .orderBy("doc_id")
    }),

    // curriculum ordering: quality-tier round-robin interleave — the
    // emitted pos-order carries the full quality mix in every window
    "d25_curriculum_order" -> ((spark, dir) => {
      Sampling.curriculumOrder(
        t(spark, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", thresholds = Seq(500, 1000, 2000), salt = "cur1")
        .orderBy("pos")
    }),

    // exact substring-span dedup (suffix-array method, relational form):
    // maximal runs of >=13 identical consecutive tokens across doc pairs
    "d24_substring_spans" -> ((spark, dir) => {
      Dedup.substringSpans(t(spark, dir, "documents"), "doc_id", "text")
        .orderBy("doc_a", "doc_b", "start_a", "start_b")
    }),

    // the gram family's quadratic-worst-case knob, end-to-end: a
    // 30-token license block planted on every 25th doc puts 18 grams at
    // a df far above any natural gram; the per-gram pair budget (8)
    // resolves them on the STAR tier — candidates linear in cluster
    // size, every copy spanning against the canonical first occurrence
    // — while natural grams (df <= 8) keep exact all-pairs. The cap is
    // pinned high so the budget, not the background cutoff, is the
    // operator under test.
    "d26_substring_spans_budget" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 25 === 0, concat(col("text"), lit(" " + Lic)))
          .otherwise(col("text")).as("text"))
      Dedup.substringSpans(docs, "doc_id", "text",
          maxGramDf = Some(100000L), pairBudget = Some(8L))
        .orderBy("doc_a", "doc_b", "start_a", "start_b")
    }),

    // the CUT step over the budgeted span table (Lee et al.: remove all
    // but one occurrence of each duplicated span): same planted corpus
    // as d26; every planted doc except the canonical first copy loses
    // the license block, natural >=13-token spans cut the same way
    "d27_span_cut" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 25 === 0, concat(col("text"), lit(" " + Lic)))
          .otherwise(col("text")).as("text"))
      val spans = Dedup.substringSpans(docs, "doc_id", "text",
        maxGramDf = Some(100000L), pairBudget = Some(8L))
      Dedup.cutSpans(docs, spans, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "d20_line_dedup" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(lit(Header + " "), col("text")))
          .otherwise(col("text")).as("text"))
      Dedup.lineDedup(docs, "doc_id", "text", lineTokens = 8)
        .orderBy("doc_id")
    }),

    "d21_bloom_new_docs" -> ((spark, dir) => {
      // incremental batch: %5==0 docs verbatim (already in the corpus)
      // plus %5==1 docs with a fresh tail (genuinely new); the operator
      // must return exactly the fresh ones, bloom-routed, md5-verified
      val docs = t(spark, dir, "documents").select("doc_id", "text")
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .unionByName(docs.filter(col("doc_id") % 5 === 1)
          .select((col("doc_id") + 500000).as("doc_id"),
            concat(col("text"), lit(" fresh "), col("doc_id").cast("string")).as("text")))
      Dedup.newDocs(docs, batch, "doc_id", "text")
        .select(col("doc_id"), md5(col("text")).as("content_md5"))
        .orderBy("doc_id")
    }),

    "e07_semantic_prune" -> ((spark, dir) => {
      // zero-iteration centroids (16 lowest-id vectors) keep the whole
      // assign -> rank -> keep pass SQL-replayable, like e04/e06
      Similarity.semanticPrune(t(spark, dir, "embeddings"), "vec_id", "embedding",
          nCentroids = 16, keepPerCluster = 20)
        .orderBy("vec_id")
    }),

    "e08_sq_topk" -> ((spark, dir) => {
      // scalar (int8 affine) quantization: fit is one min/max aggregate,
      // encode is a map-only Column expression, and the top-k scan reads
      // ONLY the codes — all of it exact SQL math, replayed by the oracle;
      // cosine rounds to 6 before ranking (e01 precedent)
      val emb = t(spark, dir, "embeddings")
      val p = graft.ext.Quantization.sqFit(emb, "embedding")
      val encoded = graft.ext.Quantization.sqEncode(emb, "vec_id", "embedding", p)
      graft.ext.Quantization.sqTopK(encoded, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", p, topK = 10, roundSim = Some(6))
        .orderBy("query_id", "rank")
    })
  )

  /** n-gram list SQL shared by the d18 oracle (mirrors
    * Dedup.shinglesFromTokens with n=8).
    */
  private def gramsSql(tk: String): String =
    s"""CASE WHEN len($tk) >= 8
       |     THEN list_distinct(list_transform(range(1, len($tk) - 6),
       |          i -> array_to_string($tk[i:i+7], ' ')))
       |     ELSE [array_to_string($tk, ' ')] END""".stripMargin

  val oracle: Map[String, String] = Map(
    "e10_hybrid_rrf" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) AS dl,
        |         string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM b),
        |tf AS (
        |  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM b)
        |  WHERE term IN ('shuffle', 'merge', 'window')
        |  GROUP BY doc_id, dl, term),
        |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |s AS (
        |  SELECT t.doc_id,
        |         round(sum(ln(1 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
        |               * t.tf * 2.2
        |               / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / st.avgdl))), 6) AS score
        |  FROM tf t JOIN dfq d USING (term) CROSS JOIN stats st
        |  GROUP BY t.doc_id),
        |bm AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |  FROM s QUALIFY rank <= 15),
        |n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |ann0 AS (
        |  SELECT c.vec_id AS doc_id, round(list_cosine_similarity(c.e, q.e), 6) AS sim
        |  FROM n q JOIN n c ON c.vec_id <> q.vec_id WHERE q.vec_id = 3),
        |ann AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS rank
        |  FROM ann0 QUALIFY rank <= 15),
        |f AS (
        |  SELECT COALESCE(bm.doc_id, ann.doc_id) AS doc_id,
        |         COALESCE(CAST(1.0 AS DOUBLE) / (60 + bm.rank), 0)
        |           + COALESCE(CAST(1.0 AS DOUBLE) / (60 + ann.rank), 0) AS rrf_score
        |  FROM bm FULL OUTER JOIN ann ON bm.doc_id = ann.doc_id)
        |SELECT doc_id, rrf_score,
        |       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
        |FROM f QUALIFY rank <= 10 ORDER BY rank""".stripMargin,

    "e09_bm25_topk" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) AS dl,
        |         string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM b),
        |tf AS (
        |  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM b)
        |  WHERE term IN ('shuffle', 'merge', 'window')
        |  GROUP BY doc_id, dl, term),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |s AS (
        |  SELECT t.doc_id,
        |         round(sum(ln(1 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
        |               * t.tf * 2.2
        |               / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / st.avgdl))), 6) AS score
        |  FROM tf t JOIN df d USING (term) CROSS JOIN stats st
        |  GROUP BY t.doc_id)
        |SELECT doc_id, score,
        |       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
        |FROM s QUALIFY rank <= 15 ORDER BY rank""".stripMargin,

    "d21_bloom_new_docs" ->
      // the bloom is pure routing — the exact answer is a plain anti-join
      // on md5(text), which is precisely what DuckDB replays here
      """WITH batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 500000, text || ' fresh ' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 5 = 1)
        |SELECT doc_id, md5(text) AS content_md5 FROM batch
        |WHERE md5(text) NOT IN (SELECT md5(text) FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "d17_dup_clusters" ->
      // transitive closure by label propagation: every node reaches its
      // component's min id; UNION (distinct) terminates the recursion
      s"""WITH RECURSIVE corpus AS (
        |  SELECT doc_id FROM documents
        |  UNION ALL SELECT doc_id + $Off FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id + ${2 * Off} FROM documents WHERE doc_id % 14 = 0),
        |pairs AS (
        |  SELECT doc_id AS id_a, doc_id + $Off AS id_b FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + $Off, doc_id + ${2 * Off} FROM documents WHERE doc_id % 14 = 0),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS comp FROM corpus
        |  UNION
        |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id),
        |cc AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical
        |FROM cc ORDER BY doc_id""".stripMargin,

    "d18_decontaminate" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $Off, substr(text, instr(text, ' ') + 1)
         |  FROM documents WHERE doc_id % 7 = 0),
         |cg AS (SELECT doc_id, ${gramsSql("tk")} AS g
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM corpus)),
         |eg AS (SELECT DISTINCT unnest(${gramsSql("tk")}) AS gram
         |  FROM (SELECT string_split_regex(trim(text), '\\s+') AS tk
         |        FROM documents WHERE doc_id % 10 = 0)),
         |ex AS (SELECT doc_id, len(g) AS n_ngrams, unnest(g) AS gram FROM cg),
         |agg AS (SELECT doc_id, CAST(any_value(n_ngrams) AS BIGINT) AS n_ngrams,
         |  CAST(count(eg.gram) AS BIGINT) AS n_hits
         |  FROM ex LEFT JOIN eg USING (gram) GROUP BY doc_id)
         |SELECT doc_id, n_ngrams, n_hits,
         |  round(CAST(n_hits AS DOUBLE) / n_ngrams, 9) AS contamination_frac,
         |  round(CAST(n_hits AS DOUBLE) / n_ngrams, 9) >= 0.1 AS contaminated
         |FROM agg ORDER BY doc_id""".stripMargin,

    "d19_domain_mix" ->
      // same quota math as Sampling.domainMix: T = min(count_d / frac_d),
      // quota_d = floor(frac_d * T), rank by md5(id || salt)
      """WITH targets(domain, frac) AS (VALUES
        |  ('en', CAST(0.4 AS DOUBLE)), ('de', CAST(0.15 AS DOUBLE)),
        |  ('es', CAST(0.15 AS DOUBLE)), ('fr', CAST(0.15 AS DOUBLE)),
        |  ('zh', CAST(0.15 AS DOUBLE))),
        |counts AS (SELECT lang AS domain, CAST(count(*) AS DOUBLE) AS c
        |  FROM documents GROUP BY 1),
        |tm AS (SELECT min(c / frac) AS t FROM counts JOIN targets USING (domain)),
        |quota AS (SELECT domain, floor(frac * (SELECT t FROM tm)) AS q FROM targets),
        |ranked AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || 'mix1'), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM ranked JOIN quota ON lang = quota.domain
        |WHERE rn <= q ORDER BY doc_id""".stripMargin,

    "d29_temperature_mix" ->
      // replays temperatureMix: integer sqrt weights (IEEE sqrt is
      // correctly rounded, so floor(sqrt(n)) is bit-equal across
      // engines), integer-division quotas, md5(id||'tmp1') rank
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |w AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wt FROM c),
        |tot AS (SELECT (SELECT count(*) FROM documents) // 2 AS keepn,
        |               (SELECT sum(wt) FROM w) AS sw),
        |q AS (SELECT source,
        |        least(n, (SELECT keepn FROM tot) * wt // (SELECT sw FROM tot)) AS quota
        |      FROM w),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR) || 'tmp1'), doc_id) AS rn
        |      FROM documents)
        |SELECT r.doc_id, r.source FROM r JOIN q USING (source)
        |WHERE r.rn <= q.quota ORDER BY r.doc_id""".stripMargin,

    "d31_temperature_mix_threshold" ->
      // replays temperatureMixThreshold: d29's sqrt-weight quotas turned
      // into per-domain bucket rates cut = round(quota/n * 2^20); the
      // quota/n division and the multiply are the same left-to-right
      // IEEE double ops the JVM runs, and round() ties away from zero ==
      // Math.round for positive values, so the cuts are bit-equal
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |w AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wt FROM c),
        |tot AS (SELECT (SELECT count(*) FROM documents) // 2 AS keepn,
        |               (SELECT sum(wt) FROM w) AS sw),
        |q AS (SELECT source, n,
        |        least(n, (SELECT keepn FROM tot) * wt // (SELECT sw FROM tot)) AS quota
        |      FROM w),
        |cuts AS (SELECT source,
        |        CAST(round(CAST(quota AS DOUBLE) / n * 1048576) AS BIGINT) AS cut
        |      FROM q)
        |SELECT doc_id, source FROM documents JOIN cuts USING (source)
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'tmp1'), 1, 15)) AS BIGINT)
        |        % 1048576 < cut
        |ORDER BY doc_id""".stripMargin,

    "d32_domain_mix_threshold" ->
      // replays domainMixThreshold: d19's quota math (T = min(count/frac),
      // quota = floor(frac*T)) turned into bucket rates over the same
      // md5(id||'mix1') hash order. tm LEFT-joins targets to counts with
      // COALESCE(c,0): a target domain with ZERO documents must drive
      // T to 0 (empty output), matching the Scala quotasFor — an inner
      // join would silently drop the empty domain from the min and keep
      // sampling the others (round-16 ADVICE)
      """WITH targets(domain, frac) AS (VALUES
        |  ('en', CAST(0.4 AS DOUBLE)), ('de', CAST(0.15 AS DOUBLE)),
        |  ('es', CAST(0.15 AS DOUBLE)), ('fr', CAST(0.15 AS DOUBLE)),
        |  ('zh', CAST(0.15 AS DOUBLE))),
        |counts AS (SELECT lang AS domain, count(*) AS c FROM documents GROUP BY 1),
        |tm AS (SELECT min(CAST(COALESCE(c, 0) AS DOUBLE) / frac) AS t
        |       FROM targets LEFT JOIN counts USING (domain)),
        |cuts AS (SELECT domain,
        |    CAST(round(CAST(CAST(floor(frac * (SELECT t FROM tm)) AS BIGINT) AS DOUBLE)
        |               / c * 1048576) AS BIGINT) AS cut
        |  FROM targets JOIN counts USING (domain))
        |SELECT doc_id, lang FROM documents JOIN cuts ON lang = cuts.domain
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix1'), 1, 15)) AS BIGINT)
        |        % 1048576 < cut
        |ORDER BY doc_id""".stripMargin,

    "d33_curriculum_key" ->
      // replays curriculumKeyMapOnly: same tier thresholds as d25, key =
      // bucket(md5(id||'cur1')) * nTiers + tier, no rank window
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(n_chars >= 500 AS INT) + CAST(n_chars >= 1000 AS INT)
        |      + CAST(n_chars >= 2000 AS INT) AS tier
        |  FROM documents)
        |SELECT doc_id, CAST(tier AS BIGINT) AS tier,
        |  CAST((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'cur1'), 1, 15)) AS BIGINT)
        |        % 1048576) * 4 + tier AS BIGINT) AS curriculum_key
        |FROM t ORDER BY doc_id""".stripMargin,

    "d23_dsir_topk" ->
      // exact replay of importanceTopK: md5-hashed unigram buckets,
      // add-one-smoothed integer posterior, mean per doc, top-50 with
      // doc_id tiebreak
      """WITH tok AS (
        |  SELECT doc_id, tgt,
        |         CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 4096 AS b
        |  FROM (SELECT doc_id, lang = 'en' AS tgt,
        |          unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |        FROM documents)
        |  WHERE w <> ''),
        |cnt AS (
        |  SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
        |         sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
        |  FROM tok GROUP BY b),
        |sc AS (SELECT b, (1000000 * (ct + 1)) // (ct + cr + 2) AS s FROM cnt),
        |per AS (
        |  SELECT doc_id, sum(s) AS score_sum, count(*) AS n_tokens
        |  FROM tok JOIN sc USING (b) GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |       CAST(score_sum AS DOUBLE) / n_tokens AS score
        |FROM per ORDER BY score DESC, doc_id LIMIT 50""".stripMargin,

    "d25_curriculum_order" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(n_chars >= 500 AS INT) + CAST(n_chars >= 1000 AS INT)
        |      + CAST(n_chars >= 2000 AS INT) AS tier
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, tier,
        |    row_number() OVER (PARTITION BY tier
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || 'cur1'), doc_id) AS rn
        |  FROM t)
        |SELECT doc_id, CAST(tier AS BIGINT) AS tier,
        |       CAST((rn - 1) * 4 + tier AS BIGINT) AS pos
        |FROM r ORDER BY pos""".stripMargin,

    "d24_substring_spans" ->
      // replays substringSpans: 13-gram md5 windows, the CARDINALITY-
      // ADAPTIVE gram-df cap (gramDfCap: greatest(50, n_docs // 1000),
      // integer-exact — the oracle derives n from the same table so it
      // picks the identical cap at every scale factor), diagonal
      // gaps-and-islands merge
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l FROM documents),
        |grams AS (
        |  SELECT doc_id, i AS pos, md5(array_to_string(l[i+1:i+13], ' ')) AS gh
        |  FROM toks, unnest(range(len(l) - 12)) AS t(i)
        |  WHERE len(l) >= 13),
        |rare AS (SELECT gh FROM grams GROUP BY gh
        |  HAVING count(*) <= greatest(50, (SELECT count(*) FROM documents) // 1000)),
        |g AS (SELECT grams.* FROM grams JOIN rare USING (gh)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         a.pos AS pos_a, b.pos AS pos_b
        |  FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id),
        |isl AS (
        |  SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
        |         pos_a - row_number() OVER (
        |           PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS island
        |  FROM pairs)
        |SELECT doc_a, doc_b,
        |       CAST(min(pos_a) AS BIGINT) AS start_a,
        |       CAST(min(pos_b) AS BIGINT) AS start_b,
        |       CAST(max(pos_a) - min(pos_a) + 13 AS BIGINT) AS len_tokens
        |FROM isl GROUP BY doc_a, doc_b, diag, island
        |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin,

    "d26_substring_spans_budget" ->
      // replays the budgeted substringSpans: same 13-gram md5 windows as
      // d24, cap pinned at 100000, then a TWO-TIER pair join — exact
      // all-pairs for grams at df <= 8, star-to-canonical (min doc, then
      // min pos within it) above — before the same diagonal
      // gaps-and-islands merge
      (s"""WITH $plantedCorpusCte,
        |$budgetSpanCtes
        |SELECT doc_a, doc_b, start_a, start_b, len_tokens FROM spans
        |ORDER BY doc_a, doc_b, start_a, start_b""").stripMargin,

    "d27_span_cut" ->
      // the cut step over the same span table: every span's doc_b side
      // loses tokens [start_b, start_b+len) (>=13-token spans), the
      // doc_a side keeps its copy — rebuilt text via an ANTI JOIN of
      // token positions against the distinct cut intervals
      (s"""WITH $plantedCorpusCte,
        |$budgetSpanCtes,
        |cuts AS (
        |  SELECT DISTINCT doc_b AS doc, start_b AS s, start_b + len_tokens AS e
        |  FROM spans WHERE len_tokens >= 13),
        |toks2 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM corpus),
        |pos AS (
        |  SELECT doc_id, i AS p, l[CAST(i + 1 AS INT)] AS tkn
        |  FROM toks2, unnest(range(len(l))) AS u(i)),
        |keptpos AS (
        |  SELECT p.doc_id, p.p, p.tkn FROM pos p
        |  ANTI JOIN cuts c ON c.doc = p.doc_id AND p.p >= c.s AND p.p < c.e),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |         array_to_string(list(tkn ORDER BY p), ' ') AS text_dedup
        |  FROM keptpos GROUP BY doc_id)
        |SELECT t.doc_id,
        |       CAST(len(t.l) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_tokens_kept,
        |       coalesce(a.text_dedup, '') AS text_dedup
        |FROM toks2 t LEFT JOIN agg a USING (doc_id)
        |ORDER BY t.doc_id""").stripMargin,

    "d20_line_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |         THEN 'alpha beta gamma delta epsilon zeta eta theta ' || text
        |         ELSE text END AS text
        |  FROM documents),
        |b AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
        |      len(string_split_regex(trim(text), '\s+')) AS n FROM corpus),
        |lines AS (SELECT doc_id, CAST(i AS INTEGER) AS line_idx,
        |    array_to_string(toks[i*8+1 : i*8+8], ' ') AS line
        |  FROM (SELECT doc_id, toks, unnest(range(0, CAST(ceil(n / 8.0) AS BIGINT))) AS i FROM b)),
        |flagged AS (SELECT doc_id, line_idx, line,
        |  row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) = 1 AS keep
        |  FROM lines)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN keep THEN line END, ' ' ORDER BY line_idx), '') AS text_dedup
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "e08_sq_topk" ->
      // replica of sqFit/sqEncode/sqTopK: per-dim min + scale=(max-min)/255,
      // code=clamped round((x-min)/scale), recon=min+code*scale, cosine
      // rounded to 6 — identical doubles on both engines because the
      // parameters and recon arithmetic are the same IEEE operations
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |ex AS (SELECT vec_id, d.dim, e[d.dim] AS x FROM base, range(1, 65) d(dim)),
        |stats AS (SELECT dim, min(x) AS mn, (max(x) - min(x)) / 255.0 AS sc
        |  FROM ex GROUP BY dim),
        |codes AS (SELECT vec_id, dim,
        |    CASE WHEN sc = 0 THEN 0
        |         ELSE greatest(0, least(255, CAST(round((x - mn) / sc, 0) AS INTEGER))) END AS code
        |  FROM ex JOIN stats USING (dim)),
        |recon AS (SELECT c.vec_id, list(s.mn + c.code * s.sc ORDER BY c.dim) AS re
        |  FROM codes c JOIN stats s USING (dim) GROUP BY c.vec_id),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM base WHERE vec_id < 5),
        |scored AS (SELECT q.query_id, r.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(r.re, q.qe), 6) AS cosine
        |  FROM recon r CROSS JOIN q WHERE r.vec_id <> q.query_id),
        |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM scored)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "e07_semantic_prune" ->
      // replica of Similarity.semanticPrune with default centroids: the
      // 16 lowest-id vectors; assignment and rank both round to 6 like
      // e04 (cross-engine float ties)
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |cent AS (SELECT vec_id AS cid, e AS ce FROM base WHERE vec_id < 16),
        |assign AS (
        |  SELECT b.vec_id, c.cid, round(list_cosine_similarity(b.e, c.ce), 6) AS sim,
        |    row_number() OVER (PARTITION BY b.vec_id
        |      ORDER BY round(list_cosine_similarity(b.e, c.ce), 6) DESC, c.cid) AS rn
        |  FROM base b CROSS JOIN cent c),
        |cells AS (SELECT vec_id, cid, sim FROM assign WHERE rn = 1),
        |ranked AS (SELECT vec_id, cid AS cluster_id, sim,
        |  CAST(row_number() OVER (PARTITION BY cid ORDER BY sim DESC, vec_id) AS BIGINT) AS cluster_rank
        |  FROM cells)
        |SELECT vec_id, cluster_id, sim, cluster_rank, cluster_rank <= 20 AS kept
        |FROM ranked ORDER BY vec_id""".stripMargin
  )
}
