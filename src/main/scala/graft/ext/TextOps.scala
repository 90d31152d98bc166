package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, document fingerprinting, language identification.
  * All pure Column expressions except langid's trained profiles (a
  * broadcast join against corpus-derived n-gram profiles).
  */
object TextOps {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: word-piece estimate = whitespace tokens plus
    * extra pieces for long words (every 4 chars beyond the first 4).
    */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t).cast("double") / 4.0).cast("long")))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^\\.!?,;:]", "")).cast("long")

  /** Stopword count against a small inline list (broadcast-free). The
    * list is a single array LITERAL: a `CreateArray` here would re-build
    * the array on every `array_contains` call — once per TOKEN inside
    * the filter lambda.
    */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column = {
    val stopArr = typedlit(stopwords)
    size(filter(tokens(text), t => array_contains(stopArr, t))).cast("long")
  }

  /** Normalized-content fingerprint: md5 of lowercased alphanumerics —
    * stable under whitespace/punctuation/casing edits.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]+", ""))

  /** Quality-scoring columns: token count, mean token length, punctuation
    * ratio, stopword ratio, and an overall keep/drop flag with
    * C4/Gopher-style threshold rules.
    */
  def qualityColumns(df: DataFrame, textCol: String,
                     stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")): DataFrame = {
    val text = col(textCol)
    graft.core.Par.spreadForCpu(df).withColumn("n_tokens", tokenCount(text))
      .withColumn("mean_token_len",
        length(regexp_replace(trim(text), "\\s+", "")).cast("double") / col("n_tokens"))
      .withColumn("punct_ratio", punctCount(text).cast("double") / greatest(length(text), lit(1)).cast("double"))
      .withColumn("stopword_ratio", stopwordCount(text, stopwords).cast("double") / col("n_tokens"))
      .withColumn("quality_ok",
        col("n_tokens") >= 20 && col("n_tokens") <= 100000 &&
          col("mean_token_len") >= 2 && col("mean_token_len") <= 12)
  }

  /** Language identification by character-trigram profile match.
    *
    * Train: top-`profileSize` trigrams per language — one shuffle on
    * (lang, trigram), profiles collected to the driver (a few hundred
    * strings; this is the model, the one justified metadata collect).
    * Classify: overlap of each document's trigram set with every
    * profile as a PURE expression (`array_intersect` against literal
    * arrays) and an `array_max(struct…)` argmax — zero shuffles, no
    * explode, fully codegen'd. A 100 TB corpus classifies in one
    * map-only pass.
    */
  def langId(labeled: DataFrame, toClassify: DataFrame, idCol: String,
             textCol: String, langCol: String, profileSize: Int = 40): DataFrame =
    classify(toClassify, idCol, textCol,
      trainProfiles(labeled, textCol, langCol, profileSize))

  /** Train the language model ONCE: top-`profileSize` trigrams per
    * language — one shuffle on (lang, trigram), profiles collected to the
    * driver (a few hundred strings; this is the model, the one justified
    * metadata collect). Steady-state pipelines call this once per model
    * refresh and reuse the result across every `classify` batch — the
    * fused `langId` convenience retrains per call, which is wrong inside
    * a loop.
    */
  def trainProfiles(labeled: DataFrame, textCol: String, langCol: String,
                    profileSize: Int = 40): Seq[(String, Seq[String])] = labeled
    .select(col(langCol).as("lang"), normalized(col(textCol)).as("__norm"))
    .select(col("lang"), explode(trigramsOfNormalized(col("__norm"))).as("trigram"))
    .groupBy("lang", "trigram").count()
    .withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("lang")
        .orderBy(col("count").desc, col("trigram"))))
    .filter(col("rn") <= profileSize)
    .select("lang", "trigram").collect()
    .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSeq).toSeq
    .sortBy(_._1)

  /** Classify against pre-trained profiles: overlap of each document's
    * trigram set with every profile as a PURE expression
    * (`array_intersect` against literal arrays) and an
    * `array_max(struct…)` argmax — zero shuffles, no explode, fully
    * codegen'd. A 100 TB corpus classifies in one map-only pass.
    */
  def classify(toClassify: DataFrame, idCol: String, textCol: String,
               profiles: Seq[(String, Seq[String])]): DataFrame = {
    val scoreStructs = profiles.map { case (lang, tgs) =>
      struct(
        // profile as one array literal, not a per-row CreateArray re-build
        size(array_intersect(col("__tg"), typedlit(tgs))).as("overlap"),
        lit(lang).as("lang"))
    }
    // argmax: max overlap, ties broken toward the lexicographically
    // larger language code (struct comparison order)
    graft.core.Par.spreadForCpu(toClassify)
      .select(col(idCol), normalized(col(textCol)).as("__norm"))
      .select(col(idCol), array_distinct(trigramsOfNormalized(col("__norm"))).as("__tg"))
      .select(col(idCol), array_max(array(scoreStructs: _*)).as("best"))
      .select(col(idCol), col("best.lang").as("predicted_lang"),
        col("best.overlap").cast("long").as("overlap"))
  }

  /** Normalized text for n-gram extraction (boundary spaces). */
  def normalized(text: Column): Column = concat(lit(" "), lower(trim(text)), lit(" "))

  /** Character trigrams — the native codegen'd single-pass expression
    * (`CharNGrams`). The `transform(sequence…, substr)` composition it
    * replaces ran interpreted (higher-order functions are
    * CodegenFallback) and was O(len²) in characters (every `substr(i,3)`
    * rescans the UTF-8 bytes to find character i); identical output
    * including the <3-char contract (one-element array of the string).
    * ONE deliberate divergence: null input yields NULL (the standard
    * Spark scalar null-in/null-out), where the legacy `otherwise(
    * array(norm))` branch yielded `[null]` — spec-pinned in ExtSpec.
    */
  def trigramsOfNormalized(norm: Column): Column =
    org.apache.spark.sql.graft.CharNGrams.charNGrams(norm, 3)

  /** PII surface patterns — the public scrub-list shapes (emails, dashed
    * phone numbers, IPv4, SSN-form ids). Kept to syntax both Java regex
    * and RE2 execute identically so oracles can replay them.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII detection + redaction: per-doc match counts for each pattern, an
    * overall flag, and the text with matches replaced by typed tags. Pure
    * Column expressions (whole-stage codegen, map-only — a 100 TB corpus
    * scrubs in one pass with no shuffle).
    *
    * Phone (3-3-4) and SSN (3-2-4) shapes are disjoint; emails are
    * redacted before IPs so a hostname-ish domain can't double-match.
    */
  def piiColumns(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    def count(re: String) = size(regexp_extract_all(text, lit(re), lit(0))).cast("long")
    graft.core.Par.spreadForCpu(df).withColumn("n_emails", count(EmailRe))
      .withColumn("n_phones", count(PhoneRe))
      .withColumn("n_ssn", count(SsnRe))
      .withColumn("n_ipv4", count(Ipv4Re))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ssn") + col("n_ipv4") > 0)
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(text, EmailRe, "[EMAIL]"),
              PhoneRe, "[PHONE]"),
            SsnRe, "[SSN]"),
          Ipv4Re, "[IP]"))
  }

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1, public):
    * duplicate-line fraction, duplicate-line character fraction, and the
    * character fraction of the most frequent word bigram, plus a keep
    * flag at the published thresholds (<0.30 / <0.20 / <0.20).
    *
    * "Lines" are fixed `lineTokens`-token chunks (the synthetic corpus
    * has no newlines; for real text pass pre-split lines). Shape: two
    * explode→groupBy passes keyed by doc id — per-key state is one count
    * per distinct line/bigram, never O(doc²), so a 100 TB corpus runs as
    * two doc-keyed shuffles with map-side partial aggregation.
    */
  def repetitionColumns(df: DataFrame, idCol: String, textCol: String,
                        lineTokens: Int = 8): DataFrame = {
    val id = col(idCol)
    val base = graft.core.Par.spreadForCpu(df)
      .select(id, tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__norm_len", length(concat_ws(" ", col("__toks"))).cast("double"))

    // norm_len rides the line explode (first() per group) so the final
    // assembly never joins back to the token arrays — two narrow
    // doc-keyed aggregation paths and one slim left join
    val lines = base.select(id, col("__norm_len"),
        explode(transform(
          sequence(lit(0), ceil(col("__n") / lineTokens.toDouble).cast("int") - 1),
          i => concat_ws(" ", slice(col("__toks"), i * lineTokens + 1, lit(lineTokens))))).as("line"))
    val lineAgg = lines.groupBy(id, col("line"))
      .agg(count(lit(1)).as("c"), first(col("__norm_len")).as("__norm_len"))
      .groupBy(id).agg(
        sum("c").as("n_lines"),
        count(lit(1)).as("n_distinct_lines"),
        sum(when(col("c") > 1, col("c") * length(col("line"))).otherwise(lit(0L))).as("dup_chars"),
        first(col("__norm_len")).as("__norm_len"))

    val bigrams = base.filter(col("__n") >= 2).select(id,
        explode(transform(sequence(lit(1), col("__n") - 1),
          i => concat(element_at(col("__toks"), i), lit(" "),
            element_at(col("__toks"), i + 1)))).as("bg"))
    val topBigram = bigrams.groupBy(id, col("bg")).agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(id)
          .orderBy(col("c").desc, col("bg"))))
      .filter(col("rn") === 1)
      .select(id, col("bg").as("top_bigram"), col("c").as("top_bigram_count"))

    lineAgg
      .join(topBigram, Seq(idCol), "left")
      .select(id,
        col("n_lines"),
        round(lit(1.0) - col("n_distinct_lines") / col("n_lines"), 9).as("dup_line_frac"),
        round(col("dup_chars") / col("__norm_len"), 9).as("dup_line_char_frac"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        // a bigram seen once is not repetition: the char fraction only
        // counts REPEATED top bigrams (otherwise every short doc trips
        // the threshold on its first bigram)
        round(when(coalesce(col("top_bigram_count"), lit(0L)) > 1,
            col("top_bigram_count") * length(col("top_bigram")) / col("__norm_len"))
          .otherwise(lit(0.0)), 9).as("top_bigram_char_frac"))
      .withColumn("repetition_ok",
        col("dup_line_frac") < 0.30 && col("dup_line_char_frac") < 0.20 &&
          col("top_bigram_char_frac") < 0.20)
  }

  /** Sliding-window document chunking — the context-window preparation
    * step for pretraining/RAG: token chunks of `chunkSize` starting every
    * `stride` tokens (overlap = chunkSize - stride), final chunk clamped.
    * `nChunks = 1 + ceil(max(n - chunkSize, 0) / stride)` — a doc shorter
    * than one chunk yields exactly one. Map-only explode (no shuffle): a
    * 100 TB corpus chunks in a single pass.
    */
  def chunkColumns(df: DataFrame, idCol: String, textCol: String,
                   chunkSize: Int = 64, stride: Int = 56): DataFrame = {
    require(stride > 0 && chunkSize >= stride, "need 0 < stride <= chunkSize")
    val base = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    base.select(col(idCol),
        explode(transform(
          sequence(lit(0),
            (ceil(greatest(col("__n") - chunkSize, lit(0)) / stride.toDouble)).cast("int")),
          k => struct(
            k.cast("long").as("chunk_idx"),
            concat_ws(" ", slice(col("__toks"), k * stride + 1, lit(chunkSize))).as("chunk_text"),
            size(slice(col("__toks"), k * stride + 1, lit(chunkSize))).cast("long").as("n_chunk_tokens"))))
          .as("c"))
      .select(col(idCol), col("c.chunk_idx"), col("c.n_chunk_tokens"), col("c.chunk_text"))
  }

  /** TF-IDF top-k terms per document (sklearn-style smoothed idf:
    * ln((N+1)/(df+1)) + 1). Two doc-keyed/term-keyed shuffles with
    * map-side partial aggregation; the per-term document-frequency table
    * is corpus-vocabulary-sized and joins broadcast. The tf table feeds
    * both the document-frequency aggregate and the final join, so it is
    * persisted for the duration of the call — without it the scan +
    * tokenize + doc-keyed aggregate (the dominant cost at corpus scale)
    * executes twice. Cache lifetime is deterministic, not leaked: the
    * (k-per-doc, small) result is eagerly materialized via
    * localCheckpoint — the job that consumes the cached tf frame — and
    * the tf persist is released before returning, the same
    * `Dedup.finishPairs` contract every LSH pipeline in this repo uses.
    * The returned frame is self-contained; its checkpoint blocks are
    * reclaimed by the ContextCleaner when the caller drops it.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val id = col(idCol)
    // no spreadForCpu here: the per-row map work is a bare whitespace
    // split feeding a partial aggregate — too light to pay for the extra
    // exchange stages a spread inserts (measured 1.35 s → 1.39/1.74 s);
    // the token explode redistributes at the groupBy anyway
    val terms = df.select(id, explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(id, col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = df.select(id).distinct().count()
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("idf", log((lit(nDocs) + 1.0) / (col("df") + 1.0)) + 1.0)
      tf.join(broadcast(dfreq), "term")
        .withColumn("tfidf", round(col("tf") * col("idf"), 9))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(id)
            .orderBy(col("tfidf").desc, col("term"))))
        .filter(col("rn") <= k)
        .select(id, col("rn").as("rank"), col("term"), col("tf"), col("df"), col("tfidf"))
        .localCheckpoint(true)
    } finally tf.unpersist(blocking = false)
  }

  /** Deterministic hash split — the train/val/test assignment step.
    * md5-based so any engine reproduces it (xxhash64 would be faster but
    * is not portable): bucket = first 8 md5 hex digits of `id || salt`
    * mod 100, assigned by cumulative fraction. Map-only, stable across
    * runs and engines, and re-running with more data never reassigns an
    * existing id (the property random splits lack).
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                fractions: Seq[(String, Int)]): DataFrame = {
    require(fractions.map(_._2).sum == 100, "fractions must sum to 100")
    val bucket = conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 8),
      16, 10).cast("long") % 100
    val (expr0, _) = fractions.foldLeft((lit(null).cast("string"), 0)) {
      case ((acc, cum), (name, pct)) =>
        (when(bucket >= cum && bucket < cum + pct, lit(name)).otherwise(acc), cum + pct)
    }
    df.withColumn("split_bucket", bucket).withColumn("split", expr0)
  }

  /** Bigram language-model scoring — the model-based quality signal:
    * train add-one-smoothed bigram probabilities on a corpus slice, score
    * each document's average log-probability (higher = more "in
    * distribution"). Train = one (prev, term) shuffle; score = explode +
    * broadcast model join + per-doc mean. `<s>` bounds each document.
    */
  def bigramLogProb(train: DataFrame, score: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    def bigrams(df: DataFrame) = {
      // pad with <s> so every token has a predecessor and indices stay
      // in bounds under ANSI element_at (no spreadForCpu: split-only map
      // work ahead of an aggregate — the extra stages cost more than the
      // parallelism buys; measured 1.41 s → 1.76 s with it)
      val base = df.select(col(idCol),
          concat(array(lit("<s>")), tokens(col(textCol))).as("__padded"))
        .withColumn("__n", size(col("__padded")))
      base.select(col(idCol),
        explode(transform(sequence(lit(1), col("__n") - 1),
          i => struct(
            element_at(col("__padded"), i).as("prev"),
            element_at(col("__padded"), i + 1).as("term")))).as("bg"))
        .select(col(idCol), col("bg.prev"), col("bg.term"))
    }
    // the bigram-count table is consumed by THREE plans (the vocab-size
    // count, the model build that the broadcast materializes, and
    // prevTotals inside it) — without materialization each re-explodes
    // and re-aggregates the TRAIN corpus, i.e. two extra full training
    // passes at any scale. localCheckpoint is safe here because the
    // table is vocabulary-sized (distinct bigrams), not corpus-sized;
    // its blocks are reclaimed by the ContextCleaner with the returned
    // frame, same lifecycle as tfidfTopTerms' output checkpoint.
    val counts = bigrams(train).groupBy("prev", "term").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val prevTotals = counts.groupBy("prev")
      .agg(sum("c").as("prev_total"), count(lit(1)).as("n_follow"))
    val vocab = counts.select("term").distinct().count()
    val model = counts.join(prevTotals, "prev")
      .withColumn("logp", log((col("c") + 1.0) / (col("prev_total") + lit(vocab.toDouble))))
      .select("prev", "term", "logp")
    val unseenFallback = log(lit(1.0) / vocab.toDouble)
    bigrams(score)
      .join(broadcast(model), Seq("prev", "term"), "left")
      .groupBy(idCol)
      .agg(round(avg(coalesce(col("logp"), unseenFallback)), 9).as("avg_logp"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Benchmark decontamination: flag corpus docs sharing word n-grams
    * with an evaluation set (the standard train/test-overlap sweep run
    * before LLM training; n=8..13 word grams are the usual operating
    * points). Per doc: the number of its distinct n-grams that appear
    * anywhere in the eval set, and a contamination fraction/flag.
    *
    * Plan shape: the eval n-gram dictionary is distinct-reduced and small
    * relative to the corpus (benchmarks are bounded), so Catalyst/AQE
    * broadcasts it under the join; the corpus side explodes its n-grams
    * once and re-aggregates on the doc id — one wide shuffle on the doc
    * id, never on the corpus n-gram space.
    *
    * Grams are matched by 64-bit xxhash (position-weighted token-hash
    * mix, `shingleHashesFromTokenHashes`) rather than by concatenated
    * strings: the exploded corpus side shuffles 8 bytes per gram instead
    * of ~n words of text (~2× end-to-end), and no shingle strings are
    * ever allocated. A collision would need two distinct grams to share
    * a 64-bit hash AND meet across the corpus/eval join — ~1e-8 odds at
    * a 1M×100k join, and the effect is one over-counted hit, not a
    * dropped doc.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String, n: Int = 8,
                    threshold: Double = 0.1): DataFrame = {
    // spread only the CORPUS side (xxhash shingling is the heavy per-row
    // kernel); the eval side feeds a distinct → broadcast build where the
    // extra exchange stages cost more than the parallelism buys (the eval
    // set is benchmark-sized by contract)
    def grams(df: DataFrame) = df
      .select(col(idCol).as("id"), Dedup.tokenHashes(col(textCol)).as("__th"))
      .select(col("id"), Dedup.shingleHashesFromTokenHashes(col("__th"), n).as("g"))
    // explode_outer, NOT explode: InferFiltersFromGenerate would turn a
    // plain explode into a pushed-down `size(g) > 0` Filter with the whole
    // shingle pipeline inlined (re-tokenizing per element_at — measured
    // 6× the entire query). The gram array is never empty (short docs
    // fall back to a 1-element whole-doc gram), so the rows are identical.
    val evalGrams = grams(evalSet)
      .select(explode_outer(col("g")).as("gram")).distinct()
      .withColumn("__hit", lit(1L))
    grams(graft.core.Par.spreadForCpu(corpus))
      .select(col("id"), size(col("g")).as("n_ngrams"), explode_outer(col("g")).as("gram"))
      .join(evalGrams, Seq("gram"), "left")
      .groupBy(col("id").as(idCol))
      .agg(first(col("n_ngrams")).cast("long").as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .withColumn("contamination_frac",
        round(col("n_hits").cast("double") / col("n_ngrams"), 9))
      .withColumn("contaminated", col("contamination_frac") >= threshold)
  }

  /** Rolling-hash (Rabin-Karp-style) document fingerprint over token
    * windows — deterministic 64-bit content signature usable for shift-
    * resistant chunk dedup. Returns the min window hash (a "winnowing"
    * representative).
    */
  def rollingMinHash(text: Column, window: Int = 8): Column =
    array_min(rollingWindowHashes(tokens(text), window))

  /** Pass a materialized tokens column for large-scale use (inline
    * expressions replay inside transform lambdas).
    */
  def rollingWindowHashes(toks: Column, window: Int): Column =
    when(size(toks) >= window,
      transform(sequence(lit(1), size(toks) - (window - 1)),
        i => xxhash64(concat_ws(" ", slice(toks, i, lit(window))))))
      .otherwise(array(xxhash64(concat_ws(" ", toks))))
}
