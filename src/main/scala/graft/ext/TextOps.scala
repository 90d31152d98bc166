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

  /** Stopword count against a small inline list (broadcast-free). */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column = {
    val stopArr = array(stopwords.map(lit): _*)
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
    df.withColumn("n_tokens", tokenCount(text))
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
    * Trains per-language profiles (top-`profileSize` trigrams by frequency)
    * from a labeled corpus, then classifies each document by the profile
    * with the largest trigram overlap. The train step is one shuffle on
    * (lang, trigram); classification is an explode + broadcast join +
    * per-doc argmax — linear in total text size.
    */
  def langId(labeled: DataFrame, toClassify: DataFrame, idCol: String,
             textCol: String, langCol: String, profileSize: Int = 40): DataFrame = {
    val explodeTrigrams = (d: DataFrame, keep: Seq[Column]) =>
      d.select(keep :+ explode(trigrams(col(textCol))).as("trigram"): _*)

    // the exploded trigram stream feeds both training and (for the common
    // self-classification case) scoring — materialize it once
    val labeledTrigrams = explodeTrigrams(labeled,
        Seq(col(idCol), col(langCol).as("lang_profile")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val profiles = labeledTrigrams
      .groupBy("lang_profile", "trigram").count()
    val top = profiles
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang_profile")
          .orderBy(col("count").desc, col("trigram"))))
      .filter(col("rn") <= profileSize)
      .select("lang_profile", "trigram")

    // overlap counts multiplicity (no distinct): skips a full shuffle of
    // the exploded trigram stream and weights repeated n-grams naturally
    val docTrigrams =
      if (toClassify eq labeled) labeledTrigrams.select(col(idCol), col("trigram"))
      else explodeTrigrams(toClassify, Seq(col(idCol)))
    val scores = docTrigrams.join(broadcast(top), "trigram")
      .groupBy(col(idCol), col("lang_profile"))
      .agg(count(lit(1)).as("overlap"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("overlap").desc, col("lang_profile"))
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(idCol), col("lang_profile").as("predicted_lang"), col("overlap"))
  }

  /** Character trigrams as an array column (pure expression). */
  def trigrams(text: Column): Column = {
    val norm = concat(lit(" "), lower(trim(text)), lit(" "))
    when(length(norm) >= 3,
      transform(sequence(lit(1), length(norm) - 2), i => substring2(norm, i, 3)))
      .otherwise(array(norm))
  }

  /** substring with a Column start position (functions.substring only
    * takes Int literals; the SQL form accepts expressions).
    */
  private def substring2(str: Column, pos: Column, len: Int): Column =
    str.substr(pos, lit(len))

  /** Rolling-hash (Rabin-Karp-style) document fingerprint over token
    * windows — deterministic 64-bit content signature usable for shift-
    * resistant chunk dedup. Returns the min window hash (a "winnowing"
    * representative).
    */
  def rollingMinHash(text: Column, window: Int = 8): Column = {
    val toks = tokens(text)
    val windows = when(size(toks) >= window,
      transform(sequence(lit(1), size(toks) - (window - 1)),
        i => xxhash64(concat_ws(" ", slice(toks, i, lit(window))))))
      .otherwise(array(xxhash64(concat_ws(" ", toks))))
    array_min(windows)
  }
}
