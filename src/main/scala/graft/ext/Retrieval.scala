package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus: BM25 top-k — the sparse
  * counterpart of the ANN suite (e01–e08). Same whitespace tokenization
  * as TextOps (lowercased for matching).
  *
  * Scale shape: the per-(doc, term) term frequencies need ONE shuffle on
  * doc_id; document frequencies aggregate over the handful of query
  * terms and broadcast back (the per-term df table is |query|-sized);
  * corpus size and average doc length are a single scalar row cross-
  * joined in. Nothing about the plan changes with corpus size except the
  * one tf shuffle — no inverted index is materialized, which is the
  * right trade when queries are issued in batch over a changing corpus.
  */
object Retrieval {

  /** BM25 scores for one query (a bag of terms) against every matching
    * document; top-k by score. k1/b are the standard Robertson defaults;
    * idf is the Lucene-style smoothed log `ln(1 + (N - df + 0.5)/(df + 0.5))`,
    * non-negative for any df.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], topK: Int,
               k1: Double = 1.2, b: Double = 0.75,
               roundScore: Option[Int] = None): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      TextOps.tokens(lower(col(textCol))).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("double"))

    // corpus stats: one scalar row (N, avgdl), broadcast into every score
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))

    // per-(doc, term) tf for query terms only — the explode is filtered
    // BEFORE the shuffle, so only matching tokens move
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).cast("double").as("tf"))

    // df per term: |query|-sized, broadcast
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))

    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(sum("w").as("score"))
    val rounded = roundScore match {
      case Some(d) => scored.withColumn("score", round(col("score"), d))
      case None    => scored
    }
    // top-k FIRST (TakeOrdered — per-partition heads, no global window
    // over every matching doc), then number the k survivors
    val top = rounded.orderBy(col("score").desc, col("doc_id").asc).limit(topK)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "score", "rank")
  }

  /** Reciprocal-rank fusion of two ranked candidate lists — the standard
    * hybrid-search combiner (sparse BM25 + dense ANN): each list
    * contributes `1/(k + rank)` for the ids it ranked, absent ids
    * contribute 0, and the fused order is the score sum. Pure rank
    * arithmetic — no score normalization across the two systems — which
    * is why RRF is the robust default. Both inputs are top-k-sized, so
    * the fuse is a candidate-local full-outer join, never corpus-wide.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, topK: Int,
              k: Int = 60): DataFrame = {
    val l = a.select(col(idCol).as("id"), col("rank").as("__rank_a"))
    val r = b.select(col(idCol).as("id"), col("rank").as("__rank_b"))
    val fused = l.join(r, Seq("id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(k) + col("__rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("__rank_b")), lit(0.0)))
    val top = fused.orderBy(col("rrf_score").desc, col("id").asc).limit(topK)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_score").desc, col("id").asc)).cast("long"))
      .select(col("id").as(idCol), col("rrf_score"), col("rank"))
  }
}
