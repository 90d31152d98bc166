package graft.query

import java.util.regex.Pattern
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted multi-field search ranking — a faithful re-expression of the
  * reference's `_search` (`lamindb/models/query_manager.py:36-172`) as one
  * codegen-friendly Column expression (no UDF, no window):
  *
  *   rank = Σ over fields of
  *     exact·200 + synonym-delimited·200 + sub-phrase·10 + startswith·8
  *     + left-sub-phrase·2 + right-sub-phrase·2 + contains·1
  *
  * with a `contains` OR-prefilter before ranking, `ORDER BY rank DESC
  * LIMIT n` (reference default 20, `SEARCH_QUERY_DEFAULT_LIMIT`). We add a
  * deterministic pk tie-break, which the reference leaves to DB order.
  */
object Search {
  val DefaultLimit = 20

  /** Coalesce(Cast(field AS STRING), '') — `query_manager.py:114-118`. */
  private def fieldExpr(f: String): Column = coalesce(col(f).cast("string"), lit(""))

  private def ci(caseSensitive: Boolean): String = if (caseSensitive) "" else "(?i)"

  def rankColumn(query: String, fields: Seq[String], caseSensitive: Boolean): Column = {
    val escaped = Pattern.quote(query.trim)
    val p = ci(caseSensitive)
    val ranks: Seq[Column] = fields.map { f =>
      val fe = fieldExpr(f)
      val exact =
        if (caseSensitive) fe === lit(query.trim) else lower(fe) === lit(query.trim.toLowerCase)
      val synonym = fe.rlike(s"$p(?:^|.*\\|)$escaped(?:\\|.*|$$)")
      val subPhrase = fe.rlike(s"$p(?:^|.*[ \\|\\.,;:])$escaped(?:[ \\|\\.,;:].*|$$)")
      val startsW = fe.rlike(s"$p(?:^|.*\\|)$escaped[^ ]*(?:\\|.*|$$)")
      val rightSub = fe.rlike(s"$p(?:^|.*[ \\|])$escaped.*")
      val leftSub = fe.rlike(s"$p.*$escaped(?:$$|[ \\|\\.,;:].*)")
      val containsC =
        if (caseSensitive) fe.contains(lit(query.trim))
        else lower(fe).contains(lit(query.trim.toLowerCase))
      // every matcher above requires the query as a substring, so the
      // cheap contains gates the six regexes: fields that don't contain
      // the query score 0 without running a single regex (codegen `if`
      // short-circuit — halves regex work on multi-field searches where
      // typically one field matches)
      when(containsC,
        exact.cast("int") * 200 + synonym.cast("int") * 200 +
          subPhrase.cast("int") * 10 + startsW.cast("int") * 8 +
          rightSub.cast("int") * 2 + leftSub.cast("int") * 2 + lit(1))
        .otherwise(lit(0))
    }
    ranks.reduce(_ + _)
  }

  def containsPrefilter(query: String, fields: Seq[String], caseSensitive: Boolean): Column =
    fields.map { f =>
      val fe = fieldExpr(f)
      if (caseSensitive) fe.contains(lit(query.trim))
      else lower(fe).contains(lit(query.trim.toLowerCase))
    }.reduce(_ || _)

  def rank(df: DataFrame, query: String, fields: Seq[String], limit: Int,
           caseSensitive: Boolean, pk: String,
           truncateString: Boolean = false, nameField: Option[String] = None): DataFrame = {
    require(query != null, "Cannot search for None value! Please pass a valid string.")
    // truncated mode (`query_manager.py:99-103`): fuzzier matching for
    // suggest_records_with_similar_names — drop the final 20% of the query
    val q0 = if (truncateString && query.length > 5)
      query.substring(0, (query.length * 0.8).toInt) else query
    val q = q0.strip()
    // extra rule for truncated strings (`query_manager.py:155-163`):
    // weight plain startswith on the name field x2
    val extra: Seq[Column] = nameField.filter(_ => truncateString).map { f =>
      val fe = fieldExpr(f)
      val sw = if (caseSensitive) fe.startsWith(lit(q)) else lower(fe).startsWith(lit(q.toLowerCase))
      sw.cast("int") * 2
    }.toSeq
    val rankCol = (rankColumn(q, fields, caseSensitive) +: extra).reduce(_ + _)
    df.filter(containsPrefilter(q, fields, caseSensitive))
      .withColumn("rank", rankCol)
      .orderBy(col("rank").desc, col(pk).asc)
      .limit(limit)
  }
}
