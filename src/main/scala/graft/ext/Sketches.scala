package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-aggregate tier for the 100 TB scale path.
  *
  * Exact `countDistinct` shuffles every distinct (group, value) pair and
  * `percentile` buffers full value lists per group — both grow with data
  * volume. The approx tier keeps per-group state CONSTANT: HLL++ registers
  * for distinct counts (`approx_count_distinct`), DataSketches HLL for
  * *mergeable* sketches (partial sketches per partition/day/source union
  * into totals without rescanning — the incremental-rollup shape), and
  * KLL-style `approx_percentile` for quantiles. The exact variants
  * (q25_quantiles) stay the oracle tier; these are the variants a
  * 1000-executor job would actually run.
  */
object Sketches {

  /** Per-group approximate distinct count (HLL++, codegen'd, map-side
    * partial aggregation — one narrow shuffle of fixed-size sketches).
    */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCol)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_n_$valueCol"))

  /** Per-group approximate percentiles with bounded accuracy (higher
    * `accuracy` = lower error = more state; state stays O(accuracy), not
    * O(rows)).
    */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val pct = expr(
      s"approx_percentile($valueCol, array(${probs.mkString(",")}), $accuracy)")
    df.groupBy(groupCol).agg(pct.as("quantiles"))
  }

  /** Mergeable HLL sketches: one binary sketch per (group, bucket) cell.
    * This is the rollup primitive — sketch once per ingest slice, store
    * the bytes, union later at query time (`hllMerge`) without touching
    * the raw data again.
    */
  def hllSketch(df: DataFrame, groupCol: String, bucketCol: String,
                valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCol, bucketCol)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Union stored sketches up to the group level and estimate: the
    * "query-time" half of the rollup — input rows = number of cells, not
    * number of raw records.
    */
  def hllMerge(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(groupCol)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))

  /** The bench twin of b05: same stats as the exact pair but HLL++ +
    * approx_percentile — fixed-size aggregation state per group.
    */
  def lineitemStatsApprox(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("n_orders"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)").as("q"))

  /** The q25 shape on the approx tier: per-lang distinct sources + median
    * and p90 of n_chars, all with constant per-group state.
    */
  def approxStats(docs: DataFrame): DataFrame =
    docs.groupBy("lang")
      .agg(
        approx_count_distinct(col("source"), 0.02).as("n_sources"),
        expr("approx_percentile(n_chars, array(0.5, 0.9), 10000)").as("q"))
      .select(col("lang"), col("n_sources"),
        col("q").getItem(0).as("median_chars"), col("q").getItem(1).as("p90_chars"))
      .orderBy("lang")
}
