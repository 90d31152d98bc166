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

  /** Exact per-group distinct-count + percentiles WITHOUT the
    * Expand + sort-fallback plan.
    *
    * A single `agg(countDistinct(x), percentile(v, ...))` plans as an
    * Expand (one input replica per distinct-aggregate branch) feeding an
    * aggregate whose partial grouping keys include the distinct value —
    * and because `percentile` is a TypedImperativeAggregate, that
    * aggregate is an ObjectHashAggregate, which falls back to SORT-based
    * aggregation once the hash map passes
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (128)
    * distinct keys. With millions of distinct values the "aggregate"
    * is really an external sort of 2x the input — the super-linear term
    * the sf10 tier measured on b05 (17.9x floor-to-floor for 10x data).
    *
    * Splitting the two aggregates keeps each on its best physical plan:
    *  - distinct count: two codegen'd HashAggregates (partial on
    *    (group, value) absorbs duplicates map-side, then count per
    *    group) — no Expand, no object aggregation;
    *  - percentile: ObjectHashAggregate over #groups keys only, never
    *    near the sort fallback;
    * joined on the group key (#groups rows per side — broadcast).
    * Each leg re-scans the source column-pruned to exactly two columns,
    * which is cheaper than one Expand+sort pass at any realistic scale.
    * Output: groupCol, n_distinct, q (array of percentiles).
    */
  def exactGroupStats(df: DataFrame, groupCol: String, distinctCol: String,
                      valueCol: String, probs: Seq[Double]): DataFrame = {
    val nd = df.groupBy(groupCol)
      .agg(countDistinct(col(distinctCol)).as("n_distinct"))
    val pq = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, array(${probs.mkString(",")}))").as("q"))
    nd.join(broadcast(pq), Seq(groupCol))
  }

  /** The bench twin of b06: the exact pair on the split plan above. */
  def lineitemStatsExact(lineitem: DataFrame): DataFrame =
    exactGroupStats(lineitem, "l_returnflag", "l_orderkey",
      "l_extendedprice", Seq(0.5, 0.9))
      .select(col("l_returnflag"), col("n_distinct").as("n_orders"), col("q"))

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
