package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `KeyValueGroupedDataset.mapGroupsWithState`
  * (SURVEY §2.10 extension): operators whose semantics the built-in
  * windowed aggregations can't express.
  *
  * `runningTotals` keeps an unbounded per-key running aggregate across
  * microbatches (count + exact decimal-free sum via long micros);
  * `streamingDedup` is the stateful seen-set dedup (`dropDuplicates`
  * with a watermark bound on state).
  */
object StatefulOps {

  final case class KeyTotals(key: String, n: Long, total: Double)

  /** Per-key running totals across ALL microbatches (update mode). The
    * state is one small struct per key — bounded by key cardinality, the
    * canonical mapGroupsWithState shape.
    */
  def runningTotals(events: DataFrame, keyCol: String, valueCol: String): Dataset[KeyTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("string").as("key"), col(valueCol).cast("double").as("value"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[KeyTotals]) =>
          val prev = state.getOption.getOrElse(KeyTotals(key, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = KeyTotals(key, n, total)
          state.update(next)
          next
      }
  }

  /** Stateful cross-batch dedup on a key column: only the FIRST event per
    * key within the watermark horizon survives. Built on the engine's
    * dropDuplicates state store (the watermark bounds state size — at
    * 100 TB/day you never keep an unbounded seen-set).
    */
  def streamingDedup(events: DataFrame, keyCol: String, tsCol: String,
                     watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicates(Seq(keyCol))

  /** Drain a stateful query over a memory sink (update mode) and return
    * the sink table — test/local harness helper.
    */
  def runUpdateQuery[T](ds: Dataset[T], spark: SparkSession, queryName: String): DataFrame = {
    val q = ds.writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
