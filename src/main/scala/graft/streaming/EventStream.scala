package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.10): the reference has no
  * stream processor — its closest notions are lazy dataset reads and
  * append-style collection growth — so this module is the flagged
  * beyond-reference extension: watermarked tumbling-window aggregation
  * over an append-only events directory, runnable identically as a batch
  * plan (same logical plan, streaming source swapped in).
  */
object EventStream {

  /** events.parquet carries TIMESTAMP(NANOS); streaming reads use an
    * explicit schema with nanos-as-long plus a conversion column.
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def toTimestamp(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** The shared windowed-aggregation plan: 1-hour tumbling windows per
    * event_type (counts + exact decimal sums).
    */
  def windowedCounts(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "1 hour") else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Run the windowed aggregation as a REAL streaming query over the
    * events directory (memory sink, complete mode), synchronously drained
    * — the local-mode pattern for exercising the streaming engine against
    * a static directory. Returns the collected result table.
    */
  def runStreaming(spark: SparkSession, dir: String, queryName: String = "graft_events_stream"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.streaming.schemaInference", "false")
    // state-store instantiation dominates a one-shot local stream: each
    // shuffle partition opens+commits its own store per microbatch, so
    // run the stateful agg on fewer partitions (fixed at first start) and
    // skip the trailing no-data watermark microbatch (complete mode never
    // evicts state, so the extra batch only re-commits all stores)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      // FileStreamSource needs a directory or glob, not a bare file path
      val stream = spark.readStream
        .schema(eventsRawSchema)
        .parquet(s"$dir/events*.parquet")
      val agg = windowedCounts(toTimestamp(stream), withWatermark = true)
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      spark.table(queryName)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevNoData match {
        case Some(v) => spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None    => spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
    }
  }

  /** Same plan, batch source — bit-identical results to the stream. */
  def runBatch(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = toTimestamp(spark.read.schema(eventsRawSchema).parquet(s"$dir/events.parquet"))
    windowedCounts(batch, withWatermark = false)
  }
}
