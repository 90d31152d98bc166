package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark

class StatefulOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mapGroupsWithState running totals accumulate across microbatches") {
    val session = spark
    import session.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(String, Double)]
    val totals = StatefulOps.runningTotals(source.toDF().toDF("k", "v"), "k", "v")
    val q = totals.writeStream.outputMode("update").format("memory")
      .queryName("totals_test").start()
    try {
      source.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
      q.processAllAvailable()
      // second batch: state from batch 1 must carry over
      source.addData(("a", 3.0))
      q.processAllAvailable()
      val last = spark.table("totals_test")
        .groupBy("key").agg(max(struct(col("n"), col("total"))).as("s"))
        .select(col("key"), col("s.n"), col("s.total"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(last("a") === ((3L, 6.0)))
      assert(last("b") === ((1L, 10.0)))
    } finally q.stop()
  }

  test("streamingDedup keeps first event per key across batches") {
    val session = spark
    import session.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = StatefulOps.streamingDedup(
      source.toDF().toDF("event_id", "ts", "payload"), "event_id", "ts", "1 hour")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_test").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      source.addData((1L, t0, "first"), (2L, t0, "x"))
      q.processAllAvailable()
      source.addData((1L, t0, "dup"), (3L, t0, "y"))
      q.processAllAvailable()
      val rows = spark.table("dedup_test")
        .select("event_id", "payload").as[(Long, String)].collect().toMap
      assert(rows.keySet === Set(1L, 2L, 3L))
      assert(rows(1L) === "first") // the duplicate did not replace it
    } finally q.stop()
  }

  test("attributionJoin matches clicks across microbatches within the interval") {
    val session = spark
    import session.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val clickSrc = MemoryStream[(Long, java.sql.Timestamp)]
    val buySrc = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val joined = EventStream.attributionJoin(
      clickSrc.toDF().toDF("user_id", "ts"),
      buySrc.toDF().toDF("user_id", "ts", "value"),
      withWatermark = true)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("attr_test").start()
    try {
      // batch 1: clicks only — buffered in join state
      clickSrc.addData((1L, ts(0)), (1L, ts(10)), (2L, ts(5)))
      q.processAllAvailable()
      // batch 2: purchases arrive later; u1@10:20 matches both buffered
      // clicks (within 30 min), u2@10:50 matches nothing (gap 45 min)
      buySrc.addData((1L, ts(20), 9.5), (2L, ts(50), 4.0))
      q.processAllAvailable()
      val rows = spark.table("attr_test")
        .select("user_id", "click_ts", "purchase_value")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
      assert(rows === Set((1L, ts(0), 9.5), (1L, ts(10), 9.5)))
    } finally q.stop()
  }
}
