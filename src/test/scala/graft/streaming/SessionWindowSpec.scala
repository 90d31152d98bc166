package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SessionWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("session boundary: exactly last+gap merges, beyond it starts a new session") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000)
    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(5), 2.0),   // merge (5 < 10)
      (1L, ts(15), 3.0),                    // exactly prev(5) + 10 -> still MERGES (closed end)
      (1L, ts(26), 4.0),                    // 26 > 15 + 10 -> new session
      (2L, ts(0), 5.0)
    ).toDF("user_id", "ts", "value")
    val s = EventStream.sessionCounts(events, "10 minutes", withWatermark = false)
      .orderBy("user_id", "session_start").collect()
    assert(s.length === 3)
    assert(s(0).getAs[Long]("n") === 3) // events at 0, 5, 15
    assert(s(0).getAs[java.sql.Timestamp]("session_end") === ts(25)) // 15 + 10
    assert(s(1).getAs[Long]("n") === 1) // the event at 26 alone
  }

  test("streamed sessions equal batch sessions under the finalization predicate") {
    val dir = graft.TestSpark.sf0001
    val streamed = EventStream.runSessionStreaming(spark, dir, "8 hours", "graft_session_spec")
      .orderBy("session_start", "user_id").collect()
    val batch = EventStream.runBatchSessions(spark, dir, "8 hours", finalizedOnly = true)
      .orderBy("session_start", "user_id").collect()
    assert(streamed.length > 0)
    assert(streamed.toSeq === batch.toSeq)
    // and some sessions DO merge multiple events (gap chosen for a mix)
    assert(streamed.exists(_.getAs[Long]("n") > 1))
    assert(streamed.exists(_.getAs[Long]("n") === 1))
  }
}
