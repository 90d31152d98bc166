package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flagship entry returns rows (driver t1 contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every oracle key has a query; all query names are well-formed") {
    val qs = SparkEntry.queries
    val orphans = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
    assert(qs.nonEmpty)
    assert(qs.keys.forall(_.matches("[a-z][a-z0-9_]+")))
  }

  test("all queries run non-empty on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, TestSpark.sf0001).count()
        if (n == 0 && name != "c04_cat_violations") Some(s"$name: empty") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("streaming result equals the batch plan bit-for-bit") {
    val streamed = EventStream.runStreaming(spark, TestSpark.sf0001, "parity_test")
      .orderBy("hour", "event_type").collect()
    val batch = EventStream.runBatch(spark, TestSpark.sf0001)
      .orderBy("hour", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }
}
