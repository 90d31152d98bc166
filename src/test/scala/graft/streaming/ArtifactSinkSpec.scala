package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import graft.catalog.Catalog

class ArtifactSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("each microbatch registers one artifact; redelivered content dedups by hash") {
    val sparkSession = spark
    import sparkSession.implicits._
    val root = TestSpark.tmpDir("sink")
    val ckpt = TestSpark.tmpDir("sink-ckpt")
    val cat = Catalog.deterministic(spark, root)
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

    val source = MemoryStream[(Long, String)]
    val q = ArtifactSink.streamToArtifacts(
      source.toDF().toDF("id", "v"), cat, root, "stream/events", ckpt)
    try {
      source.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(cat.table("artifact").count() === 1)
      source.addData((3L, "c"))
      q.processAllAvailable()
      assert(cat.table("artifact").count() === 2)
      val keys = cat.table("artifact").select("key").as[String].collect().sorted
      assert(keys.forall(_.startsWith("stream/events/batch_")))
      // artifact payloads are readable from the managed layout
      val uids = cat.table("artifact").select("uid").as[String].collect()
      uids.foreach { uid =>
        assert(spark.read.parquet(s"$root/.lamindb/$uid.parquet").count() > 0)
      }
    } finally q.stop()

    // redelivery of identical content (fresh stream, no checkpoint reuse)
    // resolves to the existing artifacts - no duplicates
    val source2 = MemoryStream[(Long, String)]
    val q2 = ArtifactSink.streamToArtifacts(
      source2.toDF().toDF("id", "v"), cat, root, "stream/events", TestSpark.tmpDir("sink-ckpt2"))
    try {
      source2.addData((1L, "a"), (2L, "b"))
      q2.processAllAvailable()
      assert(cat.table("artifact").count() === 2) // deduped by content hash
    } finally q2.stop()
  }
}
