package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Multimodal
import graft.streaming.EventStream

/** Streaming + multimodal pipeline queries. The streaming entry runs a
  * REAL Structured Streaming query (memory sink, drained synchronously)
  * whose result must hash-match the same aggregation in DuckDB — stream/
  * batch parity is the check. Multimodal entries exercise the binary-
  * column plumbing with the deterministic fake decoder (rows-only).
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_stream_window" -> ((spark, dir) => {
      EventStream.runStreaming(spark, dir, s"graft_stream_${dir.replaceAll("\\W", "_")}")
        .orderBy("hour", "event_type")
    }),

    "m01_multimodal_decode" -> ((spark, dir) => {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val withPayload = Multimodal.withFakePayload(docs, "doc_id", "text")
      val meta = Multimodal.decodeMeta(withPayload, "doc_id", "payload")
      Multimodal.resizePlan(meta, maxEdge = 512)
        .select(col("doc_id"), col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.channels").as("channels"), col("target_width"), col("target_height"),
          col("needs_resize"))
        .orderBy("doc_id")
    }),

    "m02_frame_sample" -> ((spark, dir) => {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), (col("n_chars") % 100 + 1).cast("long").as("n_frames"))
      Multimodal.frameSamplePlan(docs, "doc_id", "n_frames", every = 10, cap = 8)
        .orderBy("doc_id", "frame_idx")
    })
  )

  val oracle: Map[String, String] = Map(
    "s01_stream_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "m02_frame_sample" ->
      """SELECT doc_id, unnest(range(0, least(n_chars % 100 + 1 - 1, 70) + 1, 10)) AS frame_idx
        |FROM (SELECT doc_id, n_chars FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
