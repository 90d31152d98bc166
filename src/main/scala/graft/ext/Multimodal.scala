package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The decode step is a clearly-marked DETERMINISTIC FAKE (this
  * environment has no image/audio codecs); everything around it — the
  * binary column representation, schema evolution, partition-batched
  * processing shape, metadata struct typing — is real and is exactly what
  * a production decoder would plug into (swap `fakeDecode` for a JNI/
  * native call over the same `Iterator[Row]` batching).
  */
object Multimodal {

  /** Attach a deterministic binary payload derived from a text column —
    * stands in for real image bytes so the pipeline has data to move.
    */
  def withFakePayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("payload",
      concat(
        to_binary(lit("47524654"), lit("hex")), // "GRFT" magic
        to_binary(md5(col(textCol)), lit("hex")),
        to_binary(md5(concat(col(textCol), lit("x"))), lit("hex"))))

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType), StructField("content_hash", StringType)))

  /** FAKE DECODER — deterministic stand-in for image decode. Reads fake
    * "header" fields out of the payload bytes. Replace with a real codec
    * behind the same signature.
    */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Int, String) = {
    val w = 64 + (java.lang.Byte.toUnsignedInt(payload(4)) % 16) * 64
    val h = 64 + (java.lang.Byte.toUnsignedInt(payload(5)) % 16) * 64
    val c = 1 + (java.lang.Byte.toUnsignedInt(payload(6)) % 2) * 2
    val hash = payload.slice(4, 20).map("%02x".format(_)).mkString
    (w, h, c, hash)
  }

  /** Decode/feature-extract over the binary column, batched per
    * partition (the Scala analog of `mapInPandas`: one iterator per
    * partition, no per-row task overhead, arbitrary native calls safe).
    */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val inputSchema = df.schema
    val idIdx = inputSchema.fieldIndex(idCol)
    val pIdx = inputSchema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      inputSchema(idIdx),
      StructField("meta", metaSchema)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val (w, h, c, hash) = fakeDecode(payload)
        Row(r.get(idIdx), Row(w, h, c, hash))
      }
    }(encoder)
  }

  /** "Resize" planning: pure-metadata op computing target dims under a
    * max-edge constraint — the Spark-side half of a resize pipeline (the
    * pixel work happens inside the decode/encode stub).
    */
  def resizePlan(meta: DataFrame, maxEdge: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxEdge) / greatest(col("meta.width"), col("meta.height")).cast("double"))
    meta
      .withColumn("target_width", ceil(col("meta.width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("meta.height") * scale).cast("int"))
      .withColumn("needs_resize", scale < 1.0)
  }

  /** Frame-sampling planning for video-like payloads: every k-th frame
    * index up to a cap — generates the (artifact, frame_idx) work list a
    * decode stage would consume.
    */
  def frameSamplePlan(df: DataFrame, idCol: String, nFramesCol: String,
                      every: Int, cap: Int): DataFrame =
    df.select(col(idCol),
        explode(sequence(lit(0), least(col(nFramesCol) - 1, lit((cap - 1) * every)),
          lit(every))).as("frame_idx"))
}
