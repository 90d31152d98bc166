package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * Images run through a REAL codec: `encodeImages` writes genuine PNG
  * bytes with `javax.imageio` (dims derived deterministically from a
  * text column so a SQL oracle can predict them) and `decodeMeta` reads
  * them back with `ImageIO.read` — width/height/channels come from the
  * decoded `BufferedImage`, not from peeking at payload bytes. The
  * historical deterministic fake (`withFakePayload`/`fakeDecode`) is
  * kept as a test fixture for codec-free pipelines.
  */
object Multimodal {

  // keep ImageIO off its temp-file cache: tiny in-memory images only
  javax.imageio.ImageIO.setUseCache(false)

  /** Codec kernels are CPU-bound per row, so their parallelism should be
    * the cluster's, not the input file count's: a small parquet input
    * arrives as 1-2 partitions and would serialize the whole encode/
    * decode chain on one core. Delegates to the shared gate (this was
    * the precedent it generalized from): wide inputs pass through with
    * no shuffle; narrow ones spread to `defaultParallelism`.
    */
  private def spreadForCpu(df: DataFrame): DataFrame =
    graft.core.Par.spreadForCpu(df)

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

  /** TEST FIXTURE — deterministic stand-in for image decode over the
    * `withFakePayload` bytes; used by codec-free pipeline specs. The
    * production path is `encodeImages` + `decodeMeta` below.
    */
  private[ext] def fakeDecode(payload: Array[Byte]): (Int, Int, Int, String) = {
    val w = 64 + (java.lang.Byte.toUnsignedInt(payload(4)) % 16) * 64
    val h = 64 + (java.lang.Byte.toUnsignedInt(payload(5)) % 16) * 64
    val c = 1 + (java.lang.Byte.toUnsignedInt(payload(6)) % 2) * 2
    val hash = hex(payload.slice(4, 20))
    (w, h, c, hash)
  }

  /** Decode over the fake payloads — kept for specs that need a codec-free
    * pipeline; identical batching shape to the real `decodeMeta`.
    */
  def decodeMetaFake(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    decodeWith(df, idCol, payloadCol)(fakeDecode)

  /** Lowercase hex without `String.format` — `"%02x".format(b)` parses
    * the format string (regex + Formatter allocation) per BYTE; at 500k
    * images × 3 hex sites per image that was a jstack-visible hot frame
    * in the m03 profile. Table lookup emits identical output.
    */
  private val HexChars = "0123456789abcdef".toCharArray
  private[ext] def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      out(i * 2) = HexChars(v >>> 4)
      out(i * 2 + 1) = HexChars(v & 0xf)
      i += 1
    }
    new String(out)
  }

  private def md5hex(s: String): String =
    hex(java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")))

  /** Deterministic image dims from a text column: width/height in 8..23,
    * grayscale or RGB — small enough that encoding millions of images per
    * executor is cheap, predictable enough that a SQL oracle over md5(text)
    * can assert what the decoder must read back.
    */
  private[ext] def plannedDims(md5: String): (Int, Int, Int) = {
    val b4 = Integer.parseInt(md5.substring(0, 2), 16)
    val b5 = Integer.parseInt(md5.substring(2, 4), 16)
    val b6 = Integer.parseInt(md5.substring(4, 6), 16)
    (8 + b4 % 16, 8 + b5 % 16, 1 + (b6 % 2) * 2)
  }

  /** Encode a REAL PNG per row with `javax.imageio`, batched per
    * partition. Pixels are seeded from the md5 so payloads differ; dims
    * derive from the text so they're oracle-predictable. This is the
    * write half of the codec round-trip `decodeMeta` closes.
    */
  def encodeImages(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val inputSchema = df.schema
    val idIdx = inputSchema.fieldIndex(idCol)
    val tIdx = inputSchema.fieldIndex(textCol)
    val outSchema = StructType(Seq(inputSchema(idIdx), StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    spreadForCpu(df).mapPartitions { rows =>
      val enc = new PngEncoder
      rows.map { r =>
        val md5 = md5hex(r.getString(tIdx))
        val (w, h, c) = plannedDims(md5)
        val imgType =
          if (c == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
        val img = new java.awt.image.BufferedImage(w, h, imgType)
        val raster = img.getRaster
        // hash bytes decoded ONCE per image — substring+parseInt per
        // SAMPLE was a per-pixel allocation in the encode hot loop
        val hb = Array.tabulate(16)(i =>
          Integer.parseInt(md5.substring(i * 2, i * 2 + 2), 16))
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < c) {
              // cheap deterministic texture from the hash + coordinates
              raster.setSample(x, y, b, (hb((x + y + b) % 16) + x * 7 + y * 13) & 0xff)
              b += 1
            }
            x += 1
          }
          y += 1
        }
        Row(r.get(idIdx), enc.encode(img))
      }
    }(encoder)
  }

  /** REAL image decode over the binary column, batched per partition (the
    * Scala analog of `mapInPandas`: one iterator per partition, no per-row
    * task overhead). `ImageIO.read` parses the actual PNG/JPEG/GIF/BMP
    * bytes; width/height/channels come from the decoded raster.
    */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    decodeWith(df, idCol, payloadCol) { payload =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null)
        throw new IllegalArgumentException("payload is not a decodable image")
      (img.getWidth, img.getHeight, img.getColorModel.getNumComponents,
        payload.length.toString) // content id: cheap length tag; md5 below
    }

  private def decodeWith(df: DataFrame, idCol: String, payloadCol: String)(
      decode: Array[Byte] => (Int, Int, Int, String)): DataFrame = {
    val inputSchema = df.schema
    val idIdx = inputSchema.fieldIndex(idCol)
    val pIdx = inputSchema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(
      inputSchema(idIdx),
      StructField("meta", metaSchema)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    spreadForCpu(df).mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val (w, h, c, _) = decode(payload)
        digest.reset()
        val hash = hex(digest.digest(payload))
        Row(r.get(idIdx), Row(w, h, c, hash))
      }
    }(encoder)
  }

  /** REAL pixel resize: decode, scale with Graphics2D under the same
    * max-edge rule as `resizePlan` (scale = min(1, maxEdge/max(w,h)),
    * ceil'd targets), re-encode PNG — same per-partition batching as the
    * other codec passes. Images already within bounds pass through
    * byte-identical. Color model is preserved (gray stays 1-channel).
    */
  def resizeImages(df: DataFrame, idCol: String, payloadCol: String,
                   maxEdge: Int): DataFrame = {
    val inputSchema = df.schema
    val idIdx = inputSchema.fieldIndex(idCol)
    val pIdx = inputSchema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(inputSchema(idIdx), StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    spreadForCpu(df).mapPartitions { rows =>
      val enc = new PngEncoder
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null)
          throw new IllegalArgumentException("payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val scale = math.min(1.0, maxEdge.toDouble / math.max(w, h))
        val out =
          if (scale >= 1.0) payload
          else {
            val tw = math.ceil(w * scale).toInt
            val th = math.ceil(h * scale).toInt
            val target = new java.awt.image.BufferedImage(tw, th, img.getType)
            // bilinear resample on the rasters directly — NOT Graphics2D:
            // every drawImage allocates a native SurfaceData whose cleanup
            // is serialized on the singleton Java2D Disposer thread, and at
            // tens of thousands of tiny images across 32 task threads the
            // backlog compounds run-over-run (measured 4.4s -> 15.8s for
            // back-to-back m03 passes at sf1.0). Raster arithmetic is
            // allocation-flat, deterministic, and per-pixel identical math.
            val sr = img.getRaster
            val tr = target.getRaster
            val bands = sr.getNumBands
            val sx = w.toDouble / tw
            val sy = h.toDouble / th
            var ty = 0
            while (ty < th) {
              val fy = math.min(math.max((ty + 0.5) * sy - 0.5, 0.0), h - 1.0)
              val y0 = fy.toInt
              val y1 = math.min(h - 1, y0 + 1)
              val dy = fy - y0
              var tx = 0
              while (tx < tw) {
                val fx = math.min(math.max((tx + 0.5) * sx - 0.5, 0.0), w - 1.0)
                val x0 = fx.toInt
                val x1 = math.min(w - 1, x0 + 1)
                val dx = fx - x0
                var b = 0
                while (b < bands) {
                  val v = (1 - dx) * (1 - dy) * sr.getSample(x0, y0, b) +
                    dx * (1 - dy) * sr.getSample(x1, y0, b) +
                    (1 - dx) * dy * sr.getSample(x0, y1, b) +
                    dx * dy * sr.getSample(x1, y1, b)
                  tr.setSample(tx, ty, b, math.round(v).toInt)
                  b += 1
                }
                tx += 1
              }
              ty += 1
            }
            enc.encode(target)
          }
        Row(r.get(idIdx), out)
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

  /** REAL audio encode: genuine 16-bit mono PCM WAV bytes via
    * `javax.sound.sampled` (headless-safe). Sample rate and frame count
    * derive from md5(text) so a SQL oracle can predict what the decoder
    * must read back; samples are a deterministic hash-seeded waveform.
    */
  def encodeWavs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val inputSchema = df.schema
    val idIdx = inputSchema.fieldIndex(idCol)
    val tIdx = inputSchema.fieldIndex(textCol)
    val outSchema = StructType(Seq(inputSchema(idIdx), StructField("audio", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    spreadForCpu(df).mapPartitions { rows =>
      rows.map { r =>
        val md5 = md5hex(r.getString(tIdx))
        val (rate, frames) = plannedAudio(md5)
        val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
        val pcm = new Array[Byte](frames * 2)
        var i = 0
        while (i < frames) {
          // hash-seeded sawtooth so payloads differ per doc
          val s = ((Integer.parseInt(md5.substring(i % 16, i % 16 + 2), 16) * 257 + i * 31) % 65536 - 32768).toShort
          pcm(i * 2) = (s & 0xff).toByte
          pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val stream = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val buf = new java.io.ByteArrayOutputStream(pcm.length + 64)
        wavWriter.write(stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
        Row(r.get(idIdx), buf.toByteArray)
      }
    }(encoder)
  }

  /** Deterministic audio parameters from the md5: rate in {8000..15000},
    * frame count in 100..355.
    */
  private[ext] def plannedAudio(md5: String): (Int, Int) = {
    val b4 = Integer.parseInt(md5.substring(0, 2), 16)
    val b5 = Integer.parseInt(md5.substring(2, 4), 16)
    (8000 + (b4 % 8) * 1000, 100 + b5)
  }

  /** Minimal PNG encoder (8-bit gray / RGB, filter 0, one IDAT) with the
    * zlib `Deflater` and `CRC32` REUSED across rows. `ImageIO.write`
    * allocates a fresh writer + `Deflater` per call whose native zlib
    * state is reclaimed by the Cleaner, not eagerly; a pass that encodes
    * tens of thousands of images per task thread builds a native backlog
    * (GCLocker-initiated GCs observed) that compounds across back-to-back
    * runs — m03's suite median degraded to 11-18 s at the 10x tier while
    * its interference-free floor stayed ~1.8 s. One reused Deflater per
    * partition is allocation-flat. The output is a spec-valid PNG that
    * `ImageIO.read` (still the platform codec, used on the decode side)
    * parses to the identical raster.
    */
  private[ext] final class PngEncoder {
    private val deflater = new java.util.zip.Deflater()
    private val crc = new java.util.zip.CRC32
    private val out = new java.io.ByteArrayOutputStream(4096)
    private var defBuf = new Array[Byte](8192)

    private def chunk(tpe: String, data: Array[Byte], len: Int): Unit = {
      def be(i: Int): Array[Byte] =
        Array((i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
      out.write(be(len))
      val t = tpe.getBytes("US-ASCII")
      out.write(t)
      out.write(data, 0, len)
      crc.reset(); crc.update(t); crc.update(data, 0, len)
      out.write(be(crc.getValue.toInt))
    }

    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val bands = raster.getNumBands
      require(bands == 1 || bands == 3, s"PngEncoder supports gray/RGB, got $bands bands")
      out.reset()
      out.write(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
      val ihdr = new Array[Byte](13)
      def put(i: Int, v: Int): Unit = {
        ihdr(i) = (v >>> 24).toByte; ihdr(i + 1) = (v >>> 16).toByte
        ihdr(i + 2) = (v >>> 8).toByte; ihdr(i + 3) = v.toByte
      }
      put(0, w); put(4, h)
      ihdr(8) = 8 // bit depth
      ihdr(9) = if (bands == 1) 0 else 2 // gray | truecolor
      chunk("IHDR", ihdr, 13)
      // raw scanlines: filter byte 0 + samples row-major
      val stride = 1 + w * bands
      val raw = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        var o = y * stride + 1 // filter byte already 0
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) {
            raw(o) = raster.getSample(x, y, b).toByte; o += 1; b += 1
          }
          x += 1
        }
        y += 1
      }
      deflater.reset()
      deflater.setInput(raw)
      deflater.finish()
      var total = 0
      while (!deflater.finished()) {
        if (total == defBuf.length) defBuf = java.util.Arrays.copyOf(defBuf, defBuf.length * 2)
        total += deflater.deflate(defBuf, total, defBuf.length - total)
      }
      chunk("IDAT", defBuf, total)
      chunk("IEND", Array.emptyByteArray, 0)
      out.toByteArray
    }

    def close(): Unit = deflater.end()
  }

  /** The WAVE codec SPI instances, resolved ONCE per JVM. Every
    * `AudioSystem.write`/`getAudioFileFormat` call re-runs provider
    * discovery through `JDK13Services.getProviders`, a synchronized
    * static — 32 task threads serialize on it, and at 50k docs that lock
    * dominates the pass (~19 ms CPU per 700-byte WAV). `ServiceLoader`
    * is the same public discovery mechanism; the returned provider is the
    * identical platform codec class, so the bytes written/parsed are
    * unchanged — only the per-row global lock is gone.
    */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAVE AudioFileWriter provider"))
  }

  private lazy val wavReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.toSeq
  }

  /** The provider that actually parses WAV, found ONCE by probing a
    * minimal in-memory file. Trying providers in ServiceLoader order per
    * row means several `UnsupportedAudioFileException` throws (stack-trace
    * fill) per payload — measured ~6 s of the 50k-doc parse pass; probing
    * first cuts the pass to the actual header-parse cost.
    */
  private lazy val primaryAudioReader: Option[javax.sound.sampled.spi.AudioFileReader] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](4)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 2L)
    val buf = new java.io.ByteArrayOutputStream(64)
    wavWriter.write(stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val probe = buf.toByteArray
    wavReaders.find { r =>
      try { r.getAudioFileFormat(new java.io.ByteArrayInputStream(probe)); true }
      catch { case _: Exception => false }
    }
  }

  private def readAudioFileFormat(bytes: Array[Byte]): javax.sound.sampled.AudioFileFormat = {
    primaryAudioReader.foreach { r =>
      try return r.getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    val it = wavReaders.iterator
    while (it.hasNext) {
      try return it.next().getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no provider could parse the audio payload")
  }

  /** REAL audio metadata decode: `AudioSystem` parses the WAV header —
    * sample rate, channels, bit depth, frame count — per-partition
    * batched like the image passes.
    */
  def decodeAudioMeta(df: DataFrame, idCol: String, audioCol: String): DataFrame = {
    val inputSchema = df.schema
    val idIdx = inputSchema.fieldIndex(idCol)
    val aIdx = inputSchema.fieldIndex(audioCol)
    val outSchema = StructType(Seq(
      inputSchema(idIdx),
      StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
      StructField("bits", IntegerType), StructField("n_frames", LongType),
      StructField("duration_ms", DoubleType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    spreadForCpu(df).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](aIdx)
        val aff = readAudioFileFormat(bytes)
        val fmt = aff.getFormat
        val frames = aff.getFrameLength.toLong
        Row(r.get(idIdx), fmt.getSampleRate.toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, frames,
          frames * 1000.0 / fmt.getSampleRate)
      }
    }(encoder)
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
