package graft.artifact

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.h5.H5Input

/** Native FCS (Flow Cytometry Standard 3.0/3.1) reader — the `fcs`
  * entry of the reference's suffix loader table
  * (`core/loaders.py:185-213`, which delegates to readfcs; here the
  * public ISAC spec is implemented directly).
  *
  * Layout: 58-byte ASCII header with segment offsets → delimited TEXT
  * segment of `$`-keywords → list-mode DATA matrix. Supported data:
  * `$MODE L`, `$DATATYPE F/D/I` with uniform `$PnB`, `$BYTEORD`
  * little or big endian.
  *
  * Scale shape: TEXT parse is driver-side and tiny; DATA rows are
  * fixed-width, so the event matrix is trivially splittable — tasks
  * take disjoint event ranges and read only their own byte spans
  * through the Hadoop FS API (same contract as the h5 chunk readers).
  */
object FcsReader {

  final case class FcsMeta(text: Map[String, String], nEvents: Long,
                           channels: Seq[String], dataStart: Long,
                           datatype: String, bytesPerValue: Int,
                           littleEndian: Boolean) {
    def rowBytes: Int = channels.size * bytesPerValue
  }

  def meta(path: String): FcsMeta = {
    val in = H5Input.open(path)
    try {
      val header = new String(in.readFully(0L, 58), US_ASCII)
      require(header.startsWith("FCS3"), s"$path: not an FCS 3.x file ($header)")
      def off(i: Int): Long = header.substring(10 + i * 8, 18 + i * 8).trim.toLong
      val (textStart, textEnd) = (off(0), off(1))
      val text = parseText(
        in.readFully(textStart, (textEnd - textStart + 1).toInt))
      val dataStart = {
        val fromHeader = if (off(2) > 0) off(2) else 0L
        if (fromHeader > 0) fromHeader else text("$BEGINDATA").trim.toLong
      }
      val nPar = text("$PAR").trim.toInt
      val channels = (1 to nPar).map(i =>
        text.getOrElse(s"$$P${i}N", s"P$i"))
      val bits = (1 to nPar).map(i => text(s"$$P${i}B").trim.toInt).distinct
      require(bits.size == 1, s"$path: mixed $$PnB widths $bits unsupported")
      val datatype = text("$DATATYPE").trim
      require(Seq("F", "D", "I").contains(datatype), s"$path: $$DATATYPE $datatype")
      require(text("$MODE").trim == "L", s"$path: only list mode supported")
      val little = text("$BYTEORD").trim.startsWith("1")
      FcsMeta(text, text("$TOT").trim.toLong, channels, dataStart,
        datatype, bits.head / 8, little)
    } finally in.close()
  }

  /** TEXT segment: first byte is the delimiter; `//` (doubled) escapes
    * a literal delimiter inside a value.
    */
  private[artifact] def parseText(seg: Array[Byte]): Map[String, String] = {
    val delim = seg(0)
    val parts = collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 1
    while (i < seg.length) {
      if (seg(i) == delim) {
        if (i + 1 < seg.length && seg(i + 1) == delim) { cur += delim.toChar; i += 1 }
        else { parts += cur.result(); cur.clear() }
      } else cur += (seg(i) & 0xFF).toChar
      i += 1
    }
    if (cur.nonEmpty) parts += cur.result()
    parts.grouped(2).collect { case collection.mutable.ArrayBuffer(k, v) =>
      k.trim.toUpperCase -> v
    }.toMap
  }

  /** The event matrix as a DataFrame: `event_id` + one double column
    * per channel. Tasks read disjoint fixed-width event ranges.
    */
  def read(spark: SparkSession, path: String, parallelism: Int = 0): DataFrame = {
    val m = meta(path)
    val schema = StructType(
      StructField("event_id", LongType, nullable = false) +:
        m.channels.map(c => StructField(c, DoubleType, nullable = false)))
    val par = math.max(1, math.min(m.nEvents,
      if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism)).toInt
    val cuts = (0 to par).map(p => m.nEvents * p / par).distinct
    val ranges = cuts.zip(cuts.tail)
    val rowBytes = m.rowBytes
    val nPar = m.channels.size
    val rdd = spark.sparkContext.parallelize(ranges, ranges.size)
      .mapPartitions { it =>
        val inp = H5Input.open(path)
        val rows = it.flatMap { case (e0, e1) =>
          val raw = inp.readFully(m.dataStart + e0 * rowBytes,
            ((e1 - e0) * rowBytes).toInt)
          val b = ByteBuffer.wrap(raw).order(
            if (m.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
          Iterator.range(0, (e1 - e0).toInt).map { k =>
            val vals = new Array[Any](nPar + 1)
            vals(0) = e0 + k
            var p = 0
            while (p < nPar) {
              b.position((k * nPar + p) * m.bytesPerValue)
              vals(p + 1) = (m.datatype, m.bytesPerValue) match {
                case ("F", 4) => b.getFloat().toDouble
                case ("D", 8) => b.getDouble()
                case ("I", 2) => (b.getShort() & 0xFFFF).toDouble
                case ("I", 4) => (b.getInt() & 0xFFFFFFFFL).toDouble
                case (t, w) => throw new UnsupportedOperationException(
                  s"FCS $$DATATYPE $t width $w")
              }
              p += 1
            }
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
        new graft.h5.ClosingIterator(rows, inp)
      }
    spark.createDataFrame(rdd, schema)
  }
}
