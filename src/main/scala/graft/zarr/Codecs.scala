package graft.zarr

import java.util.zip.{CRC32C, GZIPInputStream, Inflater}

/** Bytes→bytes codec pipeline shared by the zarr v2 and v3 readers.
  *
  * v2 expresses compression as a single `compressor` (+ `filters`) in
  * `.zarray`; v3 as an ordered `codecs` list in `zarr.json` (public zarr
  * v3 core spec). Both normalize to a [[ZCodec]] sequence in ENCODE
  * order; [[ZCodec.decode]] applies the inverses right-to-left, so one
  * decode path serves every store flavor.
  */
sealed trait ZCodec extends Serializable

object ZCodec {
  /** c-blosc1 frame (v2 numcodecs default; v3 `blosc` codec). */
  case object BloscC extends ZCodec
  /** Raw zlib stream (v2 numcodecs `zlib`). */
  case object ZlibC extends ZCodec
  /** gzip-framed deflate (v3 `gzip` codec). */
  case object GzipC extends ZCodec
  /** CRC32C checksum appended to the payload (v3 `crc32c` codec). */
  case object Crc32cC extends ZCodec

  private def inflate(src: Array[Byte], sizeHint: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(src)
    var buf = new Array[Byte](math.max(sizeHint, 256))
    var o = 0
    while (!inf.finished()) {
      if (o == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      o += inf.inflate(buf, o, buf.length - o)
    }
    inf.end()
    java.util.Arrays.copyOf(buf, o)
  }

  private def gunzip(src: Array[Byte], sizeHint: Int): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(src))
    try {
      var buf = new Array[Byte](math.max(sizeHint, 256))
      var o = 0
      var n = in.read(buf, o, buf.length - o)
      while (n >= 0) {
        o += n
        if (o == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        n = in.read(buf, o, buf.length - o)
      }
      java.util.Arrays.copyOf(buf, o)
    } finally in.close()
  }

  def crc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C()
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  /** Undo an encode-ordered pipeline: checksums strip, compressors
    * inflate, applied last-codec-first.
    */
  def decode(codecs: Seq[ZCodec], enc: Array[Byte], sizeHint: Int): Array[Byte] = {
    var cur = enc
    codecs.reverseIterator.foreach {
      case Crc32cC =>
        require(cur.length >= 4, "crc32c codec: payload shorter than checksum")
        val body = cur.length - 4
        val stored = java.nio.ByteBuffer.wrap(cur, body, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        require(stored == crc32c(cur, 0, body), "crc32c mismatch: corrupt chunk")
        cur = java.util.Arrays.copyOf(cur, body)
      case BloscC => cur = Blosc.decode(cur)
      case ZlibC => cur = inflate(cur, sizeHint)
      case GzipC => cur = gunzip(cur, sizeHint)
    }
    cur
  }
}

/** The v3 `sharding_indexed` array→bytes codec: one store object (shard)
  * packs a C-order grid of independently-encoded inner chunks plus a
  * fixed-width index of (offset, nbytes) u64 pairs — the public answer
  * to "a 100 TB array should not be 100 M store objects". Readers do two
  * ranged GETs per inner chunk (index, then chunk), never the full shard.
  *
  * @param shardShape  elements per shard per dim (the v3 `chunk_grid`
  *                    chunk_shape; must be a multiple of the inner shape)
  * @param innerCodecs bytes→bytes pipeline of each inner chunk
  * @param indexCrc    index carries a trailing CRC32C (spec default)
  * @param indexAtEnd  `index_location`: end (default) or start
  */
final case class ShardInfo(shardShape: Seq[Int], innerCodecs: Seq[ZCodec],
                           indexCrc: Boolean, indexAtEnd: Boolean)
    extends Serializable {
  def indexByteLen(nInner: Int): Int = 16 * nInner + (if (indexCrc) 4 else 0)
}
