package graft.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** Pure-JVM decoder for c-blosc1 chunks — the compressor numcodecs
  * applies to zarr chunks by default (`{"id":"blosc","cname":"lz4",
  * "shuffle":1}`), which is how the reference's zarr-backed AnnData
  * stores arrive (`core/storage/_backed_access.py:108-121`).
  *
  * Implements the public c-blosc chunk format
  * (README_CHUNK_FORMAT.rst of the c-blosc repo): a 16-byte header
  * `(version, versionlz, flags, typesize, nbytes, blocksize, cbytes)`
  * with all ints little-endian; flags bit0 = byte shuffle, bit1 =
  * pure memcpy, bit2 = bit shuffle (unsupported here), bit4 =
  * blocks-not-split (recorded by c-blosc >= 1.11), bits 5-7 =
  * compressor (0 blosclz, 1 lz4, 3 zlib). After the header: one
  * int32 start offset per block, then per block its streams — when
  * split, one compressed stream per byte lane of the shuffle
  * (`typesize` streams), each preceded by its int32 compressed size;
  * a stream whose compressed size equals its uncompressed size is
  * stored raw. Shuffle is applied per block, trailing
  * non-multiple-of-typesize bytes copied unchanged.
  *
  * LZ4 streams use the public LZ4 block format (token byte with
  * 4-bit literal/match lengths, 255-continued extensions, 16-bit
  * little-endian match offsets, overlap-capable match copy).
  */
object Blosc {

  /** Decode one LZ4 block-format stream of known decompressed size. */
  def lz4Decompress(src: Array[Byte], srcOff: Int, srcLen: Int,
                    dstLen: Int): Array[Byte] = {
    val out = new Array[Byte](dstLen)
    var i = srcOff
    val end = srcOff + srcLen
    var o = 0
    while (i < end) {
      val token = src(i) & 0xFF
      i += 1
      var lit = token >>> 4
      if (lit == 15) {
        var b = 0xFF
        while (b == 0xFF) { b = src(i) & 0xFF; lit += b; i += 1 }
      }
      System.arraycopy(src, i, out, o, lit)
      i += lit; o += lit
      if (i < end) {
        val off = ((src(i) & 0xFF) | ((src(i + 1) & 0xFF) << 8))
        i += 2
        var mlen = (token & 0xF) + 4
        if ((token & 0xF) == 15) {
          var b = 0xFF
          while (b == 0xFF) { b = src(i) & 0xFF; mlen += b; i += 1 }
        }
        var s = o - off
        var k = 0
        while (k < mlen) { out(o) = out(s); o += 1; s += 1; k += 1 }
      }
    }
    require(o == dstLen, s"lz4: decoded $o of expected $dstLen bytes")
    out
  }

  private def inflate(src: Array[Byte], off: Int, len: Int,
                      dstLen: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(src, off, len)
    val out = new Array[Byte](dstLen)
    var o = 0
    while (!inf.finished() && o < dstLen) o += inf.inflate(out, o, dstLen - o)
    inf.end()
    require(o == dstLen, s"zlib: decoded $o of expected $dstLen bytes")
    out
  }

  /** Byte-transpose a shuffled block back to row order (trailing
    * remainder bytes pass through, as c-blosc's shuffle does).
    */
  def unshuffle(typesize: Int, block: Array[Byte]): Array[Byte] = {
    val nel = block.length / typesize
    val out = new Array[Byte](block.length)
    var j = 0
    while (j < typesize) {
      var i = 0
      while (i < nel) { out(i * typesize + j) = block(j * nel + i); i += 1 }
      j += 1
    }
    val tail = block.length % typesize
    if (tail > 0)
      System.arraycopy(block, block.length - tail, out, block.length - tail, tail)
    out
  }

  private val MaxSplits = 16

  /** Decode a full blosc chunk to its `nbytes` uncompressed payload. */
  def decode(chunk: Array[Byte]): Array[Byte] = {
    val hb = ByteBuffer.wrap(chunk).order(ByteOrder.LITTLE_ENDIAN)
    val flags = chunk(2) & 0xFF
    val typesize = chunk(3) & 0xFF
    val nbytes = hb.getInt(4)
    val blocksize = hb.getInt(8)
    require((flags & 0x4) == 0, "blosc bit-shuffle is not supported")
    if ((flags & 0x2) != 0) // memcpyed: payload follows the header raw
      return java.util.Arrays.copyOfRange(chunk, 16, 16 + nbytes)
    val compCode = (flags >>> 5) & 0x7
    val dontSplit = (flags & 0x10) != 0
    val doShuffle = (flags & 0x1) != 0 && typesize > 1
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val out = new Array[Byte](nbytes)
    var b = 0
    while (b < nblocks) {
      val bsize = math.min(blocksize, nbytes - b * blocksize)
      val leftover = bsize != blocksize
      val nsplits =
        if (dontSplit || leftover || typesize <= 1 || typesize > MaxSplits) 1
        else typesize
      val neblock = bsize / nsplits
      var pos = hb.getInt(16 + 4 * b)
      val block = new Array[Byte](bsize)
      var s = 0
      while (s < nsplits) {
        val csize = hb.getInt(pos)
        pos += 4
        val dec =
          if (csize == neblock)
            java.util.Arrays.copyOfRange(chunk, pos, pos + csize)
          else compCode match {
            case 1 => lz4Decompress(chunk, pos, csize, neblock)
            case 3 => inflate(chunk, pos, csize, neblock)
            case 0 => throw new UnsupportedOperationException(
              "blosc cname blosclz is not supported (lz4/zlib are)")
            case c => throw new UnsupportedOperationException(
              s"blosc compressor code $c")
          }
        System.arraycopy(dec, 0, block, s * neblock, neblock)
        pos += csize
        s += 1
      }
      val fin = if (doShuffle) unshuffle(typesize, block) else block
      System.arraycopy(fin, 0, out, b * blocksize, bsize)
      b += 1
    }
    out
  }
}
