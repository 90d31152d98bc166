package graft.h5.datasource

import java.util.{Map => JMap}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.h5._

/** DataSource V2 surface for the native HDF5 reader:
  * `spark.read.format("h5ad").load(path)` yields the COO view
  * `(obs_id, var_id, value)` of a dense or csr X (or any slot via
  * `.option("slot", "layers/scaled")`).
  *
  * This is the Catalyst-native presentation of `graft.h5`:
  *  - **partition planning = the chunk grid** — one input partition per
  *    stored chunk (dense) or per row range (csr), so task parallelism
  *    tracks the file's own layout;
  *  - **filter pushdown = chunk pruning** — min/max bounds on
  *    `obs_id`/`var_id` skip chunks whose grid offsets cannot
  *    intersect, before any byte is read (the HDF5 analog of parquet
  *    row-group pruning). Filters are also left for Spark to
  *    re-evaluate, so pushdown is purely an I/O optimization;
  *  - **column pruning** — the reader materializes only the projected
  *    fields.
  */
final class H5adSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "h5ad"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path"))
    val slot = Option(options.get("slot")).getOrElse("X")
    path.map(p => H5adSource.schemaFor(p, slot)).getOrElse(H5adSource.Schema)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("h5ad source requires a path"))
    new H5adTable(path, Option(properties.get("slot")).getOrElse("X"))
  }
}

object H5adSource {
  val Schema: StructType = StructType(Seq(
    StructField("obs_id", LongType, nullable = false),
    StructField("var_id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Matrix slots expose the COO schema; `dataframe` slots (obs / var /
    * raw/var) expose the frame's own schema from its encoding attrs.
    */
  def schemaFor(path: String, slot: String): StructType = {
    val f = H5File.open(path)
    try {
      if (H5adFrame.isFrameSlot(f, slot)) H5adFrame.describe(f, slot).schema
      else Schema
    } finally f.close()
  }
}

final class H5adTable(path: String, slot: String) extends Table with SupportsRead {
  override def name(): String = s"h5ad:$path!$slot"
  override lazy val schema: StructType = H5adSource.schemaFor(path, slot)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new H5adScanBuilder(path, slot, schema,
      options.getInt("bundleThreshold", 256),
      options.getLong("bundleBytes", 32L << 20),
      options.getLong("targetRowsPerTask", 1L << 20),
      options.getLong("targetElemsPerTask", 4L << 20))
}

final class H5adScanBuilder(path: String, slot: String, full: StructType,
                            bundleThreshold: Int, bundleBytes: Long,
                            targetRows: Long = 1L << 20,
                            targetElems: Long = 4L << 20)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Keep every filter for Spark to re-evaluate; retain min/max bounds
    * on obs_id/var_id for chunk pruning.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new H5adScan(path, slot, required, H5adScanBuilder.bounds(pushed),
      bundleThreshold, bundleBytes, targetRows, targetElems)
}

object H5adScanBuilder {
  /** Row-range partition count: ceil(n / targetRows) with a
    * `defaultParallelism` floor, capped at n. Planning runs driver-side,
    * so the active session's parallelism is the honest floor — a fixed
    * 32-partition cap (the old plan) was invisible on local[32] but
    * would bottleneck a 1000-executor scan regardless of store size.
    */
  def rangeCount(nRows: Long, targetRows: Long): Int = {
    require(targetRows >= 1, s"targetRowsPerTask must be >= 1, got $targetRows")
    val floor =
      try org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism.toLong
      catch { case _: Throwable => 8L }
    val byTarget = (nRows + targetRows - 1) / targetRows
    math.max(1L, math.min(nRows, math.max(byTarget, floor))).toInt
  }

  /** (lo, hi) inclusive bounds per column from simple comparison filters. */
  def bounds(filters: Array[Filter]): Map[String, (Long, Long)] = {
    val b = mutable.Map.empty[String, (Long, Long)]
      .withDefaultValue((Long.MinValue, Long.MaxValue))
    def tighten(col: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = b(col)
      b(col) = (math.max(l0, lo), math.min(h0, hi))
    }
    def num(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue())
      case _ => None
    }
    filters.foreach {
      case EqualTo(c, v) => num(v).foreach(n => tighten(c, n, n))
      case GreaterThan(c, v) => num(v).foreach(n => tighten(c, n + 1, Long.MaxValue))
      case GreaterThanOrEqual(c, v) => num(v).foreach(n => tighten(c, n, Long.MaxValue))
      case LessThan(c, v) => num(v).foreach(n => tighten(c, Long.MinValue, n - 1))
      case LessThanOrEqual(c, v) => num(v).foreach(n => tighten(c, Long.MinValue, n))
      case And(l, r) => b ++= bounds(Array(l)).map { case (k, v) =>
        val (l0, h0) = b(k); k -> (math.max(l0, v._1), math.min(h0, v._2))
      }; b ++= bounds(Array(r)).map { case (k, v) =>
        val (l0, h0) = b(k); k -> (math.max(l0, v._1), math.min(h0, v._2))
      }
      case _ => ()
    }
    b.toMap
  }
}

// --------------------------------------------------------------- partitions

/** One stored chunk: (addr, storedSize, rOff, cOff). */
private final case class ChunkRef4(addr: Long, storedSize: Int,
                                   rOff: Long, cOff: Long) extends Serializable

private final case class DenseChunkPartition(
    path: String, chunks: Array[ChunkRef4],
    chunkRows: Int, chunkCols: Int, nRows: Long, nCols: Long,
    dtype: H5Dtype, filters: Seq[H5Filter]) extends InputPartition

private final case class CsrRangePartition(
    path: String, groupPath: String, r0: Long, r1: Long) extends InputPartition

final class H5adScan(path: String, slot: String, required: StructType,
                     colBounds: Map[String, (Long, Long)],
                     bundleThreshold: Int = 256,
                     bundleBytes: Long = 32L << 20,
                     targetRows: Long = 1L << 20,
                     targetElems: Long = 4L << 20) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"h5ad $path!$slot bounds=$colBounds cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val (obsLo, obsHi) = colBounds.getOrElse("obs_id", (Long.MinValue, Long.MaxValue))
    val (varLo, varHi) = colBounds.getOrElse("var_id", (Long.MinValue, Long.MaxValue))
    val f = H5File.open(path)
    try {
      if (H5adFrame.isFrameSlot(f, slot)) {
        // dataframe slot: row ranges pruned by pushed row-id bounds;
        // tasks decode only their slice of each projected column
        val info = H5adFrame.describe(f, slot)
        val (idLo, idHi) = colBounds.getOrElse(info.rowIdName,
          (Long.MinValue, Long.MaxValue))
        val par = H5adScanBuilder.rangeCount(info.n, targetRows)
        val bnds = (0 to par).map(p => info.n * p / par).distinct
        return bnds.zip(bnds.tail)
          .filter { case (r0, r1) => r1 > idLo && r0 <= idHi }
          .map { case (r0, r1) =>
            FrameRangePartition(path, slot, r0, r1, info.specs.toArray): InputPartition
          }.toArray
      }
      f(slot) match {
        case g: H5Group =>
          require(f.attrString(g, "encoding-type").contains("csr_matrix"),
            s"$slot: group is not csr_matrix")
          val indptrDs = f.node(g.children("indptr"), "indptr").asInstanceOf[H5DatasetMeta]
          val nRows = indptrDs.dims(0) - 1
          val nnz = f.node(g.children("data"), "data")
            .asInstanceOf[H5DatasetMeta].dims(0)
          // rows AND elements both size the plan: a few very dense rows
          // must not collapse into one task
          val par = math.max(
            H5adScanBuilder.rangeCount(nRows, targetRows).toLong,
            math.min(nRows, (nnz + targetElems - 1) / targetElems)).toInt
          val bounds = (0 to par).map(p => nRows * p / par).distinct
          bounds.zip(bounds.tail)
            .filter { case (r0, r1) => r1 > obsLo && r0 <= obsHi } // chunk pruning
            .map { case (r0, r1) => CsrRangePartition(path, slot, r0, r1): InputPartition }
            .toArray
        case ds: H5DatasetMeta =>
          ds.layout match {
            case H5Layout.Chunked(_, chunkDims) =>
              val pruned = f.chunkRefs(ds)
                .filter { c =>
                  val r0 = c.offsets(0); val c0 = c.offsets(1)
                  (r0 + chunkDims(0)) > obsLo && r0 <= obsHi &&
                    (c0 + chunkDims(1)) > varLo && c0 <= varHi
                }
                .map(c => ChunkRef4(c.addr, c.storedSize, c.offsets(0), c.offsets(1)))
              // small files: one partition per chunk (pruning stays
              // 1:1-observable). Big files: bundle chunks to ~32MB of
              // stored bytes per task so a million-chunk X plans
              // thousands of partitions, not millions.
              val bundles: Seq[Array[ChunkRef4]] =
                if (pruned.length <= bundleThreshold) pruned.map(Array(_))
                else {
                  val target = bundleBytes
                  val out = Seq.newBuilder[Array[ChunkRef4]]
                  val cur = mutable.ArrayBuffer.empty[ChunkRef4]
                  var bytes = 0L
                  pruned.foreach { c =>
                    if (cur.nonEmpty && bytes + c.storedSize > target) {
                      out += cur.toArray; cur.clear(); bytes = 0L
                    }
                    cur += c; bytes += c.storedSize
                  }
                  if (cur.nonEmpty) out += cur.toArray
                  out.result()
                }
              bundles.map(b => DenseChunkPartition(path, b,
                chunkDims(0), chunkDims(1), ds.dims(0), ds.dims(1),
                ds.dtype, ds.filters): InputPartition).toArray
            case _ =>
              throw new UnsupportedOperationException(
                s"$slot: only chunked dense or csr slots are exposed via DSv2")
          }
      }
    } finally f.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new H5adReaderFactory(required)
}

final class H5adReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: DenseChunkPartition => new DenseChunkReader(p, required)
      case p: CsrRangePartition => new CsrRangeReader(p, required)
      case p: FrameRangePartition => new FrameRangeReader(p, required)
    }
}

/** Projects (obs, var, value) into the pruned schema. */
private object Project {
  def row(required: StructType, i: Long, j: Long, v: Double): InternalRow = {
    val vals = required.fieldNames.map {
      case "obs_id" => java.lang.Long.valueOf(i)
      case "var_id" => java.lang.Long.valueOf(j)
      case "value" => java.lang.Double.valueOf(v)
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }
}

private final class DenseChunkReader(p: DenseChunkPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val inp = H5Input.open(p.path)
  private var ci = -1
  private var buf: java.nio.ByteBuffer = _
  private var rows, cols = 0
  private var cur: ChunkRef4 = _
  private var r = 0
  private var c = -1

  private def loadNextChunk(): Boolean = {
    ci += 1
    if (ci >= p.chunks.length) return false
    cur = p.chunks(ci)
    val esize = p.dtype.size
    val dec = H5File.decodeChunk(inp.readFully(cur.addr, cur.storedSize),
      p.filters, esize, p.chunkRows * p.chunkCols * esize)
    buf = java.nio.ByteBuffer.wrap(dec).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    rows = math.min(p.chunkRows.toLong, p.nRows - cur.rOff).toInt
    cols = math.min(p.chunkCols.toLong, p.nCols - cur.cOff).toInt
    r = 0; c = -1
    true
  }

  override def next(): Boolean = {
    c += 1
    if (c >= cols) { c = 0; r += 1 }
    while (r >= rows) {
      if (!loadNextChunk()) return false
      c = 0
    }
    true
  }

  override def get(): InternalRow = {
    buf.position((r * p.chunkCols + c) * p.dtype.size)
    val v = p.dtype match {
      case H5Dtype.FloatPt(8) => buf.getDouble()
      case H5Dtype.FloatPt(4) => buf.getFloat().toDouble
      case H5Dtype.FixedPt(4, _) => buf.getInt().toDouble
      case H5Dtype.FixedPt(8, _) => buf.getLong().toDouble
      case d => throw new UnsupportedOperationException(s"X element type $d")
    }
    Project.row(required, cur.rOff + r, cur.cOff + c, v)
  }

  override def close(): Unit = inp.close()
}

private final class CsrRangeReader(p: CsrRangePartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val inp = H5Input.open(p.path)
  // each task reads its own indptr slice + the matching data/indices bytes
  private val (ptr, data, ind, dataDt, indDt) = {
    val f = H5File.open(p.path)
    try {
      val g = f.group(p.groupPath)
      val indptrDs = f.node(g.children("indptr"), "indptr").asInstanceOf[H5DatasetMeta]
      val dataDs = f.node(g.children("data"), "data").asInstanceOf[H5DatasetMeta]
      val indDs = f.node(g.children("indices"), "indices").asInstanceOf[H5DatasetMeta]
      def sliceBytes(ds: H5DatasetMeta, e0: Long, e1: Long): Array[Byte] = {
        val esize = ds.dtype.size
        ds.layout match {
          case H5Layout.Contiguous(addr, _) =>
            inp.readFully(addr + e0 * esize, ((e1 - e0) * esize).toInt)
          case H5Layout.Chunked(_, chunkDims) =>
            val out = new Array[Byte](((e1 - e0) * esize).toInt)
            f.chunkRefs(ds).foreach { ch =>
              val cs = ch.offsets(0); val ce = math.min(cs + chunkDims(0), ds.dims(0))
              val lo = math.max(e0, cs); val hi = math.min(e1, ce)
              if (lo < hi) {
                val chunk = H5File.decodeChunk(inp.readFully(ch.addr, ch.storedSize),
                  ds.filters, esize, chunkDims(0) * esize)
                System.arraycopy(chunk, ((lo - cs) * esize).toInt,
                  out, ((lo - e0) * esize).toInt, ((hi - lo) * esize).toInt)
              }
            }
            out
          case _ => throw new UnsupportedOperationException("compact CSR slot")
        }
      }
      // only THIS task's indptr slice decodes — indptr is axis-sized,
      // and a full decode per task is O(store rows) at 10^8 rows
      val ptr = f.decodeLongs(indptrDs.dtype,
        sliceBytes(indptrDs, p.r0, p.r1 + 1))
      val e0 = ptr.head; val e1 = ptr.last
      (ptr, sliceBytes(dataDs, e0, e1), sliceBytes(indDs, e0, e1),
        dataDs.dtype, indDs.dtype)
    } finally f.close()
  }
  private val dataBuf = java.nio.ByteBuffer.wrap(data)
    .order(java.nio.ByteOrder.LITTLE_ENDIAN)
  private val indBuf = java.nio.ByteBuffer.wrap(ind)
    .order(java.nio.ByteOrder.LITTLE_ENDIAN)
  private val total = (ptr.last - ptr.head).toInt
  private var k = -1
  private var row = 0

  override def next(): Boolean = { k += 1; k < total }

  override def get(): InternalRow = {
    val elem = ptr.head + k
    while (ptr(row + 1) <= elem) row += 1
    val v = dataDt match {
      case H5Dtype.FloatPt(8) => dataBuf.getDouble(k * 8)
      case H5Dtype.FloatPt(4) => dataBuf.getFloat(k * 4).toDouble
      case d => throw new UnsupportedOperationException(s"csr data type $d")
    }
    val j = indDt match {
      case H5Dtype.FixedPt(4, _) => indBuf.getInt(k * 4).toLong
      case H5Dtype.FixedPt(8, _) => indBuf.getLong(k * 8)
      case d => throw new UnsupportedOperationException(s"csr index type $d")
    }
    Project.row(required, p.r0 + row, j, v)
  }

  override def close(): Unit = inp.close()
}
