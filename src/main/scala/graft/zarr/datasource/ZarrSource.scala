package graft.zarr.datasource

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.h5.datasource.H5adScanBuilder // bounds extraction is shared
import graft.zarr.{ZArray, ZarrStore}

/** DataSource V2 surface for the native zarr reader:
  * `spark.read.format("zarr").load(path)` yields the COO view
  * `(obs_id, var_id, value)` of the store's X (or any matrix slot via
  * `.option("slot", "layers/log")`) — the zarr twin of
  * [[graft.h5.datasource.H5adSource]]:
  *  - **partition planning = the chunk grid** (dense) or row ranges
  *    against indptr (csr), so task parallelism tracks the store's own
  *    chunk layout;
  *  - **filter pushdown = chunk pruning** — pushed min/max bounds on
  *    the axis columns skip chunk OBJECTS whose grid offsets cannot
  *    intersect, before any byte is read (and with a directory store
  *    that also means those objects are never even opened);
  *  - **column pruning** — only projected fields materialize.
  *
  * Dense slots of ANY rank are served: rank-2 keeps the
  * `(obs_id, var_id)` naming; other ranks (NGFF images/labels, rank-3
  * tensors) get axis columns `d0..dN-1`, renameable via
  * `.option("axes", "c,y,x")` — each axis column prunes its own grid
  * dimension. Works on v2 and v3 (incl. sharded) stores alike.
  */
final class ZarrSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("zarr source requires a path"))
    ZarrSource.schemaFor(path, Option(options.get("slot")).getOrElse("X"),
      Option(options.get("axes")))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("zarr source requires a path"))
    new ZarrTable(path, Option(properties.get("slot")).getOrElse("X"), schema)
  }
}

object ZarrSource {
  val Schema: StructType = StructType(Seq(
    StructField("obs_id", LongType, nullable = false),
    StructField("var_id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Axis columns: rank-2 keeps the anndata COO names; other ranks use
    * `axes` (or d0..dN-1).
    */
  def axisNames(rank: Int, axes: Option[String]): Seq[String] = axes match {
    case Some(a) =>
      val names = a.split(',').map(_.trim).toSeq
      require(names.size == rank, s"axes '$a' for rank-$rank slot")
      names
    case None if rank == 2 => Seq("obs_id", "var_id")
    case None => (0 until rank).map(d => s"d$d")
  }

  def schemaFor(path: String, slot: String, axes: Option[String]): StructType =
    if (ZarrFrame.isFrameSlot(path, slot))
      ZarrFrame.describe(path, slot).schema
    else if (ZarrStore.attrString(path, slot, "encoding-type").contains("csr_matrix"))
      Schema
    else {
      val za = ZarrStore.openArray(path, slot)
      StructType(axisNames(za.rank, axes).map(StructField(_, LongType, nullable = false)) :+
        StructField("value", DoubleType, nullable = false))
    }
}

final class ZarrTable(path: String, slot: String, tschema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"zarr:$path!$slot"
  override def schema(): StructType = tschema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path, slot, tschema,
      options.getLong("targetRowsPerTask", 1L << 20),
      options.getLong("targetElemsPerTask", 4L << 20))
}

final class ZarrScanBuilder(path: String, slot: String, tschema: StructType,
                            targetRows: Long = 1L << 20,
                            targetElems: Long = 4L << 20)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = tschema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Filters stay with Spark for re-evaluation; bounds prune chunks. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan =
    new ZarrScan(path, slot, tschema, required, H5adScanBuilder.bounds(pushed),
      targetRows, targetElems)
}

private final case class ZarrDenseChunkPartition(
    za: ZArray, axes: Array[String], coords: Array[Array[Int]]) extends InputPartition

private final case class ZarrCsrRangePartition(
    path: String, slot: String, r0: Long, r1: Long,
    e0: Long, e1: Long) extends InputPartition

final class ZarrScan(path: String, slot: String, tschema: StructType,
                     required: StructType,
                     colBounds: Map[String, (Long, Long)],
                     targetRows: Long = 1L << 20,
                     targetElems: Long = 4L << 20) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"zarr $path!$slot bounds=$colBounds cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    if (ZarrFrame.isFrameSlot(path, slot)) {
      // dataframe slot: row ranges pruned by pushed row-id bounds
      val info = ZarrFrame.describe(path, slot)
      val (lo, hi) = colBounds.getOrElse(info.rowIdName, (Long.MinValue, Long.MaxValue))
      val par = H5adScanBuilder.rangeCount(info.n, targetRows)
      val bounds = (0 to par).map(p => info.n * p / par).distinct
      bounds.zip(bounds.tail)
        .filter { case (r0, r1) => r1 > lo && r0 <= hi }
        .map { case (r0, r1) =>
          ZarrFrameRangePartition(path, slot, r0, r1,
            info.specs.toArray): InputPartition
        }.toArray
    } else if (ZarrStore.attrString(path, slot, "encoding-type").contains("csr_matrix")) {
      // csr: row ranges against indptr; pushed obs bounds prune ranges,
      // and each task's element span is fixed here so tasks touch only
      // their own data/indices chunks
      val (obsLo, obsHi) = colBounds.getOrElse("obs_id", (Long.MinValue, Long.MaxValue))
      val ptrZ = ZarrStore.openArray(path, s"$slot/indptr")
      val nRows = ptrZ.shape.head - 1
      val nnz = ZarrStore.openArray(path, s"$slot/data").shape.head
      // rows AND elements both size the plan: a few very dense rows
      // must not collapse into one task
      val par = math.max(
        H5adScanBuilder.rangeCount(nRows, targetRows).toLong,
        math.min(nRows, (nnz + targetElems - 1) / targetElems)).toInt
      val bounds = (0 to par).map(p => nRows * p / par).distinct
      val kept = bounds.zip(bounds.tail)
        .filter { case (r0, r1) => r1 > obsLo && r0 <= obsHi }
      // indptr values at the SURVIVING range boundaries only: O(par)
      // chunk-sliced reads, never a full O(store rows) driver decode
      val bvals = kept.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(b => b -> ptrZ.readLongs(b, b + 1)(0)).toMap
      kept.map { case (r0, r1) =>
        ZarrCsrRangePartition(path, slot, r0, r1,
          bvals(r0), bvals(r1)): InputPartition
      }.toArray
    } else {
      val za = ZarrStore.openArray(path, slot)
      val axes = tschema.fieldNames.dropRight(1) // value is last
      require(za.rank == axes.length, s"$slot: rank ${za.rank} vs schema $tschema")
      val axBounds = axes.map(a => colBounds.getOrElse(a, (Long.MinValue, Long.MaxValue)))
      val pruned = za.gridCoords.filter { c =>
        c.indices.forall { d =>
          val off = c(d).toLong * za.chunks(d)
          val (lo, hi) = axBounds(d)
          (off + za.chunks(d)) > lo && off <= hi
        }
      }
      // one partition per chunk object (pruning stays 1:1-observable);
      // tiny-chunk stores bundle up to 64 chunks per task
      val perTask = if (pruned.size <= 256) 1 else 64
      pruned.grouped(perTask)
        .map(g => ZarrDenseChunkPartition(za, axes,
          g.map(_.toArray).toArray): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrReaderFactory(required)
}

final class ZarrReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: ZarrDenseChunkPartition => new ZarrDenseChunkReader(p, required)
      case p: ZarrCsrRangePartition => new ZarrCsrRangeReader(p, required)
      case p: ZarrFrameRangePartition => new ZarrFrameRangeReader(p, required)
    }
}

private object ZProject {
  def row(required: StructType, i: Long, j: Long, v: Double): InternalRow = {
    val vals = required.fieldNames.map {
      case "obs_id" => java.lang.Long.valueOf(i)
      case "var_id" => java.lang.Long.valueOf(j)
      case "value" => java.lang.Double.valueOf(v)
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }
}

/** Rank-agnostic dense chunk reader: odometer over each chunk's clipped
  * extents, C-order strides into the decoded (full, padded) buffer.
  */
private final class ZarrDenseChunkReader(p: ZarrDenseChunkPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val za = p.za
  private val rank = za.rank
  // projection: for each required field, the axis index (or -1 = value)
  private val proj = required.fieldNames.map(f => p.axes.indexOf(f))
  private val strides = {
    val s = new Array[Int](rank)
    var acc = 1
    var d = rank - 1
    while (d >= 0) { s(d) = acc; acc *= za.chunks(d); d -= 1 }
    s
  }
  private var ci = -1
  private var buf: java.nio.ByteBuffer = _
  private var fillOnly = false
  private val offs = new Array[Long](rank)
  private val ext = new Array[Int](rank)
  private val pos = new Array[Int](rank)
  private var done = true

  private def loadNextChunk(): Boolean = {
    ci += 1
    if (ci >= p.coords.length) return false
    val coord = p.coords(ci)
    var d = 0
    while (d < rank) {
      offs(d) = coord(d).toLong * za.chunks(d)
      ext(d) = math.min(za.chunks(d).toLong, za.shape(d) - offs(d)).toInt
      pos(d) = 0
      d += 1
    }
    za.readChunk(coord.toSeq) match {
      case Some(dec) =>
        buf = java.nio.ByteBuffer.wrap(dec).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        fillOnly = false
      case None => fillOnly = true // absent object: whole chunk = fill
    }
    done = false
    true
  }

  /** Advance the odometer; returns false when the chunk is exhausted. */
  private def advance(): Boolean = {
    var d = rank - 1
    while (d >= 0) {
      pos(d) += 1
      if (pos(d) < ext(d)) return true
      pos(d) = 0
      d -= 1
    }
    false
  }

  private var first = true

  override def next(): Boolean = {
    if (done || (!first && !advance())) {
      if (!loadNextChunk()) return false
      first = true
    }
    first = false
    true
  }

  override def get(): InternalRow = {
    var k = 0
    var d = 0
    while (d < rank) { k += pos(d) * strides(d); d += 1 }
    val v = if (fillOnly) za.fillNum.getOrElse(0.0) else za.numAt(buf, k)
    val vals = new Array[Any](proj.length)
    var f = 0
    while (f < proj.length) {
      vals(f) =
        if (proj(f) < 0) java.lang.Double.valueOf(v)
        else java.lang.Long.valueOf(offs(proj(f)) + pos(proj(f)))
      f += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = ()
}

private final class ZarrCsrRangeReader(p: ZarrCsrRangePartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val (ptr, dataBuf, indBuf, dataZ, indZ) = {
    // only THIS task's indptr slice decodes (chunk-sliced read) —
    // indptr is axis-sized, and a full decode per task is O(store
    // rows) at the 10^8-row stores this source exists to serve
    val slice = ZarrStore.openArray(p.path, s"${p.slot}/indptr")
      .readLongs(p.r0, p.r1 + 1)
    val dz = ZarrStore.openArray(p.path, s"${p.slot}/data")
    val iz = ZarrStore.openArray(p.path, s"${p.slot}/indices")
    val d = java.nio.ByteBuffer.wrap(dz.readRange1d(p.e0, p.e1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ix = java.nio.ByteBuffer.wrap(iz.readRange1d(p.e0, p.e1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (slice, d, ix, dz, iz)
  }
  private val total = (p.e1 - p.e0).toInt
  private var k = -1
  private var row = 0 // local offset within [r0, r1)

  override def next(): Boolean = { k += 1; k < total }

  override def get(): InternalRow = {
    val elem = p.e0 + k
    while (ptr(row + 1) <= elem) row += 1
    ZProject.row(required, p.r0 + row, indZ.numAt(indBuf, k).toLong,
      dataZ.numAt(dataBuf, k))
  }

  override def close(): Unit = ()
}
