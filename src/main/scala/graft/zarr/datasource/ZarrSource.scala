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
  *    `obs_id`/`var_id` skip chunk OBJECTS whose grid offsets cannot
  *    intersect, before any byte is read (and with a directory store
  *    that also means those objects are never even opened);
  *  - **column pruning** — only projected fields materialize.
  */
final class ZarrSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("zarr source requires a path"))
    new ZarrTable(path, Option(properties.get("slot")).getOrElse("X"))
  }
}

object ZarrSource {
  val Schema: StructType = StructType(Seq(
    StructField("obs_id", LongType, nullable = false),
    StructField("var_id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))
}

final class ZarrTable(path: String, slot: String) extends Table with SupportsRead {
  override def name(): String = s"zarr:$path!$slot"
  override def schema(): StructType = ZarrSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path, slot)
}

final class ZarrScanBuilder(path: String, slot: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = ZarrSource.Schema
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
    new ZarrScan(path, slot, required, H5adScanBuilder.bounds(pushed))
}

private final case class ZarrDenseChunkPartition(
    za: ZArray, coords: Array[Array[Int]]) extends InputPartition

private final case class ZarrCsrRangePartition(
    path: String, slot: String, r0: Long, r1: Long,
    e0: Long, e1: Long) extends InputPartition

final class ZarrScan(path: String, slot: String, required: StructType,
                     colBounds: Map[String, (Long, Long)]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"zarr $path!$slot bounds=$colBounds cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val (obsLo, obsHi) = colBounds.getOrElse("obs_id", (Long.MinValue, Long.MaxValue))
    val (varLo, varHi) = colBounds.getOrElse("var_id", (Long.MinValue, Long.MaxValue))
    if (ZarrStore.attrString(path, slot, "encoding-type").contains("csr_matrix")) {
      // csr: row ranges against indptr; pushed obs bounds prune ranges,
      // and each task's element span is fixed here so tasks touch only
      // their own data/indices chunks
      val indptr = ZarrStore.openArray(path, s"$slot/indptr").readFlat()
        .map(_.asInstanceOf[Long]).toArray
      val nRows = indptr.length - 1
      val par = math.max(1, math.min(nRows, 32L)).toInt
      val bounds = (0 to par).map(p => nRows.toLong * p / par).distinct
      bounds.zip(bounds.tail)
        .filter { case (r0, r1) => r1 > obsLo && r0 <= obsHi }
        .map { case (r0, r1) =>
          ZarrCsrRangePartition(path, slot, r0, r1,
            indptr(r0.toInt), indptr(r1.toInt)): InputPartition
        }.toArray
    } else {
      val za = ZarrStore.openArray(path, slot)
      require(za.rank == 2, s"$slot: dense zarr slot must be rank 2")
      val pruned = za.gridCoords.filter { c =>
        val r0 = c(0).toLong * za.chunks(0); val c0 = c(1).toLong * za.chunks(1)
        (r0 + za.chunks(0)) > obsLo && r0 <= obsHi &&
          (c0 + za.chunks(1)) > varLo && c0 <= varHi
      }
      // one partition per chunk object (pruning stays 1:1-observable);
      // tiny-chunk stores bundle up to 64 chunks per task
      val perTask = if (pruned.size <= 256) 1 else 64
      pruned.grouped(perTask)
        .map(g => ZarrDenseChunkPartition(za, g.map(_.toArray).toArray): InputPartition)
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

private final class ZarrDenseChunkReader(p: ZarrDenseChunkPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val za = p.za
  private var ci = -1
  private var buf: java.nio.ByteBuffer = _
  private var fillOnly = false
  private var rOff, cOff = 0L
  private var rows, cols = 0
  private var r = 0
  private var c = -1

  private def loadNextChunk(): Boolean = {
    ci += 1
    if (ci >= p.coords.length) return false
    val coord = p.coords(ci)
    rOff = coord(0).toLong * za.chunks(0)
    cOff = coord(1).toLong * za.chunks(1)
    rows = math.min(za.chunks(0).toLong, za.shape(0) - rOff).toInt
    cols = math.min(za.chunks(1).toLong, za.shape(1) - cOff).toInt
    za.readChunk(coord.toSeq) match {
      case Some(dec) =>
        buf = java.nio.ByteBuffer.wrap(dec).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        fillOnly = false
      case None => fillOnly = true // absent object: whole chunk = fill
    }
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
    val v = if (fillOnly) za.fillNum.getOrElse(0.0)
    else za.numAt(buf, r * za.chunks(1) + c)
    ZProject.row(required, rOff + r, cOff + c, v)
  }

  override def close(): Unit = ()
}

private final class ZarrCsrRangeReader(p: ZarrCsrRangePartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val (ptr, dataBuf, indBuf, dataZ, indZ) = {
    val indptr = ZarrStore.openArray(p.path, s"${p.slot}/indptr").readFlat()
      .map(_.asInstanceOf[Long]).toArray
    val dz = ZarrStore.openArray(p.path, s"${p.slot}/data")
    val iz = ZarrStore.openArray(p.path, s"${p.slot}/indices")
    val d = java.nio.ByteBuffer.wrap(dz.readRange1d(p.e0, p.e1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ix = java.nio.ByteBuffer.wrap(iz.readRange1d(p.e0, p.e1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (indptr, d, ix, dz, iz)
  }
  private val total = (p.e1 - p.e0).toInt
  private var k = -1
  private var row = p.r0.toInt

  override def next(): Boolean = { k += 1; k < total }

  override def get(): InternalRow = {
    val elem = p.e0 + k
    while (ptr(row + 1) <= elem) row += 1
    ZProject.row(required, row.toLong, indZ.numAt(indBuf, k).toLong,
      dataZ.numAt(dataBuf, k))
  }

  override def close(): Unit = ()
}
