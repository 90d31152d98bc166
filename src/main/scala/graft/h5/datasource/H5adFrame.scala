package graft.h5.datasource

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.h5._

/** DSv2 support for anndata `dataframe` slots (`obs`, `var`, `raw/var`):
  * `spark.read.format("h5ad").option("slot", "obs")`.
  *
  * This closes the one driver-side read path left in the HDF5 data
  * plane: `AnnH5.open` decodes axis frames on the driver (the
  * reference's h5py in-memory contract), which is fine for metadata-
  * sized frames but not for a 10^8-cell atlas. Here the frame reads
  * like any other table:
  *  - **schema from the dataframe encoding** (`_index` + `column-order`
  *    attrs; vlen/fixed strings → string, floats → double, ints/enums →
  *    long, categorical groups → string);
  *  - **partition planning = row ranges** pruned by pushed bounds on
  *    the row-id column before any byte is read;
  *  - **column pruning is physical** — only projected columns' chunks
  *    are ever read, each task decoding its own `[r0, r1)` element
  *    slice (chunked, contiguous, and compact layouts).
  */
object H5adFrame {

  /** One frame column: `kind` ∈ f(loat)/i(nt)/s(tring)/c(ategorical). */
  final case class ColSpec(outName: String, dsPath: String, kind: Char)
      extends Serializable

  final case class FrameInfo(n: Long, rowIdName: String,
                             specs: Seq[ColSpec], schema: StructType)

  def isFrameSlot(f: H5File, slot: String): Boolean =
    f(slot) match {
      case g: H5Group => f.attrString(g, "encoding-type").contains("dataframe")
      case _ => false
    }

  /** Axis naming mirrors [[graft.h5.AnnH5.open]]: var frames key by
    * var_id/var_name, everything else by obs_id/obs_name.
    */
  private def axisNames(slot: String): (String, String) =
    if (slot == "var" || slot.endsWith("/var")) ("var_id", "var_name")
    else ("obs_id", "obs_name")

  def describe(f: H5File, slot: String): FrameInfo = {
    val g = f.group(slot)
    require(f.attrString(g, "encoding-type").contains("dataframe"),
      s"$slot: not an anndata dataframe group")
    val (rowIdName, idName) = axisNames(slot)
    val indexCol = f.attrString(g, "_index").getOrElse("_index")
    val order = f.attrStrings(g, "column-order").getOrElse(
      g.children.keys.filter(_ != indexCol).toSeq.sorted)
    val n = f.node(g.children(indexCol), indexCol)
      .asInstanceOf[H5DatasetMeta].dims(0)
    val specs = (indexCol +: order.filter(g.children.contains)).map { nm =>
      val outName = if (nm == indexCol) idName else nm
      f.node(g.children(nm), nm) match {
        case d: H5DatasetMeta => d.dtype match {
          case H5Dtype.VlenStr() | H5Dtype.FixedStr(_) =>
            ColSpec(outName, s"$slot/$nm", 's')
          case H5Dtype.FloatPt(_) => ColSpec(outName, s"$slot/$nm", 'f')
          case _ => ColSpec(outName, s"$slot/$nm", 'i')
        }
        case gg: H5Group if f.attrString(gg, "encoding-type").contains("categorical") =>
          ColSpec(outName, s"$slot/$nm", 'c')
        case gg: H5Group => throw new UnsupportedOperationException(
          s"dataframe column '$slot/$nm' has unsupported encoding " +
            f.attrString(gg, "encoding-type").getOrElse("<none>"))
      }
    }
    val fields = StructField(rowIdName, LongType, nullable = false) +:
      specs.map(s => StructField(s.outName, s.kind match {
        case 'f' => DoubleType
        case 'i' => LongType
        case _ => StringType
      }, nullable = true))
    FrameInfo(n, rowIdName, specs, StructType(fields))
  }

  /** Raw bytes of elements `[e0, e1)` of a 1-D dataset — chunked reads
    * touch only overlapping chunks; compact/contiguous slice directly.
    */
  def sliceBytes(f: H5File, inp: H5Input, ds: H5DatasetMeta,
                 e0: Long, e1: Long): Array[Byte] = {
    val esize = ds.dtype.size
    ds.layout match {
      case H5Layout.Contiguous(addr, _) =>
        inp.readFully(addr + e0 * esize, ((e1 - e0) * esize).toInt)
      case H5Layout.Compact(data) =>
        java.util.Arrays.copyOfRange(data, (e0 * esize).toInt, (e1 * esize).toInt)
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
    }
  }
}

private final case class FrameRangePartition(
    path: String, slot: String, r0: Long, r1: Long,
    specs: Array[H5adFrame.ColSpec]) extends InputPartition

/** Decodes its row range of each projected column, emits one row per
  * axis index. Column payload stays bounded by (range × projected
  * columns); nothing else is materialized.
  */
private final class FrameRangeReader(p: FrameRangePartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val inp = H5Input.open(p.path)
  private val file = H5File.open(p.path)

  private val byName: Map[String, Int => Any] = {
    p.specs.filter(s => required.fieldNames.contains(s.outName)).map { s =>
      val get: Int => Any = s.kind match {
        case 'c' =>
          val g = file.group(s.dsPath)
          val codesDs = file.node(g.children("codes"), "codes").asInstanceOf[H5DatasetMeta]
          val catsDs = file.node(g.children("categories"), "categories").asInstanceOf[H5DatasetMeta]
          val codes = file.decodeLongs(codesDs.dtype,
            H5adFrame.sliceBytes(file, inp, codesDs, p.r0, p.r1))
          // categories are the distinct values — dictionary-sized, full read
          val cats = file.decodeStrings(catsDs.dtype, file.readRaw(catsDs))
            .map(UTF8String.fromString)
          i => { val c = codes(i); if (c < 0) null else cats(c.toInt) }
        case kind =>
          val ds = file.dataset(s.dsPath)
          val raw = H5adFrame.sliceBytes(file, inp, ds, p.r0, p.r1)
          kind match {
            case 'f' => val v = file.decodeDoubles(ds.dtype, raw); i => v(i)
            case 'i' => val v = file.decodeLongs(ds.dtype, raw); i => v(i)
            case _ =>
              val v = file.decodeStrings(ds.dtype, raw).map(UTF8String.fromString)
              i => v(i)
          }
      }
      s.outName -> get
    }.toMap
  }

  private var i = -1

  override def next(): Boolean = { i += 1; p.r0 + i < p.r1 }

  override def get(): InternalRow = {
    // any required field without a column spec is the synthesized row id
    val vals = required.fieldNames.map { n =>
      byName.get(n) match {
        case Some(get) => get(i)
        case None => java.lang.Long.valueOf(p.r0 + i)
      }
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = { file.close(); inp.close() }
}
