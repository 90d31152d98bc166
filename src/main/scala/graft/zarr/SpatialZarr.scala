package graft.zarr

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.artifact.AnnDataset

/** Native SpatialData-on-zarr open — the spatialdata package's public
  * store layout: a zarr store whose root attrs carry `spatialdata_attrs`
  * (the exact detection key the reference uses,
  * `core/storage/_backed_access.py:118-121`), with element groups
  * `tables/` (anndata), `points/` (NGFF points: a parquet dataset +
  * zarr attrs), `images/` and `labels/` (NGFF multiscales pyramids).
  *
  * The reference's `SpatialDataAccessor` exposes ONLY `tables`
  * (`_spatialdata_accessor.py:39-63`); this opener matches that surface
  * and extends it with the other elements, because at engine scale they
  * are the heavy ones: points are already parquet (Spark reads them
  * distributed with pushdown for free), and image pyramids are plain
  * zarr arrays the chunk-parallel reader serves executor-side. Works on
  * v2 and v3 stores alike (everything routes through [[ZarrStore]]).
  */
object SpatialZarr {

  /** One NGFF multiscales element: named axes + one [[ZArray]] per
    * pyramid level (level 0 = full resolution). Serializable metadata;
    * pixel decode happens in executor tasks via [[coo]].
    */
  final case class ImagePyramid(name: String, axes: Seq[String], levels: Seq[ZArray]) {
    def nLevels: Int = levels.size
    def shape(level: Int): Seq[Long] = levels(level).shape

    /** Level as distributed COO — one axis column per NGFF axis plus
      * `value`; tasks decode their own chunk objects (rank-agnostic
      * generalization of [[AnnZarr.denseCoo]]).
      */
    def coo(spark: SparkSession, level: Int = 0): DataFrame =
      SpatialZarr.imageCoo(spark, levels(level), axes)
  }

  /** The opened store: reference surface (`tables`) + engine extensions. */
  final case class SpatialDataset(tables: Map[String, AnnDataset],
                                  points: Map[String, DataFrame],
                                  images: Map[String, ImagePyramid],
                                  labels: Map[String, ImagePyramid])

  /** The reference's detection rule: root attrs carry `spatialdata_attrs`. */
  def isSpatial(path: String): Boolean =
    ZarrStore.attrs(path, "").exists(_.has("spatialdata_attrs"))

  private def pyramid(path: String, rel: String, name: String): ImagePyramid = {
    val ms = ZarrStore.attrs(path, rel)
      .flatMap(a => Option(a.get("multiscales"))).filter(_.isArray)
      .map(_.get(0))
      .getOrElse(sys.error(s"$rel: no NGFF multiscales metadata"))
    val axes = Option(ms.get("axes")).filter(_.isArray)
      .map(a => (0 until a.size).map(a.get(_).get("name").asText))
      .getOrElse(Nil)
    val levels = Option(ms.get("datasets")).filter(_.isArray)
      .map(d => (0 until d.size).map(d.get(_).get("path").asText))
      .getOrElse(Nil)
      .map(p => ZarrStore.openArray(path, s"$rel/$p"))
    require(levels.nonEmpty, s"$rel: multiscales with no datasets")
    require(axes.size == levels.head.rank,
      s"$rel: ${axes.size} axes for rank-${levels.head.rank} data")
    ImagePyramid(name, axes, levels)
  }

  /** Open a spatialdata store. `tables` mirrors the reference accessor;
    * `points` are the element parquet datasets read distributed;
    * `images`/`labels` are NGFF pyramids.
    */
  def open(spark: SparkSession, path: String): SpatialDataset = {
    require(isSpatial(path),
      s"$path: root attrs carry no spatialdata_attrs — not a SpatialData store")
    def names(kind: String): Seq[String] = ZarrStore.children(path, kind)
    SpatialDataset(
      tables = names("tables").map(t =>
        t -> AnnZarr.open(spark, path, s"tables/$t")).toMap,
      points = names("points").map { p =>
        p -> spark.read.parquet(s"$path/points/$p/points.parquet")
      }.toMap,
      images = names("images").map(i =>
        i -> pyramid(path, s"images/$i", i)).toMap,
      labels = names("labels").map(l =>
        l -> pyramid(path, s"labels/$l", l)).toMap)
  }

  /** Bridge an opened store into the curator surface: each table
    * becomes a modality of slot frames (`tables:key:obs` /
    * `tables:key:var` / `tables:key:var.T` resolve through
    * [[graft.curate.MuDataCurator.resolveSlot]] exactly like the
    * reference's `SpatialDataCurator` slot grammar,
    * `curators/core.py:1338`). Non-tabular elements (images / points /
    * labels) stay out of the curator by the same explicit rejection.
    */
  def toMuDataset(sd: SpatialDataset): graft.curate.MuDataset =
    graft.curate.MuDataset(
      modalities = sd.tables.map { case (name, t) =>
        name -> Map("obs" -> t.obs, "var" -> t.vars)
      })

  /** Rank-N dense array as distributed COO `(axis..., value)` — one task
    * bundle per chunk set; absent chunks emit fill_value, edge chunks
    * clip to shape.
    */
  def imageCoo(spark: SparkSession, za: ZArray, axes: Seq[String]): DataFrame = {
    require(za.rank == axes.size, s"${za.rel}: rank ${za.rank} vs axes $axes")
    val schema = StructType(
      axes.map(StructField(_, LongType, nullable = false)) :+
        StructField("value", DoubleType, nullable = false))
    val coords = za.gridCoords
    val slices = math.max(1, math.min(coords.size,
      spark.sparkContext.defaultParallelism))
    val rank = za.rank
    val rdd = spark.sparkContext.parallelize(coords, slices).flatMap { coord =>
      val offs = Array.tabulate(rank)(d => coord(d).toLong * za.chunks(d))
      val ext = Array.tabulate(rank)(d =>
        math.min(za.chunks(d).toLong, za.shape(d) - offs(d)).toInt)
      // C-order strides over the FULL (padded) chunk buffer
      val strides = new Array[Int](rank)
      var acc = 1
      var d = rank - 1
      while (d >= 0) { strides(d) = acc; acc *= za.chunks(d); d -= 1 }
      val dec = za.readChunk(coord.toSeq)
      val buf = dec.map(b => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN))
      val fv = za.fillNum.getOrElse(0.0)
      val n = ext.product
      Iterator.range(0, n).map { cell =>
        val idx = new Array[Any](rank + 1)
        var rem = cell
        var k = 0
        var d2 = rank - 1
        while (d2 >= 0) {
          val i = rem % ext(d2)
          rem /= ext(d2)
          idx(d2) = offs(d2) + i
          k += i * strides(d2)
          d2 -= 1
        }
        idx(rank) = buf.map(za.numAt(_, k)).getOrElse(fv)
        Row.fromSeq(idx.toIndexedSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
