package graft.zarr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SpatialData-on-zarr open against the committed fixture
  * (`tools/gen_spatial_zarr.py` — closed forms in its header).
  */
class SpatialZarrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val root = "fixtures/zarr/spatial.zarr"

  test("detection: spatialdata_attrs at root, absent on plain anndata") {
    assert(SpatialZarr.isSpatial(root))
    assert(!SpatialZarr.isSpatial("fixtures/zarr/pbmc.zarr"))
  }

  test("tables surface matches the reference accessor: anndata per key") {
    val sd = SpatialZarr.open(spark, root)
    assert(sd.tables.keySet == Set("table"))
    val t = sd.tables("table")
    val rows = t.obs.orderBy("obs_id").collect()
    assert(rows.length == 150)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[String]("obs_name") == s"cell$i")
      assert(r.getAs[String]("region") == "cells")
      assert(r.getAs[Long]("n_spots") == (i * 11) % 40)
    }
    val x = t.x.agg(sum("value")).head().getDouble(0)
    val expect = (for {
      i <- 0 until 150; j <- 0 until 12 if (i * 3 + j * 7) % 11 == 0
    } yield ((i + j * 5) % 13) * 0.5).sum
    assert(math.abs(x - expect) < 1e-9)
  }

  test("points element: distributed parquet read with the NGFF attrs") {
    val sd = SpatialZarr.open(spark, root)
    val pts = sd.points("transcripts")
    assert(pts.count() == 2000)
    assert(pts.columns.toSet == Set("x", "y", "gene"))
    val perGene = pts.groupBy("gene").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGene.size == 25 && perGene.values.forall(_ == 80))
    // NGFF points attrs are preserved on the zarr side
    assert(ZarrStore.attrString(root, "points/transcripts", "encoding-type")
      .contains("ngff:points"))
  }

  test("NGFF image pyramid: axes, levels, chunk-parallel COO decode") {
    val sd = SpatialZarr.open(spark, root)
    val img = sd.images("cells")
    assert(img.axes == Seq("c", "y", "x") && img.nLevels == 2)
    assert(img.shape(0) == Seq(3L, 64L, 64L) && img.shape(1) == Seq(3L, 32L, 32L))
    val coo = img.coo(spark)
    assert(coo.columns.toSeq == Seq("c", "y", "x", "value"))
    assert(coo.count() == 3L * 64 * 64)
    assert(coo.rdd.getNumPartitions > 1, "chunk grid must distribute")
    val got = coo.groupBy("c").agg(sum("value").as("s")).orderBy("c").collect()
      .map(_.getDouble(1))
    val expect = (0 until 3).map(c =>
      (for (y <- 0 until 64; x <- 0 until 64)
        yield ((c * 31 + y * 7 + x * 3) % 256).toDouble).sum)
    got.zip(expect).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9) }
    // a pixel probe through the second pyramid level
    val p = img.coo(spark, 1)
      .filter(col("c") === 2 && col("y") === 5 && col("x") === 9)
      .head().getDouble(3)
    assert(p == (2 * 31 + 2 * 5 * 7 + 2 * 9 * 3) % 256)
  }

  test("curator bridge: tables:key:slot resolves on the NATIVE store") {
    val sd = SpatialZarr.open(spark, root)
    val md = SpatialZarr.toMuDataset(sd)
    val obs = graft.curate.MuDataCurator.resolveSlot(md, "tables:table:obs")
    assert(!obs.transposed && obs.df.count() == 150)
    val varT = graft.curate.MuDataCurator.resolveSlot(md, "tables:table:var.T")
    assert(varT.transposed && varT.df.count() == 12)
    // non-tabular elements keep the reference's explicit rejection
    val e = intercept[IllegalArgumentException] {
      graft.curate.MuDataCurator.resolveSlot(md, "images:cells")
    }
    assert(e.getMessage.contains("non-tabular"))
  }

  test("labels element: int decode, block structure") {
    val sd = SpatialZarr.open(spark, root)
    val lab = sd.labels("segmentation")
    assert(lab.axes == Seq("y", "x"))
    val coo = lab.coo(spark)
    assert(coo.select("value").distinct().count() == 64)
    val s = coo.agg(sum("value")).head().getDouble(0)
    val expect = (for (y <- 0 until 64; x <- 0 until 64)
      yield ((y / 8) * 8 + (x / 8)).toDouble).sum
    assert(math.abs(s - expect) < 1e-9)
  }
}
