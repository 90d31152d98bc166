package graft.zarr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Native zarr v2 reader against the committed fixture.
  *
  * The fixture (`tools/gen_zarr.py`, written from the public zarr v2 +
  * c-blosc chunk specs with its own from-scratch LZ4/blosc encoder)
  * carries closed-form content, so every assertion pins the Scala
  * decode against arithmetic, not against the encoder:
  *   n_obs=300, n_var=40
  *   obs: _index 'cell{i}', cell_type cat 'type_{i%4}',
  *        n_genes (i*7)%50, score ((i*3)%11)*0.25
  *   var: _index 'gene{j}', highly_variable (j%3==0), null compressor
  *   X csr (split+shuffle lz4): mask (i*5+j*11)%23==0,
  *        value ((i*2+j*13)%19)*0.5
  *   layers/log dense (64,16)-chunked: ((i*17+j*3)%29)*0.25
  *   obsm/X_pca (zlib): ((i*13+k*7)%37)*0.5
  *   uns: n_bins=42 scalar, method='zheng17', rank f8[8] chunks(5)
  *        with chunk 1 ABSENT -> fill 9.0, flat memcpy [k*0.5]
  */
class ZarrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val root = "fixtures/zarr/pbmc.zarr"
  private val nObs = 300
  private val nVar = 40

  private def xmask(i: Int, j: Int) = (i * 5 + j * 11) % 23 == 0
  private def xval(i: Int, j: Int) = ((i * 2 + j * 13) % 19) * 0.5

  // ---- blosc chunk decode against the committed fixture bytes (the
  // decoder's only other exerciser is the generator's mirror encoder)

  test("blosc: split+shuffle lz4 chunk (X/data chunk 0) decodes to closed form") {
    val za = ZarrStore.openArray(root, "X/data")
    assert(za.compressor == "blosc" && za.dtype == "<f8")
    val dec = za.readChunk(Seq(0)).get
    val b = java.nio.ByteBuffer.wrap(dec).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val expected = (for {
      i <- 0 until nObs; j <- 0 until nVar if xmask(i, j)
    } yield xval(i, j)).take(256)
    expected.zipWithIndex.foreach { case (v, k) => assert(b.getDouble(k * 8) == v) }
  }

  test("blosc: unsplit lz4 (vlen-utf8 strings) and zlib and memcpy chunks decode") {
    // obs/_index: object dtype -> typesize 1 -> unsplit lz4 stream
    val idx = ZarrStore.openArray(root, "obs/_index").readFlat()
    assert(idx.length == nObs)
    (0 until nObs).foreach(i => assert(idx(i) == s"cell$i"))
    // obsm/X_pca: plain-zlib compressor path
    val pca = ZarrStore.openArray(root, "obsm/X_pca")
    assert(pca.compressor == "zlib")
    val c0 = pca.readChunk(Seq(0, 0)).get
    val pb = java.nio.ByteBuffer.wrap(c0).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until 100; k <- 0 until 5)
      assert(pb.getDouble((i * 5 + k) * 8) == ((i * 13 + k * 7) % 37) * 0.5)
    // uns/flat: blosc memcpy flag (payload raw after the 16-byte header)
    val flat = ZarrStore.openArray(root, "uns/flat").readFlat()
    assert(flat == (0 until 6).map(_ * 0.5))
  }

  test("absent chunk yields fill_value; null compressor reads raw") {
    val rank = ZarrStore.openArray(root, "uns/rank").readFlat()
    val expected = (0 until 8).map(k => if (k < 5) (k * 5 % 13) * 0.5 else 9.0)
    assert(rank == expected)
    val hv = ZarrStore.openArray(root, "var/highly_variable")
    assert(hv.compressor == "none")
    assert(hv.readFlat() == (0 until nVar).map(j => if (j % 3 == 0) 1L else 0L))
  }

  // ---- anndata open over the store

  test("obs frame: vlen index, categorical decode, i8 + f8 columns") {
    val ds = AnnZarr.open(spark, root)
    val rows = ds.obs.orderBy("obs_id").collect()
    assert(rows.length == nObs)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[String]("obs_name") == s"cell$i")
      assert(r.getAs[String]("cell_type") == s"type_${i % 4}")
      assert(r.getAs[Long]("n_genes") == (i * 7) % 50)
      assert(r.getAs[Double]("score") == ((i * 3) % 11) * 0.25)
    }
    assert(ds.vars.count() == nVar)
  }

  test("csr X decodes to the closed-form COO") {
    val ds = AnnZarr.open(spark, root)
    val got = ds.x.orderBy("obs_id", "var_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = (for {
      i <- 0 until nObs; j <- 0 until nVar if xmask(i, j)
    } yield (i.toLong, j.toLong, xval(i, j))).toArray
    assert(got.sameElements(expected))
  }

  test("dense multi-chunk layer clips edge chunks and covers the grid") {
    val ds = AnnZarr.open(spark, root)
    val log = ds.layers("log")
    assert(log.count() == nObs.toLong * nVar)
    val probe = log.filter(col("obs_id") === 299 && col("var_id") === 39)
      .head().getDouble(2)
    assert(probe == ((299 * 17 + 39 * 3) % 29) * 0.25)
    val total = log.agg(sum("value")).head().getDouble(0)
    val expected = (for (i <- 0 until nObs; j <- 0 until nVar)
      yield ((i * 17 + j * 3) % 29) * 0.25).sum
    assert(math.abs(total - expected) < 1e-6)
  }

  test("uns tree: scalars, fill-padded array, memcpy array") {
    import graft.artifact.UnsValue._
    val ds = AnnZarr.open(spark, root)
    assert(ds.uns("n_bins") == Scalar(42L))
    assert(ds.uns("method") == Scalar("zheng17"))
    val Arr(rank) = ds.uns("rank"): @unchecked
    assert(rank == (0 until 8).map(k => if (k < 5) (k * 5 % 13) * 0.5 else 9.0))
    assert(ds.uns("flat") == Arr((0 until 6).map(_ * 0.5)))
  }

  test("obsm zlib matrix distributes and sums to the closed form") {
    val ds = AnnZarr.open(spark, root)
    val pca = ds.obsm("X_pca")
    assert(pca.columns.toSeq == Seq("obs_id", "dim_id", "value"))
    val total = pca.agg(sum("value")).head().getDouble(0)
    val expected = (for (i <- 0 until nObs; k <- 0 until 5)
      yield ((i * 13 + k * 7) % 37) * 0.5).sum
    assert(math.abs(total - expected) < 1e-6)
  }

  test("subsetObs/perVarStats compose over the zarr-backed dataset") {
    val ds = AnnZarr.open(spark, root)
    val stats = ds.subsetObs(col("n_genes") < 25)
      .subsetVars(col("highly_variable") === 1)
      .perVarStats.orderBy("var_name").collect()
    val byVar = (for {
      i <- 0 until nObs if (i * 7) % 50 < 25
      j <- 0 until nVar if j % 3 == 0 && xmask(i, j)
    } yield (j, xval(i, j))).groupBy(_._1)
    stats.foreach { r =>
      val j = r.getAs[Long]("var_id").toInt
      assert(r.getAs[String]("var_name") == s"gene$j")
      assert(r.getAs[Long]("n_obs") == byVar(j).size)
      assert(math.abs(r.getAs[java.math.BigDecimal]("sum_value").doubleValue() -
        byVar(j).map(_._2).sum) < 1e-6)
    }
    assert(stats.map(_.getAs[Long]("var_id").toInt).toSet == byVar.keySet)
  }
}
