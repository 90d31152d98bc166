package graft.curate

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.artifact.{ArtifactStore, MuBridge}
import graft.catalog.Catalog

/** Two-modality MuData fixture: modality-prefixed slot wiring + var.T
  * index validation (`MuDataCurator`, `curators/core.py:1255`;
  * `SpatialDataCurator`, `:1338`).
  */
class MuDataCuratorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val geneRegistry =
    Seq("ENSG01", "ENSG02", "ENSG03").toDF("ensembl_gene_id")
  private lazy val proteinRegistry =
    Seq("P001", "P002").toDF("uniprot_id")
  private lazy val cellTypeRegistry =
    Seq("T cell", "B cell").toDF("name")

  private def mdata(badGene: Boolean = false, badCellType: Boolean = false) = MuDataset(
    global = Map("obs" -> Seq(("c1", "s1"), ("c2", "s2")).toDF("cell_id", "sample")),
    modalities = Map(
      "rna" -> Map(
        "obs" -> Seq(("c1", if (badCellType) "Z cell" else "T cell"), ("c2", "B cell"))
          .toDF("cell_id", "cell_type"),
        "var" -> Seq(("ENSG01", "ACTB"), (if (badGene) "BOGUS" else "ENSG02", "GAPDH"))
          .toDF("gene_id", "symbol"),
        "X" -> Seq(("c1", "ENSG01", 1.0)).toDF("obs_id", "var_id", "value")),
      "protein" -> Map(
        "obs" -> Seq(("c1", 0.5), ("c2", 0.7)).toDF("cell_id", "intensity"),
        "var" -> Seq(("P001", "CD3"), ("P002", "CD19")).toDF("protein_id", "label"))))

  private def schema: Map[String, SlotSchema] = Map(
    "obs" -> ColumnsSpec(SchemaSpec(Seq(
      FeatureSpec("cell_id", "str", nullable = false),
      FeatureSpec("sample", "str", nullable = false)))),
    "rna:obs" -> ColumnsSpec(SchemaSpec(Seq(
      FeatureSpec("cell_type", "cat", catRegistry = Some((cellTypeRegistry, "name")))))),
    "rna:var.T" -> IndexSpec("gene_id", geneRegistry, "ensembl_gene_id"),
    "protein:var.T" -> IndexSpec("protein_id", proteinRegistry, "uniprot_id"))

  test("two-modality fixture validates per-modality specs") {
    val reports = MuDataCurator.validate(mdata(), schema)
    assert(reports.map(_.slot) === Seq("obs", "protein:var.T", "rna:obs", "rna:var.T"))
    assert(MuDataCurator.passed(reports))
  }

  test("a bad var index fails only its own transposed slot") {
    val reports = MuDataCurator.validate(mdata(badGene = true), schema)
    val byName = reports.map(r => r.slot -> r.report).toMap
    assert(!byName("rna:var.T").passed)
    assert(byName("rna:var.T").issues.map(_.detail) === Seq("BOGUS"))
    assert(byName("protein:var.T").passed && byName("rna:obs").passed && byName("obs").passed)
  }

  test("categorical slot failure stays modality-scoped") {
    val reports = MuDataCurator.validate(mdata(badCellType = true), schema)
    val byName = reports.map(r => r.slot -> r.report).toMap
    assert(!byName("rna:obs").passed)
    assert(byName("rna:var.T").passed)
  }

  test("unknown modality / slot / format raise like InvalidArgument") {
    val m = mdata()
    val e1 = intercept[IllegalArgumentException](MuDataCurator.resolveSlot(m, "atac:obs"))
    assert(e1.getMessage.contains("Modality 'atac' not found"))
    val e2 = intercept[IllegalArgumentException](MuDataCurator.resolveSlot(m, "rna:uns"))
    assert(e2.getMessage.contains("'uns' not found on modality 'rna'"))
    val e3 = intercept[IllegalArgumentException](
      MuDataCurator.validate(m, Map("rna:var.T" -> schema("rna:obs"))))
    assert(e3.getMessage.contains("IndexSpec"))
  }

  test("non-tabular SpatialData slots are rejected with an explicit out-of-scope error") {
    val m = mdata()
    Seq("images:hires", "shapes:cells:geometry", "points:transcripts", "labels:segmentation")
      .foreach { key =>
        val e = intercept[IllegalArgumentException](MuDataCurator.resolveSlot(m, key))
        assert(e.getMessage.contains("non-tabular SpatialData element"), s"key=$key: ${e.getMessage}")
        assert(e.getMessage.contains("out of engine scope"), s"key=$key")
      }
  }

  test("SpatialData grammar: tables:key:slot and attrs:key resolve") {
    val m = mdata()
    // tables:rna:var.T is the 3-part SpatialData form of rna:var.T
    val r = MuDataCurator.validate(m,
      Map("tables:rna:var.T" -> IndexSpec("gene_id", geneRegistry, "ensembl_gene_id")))
    assert(MuDataCurator.passed(r))
    assert(MuDataCurator.resolveSlot(m, "attrs:obs").df.columns.contains("sample"))
    val e = intercept[IllegalArgumentException](MuDataCurator.resolveSlot(m, "tables:na:obs"))
    assert(e.getMessage.contains("Table 'na' not found"))
  }

  test("MuBridge ingest/open round-trip preserves the modality tree") {
    val root = TestSpark.tmpDir("mu")
    val store = new ArtifactStore(Catalog.deterministic(spark, root))
    val a = MuBridge.ingest(store, mdata(), "multi/pbmc", root)
    assert(a("otype") === "MuData")
    assert(a("n_observations") === 2L)
    val back = MuBridge.open(store, a("uid").toString)
    assert(back.global.keySet === Set("obs"))
    assert(back.modalities.keySet === Set("rna", "protein"))
    assert(back.modalities("rna").keySet === Set("obs", "var", "X"))
    assert(back.modalities("rna")("var").count() === 2)
    // validated the same way after the round-trip
    assert(MuDataCurator.passed(MuDataCurator.validate(back, schema)))
    // content-hash idempotent, like every constructor
    val a2 = MuBridge.ingest(store, mdata(), "multi/pbmc", root)
    assert(a2("uid") === a("uid"))
  }
}
