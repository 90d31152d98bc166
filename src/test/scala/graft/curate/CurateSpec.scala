package graft.curate

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Scenario names mirror the reference's mini_immuno error variants
  * (`lamindb/examples/datasets/mini_immuno.py:69-110`).
  */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val cellTypes = Seq(
    ("B cell", "B-cell|B lymphocyte"),
    ("CD8-positive alpha-beta T cell", "CD8+ T cell"),
    ("T cell", null)
  ).toDF("name", "synonyms")

  private lazy val perturbations = Seq(("DMSO", null), ("IFNG", null))
    .toDF("name", "synonyms").as("perturbations")

  test("validate: happy path all validated") {
    val vals = Seq("DMSO", "IFNG", "DMSO").toDF("value")
    val r = Curate.validate(vals, "value", perturbations, "name")
    assert(r.filter(col("validated")).count() === 3)
  }

  test("with_typo: unknown label IFNJ reported non-validated") {
    val vals = Seq("DMSO", "IFNJ").toDF("value")
    val r = Curate.inspect(vals, "value", perturbations, "name", None)
    assert(r.validated.count() === 1)
    assert(r.nonValidated.select("value").as[String].collect().toSeq === Seq("IFNJ"))
  }

  test("with_cell_type_synonym: 'B-cell' flagged as synonym match, standardize fixes it") {
    val vals = Seq("B-cell", "T cell").toDF("value")
    val ins = Curate.inspect(vals, "value", cellTypes, "name")
    assert(ins.validated.select("value").as[String].collect().toSeq === Seq("T cell"))
    assert(ins.synonymMatches.select("value").as[String].collect().toSeq === Seq("B-cell"))
    val std = Curate.standardize(vals, "value", cellTypes, "name")
      .select("standardized").as[String].collect().sorted
    assert(std.toSeq === Seq("B cell", "T cell"))
  }

  test("standardize: canonical beats synonym, unknown passes through, case-insensitive option") {
    val vals = Seq("b-cell", "ATLANTIS").toDF("value")
    val ci = Curate.standardize(vals, "value", cellTypes, "name", caseSensitive = false)
      .select("value", "standardized").as[(String, String)].collect().toMap
    assert(ci("b-cell") === "B cell")
    assert(ci("ATLANTIS") === "ATLANTIS")
  }

  test("from_values: existing vs creatable split, synonym-aware, no silent creation") {
    val vals = Seq("B-cell", "T cell", "plasma cell").toDF("value")
    val r = Curate.fromValues(vals, "value", cellTypes, "name")
    assert(r.existing.select("name").as[String].collect().sorted.toSeq ===
      Seq("B cell", "T cell"))
    assert(r.creatable.select("value").as[String].collect().toSeq === Seq("plasma cell"))
  }

  test("public-source fallback: inspect partitions public-hit vs truly-unknown, from_values creates from public") {
    // fresh instance knows only B cell; the public ontology knows all
    // three cell types (+ synonyms); 'astrocyte' is unknown everywhere
    val instance = cellTypes.filter($"name" === "B cell")
    val vals = Seq("B cell", "B-cell", "T cell", "CD8+ T cell", "astrocyte").toDF("value")

    val buckets = Curate.inspectBucketsWithPublic(vals, "value",
        instance, "name", cellTypes, "name")
      .select("value", "bucket").as[(String, String)].collect().toMap
    assert(buckets("B cell") === "validated")
    assert(buckets("B-cell") === "synonym_match") // instance synonym wins over public
    assert(buckets("T cell") === "public_hit")
    assert(buckets("CD8+ T cell") === "public_hit") // via public synonym
    assert(buckets("astrocyte") === "nonvalidated")

    val r = Curate.fromValuesWithPublic(vals, "value", instance, "name", cellTypes, "name")
    assert(r.existing.select("name").as[String].collect().toSet === Set("B cell"))
    // fromPublic returns the PUBLIC ROWS to create, canonicalized
    assert(r.fromPublic.select("name").as[String].collect().toSet ===
      Set("T cell", "CD8-positive alpha-beta T cell"))
    assert(r.creatable.select("value").as[String].collect().toSet === Set("astrocyte"))

    // without a public source the same values fall back to plain creatable
    val plain = Curate.fromValues(vals, "value", instance, "name")
    assert(plain.creatable.select("value").as[String].collect().toSet ===
      Set("T cell", "CD8+ T cell", "astrocyte"))
  }

  test("schema validation: happy path passes") {
    val df = Seq((1.0, 2.0, "DMSO"), (3.0, 4.0, "IFNG"))
      .toDF("CD8A", "CD4", "perturbation")
    val spec = SchemaSpec(Seq(
      FeatureSpec("CD8A", "num", nullable = false),
      FeatureSpec("CD4", "num", nullable = false),
      FeatureSpec("perturbation", "cat[ULabel]",
        catRegistry = Some((perturbations.toDF, "name")))))
    val report = SchemaValidator.validate(df, spec)
    assert(report.passed, report.issues.toString)
  }

  test("with_gene_typo: strict schema flags unexpected column") {
    val df = Seq((1.0, "DMSO")).toDF("GeneTypo", "perturbation")
    val spec = SchemaSpec(Seq(
      FeatureSpec("CD8A", "num"), FeatureSpec("perturbation", "cat[ULabel]")),
      maximalSet = true)
    val report = SchemaValidator.validate(df, spec)
    assert(!report.passed)
    assert(report.issues.exists(i => i.check === "unexpected_column" && i.column === "GeneTypo"))
    assert(report.issues.exists(i => i.check === "missing_column" && i.column === "CD8A"))
  }

  test("with_wrong_subtype: non-validated categorical listed with counts") {
    val df = Seq(("DMSO"), ("IFNJ"), ("IFNJ")).toDF("perturbation")
    val spec = SchemaSpec(Seq(
      FeatureSpec("perturbation", "cat[ULabel]",
        catRegistry = Some((perturbations.toDF, "name")))))
    val report = SchemaValidator.validate(df, spec)
    assert(!report.passed)
    val issue = report.issues.find(_.check === "non_validated").get
    assert(issue.column === "perturbation" && issue.detail === "IFNJ" && issue.n === 2)
  }

  test("standardizeColumn rewrites synonyms in place; addNew creates only unknowns") {
    val registry = Seq(("T cell", "T-cell|T lymphocyte"), ("B cell", "B-cell"))
      .toDF("name", "synonyms")
    val df = Seq((1, "T-cell"), (2, "B cell"), (3, "monocyte")).toDF("id", "cell_type")
    val fixed = Curate.standardizeColumn(df, "cell_type", registry, "name")
      .orderBy("id").select("cell_type").as[String].collect()
    assert(fixed.toSeq === Seq("T cell", "B cell", "monocyte"))

    val cat = graft.catalog.Catalog.deterministic(spark, graft.TestSpark.tmpDir("addnew"))
    cat.insert("ulabel", Map("name" -> "T cell", "synonyms" -> "T-cell"))
    val created = Curate.addNew(df.select(col("cell_type").as("value")), "value", cat, "ulabel")
    // "T-cell" resolves via synonym, "B cell"/"monocyte" are new
    assert(created.map(_("name")).toSet === Set("B cell", "monocyte"))
    assert(cat.table("ulabel").count() === 3)
    // re-running creates nothing
    assert(Curate.addNew(df.select(col("cell_type").as("value")), "value", cat, "ulabel").isEmpty)
  }

  test("slot-wise curation: obs/var validate independently, composite passes iff all do") {
    // the AnnData-curator shape: obs rows x var.T rows curated separately
    val obs = Seq(("c1", "T cell", 12.0), ("c2", "B cell", 31.0))
      .toDF("cell_id", "cell_type", "n_genes")
    val varT = Seq(("CD8A", "protein_coding"), ("CD4", "protein_coding"))
      .toDF("gene", "biotype")
    val obsSpec = SchemaSpec(Seq(
      FeatureSpec("cell_id", "str", nullable = false),
      FeatureSpec("cell_type", "cat[ULabel]",
        catRegistry = Some((Seq("T cell", "B cell").toDF("name"), "name"))),
      FeatureSpec("n_genes", "num")))
    val varSpec = SchemaSpec(Seq(
      FeatureSpec("gene", "str", nullable = false), FeatureSpec("biotype", "str")))
    val ok = SlotsCurator.validate(Map("obs" -> (obs, obsSpec), "var" -> (varT, varSpec)))
    assert(SlotsCurator.passed(ok))

    // one bad slot fails the composite and is identifiable by name
    val badObs = obs.withColumn("cell_type",
      org.apache.spark.sql.functions.lit("NK cell"))
    val mixed = SlotsCurator.validate(Map("obs" -> (badObs, obsSpec), "var" -> (varT, varSpec)))
    assert(!SlotsCurator.passed(mixed))
    assert(mixed.find(_.slot == "obs").exists(!_.report.passed))
    assert(mixed.find(_.slot == "var").exists(_.report.passed))

    // slot standardization adds missing columns so a sparse slot conforms
    val sparseVar = Seq(("CD8A")).toDF("gene")
    val fixed = SlotsCurator.standardize(Map("var" -> (sparseVar, varSpec)))
    assert(SlotsCurator.passed(SlotsCurator.validate(fixed)))
  }

  test("standardizeDataset adds missing schema columns with typed defaults") {
    val df = Seq((1, "x")).toDF("id", "b")
    val spec = SchemaSpec(Seq(
      FeatureSpec("b", "str"), FeatureSpec("score", "num"), FeatureSpec("flag", "bool")))
    val out = Curate.standardizeDataset(df, spec, defaults = Map("score" -> 0.0))
    assert(out.columns.toSet === Set("id", "b", "score", "flag"))
    assert(out.schema("score").dataType === org.apache.spark.sql.types.DoubleType)
    assert(out.schema("flag").dataType === org.apache.spark.sql.types.BooleanType)
    val r = out.head()
    assert(r.getAs[Double]("score") === 0.0)
    assert(r.isNullAt(r.fieldIndex("flag")))
    // conforms after standardization
    assert(SchemaValidator.validate(out, spec).passed)
  }

  test("ordered_set + nullability + dtype coercion violations") {
    val df = Seq(("x", null.asInstanceOf[String]), ("y", "1.5"), ("z", "oops"))
      .toDF("b", "a")
    val spec = SchemaSpec(Seq(
      FeatureSpec("a", "num", nullable = false), FeatureSpec("b", "str")),
      orderedSet = true)
    val report = SchemaValidator.validate(df, spec)
    assert(report.issues.exists(_.check === "column_order"))
    assert(report.issues.exists(i => i.check === "null_values" && i.column === "a" && i.n === 1))
    assert(report.issues.exists(i => i.check === "dtype_mismatch" && i.column === "a" && i.n === 1))
  }

  test("pattern constraint: the reference DOI regex flags malformed values, skips nulls") {
    // the Reference.doi RegexValidator pattern (models/project.py:178-186)
    val doiRe = """^(?:https?://(?:dx\.)?doi\.org/|doi:|DOI:)?10\.\d+/.*$"""
    val df = Seq(
      ("r1", "10.1000/xyz123"),
      ("r2", "https://doi.org/10.5555/abc"),
      ("r3", "doi:10.1/ok"),
      ("r4", "not-a-doi"),
      ("r5", null.asInstanceOf[String])
    ).toDF("name", "doi")
    val spec = SchemaSpec(Seq(
      FeatureSpec("name", "str"),
      FeatureSpec("doi", "str", pattern = Some(doiRe))))
    val report = SchemaValidator.validate(df, spec)
    val issue = report.issues.find(_.check === "pattern_mismatch")
    assert(issue.isDefined && issue.get.column === "doi" && issue.get.n === 1)
    // all-conforming (and null) values pass
    assert(SchemaValidator.validate(df.filter($"name" =!= "r4"), spec).passed)
  }
}
