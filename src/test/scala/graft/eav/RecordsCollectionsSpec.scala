package graft.eav

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.artifact.{ArtifactStore, Collections}
import graft.catalog.Catalog

class RecordsCollectionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("record sheet round-trip: from_dataframe -> EAV -> to_dataframe") {
    val cat = Catalog.deterministic(spark, TestSpark.tmpDir("rec"))
    val records = new Records(cat)
    val sheet = Seq(
      ("sample1", 2.5, "drug1", true),
      ("sample2", 4.0, "drug2", false)
    ).toDF("name", "concentration", "compound", "treated")
    records.fromDataFrame(sheet, "BioSample", "name")

    // feature dictionary captured with inferred dtypes
    val feats = cat.table("feature").select("name", "dtype").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(feats === Map("concentration" -> "num", "compound" -> "str", "treated" -> "bool"))

    // EAV filtering through typed predicates
    val hot = records.store("BioSample")
      .filter(records.ofType("BioSample"), "id", F("concentration") > 3.0)
    assert(hot.select("name").as[String].collect().toSeq === Seq("sample2"))

    // wide export reproduces values with types
    val wide = records.toDataFrame("BioSample").orderBy("name")
    val r1 = wide.head()
    assert(r1.getAs[String]("name") === "sample1")
    assert(r1.getAs[Double]("concentration") === 2.5)
    assert(r1.getAs[String]("compound") === "drug1")
    assert(r1.getAs[Boolean]("treated") === true)
  }

  test("collections: idempotent create, append = new version, open/load/n_observations") {
    val root = TestSpark.tmpDir("coll")
    val cat = Catalog.deterministic(spark, root)
    val store = new ArtifactStore(cat)
    val colls = new Collections(cat, store)

    val a1 = store.fromDataFrame(Seq((1L, "x"), (2L, "y")).toDF("id", "v"), "part1", root)
    val a2 = store.fromDataFrame(Seq((3L, "z")).toDF("id", "v"), "part2", root)
    val a3 = store.fromDataFrame(Seq((4L, "w"), (5L, "q")).toDF("id", "v"), "part3", root)
    val id1 = a1("id").asInstanceOf[Long]
    val id2 = a2("id").asInstanceOf[Long]
    val id3 = a3("id").asInstanceOf[Long]

    val c1 = colls.create("corpus", Seq(id1, id2))
    // identical content -> identical collection (hash idempotency)
    assert(colls.create("corpus", Seq(id1, id2))("uid") === c1("uid"))
    val cid1 = c1("id").asInstanceOf[Long]
    assert(colls.orderedArtifactIds(cid1) === Seq(id1, id2))
    assert(colls.nObservations(cid1) === 3L)
    assert(colls.open(cid1).count() === 3)

    val c2 = colls.append(cid1, Seq(id3))
    assert(c2("uid").toString.take(16) === c1("uid").toString.take(16)) // same family
    assert(c2("uid").toString.takeRight(4) === "0001")
    val heads = cat.table("collection").filter(col("is_latest")).count()
    assert(heads === 1)
    val cid2 = c2("id").asInstanceOf[Long]
    assert(colls.nObservations(cid2) === 5L)

    // provenance-labeled eager concat
    val loaded = colls.load(cid2)
    assert(loaded.count() === 5)
    assert(loaded.select("artifact_uid").distinct().count() === 3)
  }

  test("collection load inner vs outer column alignment") {
    val root = TestSpark.tmpDir("coll2")
    val cat = Catalog.deterministic(spark, root)
    val store = new ArtifactStore(cat)
    val colls = new Collections(cat, store)
    val a1 = store.fromDataFrame(Seq((1L, "x")).toDF("id", "v"), "p1", root)
    val a2 = store.fromDataFrame(Seq((2L, 9.9)).toDF("id", "w"), "p2", root)
    val cid = colls.create("mixed",
      Seq(a1("id").asInstanceOf[Long], a2("id").asInstanceOf[Long]))("id").asInstanceOf[Long]
    val outer = colls.load(cid, "outer")
    assert(outer.columns.toSet === Set("id", "v", "w", "artifact_uid"))
    assert(outer.count() === 2)
    val inner = colls.load(cid, "inner")
    assert(inner.columns.toSet === Set("id", "artifact_uid"))
  }

  test("artifact feature annotation: add_values -> EAV filter -> wide export") {
    val root = TestSpark.tmpDir("af")
    val cat = Catalog.deterministic(spark, root)
    val store = new ArtifactStore(cat)
    val af = new ArtifactFeatures(cat)
    val a1 = store.fromDataFrame(Seq((1L, "x")).toDF("id", "v"), "d1", root)
    val a2 = store.fromDataFrame(Seq((2L, "y")).toDF("id", "v"), "d2", root)
    af.addValues(a1("id").asInstanceOf[Long], Map("temperature" -> 21.5, "site" -> "lab1"))
    af.addValues(a2("id").asInstanceOf[Long], Map("temperature" -> 38.0, "site" -> "lab2"))

    // EAV dispatch through the artifact QuerySet (unknown key -> feature)
    val hot = af.querySet.filter("temperature__gt" -> 30.0)
    assert(hot.df.select("key").as[String].collect().toSeq === Seq("d2"))

    val wide = af.toDataFrame(cat.table("artifact")).orderBy("key")
    assert(wide.columns.contains("temperature") && wide.columns.contains("site"))
    assert(wide.head().getAs[Double]("temperature") === 21.5)
  }

  test("json values dedup by (feature, hash); links are unique per artifact") {
    val root = TestSpark.tmpDir("jv")
    val cat = Catalog.deterministic(spark, root)
    val store = new ArtifactStore(cat)
    val af = new ArtifactFeatures(cat)
    val a1 = store.fromDataFrame(Seq((1L, "x")).toDF("id", "v"), "d1", root)
    val a2 = store.fromDataFrame(Seq((2L, "y")).toDF("id", "v"), "d2", root)
    val id1 = a1("id").asInstanceOf[Long]
    val id2 = a2("id").asInstanceOf[Long]
    // same (feature, value) on two artifacts -> ONE json_value row, two links
    af.addValues(id1, Map("site" -> "lab1"))
    af.addValues(id2, Map("site" -> "lab1"))
    assert(cat.table("json_value").count() === 1)
    assert(cat.table("artifact_json_values").count() === 2)
    // re-annotating the same artifact with the same value is a no-op
    af.addValues(id1, Map("site" -> "lab1"))
    assert(cat.table("artifact_json_values").count() === 2)
    // a different value creates a second dedup'd row
    af.addValues(id1, Map("site" -> "lab2"))
    assert(cat.table("json_value").count() === 2)
    // both artifacts still resolve their value through the view
    val v = af.valuesView.orderBy("record_id")
      .select("record_id", "value_json").as[(Long, String)].collect()
    assert(v.count(_._2 == "\"lab1\"") === 2)
    // run annotation shares the SAME deduplicated value rows
    val run = cat.insert("run", Map("transform_id" -> 1L, "status_code" -> 0))
    af.addRunValues(run("id").asInstanceOf[Long], Map("site" -> "lab1"))
    assert(cat.table("json_value").count() === 2) // no new value row
    assert(cat.table("run_json_values").count() === 1)
    af.addRunValues(run("id").asInstanceOf[Long], Map("site" -> "lab1"))
    assert(cat.table("run_json_values").count() === 1) // link idempotent
  }

  test("labels add / add_from / remove mirror the label manager") {
    val root = TestSpark.tmpDir("lm")
    val cat = Catalog.deterministic(spark, root)
    val store = new ArtifactStore(cat)
    val af = new ArtifactFeatures(cat)
    val a1 = store.fromDataFrame(Seq((1L, "x")).toDF("id", "v"), "d1", root)("id").asInstanceOf[Long]
    val a2 = store.fromDataFrame(Seq((2L, "y")).toDF("id", "v"), "d2", root)("id").asInstanceOf[Long]
    val labels = (0 until 3).map(i =>
      cat.insert("ulabel", Map("name" -> s"Project $i"))("id").asInstanceOf[Long])
    af.addLabels(a2, Seq.empty)          // empty add is a no-op
    af.addLabels(a2, labels)
    af.addLabels(a2, labels)             // duplicate add is a no-op
    assert(cat.table("artifact_ulabels").filter(col("artifact_id") === a2).count() === 3)
    // add_from copies all links; idempotent on re-run
    assert(af.addLabelsFrom(a1, a2) === 3)
    assert(af.addLabelsFrom(a1, a2) === 0)
    assert(cat.table("artifact_ulabels").filter(col("artifact_id") === a1).count() === 3)
    af.removeLabels(a1, labels.take(2))
    assert(cat.table("artifact_ulabels").filter(col("artifact_id") === a1).count() === 1)
    assert(cat.table("artifact_ulabels").filter(col("artifact_id") === a2).count() === 3)
    // link uniqueness is (artifact, ulabel, feature): the SAME label under
    // a different feature is a new link, and re-adding it is the no-op
    val fid = cat.insert("feature", Map("name" -> "scope", "dtype" -> "cat"))("id")
      .asInstanceOf[Long]
    af.addLabels(a2, labels.take(1), featureId = Some(fid))
    assert(cat.table("artifact_ulabels").filter(col("artifact_id") === a2).count() === 4)
    af.addLabels(a2, labels.take(1), featureId = Some(fid))
    assert(cat.table("artifact_ulabels").filter(col("artifact_id") === a2).count() === 4)
    // add_from carries the feature-scoped link too
    assert(af.addLabelsFrom(a1, a2) === 3) // 2 removed plain links + 1 feature-scoped
  }
}
