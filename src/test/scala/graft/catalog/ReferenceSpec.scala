package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.artifact.ArtifactStore
import graft.query.QuerySet

/** Reference registry + person links (`models/project.py:45-249, 480-550`):
  * typed bibliographic records M2M-linked to artifacts/transforms/
  * collections/projects, and role-scoped project membership (ProjectUser).
  */
class ReferenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def setup() = {
    val root = TestSpark.tmpDir("refs")
    val cat = Catalog.deterministic(spark, root)
    (cat, new ArtifactStore(cat), root)
  }

  test("typed references filter by type__name and carry bibliographic fields") {
    val (cat, _, _) = setup()
    val paperType = cat.insert("reference", Map("name" -> "Paper", "is_type" -> true))
    val tid = paperType("id").asInstanceOf[Long]
    cat.insert("reference", Map(
      "name" -> "A Paper Title", "abbr" -> "APT", "type_id" -> tid,
      "url" -> "https://doi.org/10.1000/xyz123", "pubmed_id" -> 12345678L,
      "doi" -> "10.1000/xyz123", "text" -> "searchable abstract text",
      "date" -> java.sql.Date.valueOf("2023-11-21")))
    cat.insert("reference", Map("name" -> "Internal Study", "type_id" -> tid))
    cat.insert("reference", Map("name" -> "Untyped Doc"))
    val qs = QuerySet(cat, "reference")
    assert(qs.filter("type__name" -> "Paper").count() === 2)
    assert(qs.filter("pubmed_id" -> 12345678L).count() === 1)
    assert(qs.filter("doi__startswith" -> "10.1000").count() === 1)
    val r = qs.filter("abbr" -> "APT").toDataFrame(limit = None)._1.head()
    assert(r.getAs[java.sql.Date]("date").toString === "2023-11-21")
  }

  test("artifact <-> reference M2M traverses both directions; feature-scoped links allowed") {
    val (cat, store, root) = setup()
    val a1 = store.fromDataFrame(Seq((1, "x")).toDF("id", "v"), "k1", root)
    val a2 = store.fromDataFrame(Seq((2, "y")).toDF("id", "v"), "k2", root)
    val ref = cat.insert("reference", Map("name" -> "A Paper Title"))
    cat.insert("artifact_references", Map(
      "artifact_id" -> a1("id"), "reference_id" -> ref("id")))
    // filter artifacts by reference name (M2M semi-join)
    assert(store.querySet.filter("references__name" -> "A Paper Title").count() === 1)
    assert(store.querySet.filter("references__name" -> "Nope").count() === 0)
    // reverse: references by artifact key
    assert(QuerySet(cat, "reference").filter("artifacts__key" -> "k1").count() === 1)
    assert(QuerySet(cat, "reference").filter("artifacts__key" -> "k2").count() === 0)
    // annotate artifacts with their reference names
    val wide = store.querySet.withIncluded(Seq("references__name"))
    assert(wide.filter(col("id") === a1("id")).head()
      .getAs[Seq[String]]("references__name") === Seq("A Paper Title"))
    assert(wide.filter(col("id") === a2("id")).head()
      .getAs[Seq[String]]("references__name") === null)
  }

  test("project membership: role-scoped user links and project references") {
    val (cat, store, root) = setup()
    val u1 = cat.insert("user", Map("handle" -> "ana", "name" -> "Ana B"))
    val u2 = cat.insert("user", Map("handle" -> "kim", "name" -> "Kim C"))
    val p = cat.insert("project", Map("name" -> "atlas"))
    val other = cat.insert("project", Map("name" -> "side"))
    // (project, user, role) unique — same user may hold two roles
    cat.insert("project_users", Map("project_id" -> p("id"), "user_id" -> u1("id"), "role" -> "lead"))
    cat.insert("project_users", Map("project_id" -> p("id"), "user_id" -> u1("id"), "role" -> "reviewer"))
    cat.insert("project_users", Map("project_id" -> other("id"), "user_id" -> u2("id"), "role" -> "lead"))
    val projects = QuerySet(cat, "project")
    assert(projects.filter("users__handle" -> "ana").count() === 1)
    assert(projects.filter("users__handle" -> "ana").toDataFrame(limit = None)._1
      .head().getAs[String]("name") === "atlas")
    // a project annotates references; artifacts link to projects
    val ref = cat.insert("reference", Map("name" -> "Roadmap Doc"))
    cat.insert("project_references", Map("project_id" -> p("id"), "reference_id" -> ref("id")))
    assert(projects.filter("references__name" -> "Roadmap Doc").count() === 1)
    val a = store.fromDataFrame(Seq((1, "x")).toDF("id", "v"), "k1", root)
    cat.insert("artifact_projects", Map("artifact_id" -> a("id"), "project_id" -> p("id")))
    assert(store.querySet.filter("projects__name" -> "atlas").count() === 1)
    assert(QuerySet(cat, "project").filter("artifacts__key" -> "k1").count() === 1)
  }

  test("query_references walks sub-types through the type DAG") {
    // the reference's `_query_relatives` (`project.py:141-149`): while
    // `.references` retrieves records of ONE type, query_references also
    // retrieves records whose type is a sub-type
    val (cat, _, _) = setup()
    val doc = cat.insert("reference", Map("name" -> "Document", "is_type" -> true))
    val paper = cat.insert("reference", Map(
      "name" -> "Paper", "is_type" -> true, "type_id" -> doc("id")))
    cat.insert("reference", Map("name" -> "internal memo", "type_id" -> doc("id")))
    cat.insert("reference", Map("name" -> "a paper", "type_id" -> paper("id")))
    cat.insert("reference", Map("name" -> "untyped"))
    val under = graft.query.TypeOps.instancesUnder(cat, "reference",
      doc("id").asInstanceOf[Long])
    // sub-type node "Paper" plus both instances; NOT the untyped row
    assert(under.select("name").collect().map(_.getString(0)).toSet ===
      Set("Paper", "internal memo", "a paper"))
    // the direct-type query stays narrow
    assert(graft.query.QuerySet(cat, "reference")
      .filter("type__name" -> "Paper").count() === 1)
  }

  test("reference search ranks name over abstract text") {
    val (cat, _, _) = setup()
    cat.insert("reference", Map("name" -> "single cell atlas", "text" -> "methods"))
    cat.insert("reference", Map("name" -> "other topic", "text" -> "mentions atlas once"))
    val hits = QuerySet(cat, "reference").search("atlas").collect()
    assert(hits.length === 2)
    assert(hits.head.getAs[String]("name") === "single cell atlas")
  }
}
