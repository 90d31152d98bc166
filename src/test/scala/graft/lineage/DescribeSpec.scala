package graft.lineage

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.artifact.ArtifactStore
import graft.catalog.Catalog

class DescribeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("describe renders provenance + features + labels; lookup() keys rows by field") {
    val root = TestSpark.tmpDir("desc")
    val cat = Catalog.deterministic(spark, root)
    val store = new ArtifactStore(cat)
    val lin = new Lineage(cat)
    val af = new graft.eav.ArtifactFeatures(cat)

    lin.track("describe-test.scala", "v1")
    val a = store.fromDataFrame(Seq((1, "x")).toDF("id", "v"), "d", root)
    lin.finish()
    val aid = a("id").asInstanceOf[Long]
    af.addValues(aid, Map("temperature" -> 21.5))
    cat.insert("ulabel", Map("name" -> "validated-batch"))
    cat.insert("artifact_ulabels", Map("artifact_id" -> aid,
      "ulabel_id" -> cat.table("ulabel").select("id").head().getLong(0)))

    val out = Describe.artifact(cat, aid)
    assert(out.contains(a("uid").toString))
    assert(out.contains("describe-test.scala"))
    assert(out.contains("temperature"))
    assert(out.contains("validated-batch"))

    val byName = graft.query.QuerySet(cat, "ulabel").lookup("name")
    assert(byName.contains("validated-batch"))
  }
}
