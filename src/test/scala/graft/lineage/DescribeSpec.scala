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

  test("rowsMany equals the union of per-id rows (the q46 batched plan, r18)") {
    import org.apache.spark.sql.functions._
    val root = TestSpark.tmpDir("descmany")
    val cat = Catalog.deterministic(spark, root)
    val store = new ArtifactStore(cat)
    val lin = new Lineage(cat)
    val af = new graft.eav.ArtifactFeatures(cat)

    lin.track("many.scala", "v1")
    val arts = Seq("a", "b", "c").map { k =>
      k -> store.fromDataFrame(Seq((1, k)).toDF("id", "v"), s"p/$k", root)("id").asInstanceOf[Long]
    }
    lin.finish()
    // asymmetric annotations so per-id row sets differ: features on a,
    // a label on b, nothing extra on c
    af.addValues(arts.head._2, Map("n" -> 7L))
    val lid = cat.insert("ulabel", Map("name" -> "L"))("id").asInstanceOf[Long]
    cat.insert("artifact_ulabels", Map("artifact_id" -> arts(1)._2, "ulabel_id" -> lid))

    val batched = Describe.rowsMany(cat, arts.map { case (k, id) => (s"key/$k", id) })
      .orderBy("art_key", "section", "item", "value")
      .collect().map(_.toSeq).toSeq
    val unioned = arts.map { case (k, id) =>
      Describe.rows(cat, id).withColumn("art_key", lit(s"key/$k"))
        .select("art_key", "section", "item", "detail", "value")
    }.reduce(_ unionByName _)
      .orderBy("art_key", "section", "item", "value")
      .collect().map(_.toSeq).toSeq
    assert(batched === unioned)
    // and the batched plan stays O(sections): one Union of 4 subtrees,
    // not 4 x N (the per-id shape planned 584 operators for 5 ids)
    val n = arts.size
    val batchedPlan = Describe.rowsMany(cat, arts.map { case (k, id) => (k, id) })
      .queryExecution.executedPlan.toString
    val unionArms = batchedPlan.linesIterator.count(_.contains("Union")) // 1 union node
    assert(unionArms <= 2, s"batched plan should hold one Union regardless of n=$n")
  }

  test("viewLineage walks producer runs to their inputs recursively") {
    val root = TestSpark.tmpDir("vl")
    val cat = Catalog.deterministic(spark, root)
    val store = new ArtifactStore(cat)
    val lin = new Lineage(cat)

    // raw is registered OUTSIDE any run (no producer)
    val raw = store.fromDataFrame(Seq((1, "raw")).toDF("id", "v"), "raw", root)
    // stage 1: raw -> (run1) -> intermediate
    lin.track("stage1.scala", "s1")
    store.openByUid(raw("uid").toString).count() // records run input
    val mid = store.fromDataFrame(Seq((2, "mid")).toDF("id", "v"), "mid", root)
    lin.finish()
    // stage 2: intermediate -> (run2) -> final
    lin.track("stage2.scala", "s2")
    store.openByUid(mid("uid").toString).count()
    val fin = store.fromDataFrame(Seq((3, "fin")).toDF("id", "v"), "fin", root)
    lin.finish()

    val tree = Describe.viewLineage(cat, fin("id").asInstanceOf[Long])
    assert(tree.contains(fin("uid").toString))
    assert(tree.contains("stage2.scala"))
    assert(tree.contains(mid("uid").toString))
    assert(tree.contains("stage1.scala"))
    assert(tree.contains(raw("uid").toString))
    // deeper level is indented further
    val finLine = tree.linesIterator.indexWhere(_.contains(fin("uid").toString))
    val rawLine = tree.linesIterator.indexWhere(_.contains(raw("uid").toString))
    assert(finLine === 0 && rawLine > finLine)
  }
}
