package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.artifact.ArtifactStore
import graft.query.QuerySet

class BranchOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merge moves branch records to main and marks the branch merged") {
    val cat = Catalog.deterministic(spark, TestSpark.tmpDir("merge"))
    cat.insert("branch", Map("name" -> "main", "status_code" -> 0)) // id 1 = main
    val branch = cat.insert("branch", Map("name" -> "feature", "status_code" -> 0))
    val bid = branch("id").asInstanceOf[Long]
    cat.currentBranchId = bid
    cat.insert("ulabel", Map("name" -> "merged_label"))
    cat.currentBranchId = Catalog.MainBranchId
    // hidden from main before the merge
    assert(QuerySet(cat, "ulabel").filter("name" -> "merged_label").count() === 0)

    BranchOps.merge(cat, "feature")
    assert(QuerySet(cat, "ulabel").filter("name" -> "merged_label").count() === 1)
    val st = cat.table("branch").filter(col("id") === bid)
      .head().getAs[Int]("status_code")
    assert(st === BranchOps.StatusMerged)
    // status name filter via enum map
    assert(QuerySet(cat, "branch").filter("status" -> "merged").count() === 1)
  }

  test("merge reconciles is_latest per family on the target branch") {
    import spark.implicits._
    val root = TestSpark.tmpDir("merge")
    val cat = Catalog.deterministic(spark, root)
    val store = new ArtifactStore(cat)
    cat.insert("branch", Map("name" -> "main", "status_code" -> 0)) // id 1 = main
    val workId = cat.insert("branch", Map("name" -> "work", "status_code" -> 0))("id").asInstanceOf[Long]
    val v1 = store.fromDataFrame(Seq((1, "a")).toDF("id", "v"), "m/x", root)
    cat.currentBranchId = workId
    val v2 = store.fromDataFrame(Seq((2, "b")).toDF("id", "v"), "m/x", root)
    cat.currentBranchId = Catalog.MainBranchId
    // two heads, one per branch
    assert(cat.table("artifact").filter(col("is_latest")).count() === 2)

    BranchOps.merge(cat, "work")
    val heads = cat.table("artifact").filter(col("is_latest"))
      .select("uid").collect().map(_.getString(0))
    // single head on main: v2 (same created_at under the fixed clock -> id tie-break)
    assert(heads.toSeq === Seq(v2("uid")))
    assert(cat.table("artifact").filter(col("branch_id") === 1L).count() === 2)
    assert(v1 != null)
  }

  test("transform soft delete promotes its predecessor (generic lifecycle)") {
    val cat = Catalog.deterministic(spark, TestSpark.tmpDir("lc"))
    val v1 = cat.insert("transform", Map("key" -> "t.scala",
      "uid" -> (("a" * 16) + "0000"), "is_latest" -> false))
    val v2 = cat.insert("transform", Map("key" -> "t.scala",
      "uid" -> (("a" * 16) + "0001"), "is_latest" -> true))
    Lifecycle.trash(cat, "transform", Seq(v2("id").asInstanceOf[Long]))
    val rows = cat.table("transform").orderBy("id")
      .select("is_latest", "branch_id").collect()
    assert(rows(0).getBoolean(0) === true)   // v1 promoted
    assert(rows(1).getBoolean(0) === false)  // v2 demoted
    assert(rows(1).getLong(1) === Catalog.TrashBranchId)
    Lifecycle.restore(cat, "transform", Seq(v2("id").asInstanceOf[Long]))
    assert(cat.table("transform").filter(col("id") === v2("id")).head().getAs[Long]("branch_id") === 1L)
    // ulabel (unversioned): trash moves branch without touching heads
    val lab = cat.insert("ulabel", Map("name" -> "x"))
    Lifecycle.trash(cat, "ulabel", Seq(lab("id").asInstanceOf[Long]))
    assert(cat.table("ulabel").head().getAs[Long]("branch_id") === Catalog.TrashBranchId)
  }

  test("merging a branch into itself is a no-op; unknown branch raises") {
    val cat = Catalog.deterministic(spark, TestSpark.tmpDir("merge"))
    cat.insert("branch", Map("name" -> "main", "status_code" -> 0)) // id 1 = main
    val bid = cat.insert("branch", Map("name" -> "self", "status_code" -> 0))("id").asInstanceOf[Long]
    val before = cat.table("branch").collect().toSeq
    cat.currentBranchId = bid
    BranchOps.merge(cat, "self") // source == current target
    cat.currentBranchId = Catalog.MainBranchId
    assert(cat.table("branch").collect().toSeq === before)
    intercept[graft.query.DoesNotExist](BranchOps.merge(cat, "nope"))
  }
}
