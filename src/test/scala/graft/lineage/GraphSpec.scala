package graft.lineage

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("BFS descendants with min-depth and depth cap") {
    //     1 -> 2 -> 4
    //     1 -> 3 -> 4 (diamond: 4 at min depth 2)
    //     4 -> 5
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L)).toDF("parent", "child")
    val start = Seq(1L).toDF("node")
    val all = Graph.descendants(edges, start, "parent", "child")
      .as[(Long, Int)].collect().toMap
    assert(all === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 3))
    val capped = Graph.descendants(edges, start, "parent", "child", maxDepth = 1)
      .as[(Long, Int)].collect().toMap
    assert(capped === Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("BFS ancestors = reversed edges") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("parent", "child")
    val up = Graph.ancestors(edges, Seq(3L).toDF("node"), "parent", "child")
      .as[(Long, Int)].collect().toMap
    assert(up === Map(3L -> 0, 2L -> 1, 1L -> 2))
  }

  test("cycle terminates (visited-set subtraction)") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("parent", "child")
    val r = Graph.descendants(edges, Seq(1L).toDF("node"), "parent", "child")
      .as[(Long, Int)].collect().toMap
    assert(r === Map(1L -> 0, 2L -> 1))
  }

  /** 6-level binary tree: parent i -> children 2i+1, 2i+2 (127 nodes). */
  private def binTree() = {
    import org.apache.spark.sql.functions._
    spark.range(1, 127).select(col("id").as("child"),
      ((col("id") - 1) / 2).cast("long").as("parent"))
  }

  test("distributed BFS path: parity with the driver-frontier loop") {
    val edges = binTree()
    val start = Seq(0L).toDF("node")
    val driver = Graph.reachable(edges, start, "parent", "child")
      .as[(Long, Int)].collect().toMap
    val dist = Graph.reachableDistributed(edges, start, "parent", "child")
      .as[(Long, Int)].collect().toMap
    assert(dist === driver)
    assert(driver.size === 127 && driver.values.max === 6)
    // depth cap respected on the distributed loop too
    val capped = Graph.reachableDistributed(edges, start, "parent", "child", maxDepth = 2)
      .as[(Long, Int)].collect().toMap
    assert(capped === driver.filter(_._2 <= 2))
    // cycle termination without a driver-side visited set
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("parent", "child")
    val r = Graph.reachableDistributed(cyc, Seq(1L).toDF("node"), "parent", "child")
      .as[(Long, Int)].collect().toMap
    assert(r === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("frontier overflow falls back to the distributed loop automatically") {
    val edges = binTree()
    val start = Seq(0L).toDF("node")
    // limit smaller than the visited set forces the MID-LOOP restart
    // (visited + frontier outgrow the driver budget at depth ~4)
    val fromFallback = Graph.reachable(edges, start, "parent", "child",
      localFrontierLimit = 20)
      .as[(Long, Int)].collect().toMap
    // limit smaller than the start set forces the UP-FRONT redirect
    val fromStart = Graph.reachable(edges, Seq(0L).toDF("node"), "parent", "child",
      localFrontierLimit = 0)
      .as[(Long, Int)].collect().toMap
    val expected = Graph.reachable(edges, start, "parent", "child")
      .as[(Long, Int)].collect().toMap
    assert(fromFallback === expected)
    assert(fromStart === expected)
  }
}
