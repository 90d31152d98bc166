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
}
