package graft.lineage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-based BFS over a DAG edge table — the Spark analog of the
  * reference's frontier-loop traversal (`lamindb/models/has_parents.py:
  * 34-71`, "optimized to have fewer recursive calls": one query per level,
  * not per node). Spark SQL has no recursive CTE; the loop lives in the
  * driver, the per-level joins on the cluster, exactly like the reference
  * runs one DB query per level.
  */
object Graph {

  /** All nodes reachable from `start` following `fromCol -> toCol` edges,
    * annotated with min BFS depth. `maxDepth < 0` means unbounded (runs to
    * fixpoint; the visited-set subtraction guarantees termination on DAGs
    * and cycles alike).
    *
    * Returns (node, depth) with depth 0 = the start set.
    */
  def reachable(edges: DataFrame, start: DataFrame, fromCol: String, toCol: String,
                maxDepth: Int = -1): DataFrame = {
    val spark = edges.sparkSession
    var visited = start.select(col(start.columns.head).cast("long").as("node"))
      .distinct().withColumn("depth", lit(0))
    var frontier = visited
    var depth = 0
    var done = false
    while (!done && (maxDepth < 0 || depth < maxDepth)) {
      depth += 1
      // next = targets of frontier edges, minus already-visited nodes.
      // The frontier and visited sets are tiny relative to the edge
      // table, so both sides broadcast: each level is a shuffle-free
      // map-side join over the (cluster-cached) edges. Only the frontier
      // is checkpointed (it feeds the next join and would otherwise nest
      // one plan per level); `visited` stays a lazy union of checkpointed
      // frontiers — linear plan growth.
      val next = edges
        .join(broadcast(frontier.select(col("node").as(fromCol))), fromCol)
        .select(col(toCol).cast("long").as("node")).distinct()
        .join(broadcast(visited.select("node")), Seq("node"), "left_anti")
        .withColumn("depth", lit(depth))
        // frontiers are small: one partition keeps the per-level
        // checkpoint + probe cheap instead of materializing N empties
        .coalesce(1)
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        visited = visited.unionByName(next)
        frontier = next
      }
    }
    visited
  }

  /** Ancestors = reachable over reversed edges (`_query_relatives` with
    * `parents`), descendants = forward edges (`children`).
    */
  def descendants(edges: DataFrame, start: DataFrame, parentCol: String, childCol: String,
                  maxDepth: Int = -1): DataFrame =
    reachable(edges, start, parentCol, childCol, maxDepth)

  def ancestors(edges: DataFrame, start: DataFrame, parentCol: String, childCol: String,
                maxDepth: Int = -1): DataFrame =
    reachable(edges, start, childCol, parentCol, maxDepth)
}
