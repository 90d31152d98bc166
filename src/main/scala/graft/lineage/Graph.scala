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
    * Execution: the frontier is driver-resident (it was always assumed
    * broadcast-small — lineage frontiers are metadata-scale), so each
    * level is exactly ONE cluster job: broadcast the frontier from a
    * local relation (no collect job), semi-join the edge table, collect
    * the next frontier. The visited set and depth map stay on the driver.
    * Edges are cached across levels. If a frontier outgrows
    * `localFrontierLimit`, falls back to the fully distributed loop.
    *
    * Returns (node, depth) with depth 0 = the start set.
    */
  def reachable(edges: DataFrame, start: DataFrame, fromCol: String, toCol: String,
                maxDepth: Int = -1, localFrontierLimit: Int = 4000000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val startIds = start.select(col(start.columns.head).cast("long")).as[Long].collect().distinct
    if (startIds.length > localFrontierLimit)
      return reachableDistributed(edges, start, fromCol, toCol, maxDepth)

    val cached = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val visited = scala.collection.mutable.LinkedHashMap.empty[Long, Int]
      startIds.foreach(visited.update(_, 0))
      var frontier: Array[Long] = startIds
      var depth = 0
      while (frontier.nonEmpty && (maxDepth < 0 || depth < maxDepth)) {
        depth += 1
        val fdf = frontier.toSeq.toDF(fromCol)
        // no .distinct(): dedup on the driver instead of paying a shuffle
        // per level (collect size is bounded by edge fan-in x frontier)
        val next = cached
          .join(broadcast(fdf), fromCol)
          .select(col(toCol).cast("long"))
          .as[Long].collect()
        frontier = next.distinct.filterNot(visited.contains)
        if (visited.size + frontier.length > localFrontierLimit) {
          // graph outgrew the driver: restart distributed (rare path)
          return reachableDistributed(edges, start, fromCol, toCol, maxDepth)
        }
        frontier.foreach(visited.update(_, depth))
      }
      visited.toSeq.toDF("node", "depth")
    } finally cached.unpersist(blocking = false)
  }

  /** Fully distributed BFS (frontier/visited never leave the cluster):
    * the path for graphs whose frontiers exceed driver memory. Same
    * result contract as `reachable`.
    */
  def reachableDistributed(edges: DataFrame, start: DataFrame, fromCol: String, toCol: String,
                           maxDepth: Int = -1): DataFrame = {
    var visited = start.select(col(start.columns.head).cast("long").as("node"))
      .distinct().withColumn("depth", lit(0))
    var frontier = visited
    var depth = 0
    var done = false
    while (!done && (maxDepth < 0 || depth < maxDepth)) {
      depth += 1
      // next = targets of frontier edges, minus already-visited nodes.
      // Only the frontier is checkpointed (it feeds the next join and
      // would otherwise nest one plan per level); `visited` stays a lazy
      // union of checkpointed frontiers — linear plan growth.
      val next = edges
        .join(frontier.select(col("node").as(fromCol)), fromCol)
        .select(col(toCol).cast("long").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("depth", lit(depth))
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
