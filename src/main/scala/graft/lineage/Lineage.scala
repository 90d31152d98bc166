package graft.lineage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.core.Hashing

/** Transform/Run lineage tracking (`lamindb.track()` / `finish()`,
  * `lamindb/core/_context.py:431-1025`): a Transform identifies code (by
  * key + source hash, idempotent re-use), a Run is one execution of it.
  * Run status codes follow `base/types.py:73-99`:
  * -3 scheduled, -2 re-started, -1 started, 0 completed, 1 errored, 2 aborted.
  */
final class Lineage(val cat: Catalog) {

  /** Create-or-reuse a Transform by (key, source hash), then start a Run
    * and make it current so opens/saves auto-link lineage.
    * Returns (transformId, runId).
    */
  def track(key: String, sourceCode: String = "", paramsJson: String = null): (Long, Long) = {
    val hash = Hashing.md5String(sourceCode)
    val existing = cat.table("transform")
      .filter(col("key") === key && col("source_code_hash") === hash)
      .select("id").head(1)
    val transformId = existing.headOption.map(_.getLong(0)).getOrElse {
      cat.insert("transform", Map(
        "key" -> key, "typ" -> "script", "source_code_hash" -> hash,
        "is_latest" -> true))("id").asInstanceOf[Long]
    }
    val runId = cat.insert("run", Map(
      "transform_id" -> transformId, "status_code" -> -1,
      "started_at" -> cat.clock(), "params_json" -> paramsJson))("id").asInstanceOf[Long]
    cat.currentRunId = Some(runId)
    (transformId, runId)
  }

  /** Mark the current run completed (`ln.finish()`). */
  def finish(statusCode: Int = 0): Unit = {
    cat.currentRunId.foreach { runId =>
      cat.flush("run")
      cat.overwrite("run",
        cat.table("run").withColumn("status_code",
            when(col("id") === runId, lit(statusCode)).otherwise(col("status_code")))
          .withColumn("finished_at",
            when(col("id") === runId, lit(cat.clock())).otherwise(col("finished_at"))))
    }
    cat.currentRunId = None
  }

  /** Bipartite artifact↔run lineage edges: run consumed inputs
    * (run_inputs) and produced outputs (artifact.run_id). Edge direction:
    * producer -> consumer.
    */
  def artifactRunEdges: DataFrame = {
    val produced = cat.table("artifact")
      .filter(col("run_id").isNotNull)
      .select(col("run_id").as("src_run"), col("id").as("artifact_id"))
    val consumed = cat.table("run_inputs")
      .select(col("artifact_id"), col("run_id").as("dst_run"))
    produced.join(consumed, "artifact_id")
      .select(col("src_run").as("parent"), col("dst_run").as("child"))
      .distinct()
  }

  /** Upstream/downstream runs of a run (BFS over the run DAG) —
    * `all_parent_runs`/`all_child_runs` (`has_parents.py:527,573`).
    */
  def downstreamRuns(runId: Long, maxDepth: Int = -1): DataFrame = {
    val start = cat.spark.range(runId, runId + 1).select(col("id").as("node"))
    Graph.descendants(artifactRunEdges, start, "parent", "child", maxDepth)
  }

  def upstreamRuns(runId: Long, maxDepth: Int = -1): DataFrame = {
    val start = cat.spark.range(runId, runId + 1).select(col("id").as("node"))
    Graph.ancestors(artifactRunEdges, start, "parent", "child", maxDepth)
  }
}
