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

  /** Create-or-reuse a Transform, then start a Run and make it current so
    * opens/saves auto-link lineage. Reference idempotency contract
    * (`Transform._create_or_load_from_source`, `models/transform.py:
    * 435-580` + `_context.py:676-748`):
    *
    *  - the source is hashed AS WRITTEN, but persisted with secret-looking
    *    hardcoded assignments redacted (`transform.py:453-461`);
    *  - same source hash → the SAME transform row, only a new run;
    *  - same key with changed source → a new VERSION in the existing uid
    *    family (head flips);
    *  - `params` are serialized to JSON with sensitive keys/values
    *    redacted (`serialize_params_to_json`, `_context.py:393-428`).
    *
    * Returns (transformId, runId).
    */
  def track(key: String, sourceCode: String = "",
            params: Map[String, Any] = Map.empty,
            asCopy: Boolean = false): (Long, Long) = {
    val hash = Hashing.md5String(sourceCode)
    // hash-reuse is GLOBAL (any key): the reference's rename prompt
    // defaults to "renamed, reuse" (`transform.py:553-563`); pass
    // asCopy=true for the "intentionally made a copy" answer, which
    // forces a fresh transform identity for the same source
    val existing =
      if (asCopy) None
      else cat.table("transform")
        .filter(col("source_code_hash") === hash)
        .select("id").head(1).headOption
    val transformId = existing.map(_.getLong(0)).getOrElse {
      val (stored, _) = Redaction.redactSource(sourceCode)
      val family = cat.table("transform").filter(col("key") === key)
        .select("uid").collect().map(_.getString(0)).toSeq
      val uid =
        if (family.isEmpty) cat.newUidFor(cat.tableDef("transform"))
        else graft.core.Versioning.nextUidInFamily(family)
      if (family.nonEmpty) {
        val stem = graft.core.Versioning.stem(uid)
        cat.flush("transform")
        cat.overwrite("transform",
          cat.table("transform").withColumn("is_latest",
            when(col("uid").startsWith(stem) && col("branch_id") === cat.currentBranchId,
              lit(false)).otherwise(col("is_latest"))))
      }
      cat.insert("transform", Map(
        "uid" -> uid, "key" -> key, "typ" -> "script",
        "source_code" -> (if (stored.isEmpty) null else stored),
        "source_code_hash" -> hash,
        "is_latest" -> true))("id").asInstanceOf[Long]
    }
    val pj = if (params.nonEmpty) Redaction.serializeParams(params) else null
    val runId = cat.insert("run", Map(
      "transform_id" -> transformId, "status_code" -> -1,
      "started_at" -> cat.clock(), "params_json" -> pj))("id").asInstanceOf[Long]
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
