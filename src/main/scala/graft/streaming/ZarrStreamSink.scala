package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.zarr.{AnnZarrWriter, ZarrStore}

/** Streaming ingestion into an AnnData-on-zarr store: every microbatch
  * of COO-ish rows is APPENDED in place via
  * [[graft.zarr.AnnZarrWriter.appendRows]] — only boundary + new chunk
  * objects are written per batch, so a long-running stream grows the
  * store at O(batch), not O(store). The batch analog is the reference's
  * append-style collection growth (`collection.py`); the zarr container
  * is what makes the streaming flavor possible at all (a single-file
  * HDF5 sink would rewrite or lock the file per batch).
  *
  * Exactly-once effect without a transactional sink: `foreachBatch` may
  * redeliver a batch after failure, so applied batch ids are recorded
  * in a ledger object (`.graft_batches` at the store root — same
  * resume-ledger idea as the AnnData append bridge); a redelivered
  * batch is skipped. Batch contract: one row per matrix element, with
  * `obs_name` (new rows grouped by it), `var_id`, `value`, plus any
  * obs-level metadata columns (constant per obs_name).
  */
object ZarrStreamSink {

  private val LedgerName = ".graft_batches"

  private def appliedBatches(path: String): Set[Long] = {
    ZarrStore.readBytes(path, LedgerName) match {
      case Some(b) => new String(b, java.nio.charset.StandardCharsets.UTF_8)
        .split('\n').filter(_.nonEmpty).map(_.toLong).toSet
      case None => Set.empty
    }
  }

  private def recordBatch(path: String, batchId: Long): Unit = {
    val prior = ZarrStore.readBytes(path, LedgerName)
      .map(new String(_, java.nio.charset.StandardCharsets.UTF_8)).getOrElse("")
    val fs = ZarrStore.fs(path)
    val out = fs.create(new Path(path, LedgerName), true)
    try out.write((prior + batchId + "\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Start the stream: each microbatch's distinct `obs_name`s become
    * appended rows (ids assigned in name order within the batch), their
    * elements land as new X chunks. Caller owns the query lifecycle.
    */
  def streamAppendZarr(stream: DataFrame, path: String, obsCols: Seq[String],
                       checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty && !appliedBatches(path).contains(batchId)) {
          // local obs ids in obs_name order — batches are microbatch-
          // sized, so the single-partition ranking window is bounded
          val obs = batch.select(col("obs_name") +: obsCols.map(col): _*)
            .distinct()
            .withColumn("obs_id",
              row_number().over(Window.orderBy("obs_name")).cast("long") - 1)
          val x = batch
            .join(obs.select("obs_name", "obs_id"), "obs_name")
            .select(col("obs_id"), col("var_id").cast("long").as("var_id"),
              col("value").cast("double").as("value"))
          AnnZarrWriter.appendRows(obs, x, path)
          recordBatch(path, batchId)
        }
      }
      .start()
}
