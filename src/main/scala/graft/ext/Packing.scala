package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training batches: assign documents to fixed
  * token-capacity bins so each bin fills a context window with minimal
  * padding — the standard pre-tokenization packing pass of an LLM data
  * pipeline (the reference stops at dataset loading; this is a
  * beyond-reference training-data operator, like the dedup suite).
  *
  * Greedy next-fit over a deterministic order, sharded: documents are
  * hashed into `nShards` independent packing streams, and within a shard
  * sorted by (tokens desc, id) and accumulated by running token total;
  * a document lands in the bin its cumulative END falls into, so a bin
  * can overflow by at most its last document (exact first-fit-decreasing
  * is inherently sequential — at 100 TB nobody bin-packs optimally; the
  * shard-local greedy pass is the production trade).
  *
  * Scale shape: ONE shuffle on the shard key, one window pass per shard
  * partition, map-only arithmetic after — no driver state, no iteration.
  * Shards are independent, so parallelism = nShards regardless of corpus
  * size; padding waste stays bounded by capacity/shard-mean-doc ratio.
  */
object Packing {

  /** Pack by an explicit token-count column. Output: one row per doc with
    * its shard, bin id (1-based within shard), and position/cumulative
    * tokens inside the bin. Deterministic given (id, tokens).
    */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: Column,
                    capacity: Int, nShards: Int): DataFrame = {
    require(capacity > 0 && nShards > 0, "capacity and nShards must be positive")
    val id = col(idCol)
    // clamp token counts to >= 1 (null/empty docs still occupy one slot):
    // keeps cum_tokens strictly increasing and bin_id >= 1 even for
    // degenerate inputs — a null count would otherwise propagate null
    // cum_tokens/bin_id, and an all-zero shard would land in bin 0
    val sharded = docs.select(id.as("doc_id"),
        greatest(coalesce(tokensCol.cast("long"), lit(1L)), lit(1L)).as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards)).cast("int"))
    val w = Window.partitionBy("shard")
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // the bin whose capacity span contains the doc's cumulative end
      .withColumn("bin_id", ceil(col("cum_tokens").cast("double") / capacity).cast("long"))
      .select("doc_id", "shard", "n_tokens", "cum_tokens", "bin_id")
  }

  /** Per-bin fill report: documents, tokens, and padding waste against
    * the capacity (the metric a packing pass is judged by).
    */
  def binFill(packed: DataFrame, capacity: Int): DataFrame =
    packed.groupBy("shard", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .withColumn("padding",
        greatest(lit(0L), lit(capacity.toLong) - col("bin_tokens")))
}
