package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the 100 TB case.
  *
  * AQE's skew-join split handles most skew at runtime; explicit salting
  * remains the tool when one join key dominates so heavily that a single
  * task would still own it (e.g. a null-ish default key in lineage link
  * tables). Semantics are identical to a plain equi-join — verified by
  * the DuckDB oracle on q22.
  */
object Skew {

  /** Salted inner equi-join: left rows scatter across `nSalts` buckets by
    * a deterministic row hash; the right side replicates once per salt.
    * Join key cardinality per task becomes |key| / nSalts.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
                 nSalts: Int, saltBy: Seq[String]): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(concat_ws("", saltBy.map(col): _*)), lit(nSalts)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Skew-adaptive inner equi-join: detect keys whose row count exceeds
    * `hotKeyThreshold`, salt ONLY those (replicating only the matching
    * right rows), and join the uniform remainder plainly. This is the
    * production form — blanket salting replicates the whole right side
    * `nSalts`×, which at 100 TB turns a skew fix into a shuffle-volume
    * regression. Hot keys are by definition few (bounded by
    * |left| / threshold), so the driver-side hot-key set stays tiny.
    */
  def skewJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
               nSalts: Int = 8, hotKeyThreshold: Long = 1000000,
               saltBy: Seq[String] = Nil, sampleFraction: Double = 0.01): DataFrame = {
    // Hot-key detection from a SAMPLE when the threshold is statistically
    // visible in it (expected >=20 sampled rows for a threshold-sized
    // key): the exact pass is a full shuffle of the fact table's keys —
    // for a near-unique key, map-side partial aggregation absorbs
    // nothing, so at 100 TB "detection" costs as much as the join it
    // guards. A key at the threshold lands ~threshold·fraction sampled
    // rows (sigma = sqrt of that); cutting at HALF the scaled threshold
    // makes a miss vanishingly unlikely, and both error directions are
    // benign: a missed borderline key only skips salting it (plain-join
    // correctness, AQE still splits it), a false positive only salts a
    // warm key. Thin thresholds keep the exact pass.
    val sampled = hotKeyThreshold * sampleFraction >= 20
    val (src, cut) =
      if (sampled) (left.sample(withReplacement = false, sampleFraction, seed = 7L),
        math.max(1L, (hotKeyThreshold * sampleFraction / 2).toLong))
      else (left, hotKeyThreshold)
    val hot = src.groupBy(leftKey).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= cut)
      .select(leftKey).collect().map(_.get(0)).toIndexedSeq
    if (hot.isEmpty) left.join(right, left(leftKey) === right(rightKey))
    else {
      val saltCols = if (saltBy.nonEmpty) saltBy else left.columns.toSeq
      val hotJoin = saltedJoin(
        left.filter(col(leftKey).isin(hot: _*)),
        right.filter(col(rightKey).isin(hot: _*)),
        leftKey, rightKey, nSalts, saltCols)
      val coldJoin = left.filter(!col(leftKey).isin(hot: _*))
        .join(right.filter(!col(rightKey).isin(hot: _*)),
          left(leftKey) === right(rightKey))
      coldJoin.unionByName(hotJoin)
    }
  }
}
