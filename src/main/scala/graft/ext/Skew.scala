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
}
