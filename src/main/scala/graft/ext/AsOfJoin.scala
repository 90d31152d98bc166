package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for each left row, the single right row with the
  * greatest `rightTs <= leftTs` under the same key (the time-series
  * "latest state at event time" primitive; DuckDB/Pandas expose it as
  * `ASOF JOIN` / `merge_asof`; Spark has no built-in).
  *
  * Shape: tag + union both sides, then one window pass per key ordered by
  * (ts, side) carrying the last non-null right payload forward. ONE
  * shuffle on the key, no range-condition join (a naive `l.ts >= r.ts`
  * join explodes to |L|x|R| per key before picking the max — this stays
  * |L|+|R|). At equal timestamps the right row sorts first, so matches
  * are inclusive, like DuckDB's `ON l.ts >= r.ts`. Among right rows with
  * IDENTICAL (key, ts) the winner is tie-broken by the payload struct
  * ordering so the result stays deterministic.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           payloadCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftSt = left.schema
    val payloadSt = StructType(payloadCols.map(c => right.schema(c)))

    val leftTagged = left.select(
      struct(left.columns.map(col): _*).as("__l"),
      col(key).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(payloadSt).as("__p"))
    val rightTagged = right.select(
      lit(null).cast(leftSt).as("__l"),
      col(key).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("__p"))

    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftTagged.unionByName(rightTagged)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +:
        payloadCols.map(c => col(s"__match.$c").as(prefix + c)): _*)
  }
}
