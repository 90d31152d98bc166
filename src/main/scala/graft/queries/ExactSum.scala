package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine money/measure sums WITHOUT per-row
  * BigDecimal.
  *
  * The decimal-cast pattern these helpers replace
  * (`sum(x.cast("decimal(18,2)")).cast("double")`) exists for oracle
  * stability — double summation drifts with partition order, decimal
  * summation doesn't — but Spark's double→decimal cast routes through
  * `BigDecimal.valueOf(d)` = `new BigDecimal(Double.toString(d))`: a
  * STRING format + parse per value. At sf10 that is 180M string
  * round-trips inside q01's hash aggregate — the jstack-visible hot
  * frames (`Double.toString`, `FloatingDecimal`, `changePrecision`)
  * and most of its 25× floor ratio.
  *
  * A fixed-point column (2dp money, 6dp measures) sums exactly as a
  * scaled long: `round(x·10^s)` is pure double arithmetic + one
  * integer conversion, the long sum is exact integer math (no
  * partition-order sensitivity), and the single final
  * `CAST(sum AS DOUBLE)/10^s` is the same IEEE operation in every
  * engine. Each helper emits the Spark column and the character-equal
  * ANSI SQL so oracles replay bit-identically (`round` is
  * half-away-from-zero for positive values in both engines; inputs
  * here are non-negative).
  *
  * Overflow bound: the scaled sum must stay under 2^63 — 2dp values
  * ≤10^7 sum safely past 10^11 rows, the product form (price·factor,
  * 10^-4 units) past 10^9 rows per group; both orders of magnitude
  * beyond any single aggregation group this engine targets. DuckDB
  * sums BIGINT into HUGEINT, so an overflow would surface as an
  * oracle mismatch, not silent corruption.
  */
object ExactSum {

  /** Σ x as a double, exact via ·10^digits scaled-long integer sum. */
  def sumFixed(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    sum(round(c * p).cast("long")).cast("double") / lit(p)
  }

  /** SQL twin of [[sumFixed]] (same ops, same order). */
  def sumFixedSql(expr: String, digits: Int): String = {
    val p = math.pow(10, digits).toLong
    s"CAST(sum(CAST(round(($expr) * $p) AS BIGINT)) AS DOUBLE) / $p.0"
  }

  /** Σ price·(1−disc) as a double — both factors 2dp, exact in 10^-4
    * units: cents × (100 − discount-hundredths).
    */
  def sumRevenue(price: Column, disc: Column): Column =
    sum(round(price * 100).cast("long") * (lit(100L) - round(disc * 100).cast("long")))
      .cast("double") / lit(10000.0)

  /** SQL twin of [[sumRevenue]]. */
  def sumRevenueSql(price: String, disc: String): String =
    s"CAST(sum(CAST(round($price * 100) AS BIGINT) * " +
      s"(100 - CAST(round($disc * 100) AS BIGINT))) AS DOUBLE) / 10000.0"
}
