package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Skew

/** Join-shape queries exercising the scale toolbox: multi-join
  * aggregation (broadcast dims + shuffled fact join) and the salted-join
  * equivalence check.
  */
object ScaleQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_join_agg_revenue" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val o = t(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = t(spark, dir, "customer")
      val n = t(spark, dir, "nation")
      // pre-join partial aggregation: the final group key (n_name) is
      // functionally determined by the ORDER side, so collapsing
      // lineitem to one row per order BEFORE the wide joins is
      // semantics-preserving — and the scaled-long revenue sum is exact
      // integer math, so two-stage summation is bit-equal to one-stage.
      // The map-side combine rides the same l_orderkey hash partitioning
      // the join needs (no extra exchange), and the join then processes
      // ~4x fewer rows (one per order instead of one per lineitem).
      val liAgg = li.groupBy(col("l_orderkey")).agg(
        sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_scaled"),
        count(lit(1)).as("n_li"))
      liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum(col("rev_scaled")).cast("double") / lit(10000.0)).as("revenue"),
          sum(col("n_li")).as("n_items"))
        .orderBy("n_name")
    }),

    "q22_salted_join" -> ((spark, dir) => {
      // skew-adaptive path: detect hot keys, salt only those. l_orderkey
      // is uniform (≤7 rows/key), so this resolves to detection + plain
      // shuffle join — the correct production plan; blanket salting
      // (saltedJoin) replicates the whole orders side 8x for nothing and
      // is covered by ExtSpec on synthetically skewed data.
      Skew.skewJoin(
          t(spark, dir, "lineitem"), t(spark, dir, "orders"),
          "l_orderkey", "o_orderkey", nSalts = 8, hotKeyThreshold = 100000,
          saltBy = Seq("l_orderkey", "l_linenumber"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          ExactSum.sumFixed(col("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_orderstatus")
    })
  )

  val oracle: Map[String, String] = Map(
    "q21_join_agg_revenue" ->
      s"""SELECT n_name,
        |  ${ExactSum.sumRevenueSql("l_extendedprice", "l_discount")} AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q22_salted_join" ->
      s"""SELECT o_orderstatus, count(*) AS n,
        |  ${ExactSum.sumFixedSql("l_quantity", 2)} AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
