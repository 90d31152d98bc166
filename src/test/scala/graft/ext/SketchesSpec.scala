package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 groups x known cardinalities; values repeat so distinct != count
  private lazy val df = spark.range(0, 30000)
    .select((col("id") % 3).cast("string").as("g"),
      (col("id") % when(col("id") % 3 === 0, 2000).otherwise(700)).as("v"),
      (col("id") % 1000).cast("double").as("x"))

  test("approxDistinct lands within 3*rsd of the exact cardinality") {
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinct(df, "g", "v", rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val a = approx(g)
      assert(math.abs(a - n).toDouble / n <= 0.15, s"group $g: exact $n approx $a")
    }
  }

  test("mergeable HLL: unioned per-bucket sketches equal the single-pass estimate") {
    // sketch per (g, bucket) cell — the "rollup slice" shape — then merge
    val cells = Sketches.hllSketch(
      df.withColumn("bucket", col("x") % 4), "g", "bucket", "v")
    assert(cells.count() === 12)
    val merged = Sketches.hllMerge(cells, "g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // single-pass estimate over the raw data at the same lgK
    val direct = df.groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sparse per-cell sketches can retain MORE precision than one dense
    // pass, so merged==direct is not guaranteed — but both must sit
    // within the lgK=12 error envelope of the truth, and near each other
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(merged(g) - n).toDouble / n <= 0.10, s"merged $g: ${merged(g)} vs $n")
      assert(math.abs(direct(g) - n).toDouble / n <= 0.10, s"direct $g: ${direct(g)} vs $n")
      assert(math.abs(merged(g) - direct(g)).toDouble / n <= 0.05, s"drift $g")
    }
  }

  test("approxQuantiles tracks exact percentiles within the accuracy bound") {
    val approx = Sketches.approxQuantiles(df, "g", "x", Seq(0.5, 0.9), accuracy = 10000)
      .select(col("g"), col("quantiles").getItem(0).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = df.groupBy("g").agg(expr("percentile(x, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (g, m) =>
      assert(math.abs(approx(g) - m) <= m * 0.02 + 1.0, s"group $g: $m vs ${approx(g)}") }
  }

  test("exactGroupStats matches the single-agg combined plan value-for-value") {
    val split = Sketches.exactGroupStats(df, "g", "v", "x", Seq(0.5, 0.9))
      .select(col("g"), col("n_distinct"),
        col("q").getItem(0).as("m"), col("q").getItem(1).as("p90"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val combined = df.groupBy("g")
      .agg(countDistinct(col("v")).as("n"),
        expr("percentile(x, array(0.5, 0.9))").as("q"))
      .select(col("g"), col("n"),
        col("q").getItem(0).as("m"), col("q").getItem(1).as("p90"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(split === combined)
  }

  test("exactGroupStats plans no Expand and no object-agg over distinct keys") {
    val plan = Sketches.exactGroupStats(df, "g", "v", "x", Seq(0.5))
      .queryExecution.executedPlan.toString
    // the combined agg would plan Expand (one replica per distinct branch)
    // feeding an ObjectHashAggregate keyed by (g, v) — which sort-falls-back
    // past 128 keys. The split plan must keep the distinct leg on codegen'd
    // HashAggregates and the percentile leg's ObjectHashAggregate keyed by
    // the group column alone (bounded keys, no fallback), joined broadcast.
    assert(!plan.contains("Expand"), plan)
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("approx plan carries partial aggregation, no expand or full value buffering") {
    val plan = Sketches.lineitemStatsApprox(
      df.select(col("g").as("l_returnflag"), col("v").as("l_orderkey"),
        col("x").as("l_extendedprice")))
      .queryExecution.executedPlan.toString
    // two-phase hash aggregate (partial -> final): fixed-size sketch state
    // travels the shuffle, not raw values
    assert(plan.contains("HashAggregate"))
    // exact countDistinct plans an Expand (row multiplication); approx must not
    assert(!plan.contains("Expand"))
  }
}
