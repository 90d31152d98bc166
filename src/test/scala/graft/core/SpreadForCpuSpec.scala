package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r18 `Par.spreadForCpu` gate that parallelizes CPU-heavy text
  * kernels over narrow (single-row-group) inputs:
  *  - narrow input → round-robin repartition to defaultParallelism;
  *  - already-wide input → returned UNTOUCHED (no shuffle added — the
  *    production case, where a corpus scan arrives as thousands of
  *    splits);
  *  - streaming frame → untouched (`.rdd` is illegal on streaming plans);
  *  - row content is preserved exactly (only placement changes).
  */
class SpreadForCpuSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("narrow input is spread to defaultParallelism") {
    val one = spark.range(100).coalesce(1).toDF()
    assert(one.rdd.getNumPartitions == 1)
    val spread = Par.spreadForCpu(one)
    assert(spread.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(spread.select(sum("id")).head.getLong(0) == 4950L)
    assert(spread.count() == 100)
  }

  test("wide input passes through untouched") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000, 1, target + 2).toDF()
    assert(Par.spreadForCpu(wide) eq wide, "an already-wide frame must be returned as-is")
  }

  test("input with exactly defaultParallelism partitions passes through (strict-< gate)") {
    val target = spark.sparkContext.defaultParallelism
    val exact = spark.range(0, 1000, 1, target).toDF()
    assert(Par.spreadForCpu(exact) eq exact)
  }

  test("a frame with an upstream shuffle passes through (no .rdd materialization)") {
    // spreading after an exchange is pointless (the shuffle already
    // redistributes) and Dataset.rdd on an AQE plan with query stages
    // would EXECUTE them just to read a partition count — the gate must
    // return such frames untouched without planning their RDD
    val agg = spark.range(100).coalesce(1).groupBy((col("id") % 7).as("k"))
      .agg(sum("id").as("s"))
    assert(Par.spreadForCpu(agg) eq agg)
  }

  test("streaming frame passes through") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val out = Par.spreadForCpu(ms.toDF())
    assert(out.isStreaming)
  }

  test("spread preserves the exact row multiset") {
    val df = spark.range(50).select(col("id"), md5(col("id").cast("string")).as("h")).coalesce(1)
    val a = df.collect().map(_.toString).sorted
    val b = Par.spreadForCpu(df).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
