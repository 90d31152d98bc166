package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ext.Similarity

class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native dot == zip_with fold bit-for-bit on doubles and floats") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat()),
      Array.fill(64)(rnd.nextFloat())))
    val df = rows.toDF("a", "b")
    val got = df.select(
      Similarity.dot($"a", $"b").as("native"),
      Similarity.dotFold($"a", $"b").as("fold")).collect()
    got.foreach { r =>
      // identical summation order -> exactly equal, not approximately
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) === 0)
    }
  }

  test("null array input -> null; empty arrays -> 0.0") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None, Some(Array(3.0, 4.0))),
      (Some(Array.empty[Double]), Some(Array.empty[Double]))
    ).toDF("a", "b")
    val r = df.select(Similarity.dot($"a", $"b").as("d")).collect()
    assert(r(0).getDouble(0) === 11.0)
    assert(r(1).isNullAt(0))
    assert(r(2).getDouble(0) === 0.0)
  }

  test("interpreted eval agrees with codegen path") {
    val e = org.apache.spark.sql.graft.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0, 5.0, 6.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) === 32.0)
  }

  test("graft_dot is SQL-callable after registry install") {
    org.apache.spark.sql.graft.GraftExtensions.installInto(spark)
    val d = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(d === 11.0)
    // float arrays go through the implicit element cast
    val f = spark.sql(
      "SELECT graft_dot(cast(array(1.0, 2.0) AS ARRAY<FLOAT>), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(f === 11.0)
  }

  test("stays inside whole-stage codegen (no fallback)") {
    // a range-backed plan so the projection isn't constant-folded away
    val df = spark.range(8).select(
      array($"id".cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), lit(4.0)).as("b"))
    val q = df.select(Similarity.dot($"a", $"b").as("d"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(q.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(q.agg(sum("d")).head().getDouble(0) === (0 until 8).map(i => i * 3.0 + 8.0).sum)
  }

  test("graft_char_ngrams is SQL-callable after registry install") {
    org.apache.spark.sql.graft.GraftExtensions.installInto(spark)
    val r = spark.sql("SELECT graft_char_ngrams(' cat ', 3) AS g")
      .head().getSeq[String](0)
    assert(r === Seq(" ca", "cat", "at "))
    // short-string contract: fewer than n chars -> the whole string
    assert(spark.sql("SELECT graft_char_ngrams('ab', 3) AS g")
      .head().getSeq[String](0) === Seq("ab"))
  }
}
