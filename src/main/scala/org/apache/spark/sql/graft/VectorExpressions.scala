package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst dot product: Σ aᵢ·bᵢ over two double arrays.
  *
  * The `zip_with`/`aggregate` composition allocates an intermediate array
  * per row and evaluates its lambda through `HigherOrderFunction`'s
  * interpreted path; this expression generates a primitive fused loop
  * inside whole-stage codegen (`doGenCode`), with an identical
  * left-to-right summation order so results are bit-compatible with the
  * fold it replaces. Float arrays arrive via an implicit element cast,
  * exactly like `transform(v, _.cast("double"))`.
  *
  * (Lives under `org.apache.spark.sql` because `AbstractDataType` and the
  * Column↔Expression bridge are `private[sql]` — the standard extension
  * placement, no Spark internals are modified.)
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object VectorExpressions {
  /** Column wrapper for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Bloom-filter build as a codegen'd aggregate over a LONG column —
    * Spark's own `BloomFilterAggregate` (the machinery behind runtime
    * join filter pushdown): per-partition partial blooms, binary merge
    * in the agg buffer, one serialized sketch out. Much cheaper than the
    * RDD-based `DataFrameStatFunctions.bloomFilter`, which row-iterates
    * outside codegen and merges full-size blooms per partition.
    */
  def bloomAgg(value: Column, expectedItems: Long, fpp: Double): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ExpressionUtils.expression(value),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Membership probe against a serialized `util.sketch.BloomFilter` via
    * Spark's own `BloomFilterMightContain` (the expression behind runtime
    * row-level filter pushdown — codegen'd, no UDF). `value` must be a
    * LONG column; pair it with a bloom built over the same 64-bit hashes
    * (the `putLong` path, e.g. [[bloomAgg]] on an `xxhash64` column).
    */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal.create(bloomBytes, BinaryType),
        ExpressionUtils.expression(value)))
}

/** `SparkSessionExtensions` hook: registers `graft_dot` in the function
  * registry so plain SQL can use the native expression —
  * `spark.sql("SELECT graft_dot(a, b) ...")`. Wire with
  * `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotEntry)
    ext.injectFunction(GraftExtensions.ngramEntry)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private val dotEntry = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot expects exactly 2 arguments")
      DotProduct(children.head, children(1)): Expression
    })

  private val ngramEntry = (
    FunctionIdentifier("graft_char_ngrams"),
    new ExpressionInfo(classOf[CharNGrams].getName, "graft_char_ngrams"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_char_ngrams expects (str, n)")
      val n = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_char_ngrams: n must be an integer literal, got $other")
      }
      CharNGrams(children.head, n): Expression
    })

  /** Register the functions on an ALREADY-RUNNING session (the
    * `spark.sql.extensions` config only applies at session build time).
    */
  def installInto(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(dotEntry._1, dotEntry._2, dotEntry._3)
    spark.sessionState.functionRegistry
      .registerFunction(ngramEntry._1, ngramEntry._2, ngramEntry._3)
  }
}
