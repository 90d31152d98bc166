package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Errors mirroring the reference's query exceptions. */
class DoesNotExist(msg: String) extends RuntimeException(msg)
class MultipleResultsFound(msg: String) extends RuntimeException(msg)
class FieldError(msg: String) extends IllegalArgumentException(msg)

/** Django-lookup → Catalyst `Column` translation (SURVEY §2.2).
  *
  * Semantics match the reference's filter language
  * (`lamindb/models/query_set.py:1520-1584` + Django lookups): `exact` is
  * the default; `i*` variants are case-insensitive; `regex` has re.search
  * (substring) semantics, which `rlike` shares.
  */
object Lookups {
  val all: Set[String] = Set(
    "exact", "iexact", "contains", "icontains", "startswith", "istartswith",
    "endswith", "iendswith", "in", "gt", "gte", "lt", "lte", "isnull",
    "regex", "iregex", "range")

  private def l(v: Any): Column = v match {
    case c: Column => c
    case other     => lit(other)
  }

  def compile(c: Column, lookup: String, value: Any): Column = lookup match {
    case "exact" =>
      if (value == null) c.isNull else c === l(value)
    case "iexact"      => lower(c) === lower(l(value))
    case "contains"    => c.contains(l(value))
    case "icontains"   => lower(c).contains(lower(l(value)))
    case "startswith"  => c.startsWith(l(value))
    case "istartswith" => lower(c).startsWith(lower(l(value)))
    case "endswith"    => c.endsWith(l(value))
    case "iendswith"   => lower(c).endsWith(lower(l(value)))
    case "in" =>
      value match {
        case vs: Iterable[_] => c.isin(vs.toSeq: _*)
        case vs: Array[_]    => c.isin(vs.toIndexedSeq: _*)
        case v               => c.isin(v)
      }
    case "gt"  => c > l(value)
    case "gte" => c >= l(value)
    case "lt"  => c < l(value)
    case "lte" => c <= l(value)
    case "isnull" =>
      if (value == true) c.isNull else c.isNotNull
    case "regex"  => c.rlike(value.toString)
    case "iregex" => c.rlike("(?i)" + value.toString)
    case "range" =>
      value match {
        case (lo, hi)              => c >= l(lo) && c <= l(hi)
        case Seq(lo, hi)           => c >= l(lo) && c <= l(hi)
        case other                 => throw new FieldError(s"range lookup needs a 2-tuple, got $other")
      }
    case other => throw new FieldError(s"unsupported lookup '$other'")
  }
}

/** Q-object algebra (`lamindb` re-exports Django `Q` at `__init__.py:195`):
  * `Q("a__gt" -> 1) | Q("b" -> "x")`, `!q`, `q1 & q2`, arbitrarily nested.
  */
sealed trait QNode {
  def &(other: QNode): QNode = QAnd(Seq(this, other))
  def |(other: QNode): QNode = QOr(Seq(this, other))
  def unary_! : QNode = QNot(this)

  /** All lookup keys referenced anywhere in this tree (for branch-bypass
    * detection, `query_set.py:249-262`).
    */
  def keys: Seq[String] = this match {
    case QPred(k, _)  => Seq(k)
    case QAnd(cs)     => cs.flatMap(_.keys)
    case QOr(cs)      => cs.flatMap(_.keys)
    case QNot(c)      => c.keys
  }
}
final case class QPred(key: String, value: Any) extends QNode
final case class QAnd(children: Seq[QNode]) extends QNode
final case class QOr(children: Seq[QNode]) extends QNode
final case class QNot(child: QNode) extends QNode

object Q {
  def apply(kwargs: (String, Any)*): QNode =
    if (kwargs.size == 1) QPred(kwargs.head._1, kwargs.head._2)
    else QAnd(kwargs.map { case (k, v) => QPred(k, v) })
}
