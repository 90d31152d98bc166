package graft.dtype

import org.apache.spark.sql.types._

/** The reference's feature dtype string grammar (`lamindb/base/types.py:
  * 132-145`, parser `models/feature.py:90-405`):
  *
  * {{{
  * simple := num | int | float | str | bool | datetime | date | dict | path | url | object
  * cat    := cat[Registry] | cat[Registry.field] | cat[R1|R2] (union), optional [filter]
  * list   := list[simple] | list[cat[...]]
  * }}}
  */
sealed trait Dtype { def asString: String }
final case class Simple(name: String) extends Dtype { def asString: String = name }
final case class Cat(registries: Seq[CatComponent]) extends Dtype {
  def asString: String = s"cat[${registries.map(_.asString).mkString("|")}]"
}
final case class CatComponent(registry: String, field: Option[String], filter: Option[String]) {
  def asString: String =
    registry + field.map("." + _).getOrElse("") + filter.map("[" + _ + "]").getOrElse("")
}
final case class ListOf(element: Dtype) extends Dtype {
  def asString: String = s"list[${element.asString}]"
}

object Dtype {
  val simpleNames: Set[String] = Set(
    "num", "int", "float", "str", "bool", "datetime", "datetime64[ns, UTC]",
    "date", "dict", "path", "url", "object")

  /** Parse a dtype string. Mirrors `parse_dtype`/`parse_cat_dtype`/
    * `parse_nested_brackets` (`feature.py:90-405`) semantically: bracket
    * nesting is tracked so filters like `cat[Gene.symbol[source='x']]`
    * survive, and `|` splits union components only at depth 0.
    */
  def parse(s: String): Dtype = {
    val t = s.trim
    if (simpleNames.contains(t)) Simple(t)
    else if (t.startsWith("list[") && t.endsWith("]"))
      ListOf(parse(t.substring(5, t.length - 1)))
    else if (t.startsWith("cat[") && t.endsWith("]")) {
      val inner = t.substring(4, t.length - 1)
      Cat(splitTopLevel(inner, '|').map(parseCatComponent))
    } else if (t == "cat") Cat(Nil)
    else throw new IllegalArgumentException(s"invalid dtype string '$s'")
  }

  /** Split on `sep` only where bracket depth is 0. */
  private[dtype] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '[' => depth += 1; cur.append('[')
      case ']' => depth -= 1; cur.append(']')
      case c if c == sep && depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    out += cur.toString
    out.result().filter(_.nonEmpty)
  }

  private def parseCatComponent(s: String): CatComponent = {
    // Registry[.field][[filter]] — filter is the innermost [...] suffix
    val (head, filter) =
      if (s.endsWith("]")) {
        val open = s.indexOf('[')
        if (open >= 0) (s.substring(0, open), Some(s.substring(open + 1, s.length - 1)))
        else (s, None)
      } else (s, None)
    // registry paths may be dotted modules (`bionty.Gene`); the reference
    // disambiguates against known registries — we use the convention that
    // registry segments are Capitalized and field names are lowercase
    val segs = head.split("\\.")
    if (segs.length >= 2 && segs.last.nonEmpty && segs.last.head.isLower)
      CatComponent(segs.init.mkString("."), Some(segs.last), filter)
    else CatComponent(head, None, filter)
  }

  /** Spark physical type for a dtype (SURVEY §1.2 mapping). Categoricals
    * are referentially typed: physically strings + registry membership.
    */
  def toSpark(d: Dtype): DataType = d match {
    case Simple("num") | Simple("float")    => DoubleType
    case Simple("int")                      => LongType
    case Simple("str") | Simple("path") | Simple("url") | Simple("object") => StringType
    case Simple("bool")                     => BooleanType
    case Simple("datetime")                 => TimestampNTZType
    case Simple("datetime64[ns, UTC]")      => TimestampType
    case Simple("date")                     => DateType
    case Simple("dict")                     => StringType // JSON string, like the reference
    case Simple(other)                      => throw new IllegalArgumentException(s"unmapped dtype $other")
    case Cat(_)                             => StringType
    case ListOf(el)                         => ArrayType(toSpark(el))
  }

  /** Value-type inference for literals (add_values path,
    * `infer_feature_type_convert_json` `_feature_manager.py:752-839`):
    * bool → int → float → datetime → str inference order.
    */
  def infer(value: Any): Dtype = value match {
    case _: Boolean                    => Simple("bool")
    case _: Int | _: Long              => Simple("int")
    case _: Float | _: Double          => Simple("num")
    case _: java.sql.Timestamp         => Simple("datetime")
    case _: java.sql.Date              => Simple("date")
    case _: java.time.LocalDate        => Simple("date")
    case s: String =>
      if (scala.util.Try(java.time.LocalDate.parse(s)).isSuccess) Simple("date")
      else if (scala.util.Try(java.time.Instant.parse(s)).isSuccess) Simple("datetime")
      else Simple("str")
    case m: Map[_, _]                  => Simple("dict")
    case it: Iterable[_] if it.nonEmpty => ListOf(infer(it.head))
    case _                             => Simple("object")
  }
}
