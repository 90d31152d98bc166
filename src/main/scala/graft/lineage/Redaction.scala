package graft.lineage

/** Secret redaction for tracked params and persisted source code
  * (`lamindb/_secret_redaction.py` + `serialize_params_to_json`,
  * `core/_context.py:393-428`).
  *
  * Driver-side string processing only — params and source snippets are
  * metadata-scale; nothing here touches a DataFrame.
  */
object Redaction {

  val RedactedValue = "***REDACTED***"

  private val SensitiveKeyPattern =
    ("(^|[_\\-.])(api[_-]?key|access[_-]?key|secret|token|password|passwd|" +
      "private[_-]?key|client[_-]?secret)($|[_\\-.])").r

  /** camelCase/PascalCase → snake_case, lowered (`normalize_sensitive_key_name`). */
  def normalizeKeyName(key: String): String = {
    val s1 = key.replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
    s1.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase
  }

  def isSensitiveKey(key: String): Boolean =
    SensitiveKeyPattern.findFirstIn(normalizeKeyName(key)).isDefined

  /** Postgres URLs with inline credentials (`_POSTGRES_CREDENTIALS_URL_PATTERN`). */
  private val PostgresCredsPattern =
    "(?i)^postgres(?:ql)?://[^:@/\\s]+:[^@/\\s]+@[^/\\s]+(?:/[^\\s]*)?$".r

  def isSensitiveValue(value: Any): Boolean = value match {
    case s: String => PostgresCredsPattern.findFirstIn(s.trim).isDefined
    case _         => false
  }

  /** `serialize_params_to_json`: skip null/empty-list entries, redact
    * sensitive keys and credential-bearing values, emit deterministic
    * (key-sorted) JSON.
    */
  def serializeParams(params: Map[String, Any]): String = {
    val kept = params.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      v match {
        case null                       => None
        case xs: Seq[_] if xs.isEmpty   => None
        case _ =>
          val vv: Any =
            if (isSensitiveKey(k) || isSensitiveValue(v)) RedactedValue else v
          Some(k -> vv)
      }
    }
    kept.map { case (k, v) => s"${jsonString(k)}:${jsonValue(v)}" }
      .mkString("{", ",", "}")
  }

  private def jsonValue(v: Any): String = v match {
    case s: String     => jsonString(s)
    case b: Boolean    => b.toString
    case n: Byte       => n.toString
    case n: Short      => n.toString
    case n: Int        => n.toString
    case n: Long       => n.toString
    case n: Float      => n.toString
    case n: Double     => n.toString
    case n: BigDecimal => n.toString
    case xs: Seq[_]    => xs.map(jsonValue).mkString("[", ",", "]")
    case other         => jsonString(String.valueOf(other))
  }

  private def jsonString(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""

  // Source-code redaction: only hardcoded QUOTED literals in assignments
  // are redacted; env-based references stay untouched so the code remains
  // re-runnable (`_KEY_VALUE_ASSIGNMENT_PATTERN` & friends).
  private val KeyValueAssignment =
    "(?m)([A-Za-z_][A-Za-z0-9_.\\-]*)(\\s*(?::=|=|:)\\s*)(['\"`])(.*?)\\3".r
  private val EnvAssignment =
    "(?m)(os\\.environ\\[\\s*['\"]([^'\"]+)['\"]\\s*\\]\\s*=\\s*)(['\"`])(.*?)\\3".r
  private val QuotedKeyAssignment =
    "(?m)(['\"])([^'\"]+)\\1(\\s*:\\s*)(['\"`])(.*?)\\4".r
  private val EnvReferenceValue =
    "^(os\\.getenv\\(.+\\)|getenv\\(.+\\)|os\\.environ\\[[^\\]]+\\]|os\\.environ\\.get\\(.+\\))$".r

  /** Redact secret-looking assignments in source code before persisting
    * it on the Transform; returns (redacted source, redaction count).
    */
  def redactSource(source: String): (String, Int) = {
    var count = 0
    def sub(m: scala.util.matching.Regex.Match, key: String, prefix: String,
            quote: String, value: String): String =
      if ((isSensitiveKey(key) || isSensitiveValue(value)) &&
          EnvReferenceValue.findFirstIn(value).isEmpty && value != RedactedValue) {
        count += 1
        scala.util.matching.Regex.quoteReplacement(s"$prefix$quote$RedactedValue$quote")
      } else scala.util.matching.Regex.quoteReplacement(m.matched)

    var out = KeyValueAssignment.replaceAllIn(source, m =>
      sub(m, m.group(1), m.group(1) + m.group(2), m.group(3), m.group(4)))
    out = EnvAssignment.replaceAllIn(out, m =>
      sub(m, m.group(2), m.group(1), m.group(3), m.group(4)))
    out = QuotedKeyAssignment.replaceAllIn(out, m =>
      sub(m, m.group(2), m.group(1) + m.group(2) + m.group(1) + m.group(3),
        m.group(4), m.group(5)))
    (out, count)
  }
}
