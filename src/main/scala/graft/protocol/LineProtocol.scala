package graft.protocol

/** A typed line-protocol field value: DOUBLE fast path (the reference's
  * only type, refluxdb src/protocol.rs:40-44), plus the integer (`42i`),
  * string and bool values its README plans (README.md:50 "TODO: Handle
  * different data types for the measurement") and its own round-trip tests
  * require (protocol.rs:150-190 all use `fieldKey="fieldValue"`, which the
  * f64-only parser `unwrap()`-panics on — SURVEY Q-G). */
sealed trait FieldValue
object FieldValue {
  final case class FloatV(v: Double) extends FieldValue
  final case class IntV(v: Long) extends FieldValue
  final case class StringV(v: String) extends FieldValue
  final case class BoolV(v: Boolean) extends FieldValue
}

/** One parsed line-protocol record.
  *
  * Shape follows the reference (refluxdb src/protocol.rs:4-10): measurement
  * name, insertion-ordered tag set, insertion-ordered typed field set,
  * optional nanosecond timestamp.
  */
case class LineRecord(
    measurement: String,
    tags: Vector[(String, String)],
    fields: Vector[(String, FieldValue)],
    timestamp: Option[Long])

/** Line-protocol parse/serialize (reference R1/R2, refluxdb
  * src/protocol.rs:46-147), pure Scala — no Spark dependency so it can run
  * inside a codegen'd expression, a UDF, or the gateway thread.
  *
  * Grammar (whitespace-separated, as in the reference's split at
  * src/protocol.rs:85 — but escape- and quote-aware, so string field values
  * may contain spaces and commas, and tags may carry escaped structural
  * chars):
  *
  *   measurement[,tag=v[,tag=v...]] field=v[,field=v...] [timestamp_ns]
  *
  * Field value types (Influx line-protocol syntax): `1.5` → double,
  * `42i` → long, `"s"` → string (backslash-escaped `\"` and `\\`),
  * `t/T/true/True/TRUE` and f-forms → bool.
  *
  * Escaping (Influx spec; deviation D6 — the reference has none, quirk
  * Q-H): in the measurement, tag keys/values and field keys, a backslash
  * escapes space, comma, equals and backslash (`\ ` `\,` `\=` `\\`); any
  * other `\x` stays a literal two-char sequence. Double quotes delimit
  * ONLY field values (a `"` directly after `=` in the field segment);
  * anywhere else — in particular inside tag values — a quote is a literal
  * character and can never swallow separators (round-2 ADVICE fix).
  *
  * Reference error semantics preserved (src/protocol.rs:79-144): empty line,
  * missing fieldset, invalid timestamp are errors; a tag or field without
  * '=' is silently skipped (src/protocol.rs:98-101,118-123); a tag or field
  * whose VALUE is empty is likewise skipped — reference tag()/field()
  * (src/protocol.rs:34-44) insert only when the value is non-empty.
  * Deviations (SURVEY §7.4): D5 — a non-numeric unquoted field value is a
  * clean parse error (the reference `unwrap()`s and panics); A.4 — the
  * timestamp is optional (the line-protocol spec allows omission;
  * reference errors).
  */
object LineProtocol {

  private val boolTrue = Set("t", "T", "true", "True", "TRUE")
  private val boolFalse = Set("f", "F", "false", "False", "FALSE")

  /** Split on runs of separator chars that are neither backslash-escaped
    * nor inside a double-quoted string FIELD VALUE. Quote state begins only
    * at a `"` directly following `=` (a field-value opener): a stray quote
    * in a tag value is literal and cannot eat separators. Backslash always
    * protects the next char from acting as a separator; both chars are kept
    * verbatim here (context-specific unescaping happens per token later).
    */
  private def splitOutsideQuotes(s: String, isSep: Char => Boolean,
      quoteFromSegment: Int = 0): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var seg = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        cur.append(c).append(s.charAt(i + 1)); i += 2
      } else {
        if (c == '"' && seg >= quoteFromSegment &&
            (inQuote || (cur.nonEmpty && cur.charAt(cur.length - 1) == '=')))
          inQuote = !inQuote
        if (!inQuote && isSep(c)) {
          if (cur.nonEmpty) { out += cur.result(); cur.clear(); seg += 1 }
        } else cur.append(c)
        i += 1
      }
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  /** Split on every unescaped `sep`, PRESERVING empty tokens (so an empty
    * measurement before the first tag comma is still detected). */
  private def splitEscaped(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        cur.append(c).append(s.charAt(i + 1)); i += 2
      } else if (c == sep) {
        out += cur.result(); cur.clear(); i += 1
      } else { cur.append(c); i += 1 }
    }
    out += cur.result()
    out.result()
  }

  /** CHEAP pre-parse: just the measurement token (up to the first
    * unescaped ',', ' ' or '\t'), unescaped — lets a pushed-down
    * `series = 'x'` filter skip whole lines before tag/field parsing
    * (sources.LineProtocolSource). MUST mirror [[parse]]'s lexing of the
    * first segment exactly (same trim, same separators — quote state
    * never applies to segment 0) or the pushdown skip drops rows the
    * full parser would match. None for an empty measurement (the full
    * parser would reject the line anyway). */
  def measurementOf(line: String): Option[String] = {
    val t = line.trim
    var i = 0
    var end = -1
    while (i < t.length && end < 0) {
      val c = t.charAt(i)
      if (c == '\\' && i + 1 < t.length) i += 2
      else if (c == ',' || c == ' ' || c == '\t') end = i
      else i += 1
    }
    val tok = unescapeToken(t.substring(0, if (end < 0) t.length else end))
    if (tok.isEmpty) None else Some(tok)
  }

  /** Split `k=v` at the first unescaped '='; None when there is none. */
  private def splitKv(kv: String): Option[(String, String)] = {
    var i = 0
    while (i < kv.length) {
      val c = kv.charAt(i)
      if (c == '\\' && i + 1 < kv.length) i += 2
      else if (c == '=') return Some((kv.substring(0, i), kv.substring(i + 1)))
      else i += 1
    }
    None
  }

  /** `\ ` `\,` `\=` `\\` → the escaped char; any other `\x` stays literal
    * (Influx tolerates unescaped backslashes). */
  private def unescapeToken(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length &&
          " ,=\\".indexOf(s.charAt(i + 1)) >= 0) {
        sb.append(s.charAt(i + 1)); i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def parseFieldValue(v: String): Either[String, FieldValue] =
    if (v.startsWith("\"")) unquote(v).map(FieldValue.StringV.apply)
    else if (boolTrue.contains(v)) Right(FieldValue.BoolV(true))
    else if (boolFalse.contains(v)) Right(FieldValue.BoolV(false))
    else if (v.length > 1 && v.endsWith("i"))
      v.dropRight(1).toLongOption match {
        case Some(l) => Right(FieldValue.IntV(l))
        case None    => Left(s"invalid integer field value '$v'")
      }
    else v.toDoubleOption match {
      case Some(d) => Right(FieldValue.FloatV(d))
      case None    => Left(s"non-numeric field value '$v'")
    }

  /** `"escaped \" string"` → `escaped " string`; rejects unterminated or
    * trailing-garbage quoted values. */
  private def unquote(v: String): Either[String, String] = {
    if (v.length < 2 || !v.endsWith("\""))
      return Left(s"unterminated string value '$v'")
    val body = v.substring(1, v.length - 1)
    val sb = new StringBuilder(body.length)
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) {
        sb.append(body.charAt(i + 1)); i += 2
      } else if (c == '"') {
        return Left(s"unescaped quote inside string value '$v'")
      } else { sb.append(c); i += 1 }
    }
    Right(sb.toString)
  }

  def parse(line: String): Either[String, LineRecord] = {
    val trimmed = line.trim
    if (trimmed.isEmpty) return Left("empty line")
    // quotes are meaningful only from the FIELD segment on (index >= 1):
    // a quote in the measurement/tag segment is a literal character
    val segments = splitOutsideQuotes(trimmed,
      c => c == ' ' || c == '\t', quoteFromSegment = 1)
    if (segments.length < 2) return Left(s"missing fieldset: '$line'")
    if (segments.length > 3) return Left(s"too many segments: '$line'")

    val head = splitEscaped(segments(0), ',')
    val measurement = unescapeToken(head(0))
    if (measurement.isEmpty) return Left("empty measurement name")

    val tags = head.drop(1).flatMap { kv =>
      splitKv(kv) match {
        case Some((k, v)) if k.nonEmpty && v.nonEmpty =>
          Some(unescapeToken(k) -> unescapeToken(v))
        case _ => None // no '=' or empty value: skipped, as in the reference
      }
    }

    val fieldErrs = Vector.newBuilder[String]
    val fields = splitOutsideQuotes(segments(1), _ == ',').flatMap { kv =>
      splitKv(kv) match {
        case Some((k, v)) if k.nonEmpty && v.nonEmpty =>
          parseFieldValue(v) match {
            case Right(fv) => Some(unescapeToken(k) -> fv)
            case Left(err) => fieldErrs += err; None
          }
        case _ => None // no '=' or empty value: skipped, as in the reference
      }
    }
    val errs = fieldErrs.result()
    if (errs.nonEmpty) return Left(errs.mkString("; "))
    if (fields.isEmpty) return Left(s"no valid fields: '$line'")

    val ts: Either[String, Option[Long]] =
      if (segments.length == 3)
        segments(2).toLongOption
          .toRight(s"invalid timestamp '${segments(2)}'").map(Some(_))
      else Right(None)

    ts.map(LineRecord(measurement, tags, fields, _))
  }

  /** Escape for measurement / tag key / tag value / field key position. */
  private def escapeToken(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case ' '  => sb.append("\\ ")
      case ','  => sb.append("\\,")
      case '='  => sb.append("\\=")
      case c    => sb.append(c)
    }
    sb.toString
  }

  private def serializeValue(v: FieldValue): String = v match {
    case FieldValue.FloatV(d)  => d.toString
    case FieldValue.IntV(l)    => s"${l}i"
    case FieldValue.BoolV(b)   => b.toString
    case FieldValue.StringV(s) =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }

  /** Inverse of [[parse]] (reference R2, src/protocol.rs:46-72).
    *
    * String values are quoted and backslash-escaped; measurement, tag
    * keys/values and field keys are `\ ` `\,` `\=` `\\`-escaped (deviation
    * D6 — the reference's serializer emits structural chars raw, quirk Q-H,
    * so a tag like `host=a b` silently mis-parses there). Every record
    * round-trips: parse(serialize(r)) == r — including the reference's own
    * test lines (protocol.rs:150-190).
    */
  def serialize(r: LineRecord): String = {
    val tagPart =
      if (r.tags.isEmpty) escapeToken(r.measurement)
      else escapeToken(r.measurement) + "," +
        r.tags.map { case (k, v) => s"${escapeToken(k)}=${escapeToken(v)}" }
          .mkString(",")
    val fieldPart = r.fields
      .map { case (k, v) => s"${escapeToken(k)}=${serializeValue(v)}" }
      .mkString(",")
    val tsPart = r.timestamp.map(t => s" $t").getOrElse("")
    s"$tagPart $fieldPart$tsPart"
  }
}
