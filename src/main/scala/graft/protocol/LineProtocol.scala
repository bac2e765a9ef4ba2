package graft.protocol

/** A typed line-protocol field value: DOUBLE fast path (the reference's
  * only type, refluxdb src/protocol.rs:40-44), plus the string/bool values
  * its README plans (README.md:50 "TODO: Handle different data types for
  * the measurement") and its own round-trip tests require (protocol.rs:
  * 150-190 all use `fieldKey="fieldValue"`, which the f64-only parser
  * `unwrap()`-panics on — SURVEY Q-G). */
sealed trait FieldValue
object FieldValue {
  final case class FloatV(v: Double) extends FieldValue
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
  * src/protocol.rs:85 — but quote-aware, so string field values may
  * contain spaces and commas):
  *
  *   measurement[,tag=v[,tag=v...]] field=v[,field=v...] [timestamp_ns]
  *
  * Field value types (Influx line-protocol syntax): `1.5` → double,
  * `"s"` → string (backslash-escaped `\"` and `\\`), `t/T/true/True/TRUE`
  * and f-forms → bool. An integer literal parses as double; the Influx
  * `i` suffix is not supported (neither does the reference) — clean error.
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

  /** Split on runs of separator chars that sit OUTSIDE double quotes
    * (backslash escapes the next char inside quotes). */
  private def splitOutsideQuotes(s: String, isSep: Char => Boolean)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote && c == '\\' && i + 1 < s.length) {
        cur.append(c).append(s.charAt(i + 1)); i += 2
      } else {
        if (c == '"') inQuote = !inQuote
        if (!inQuote && isSep(c)) {
          if (cur.nonEmpty) { out += cur.result(); cur.clear() }
        } else cur.append(c)
        i += 1
      }
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  private def parseFieldValue(v: String): Either[String, FieldValue] =
    if (v.startsWith("\"")) unquote(v).map(FieldValue.StringV.apply)
    else if (boolTrue.contains(v)) Right(FieldValue.BoolV(true))
    else if (boolFalse.contains(v)) Right(FieldValue.BoolV(false))
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
    val segments = splitOutsideQuotes(trimmed, c => c == ' ' || c == '\t')
    if (segments.length < 2) return Left(s"missing fieldset: '$line'")
    if (segments.length > 3) return Left(s"too many segments: '$line'")

    val head = segments(0).split(",", -1)
    val measurement = head(0)
    if (measurement.isEmpty) return Left("empty measurement name")

    val tags = head.drop(1).toVector.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty && v.nonEmpty => Some(k -> v)
        case _ => None // no '=' or empty value: skipped, as in the reference
      }
    }

    val fieldErrs = Vector.newBuilder[String]
    val fields = splitOutsideQuotes(segments(1), _ == ',').flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty && v.nonEmpty =>
          parseFieldValue(v) match {
            case Right(fv) => Some(k -> fv)
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

  private def serializeValue(v: FieldValue): String = v match {
    case FieldValue.FloatV(d)  => d.toString
    case FieldValue.BoolV(b)   => b.toString
    case FieldValue.StringV(s) =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }

  /** Inverse of [[parse]] (reference R2, src/protocol.rs:46-72).
    *
    * String values are quoted and backslash-escaped, so they round-trip
    * even with spaces/commas/quotes inside — including the reference's own
    * test lines (protocol.rs:150-190). Tag values get NO escaping, like
    * the reference (quirk Q-H): a tag containing structural chars does not
    * round-trip.
    */
  def serialize(r: LineRecord): String = {
    val tagPart =
      if (r.tags.isEmpty) r.measurement
      else r.measurement + "," +
        r.tags.map { case (k, v) => s"$k=$v" }.mkString(",")
    val fieldPart = r.fields
      .map { case (k, v) => s"$k=${serializeValue(v)}" }.mkString(",")
    val tsPart = r.timestamp.map(t => s" $t").getOrElse("")
    s"$tagPart $fieldPart$tsPart"
  }
}
