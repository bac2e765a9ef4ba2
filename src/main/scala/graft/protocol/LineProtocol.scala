package graft.protocol

/** One parsed line-protocol record.
  *
  * Shape follows the reference (refluxdb src/protocol.rs:4-10): measurement
  * name, insertion-ordered tag set, insertion-ordered field set, optional
  * nanosecond timestamp. Field values are f64-only for parity (reference
  * src/protocol.rs:40-44 and README.md:50's TODO; SURVEY Q-G/D5).
  */
case class LineRecord(
    measurement: String,
    tags: Vector[(String, String)],
    fields: Vector[(String, Double)],
    timestamp: Option[Long])

/** Line-protocol parse/serialize (reference R1/R2, refluxdb
  * src/protocol.rs:46-147), pure Scala — no Spark dependency so it can run
  * inside a codegen'd expression, a UDF, or the gateway thread.
  *
  * Grammar (whitespace-separated, as in the reference's split at
  * src/protocol.rs:85):
  *
  *   measurement[,tag=v[,tag=v...]] field=v[,field=v...] [timestamp_ns]
  *
  * Reference error semantics preserved (src/protocol.rs:79-144): empty line,
  * missing fieldset, invalid timestamp are errors; a tag or field without
  * '=' is silently skipped (src/protocol.rs:98-101,118-123). Deviations
  * (SURVEY §7.4): D5 — a non-numeric field value is a clean parse error
  * (the reference `unwrap()`s and panics); A.4 — the timestamp is optional
  * (the line-protocol spec allows omission; reference errors).
  */
object LineProtocol {

  def parse(line: String): Either[String, LineRecord] = {
    val trimmed = line.trim
    if (trimmed.isEmpty) return Left("empty line")
    val segments = trimmed.split("\\s+")
    if (segments.length < 2) return Left(s"missing fieldset: '$line'")
    if (segments.length > 3) return Left(s"too many segments: '$line'")

    val head = segments(0).split(",", -1)
    val measurement = head(0)
    if (measurement.isEmpty) return Left("empty measurement name")

    val tags = head.drop(1).toVector.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => Some(k -> v)
        case _                         => None // skipped, as in the reference
      }
    }

    val fieldErrs = Vector.newBuilder[String]
    val fields = segments(1).split(",", -1).toVector.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty =>
          v.toDoubleOption match {
            case Some(d) => Some(k -> d)
            case None    => fieldErrs += s"non-numeric field value '$kv'"; None
          }
        case _ => None // skipped, as in the reference
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

  /** Inverse of [[parse]] (reference R2, src/protocol.rs:46-72).
    *
    * Like the reference, performs NO escaping: values containing spaces,
    * commas, or '=' produce lines that do not round-trip (reference quirk
    * Q-H — its parser splits on whitespace with no escape support either).
    * The round-trip invariant holds for values free of structural chars.
    */
  def serialize(r: LineRecord): String = {
    val tagPart =
      if (r.tags.isEmpty) r.measurement
      else r.measurement + "," +
        r.tags.map { case (k, v) => s"$k=$v" }.mkString(",")
    val fieldPart = r.fields.map { case (k, v) => s"$k=$v" }.mkString(",")
    val tsPart = r.timestamp.map(t => s" $t").getOrElse("")
    s"$tagPart $fieldPart$tsPart"
  }
}
