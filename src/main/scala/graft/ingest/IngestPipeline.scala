package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.protocol.{FieldValue, LineProtocol}

/** One parsed + fanned-out line: either a measurement row (parse_error null)
  * or a quarantined line (parse_error set, measurement fields null/zero).
  * Exactly one of value/value_long/value_str/value_bool is set per
  * measurement row — the typed-field union (reference README.md:50's
  * planned typed values; doubles stay the dense fast path, `42i` Influx
  * integer fields land in value_long). */
case class ParsedLine(
    line: String,
    series: String,
    name: String,
    value: Option[Double],
    value_long: Option[Long],
    value_str: Option[String],
    value_bool: Option[Boolean],
    time_ns: Option[Long],
    tags: Map[String, String],
    parse_error: String)

/** Raw line-protocol text → canonical measurement rows (reference E3,
  * refluxdb src/handlers.rs:100-145 + src/udpserver.rs:16-106, re-expressed
  * as a declarative plan so the same code runs in batch AND Structured
  * Streaming micro-batches).
  *
  * Canonical schema (FIXTURES.md §A.1):
  *   series, id, time, created_at, name, value, tags
  *
  * Semantics: one output row per field (reference per-field fan-out R5,
  * src/handlers.rs:113-134); event time honored from the line timestamp,
  * ns→µs (deviation D1 — the reference discards client timestamps, SURVEY
  * Q-A), falling back to arrival time; `created_at` is always arrival time;
  * fresh UUID per row (reference src/persistence.rs:110). Unparseable lines
  * are routed to a quarantine side (`parse_error`) rather than dropped — at
  * 100 TB silent drops are unauditable.
  *
  * The parse itself runs as a typed `mapPartitions` flatMap: exactly one
  * `LineProtocol.parse` per line (a struct-returning UDF would be re-inlined
  * by CollapseProject once per referenced field — 6-7 parses per line).
  * Everything downstream (uuid, time coalescing, partitioning) stays in
  * Catalyst expressions.
  */
object IngestPipeline {

  /** Scalar UDF surface for SQL users (SURVEY §7.5): parse_line / to_line.
    * Registered nondeterministic-free for ad-hoc use; the bulk pipeline
    * below uses the typed path instead. */
  def registerUdfs(spark: SparkSession): Unit = {
    spark.udf.register("parse_line",
      (line: String) => LineProtocol.parse(if (line == null) "" else line) match {
        case Right(r) =>
          (r.measurement, r.tags.toMap,
            r.fields.collect { case (k, FieldValue.FloatV(v)) => k -> v }.toMap,
            r.fields.collect { case (k, FieldValue.IntV(v)) => k -> v }.toMap,
            r.fields.collect { case (k, FieldValue.StringV(v)) => k -> v }.toMap,
            r.fields.collect { case (k, FieldValue.BoolV(v)) => k -> v }.toMap,
            r.timestamp, None)
        case Left(err) =>
          (null, Map.empty[String, String], Map.empty[String, Double],
            Map.empty[String, Long], Map.empty[String, String],
            Map.empty[String, Boolean], Option.empty[Long], Some(err))
      })
    spark.udf.register("to_line",
      (m: String, tags: Map[String, String], fields: Map[String, Double],
       fieldsInt: Map[String, Long], fieldsStr: Map[String, String],
       fieldsBool: Map[String, Boolean], ts: java.lang.Long) => {
        def opt[V](m: Map[String, V]): Map[String, V] =
          if (m == null) Map.empty else m
        val typed: Vector[(String, FieldValue)] =
          (opt(fields).view.mapValues(FieldValue.FloatV.apply).toVector ++
            opt(fieldsInt).view.mapValues(FieldValue.IntV.apply).toVector ++
            opt(fieldsStr).view.mapValues(FieldValue.StringV.apply).toVector ++
            opt(fieldsBool).view.mapValues(FieldValue.BoolV.apply).toVector)
            .sortBy(_._1)
        LineProtocol.serialize(graft.protocol.LineRecord(
          m,
          if (tags == null) Vector.empty else tags.toVector.sortBy(_._1),
          typed,
          Option(ts).map(_.longValue)))
      })
  }

  /** One parse per line, fan-out per field, quarantine rows inline. */
  def parseAll(spark: SparkSession, lines: DataFrame): DataFrame = {
    import spark.implicits._
    lines.select(col("value")).as[String].mapPartitions { it =>
      it.flatMap { line =>
        LineProtocol.parse(if (line == null) "" else line) match {
          case Right(r) =>
            r.fields.iterator.map { case (k, v) =>
              val (d, l, s, b) = v match {
                case FieldValue.FloatV(x)  => (Some(x), None, None, None)
                case FieldValue.IntV(x)    => (None, Some(x), None, None)
                case FieldValue.StringV(x) => (None, None, Some(x), None)
                case FieldValue.BoolV(x)   => (None, None, None, Some(x))
              }
              ParsedLine(line, r.measurement, k, d, l, s, b, r.timestamp,
                r.tags.toMap, null)
            }
          case Left(err) =>
            Iterator.single(
              ParsedLine(line, null, null, None, None, None, None, None,
                Map.empty, err))
        }
      }
    }.toDF()
  }

  /** parseAll output → canonical measurement rows (the ok side). */
  def canonical(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("parse_error").isNull)
      .withColumn("created_at", current_timestamp())
      .select(col("series"),
        expr("uuid()").as("id"),
        coalesce(expr("timestamp_micros(time_ns div 1000)"), col("created_at"))
          .as("time"),
        col("created_at"),
        col("name"), col("value"), col("value_long"), col("value_str"),
        col("value_bool"), col("tags"))

  /** parseAll output → rejected lines with their parse error. */
  def errors(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("parse_error").isNotNull)
      .select(col("line"), col("parse_error"))

  /** `lines` must have a string column `value`; returns canonical rows. */
  def parseLines(spark: SparkSession, lines: DataFrame): DataFrame =
    canonical(parseAll(spark, lines))

  /** Rejected lines with their parse error (quarantine side). */
  def parseErrors(spark: SparkSession, lines: DataFrame): DataFrame =
    errors(parseAll(spark, lines))
}
