package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.protocol.LineProtocol

/** Raw line-protocol text → canonical measurement rows (reference E3,
  * refluxdb src/handlers.rs:100-145 + src/udpserver.rs:16-106, re-expressed
  * as a declarative plan so the same code runs in batch AND Structured
  * Streaming micro-batches).
  *
  * Canonical schema (FIXTURES.md §A.1):
  *   series, id, time, created_at, name, value, tags
  *
  * Semantics: one output row per field (reference per-field fan-out R5,
  * src/handlers.rs:113-134, via `explode(fields)`); event time honored from
  * the line timestamp, ns→µs (deviation D1 — the reference discards client
  * timestamps, SURVEY Q-A), falling back to arrival time; `created_at` is
  * always arrival time; fresh UUID per row (reference src/persistence.rs:110).
  * Unparseable lines are routed to a quarantine side (`parse_error` column)
  * rather than dropped — at 100 TB silent drops are unauditable.
  */
object IngestPipeline {

  /** Result struct of parse_line (FIXTURES.md §A.2 + error slot). */
  val parsedType: StructType = StructType(Seq(
    StructField("measurement", StringType),
    StructField("tags", MapType(StringType, StringType), nullable = false),
    StructField("fields", MapType(StringType, DoubleType), nullable = false),
    StructField("ts", LongType, nullable = true),
    StructField("parse_error", StringType, nullable = true)))

  private val parseLineFn: String => (String, Map[String, String],
      Map[String, Double], Option[Long], Option[String]) = { line =>
    LineProtocol.parse(if (line == null) "" else line) match {
      case Right(r) =>
        (r.measurement, r.tags.toMap, r.fields.toMap, r.timestamp, None)
      case Left(err) => (null, Map.empty, Map.empty, None, Some(err))
    }
  }

  /** Register `parse_line` / `to_line` for the SQL surface (SURVEY §7.5). */
  def registerUdfs(spark: SparkSession): Unit = {
    spark.udf.register("parse_line", parseLineFn)
    spark.udf.register("to_line",
      (m: String, tags: Map[String, String], fields: Map[String, Double],
       ts: java.lang.Long) =>
        LineProtocol.serialize(graft.protocol.LineRecord(
          m,
          if (tags == null) Vector.empty else tags.toVector.sortBy(_._1),
          if (fields == null) Vector.empty else fields.toVector.sortBy(_._1),
          Option(ts).map(_.longValue))))
  }

  /** `lines` must have a string column `value`; returns canonical rows. */
  def parseLines(spark: SparkSession, lines: DataFrame): DataFrame = {
    registerUdfs(spark)
    lines
      .withColumn("r", call_udf("parse_line", col("value")))
      .withColumn("created_at", current_timestamp())
      .filter(col("r._5").isNull && col("r._1").isNotNull)
      .select(col("r._1").as("series"),
        expr("uuid()").as("id"),
        coalesce(expr("timestamp_micros(r._4 div 1000)"), col("created_at"))
          .as("time"),
        col("created_at"),
        explode(col("r._3")).as(Seq("name", "value")),
        col("r._2").as("tags"))
  }

  /** Rejected lines with their parse error (quarantine side). */
  def parseErrors(spark: SparkSession, lines: DataFrame): DataFrame = {
    registerUdfs(spark)
    lines
      .withColumn("r", call_udf("parse_line", col("value")))
      .filter(col("r._5").isNotNull)
      .select(col("value").as("line"), col("r._5").as("parse_error"))
  }
}
