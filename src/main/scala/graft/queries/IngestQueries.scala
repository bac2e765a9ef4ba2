package graft.queries

import org.apache.spark.sql.functions._

import graft.ingest.IngestPipeline

/** Oracle-checked ingest queries: line-protocol text is BUILT from the
  * events table with Catalyst string expressions, parsed back through the
  * real typed ingest path (IngestPipeline.parseAll — the same mapPartitions
  * parse the engine's batch and streaming writers use), and the fan-out is
  * compared against DuckDB reconstructing the expected rows directly.
  *
  * This turns the typed-field union (double / `42i` long / string / bool,
  * reference README.md:50's TODO) and D6 tag escaping into driver-gated
  * correctness surface instead of spec-only coverage: every event becomes
  * one line carrying all four field types, an escaped-space tag value
  * (`h\ <n>` → "h <n>") and a nanosecond timestamp.
  */
object IngestQueries extends QuerySet {

  /** Line-protocol text built from events: every event becomes one line
    * carrying all four field types, an escaped-space tag and a ns
    * timestamp. */
  private def builtLines(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "events").select(concat(
      lit("meter,host=h\\ "), col("user_id") % 10,
      lit(" cnt="), col("event_id"), lit("i,ratio="), col("value"),
      lit(",label=\""), col("event_type"), lit("\",ok="),
      col("event_id") % 2 === 0,
      lit(" "), unix_micros(col("ts")) * 1000).as("value"))

  /** Shared projection + total order over the parsed per-field rows. */
  private def canonOut(parsed: org.apache.spark.sql.DataFrame) =
    parsed
      .filter(col("parse_error").isNull)
      .select(col("series"), col("name"), col("value"), col("value_long"),
        col("value_str"), col("value_bool"), col("time_ns"),
        col("tags").getItem("host").as("host"))
      // (time_ns, name) is unique per event+field; remaining columns only
      // break ties between events sharing an identical ns timestamp, and
      // within such a tie group every row has the same null columns (same
      // field name), so Spark/DuckDB null-placement defaults never differ
      .orderBy(col("time_ns"), col("name"), col("value_long"), col("value"),
        col("value_str"), col("value_bool"), col("host"))

  val queries: Map[String, Q] = Map(
    "q_ingest_typed" -> { (s, dir) =>
      canonOut(IngestPipeline.parseAll(s, builtLines(s, dir)))
    },

    // The SAME semantics through the custom Catalyst GENERATOR
    // (functions/ExplodeLineGenerator, §2.4k UDTF rung): the Generate
    // fan-out must reproduce the mapPartitions ingest path row-for-row,
    // certified against the identical DuckDB oracle. At scale Generate
    // pipelines inside the scan stage exactly like the typed flatMap —
    // this query exists so the generator surface has a driver-gated
    // correctness row, not just spec coverage.
    "q_ingest_generator" -> { (s, dir) =>
      import graft.functions.ExplodeLine.explode_line
      canonOut(builtLines(s, dir).select(explode_line(col("value"))))
    }
  )

  private val typedSql =
    """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |         epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS tns,
        |         'h ' || CAST(user_id % 10 AS VARCHAR) AS host
        |  FROM events)
        |SELECT * FROM (
        |  SELECT 'meter' AS series, 'cnt' AS name, NULL::DOUBLE AS value,
        |         CAST(event_id AS BIGINT) AS value_long,
        |         NULL::VARCHAR AS value_str, NULL::BOOLEAN AS value_bool,
        |         tns AS time_ns, host
        |  FROM e
        |  UNION ALL
        |  SELECT 'meter', 'ratio', value, NULL, NULL, NULL, tns, host FROM e
        |  UNION ALL
        |  SELECT 'meter', 'label', NULL, NULL, event_type, NULL, tns, host FROM e
        |  UNION ALL
        |  SELECT 'meter', 'ok', NULL, NULL, NULL, event_id % 2 = 0, tns, host FROM e)
        |ORDER BY time_ns, name, value_long, value, value_str, value_bool, host""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_ingest_typed" -> typedSql,
    // identical expected rows — the generator must match the typed
    // mapPartitions ingest path exactly
    "q_ingest_generator" -> typedSql
  )
}
