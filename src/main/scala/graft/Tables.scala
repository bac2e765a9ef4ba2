package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated test tables (TESTDATA.md, FIXTURES.md §B).
  *
  * All queries read the parquet directly (no caching): filters and column
  * projections must reach the scan (`PushedFilters` / `ReadSchema` in
  * `.explain("formatted")`), which is the behavior that matters at 100 TB.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark rejects unless
    * this flag is on; with it, nanos read as LONG and [[load]] truncates to
    * µs (same truncation DuckDB applies), keeping both engines
    * bit-identical. Set ONCE at session build time by every entry point
    * (Verify/Bench/Explain/IngestBench and the test harness) — a loader
    * must not mutate session-global parquet semantics as a side effect. */
  val sessionConfig: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Apply [[sessionConfig]] to a session builder (single source of truth). */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    sessionConfig.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) file read under nanosAsLong
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // µs-precision naive timestamps (driver generators vary): the
        // session TZ is pinned UTC everywhere, so NTZ→LTZ keeps the same
        // wall clock while restoring the instant semantics every query
        // (epoch arithmetic, casts to double) is written against
        df.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => df
    }
  }

  /** Register every table as a temp view (for the SQL facade / spark.sql). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
