package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Blocks-READ probe for the zone-map family (round-14 VERDICT #6: the
  * family's 50× wall-clock factors are OUTPUT-bound — kept rows grow
  * with K — which invites misreading; this prints the PRUNING side as a
  * measured number). For a data dir it reports, per cut, the sidecar's
  * total block count and the SURVIVOR count the scans actually open —
  * the same sidecar predicates `ZoneMaps.prunedRange` /
  * `prunedValueCut` / `prunedRangeValue` push into DPP, evaluated
  * standalone. Usage:
  * `sbt "runMain graft.ZoneProbe <dir> [<dir2> ...]"` — one JSON line
  * per dir. The cut constants are q_zone_scan*'s exact literals. */
object ZoneProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cutTs = lit("2024-01-20").cast("timestamp")
    val minCents = 30000L
    for (dir <- args) {
      val (_, sidecar) = graft.operators.ZoneMaps.eventsLayout(spark, dir)
      // coalesce: sum() over an EMPTY sidecar (zero blocks) is NULL and
      // getLong would NPE — an empty dir must print a zero-count line
      // (round-15 ADVICE)
      val row = sidecar.agg(
        count(lit(1)).as("blocks"),
        coalesce(sum(when(col("max_ts") >= cutTs, 1L).otherwise(0L)),
          lit(0L)).as("t"),
        coalesce(sum(when(col("max_value_cents") >= minCents, 1L)
          .otherwise(0L)), lit(0L)).as("v"),
        coalesce(sum(when(col("max_ts") >= cutTs &&
          col("max_value_cents") >= minCents, 1L).otherwise(0L)), lit(0L))
          .as("tv"))
        .head()
      val qd = dir.replace("\\", "\\\\").replace("\"", "\\\"")
      println(s"""{"dir":"$qd","blocks":${row.getLong(0)},""" +
        s""""open_time":${row.getLong(1)},"open_value":${row.getLong(2)},""" +
        s""""open_both":${row.getLong(3)}}""")
    }
    spark.stop()
  }
}
