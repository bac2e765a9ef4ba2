package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ZONE-MAP STORE — the serving side of q_zone_maps (Moerkotte, VLDB
  * 1998 small materialized aggregates; the pruning index behind parquet
  * row-group stats / ClickHouse marks / Snowflake micro-partitions):
  * the events fact written ONCE per (dir, mtime) partitioned by a
  * fixed-width ingest-order block, with a persisted per-block min/max
  * timestamp sidecar. A time-range scan then consults the SIDECAR (a
  * block-domain table — never the fact) to derive the surviving-block
  * predicate, and the fact scan partition-prunes to those directories.
  * The r12 /similar lesson applied to range scans: serving never
  * re-scans facts to decide what to read.
  *
  * Pruning predicate shape: ingest order is roughly time order (the
  * correlation q_zone_maps measures), so the blocks surviving
  * `ts >= cut` form a SUFFIX of the block ids, and the pruning filter
  * is a single `blk >= minSurvivor` comparison on the partition
  * column — one scalar from a 1-row agg over the sidecar (a driver
  * read of one long, not a block-list collect: at 100 TB the block
  * DOMAIN is fact-sized/512, so enumerating surviving blocks into an
  * IN-list would be a data-sized collect; the contiguous-range scalar
  * is what keeps the driver out of the data path. An UNcorrelated
  * predicate column would need per-block flags pushed as a sidecar
  * semi-join instead — the q_dedup_cross anti-join posture — not a
  * driver list).
  *
  * Exactness: pruning must never change an answer, only the files
  * read — the exact predicate always closes the superset
  * (ZoneMapSpec pins result equality and the file-count reduction).
  */
object ZoneMaps {

  /** Rows per block: matches q_zone_maps' report (512 at test SF; a
    * production layout sizes blocks to the writer's file/row-group
    * unit — the constant is per-layout, not per-corpus). */
  val BlockRows = 512L

  /** The per-block min/max-ts sidecar rollup — ONE definition shared
    * by the [[eventsLayout]] batch build and the st45 streaming
    * maintenance twin (count/min/max merge additively across
    * micro-batches, so the streamed sidecar equals this batch rollup
    * over any arrived prefix bit-for-bit). `ev` needs (event_id, ts). */
  def sidecarRollup(ev: DataFrame): DataFrame =
    ev.withColumn("blk", expr(s"event_id div $BlockRows"))
      .groupBy(col("blk"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))

  /** The cached block-partitioned EVENTS layout + its zone-map sidecar
    * for a testdata dir, written once per (dir, mtime) — the
    * ZOrder.lineitemLayout / SignatureStore.forCorpus artifact recipe.
    * Returns (layout, sidecar). */
  def eventsLayout(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val src = new java.io.File(s"$dir/events.parquet")
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3
      .stringHash(s"${src.getCanonicalPath}@${src.lastModified}"))
    val out = s"${sys.props("java.io.tmpdir")}/graft_zonemap/events_$key"
    val p = new Path(out)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) {
      // staging + rename (the IncrementalRollup artifact discipline):
      // an interrupted build leaves only the staging dir — the final
      // root appears atomically complete or not at all
      val stage = new Path(out + ".staging")
      fs.delete(stage, true)
      val raw = graft.Tables.load(spark, dir, "events")
      raw.withColumn("blk", expr(s"event_id div $BlockRows"))
        .repartition(col("blk"))
        .write.mode("overwrite").partitionBy("blk")
        .parquet(s"$stage/data")
      sidecarRollup(raw)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/zonemap")
      fs.rename(stage, p)
    }
    (spark.read.parquet(s"$out/data"),
      spark.read.parquet(s"$out/zonemap"))
  }

  /** Time-range scan THROUGH the zone map — two pruning levels that
    * compose:
    *  1. STATIC suffix: the sidecar's 1-row agg yields the first block
    *     that can match; `blk >= that` is a literal partition filter
    *     (plan-time dir pruning, free). Exact when ingest order is
    *     globally time-ordered — the single-writer TSDB case.
    *  2. DYNAMIC survivor semi-join: the sidecar's surviving-block set
    *     broadcasts into a left-semi join on the partition column, so
    *     Spark's dynamic partition pruning also skips NON-contiguous
    *     dead blocks — the multi-tenant/backfill case where K
    *     time-ordered id ranges interleave and a single suffix keeps
    *     almost everything (measured: the 30-tenant replica drops the
    *     suffix's skip from 61% to 3%; the semi-join restores it).
    *     Broadcast side is block-domain — fine to ~10⁸ blocks; past
    *     that, keep suffix-only or roll blocks up to file granularity
    *     (the q_shortest_path broadcast-cutover posture).
    * The exact predicate always closes the superset. Returns exactly
    * the rows of `events WHERE ts >= cut`. */
  def prunedRange(spark: SparkSession, dir: String, cut: String): DataFrame = {
    val (layout, sidecar) = eventsLayout(spark, dir)
    val cutTs = lit(cut).cast("timestamp")
    // ONE scalar off the block-domain sidecar (documented driver read):
    // min block whose max_ts reaches the cut; an empty survivor set
    // (cut past the corpus) prunes everything
    val row = sidecar.filter(col("max_ts") >= cutTs)
      .agg(min(col("blk")).as("b")).head()
    if (row.isNullAt(0)) layout.filter(lit(false))
    else {
      val survivors = sidecar.filter(col("max_ts") >= cutTs)
        .select(col("blk"))
      layout.filter(col("blk") >= row.getLong(0))
        .join(broadcast(survivors), Seq("blk"), "left_semi")
        .filter(col("ts") >= cutTs)
    }
  }
}
