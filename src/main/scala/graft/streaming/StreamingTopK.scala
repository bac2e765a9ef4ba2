package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** Streaming heavy hitters: continuous top-k over an unbounded token
  * stream with BOUNDED state — the classic Misra-Gries summary, merged
  * per micro-batch with distributed DataFrame ops (the "mergeable
  * summaries" formulation: summaries merge by counter addition +
  * (m+1)-th-counter eviction, so exact per-batch counts are just
  * summaries with zero error).
  *
  * Why not a stateful aggregation? The batch CMS path (q_approx_topk)
  * needs a candidate set to enumerate winners, and a
  * flatMapGroupsWithState on a constant key would funnel every batch
  * row through one task. Here each micro-batch is exact-counted with a
  * normal codegen'd groupBy (map-side partials shrink the shuffle to
  * the batch vocabulary), then outer-joined once with the m-row
  * summary; eviction is computed LOCALLY from the collected top
  * (capacity+1) rows — every survivor necessarily sits inside them —
  * so the distributed merge runs exactly once per batch and the next
  * summary is a driver-bounded (≤ capacity rows) literal frame.
  *
  * Summary row contract (Misra-Gries counters UNDERESTIMATE): `cnt`
  * is a LOWER bound on the token's true stream count and `cnt + err`
  * an UPPER bound. `err` must account for history the counter never
  * saw: a token ENTERING the summary inherits the global accumulated
  * eviction total (it may have been counted and fully evicted that
  * many times before), and survivors absorb each eviction threshold
  * applied while present — both are tracked, so the bounds hold even
  * for tokens that leave and re-enter. Any token with true count
  * > N/(m+1) is guaranteed present — the heavy-hitter guarantee.
  *
  * State layout: one versioned dir per micro-batch —
  * `v<batchId>/summary` (m rows) + `v<batchId>/meta` (the global
  * eviction total) — STAGED under a dot-prefixed temp dir and
  * atomically renamed, so readers never observe a partially-written
  * version (a bare parquet write becomes listable the moment the
  * committer creates the dir). A replayed batch id B reads only
  * versions strictly below B — recovery never double-counts — and
  * older versions are pruned (at least 2 kept: the replay of B needs
  * B-1). At 100 TB the state is m rows; the stream's volume only
  * flows through the per-batch partial counts.
  */
object StreamingTopK {

  val summarySchema: StructType = StructType(Seq(
    StructField("tok", StringType), StructField("cnt", LongType),
    StructField("err", LongType)))

  private val metaSchema: StructType =
    StructType(Seq(StructField("evicted_total", LongType)))

  private def versionOf(p: Path): Long =
    p.getName.stripPrefix("v").toLong

  /** Complete (renamed) version dirs under `stateDir`, optionally only
    * those strictly below `beforeVersion`. */
  private def versionDirs(spark: SparkSession, stateDir: String,
      beforeVersion: Option[Long]): Seq[Path] = {
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath).toSeq
      .filter(p => p.getName.startsWith("v") &&
        scala.util.Try(versionOf(p)).isSuccess)
      .filter(p => beforeVersion.forall(versionOf(p) < _))
  }

  /** Latest persisted summary (typed-empty before the first batch).
    * `beforeVersion` bounds the read to versions STRICTLY below it —
    * the merge for a replayed batch id B must never see B's own
    * output, or the replay would double-count. */
  def summary(spark: SparkSession, stateDir: String,
      beforeVersion: Option[Long] = None): DataFrame = {
    val vs = versionDirs(spark, stateDir, beforeVersion)
    if (vs.isEmpty) spark.createDataFrame(
      java.util.Collections.emptyList[Row](), summarySchema)
    else spark.read.schema(summarySchema)
      .parquet(new Path(vs.maxBy(versionOf), "summary").toString)
  }

  /** The global eviction total at the latest version — the maximum
    * count any single ABSENT token can have accumulated and lost. */
  def evictedTotal(spark: SparkSession, stateDir: String,
      beforeVersion: Option[Long] = None): Long = {
    val vs = versionDirs(spark, stateDir, beforeVersion)
    if (vs.isEmpty) 0L
    else spark.read.schema(metaSchema)
      .parquet(new Path(vs.maxBy(versionOf), "meta").toString)
      .head().getLong(0)
  }

  /** The current top-k estimate: guaranteed lower-bound count, upper
    * bound, and whether the entry is EXACT (err never touched it).
    * Ranked by the conservative lower bound. */
  def topK(spark: SparkSession, stateDir: String, k: Int): DataFrame =
    summary(spark, stateDir)
      .select(col("tok"), col("cnt").as("count_lower"),
        (col("cnt") + col("err")).as("count_upper"),
        (col("err") === 0L).as("exact"))
      .orderBy(col("count_lower").desc, col("tok"))
      .limit(k)

  /** Merge one micro-batch's exact token counts into the summary (pure
    * Misra-Gries merge; public for direct testing). Returns the next
    * (≤ capacity)-row summary as LOCAL rows plus the next global
    * eviction total. */
  def merge(prev: DataFrame, prevEvictedTotal: Long,
      batchTokens: DataFrame, capacity: Int): (Seq[Row], Long) = {
    val counts = batchTokens.groupBy(col("tok"))
      .agg(count(lit(1)).as("bcnt"))
    // full outer join, NOT union+sum: a token new to the summary must
    // inherit the global eviction total as its err (it may have been
    // counted and fully evicted before), which requires knowing
    // new-vs-existing — summed unions cannot tell them apart
    val merged = prev.join(counts, Seq("tok"), "full_outer")
      .select(col("tok"),
        (coalesce(col("cnt"), lit(0L)) +
          coalesce(col("bcnt"), lit(0L))).as("cnt"),
        coalesce(col("err"), lit(prevEvictedTotal)).as("err"))
    // every possible survivor of an eviction at threshold cStar (the
    // (capacity+1)-th counter) has cnt > cStar and therefore sits
    // inside the top capacity+1 rows: one distributed pass collects
    // them and the eviction itself is local driver math over ≤
    // capacity+1 bounded rows
    val over = merged.orderBy(col("cnt").desc, col("tok"))
      .limit(capacity + 1).collect().toSeq
    if (over.length <= capacity) (over, prevEvictedTotal)
    else {
      val cStar = over.last.getLong(1)
      val kept = over
        .filter(_.getLong(1) > cStar)
        .map(r => Row(r.getString(0), r.getLong(1) - cStar,
          r.getLong(2) + cStar))
      (kept, prevEvictedTotal + cStar)
    }
  }

  /** Wire a streaming token frame (column `tok`) into a continuously
    * maintained summary under `stateDir`. Start the returned writer
    * with `.start()` after setting a checkpoint. */
  def maintain(tokens: DataFrame, stateDir: String,
      capacity: Int = 1000, keepVersions: Int = 2)
      : DataStreamWriter[Row] = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    // a replay of batch B reads version B-1: pruning below 2 versions
    // would let a crash between the vB commit and the streaming
    // checkpoint silently reset the whole summary on restart
    require(keepVersions >= 2, s"keepVersions must be >= 2, got $keepVersions")
    tokens.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val before = Some(batchId)
        val (rows, nextTotal) = merge(
          summary(spark, stateDir, before),
          evictedTotal(spark, stateDir, before),
          batch, capacity)
        // stage both parts, then one atomic rename: readers (and a
        // concurrent topK poller) never see a half-written version;
        // a replayed batch deletes the orphaned target first
        val fs = new Path(stateDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val staging = new Path(stateDir, s".staging_v$batchId")
        val target = new Path(stateDir, s"v$batchId")
        fs.delete(staging, true)
        spark.createDataFrame(rows.asJava, summarySchema).coalesce(1)
          .write.mode("overwrite")
          .parquet(new Path(staging, "summary").toString)
        spark.createDataFrame(
          java.util.Collections.singletonList(Row(nextTotal)), metaSchema)
          .coalesce(1).write.mode("overwrite")
          .parquet(new Path(staging, "meta").toString)
        fs.delete(target, true)
        fs.rename(staging, target)
        versionDirs(spark, stateDir, None)
          .sortBy(versionOf).dropRight(keepVersions)
          .foreach(p => fs.delete(p, true))
        ()
    }
  }
}
