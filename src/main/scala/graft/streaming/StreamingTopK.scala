package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** Streaming heavy hitters: continuous top-k over an unbounded token
  * stream with BOUNDED state — the classic Misra-Gries summary, merged
  * per micro-batch with plain distributed DataFrame ops (the
  * "mergeable summaries" formulation: summaries of two streams merge
  * by counter addition + (k+1)-th-counter subtraction, so exact
  * per-batch counts are just summaries with zero error).
  *
  * Why not a stateful aggregation? The batch CMS path (q_approx_topk)
  * needs a candidate set to enumerate winners, and a
  * flatMapGroupsWithState on a constant key would funnel every batch
  * row through one task. Here each micro-batch is exact-counted with a
  * normal codegen'd groupBy (map-side partials shrink the shuffle to
  * the batch vocabulary), then merged into the m-row summary — one
  * bounded join-free union-aggregate per batch, all distributed; the
  * only driver-sized value is the (m+1)-th counter used for eviction.
  *
  * Summary row contract (Misra-Gries counters UNDERESTIMATE): `cnt`
  * is a LOWER bound on the token's true stream count and `cnt + err`
  * an UPPER bound — `err` accumulates the eviction thresholds applied
  * while the token was present, the maximum undercount it can have
  * absorbed. Any token with true count > N/(m+1) is guaranteed
  * present — the heavy-hitter guarantee.
  *
  * State is a versioned parquet dir per micro-batch (`v<batchId>`,
  * overwrite-idempotent so a replayed batch rewrites the same version;
  * older versions are pruned). At 100 TB the state is m rows — the
  * stream's volume only flows through the per-batch partial counts.
  */
object StreamingTopK {

  val summarySchema: StructType = StructType(Seq(
    StructField("tok", StringType), StructField("cnt", LongType),
    StructField("err", LongType)))

  private def versionOf(p: Path): Long =
    p.getName.stripPrefix("v").toLong

  /** Latest persisted summary (typed-empty before the first batch).
    * `beforeVersion` bounds the read to versions STRICTLY below it —
    * the merge for a replayed batch id B must never see B's own
    * partially-committed output, or the replay would double-count. */
  def summary(spark: SparkSession, stateDir: String,
      beforeVersion: Option[Long] = None): DataFrame = {
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], summarySchema)
    if (!fs.exists(dir)) return empty
    val versions = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.startsWith("v"))
      .filter(p => beforeVersion.forall(versionOf(p) < _))
    if (versions.isEmpty) empty
    else spark.read.schema(summarySchema)
      .parquet(versions.maxBy(versionOf).toString)
  }

  /** The current top-k estimate: guaranteed lower-bound count, upper
    * bound, and whether the entry is EXACT (no eviction ever applied
    * while it was tracked). Ranked by the conservative lower bound. */
  def topK(spark: SparkSession, stateDir: String, k: Int): DataFrame =
    summary(spark, stateDir)
      .select(col("tok"), col("cnt").as("count_lower"),
        (col("cnt") + col("err")).as("count_upper"),
        (col("err") === 0L).as("exact"))
      .orderBy(col("count_lower").desc, col("tok"))
      .limit(k)

  /** Merge one micro-batch's exact token counts into the summary
    * (pure Misra-Gries merge; public for direct testing). */
  def merge(prev: DataFrame, batchTokens: DataFrame,
      capacity: Int): DataFrame = {
    val counts = batchTokens.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"), lit(0L).as("err"))
    val merged = prev.unionByName(counts)
      .groupBy(col("tok"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("err")).as("err"))
    val over = merged.orderBy(col("cnt").desc).limit(capacity + 1)
      .collect()
    if (over.length <= capacity) merged
    else {
      // the (capacity+1)-th counter: subtract it everywhere, drop the
      // non-positive — classic MG eviction; survivors absorb it as err
      val cStar = over.last.getLong(1)
      merged.filter(col("cnt") > cStar)
        .select(col("tok"), (col("cnt") - cStar).as("cnt"),
          (col("err") + cStar).as("err"))
    }
  }

  /** Wire a streaming token frame (column `tok`) into a continuously
    * maintained summary under `stateDir`. Start the returned writer
    * with `.start()` after setting a checkpoint. */
  def maintain(tokens: DataFrame, stateDir: String,
      capacity: Int = 1000, keepVersions: Int = 2)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    tokens.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val next = merge(
          summary(spark, stateDir, beforeVersion = Some(batchId)),
          batch, capacity)
        // overwrite of v<batchId> makes a replayed batch idempotent;
        // the read above never sees a partial write (new version dirs
        // become visible only once _SUCCESS-complete, and recovery
        // reads the max version)
        next.coalesce(1).write.mode("overwrite")
          .parquet(s"$stateDir/v$batchId")
        val dir = new Path(stateDir)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(dir).map(_.getPath)
          .filter(_.getName.startsWith("v"))
          .sortBy(versionOf).dropRight(keepVersions)
          .foreach(p => fs.delete(p, true))
        ()
    }
  }
}
