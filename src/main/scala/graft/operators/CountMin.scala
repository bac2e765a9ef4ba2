package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the shared hash
  * family behind batch q_cms_heavy_hitters and streaming st37. The
  * whole point of pinning it here: the sketch is DETERMINISTIC integer
  * arithmetic (((k·a+b) mod P) mod W with P = 2³¹−1), so the batch
  * build, the streaming state, and the DuckDB oracle all compute the
  * same 3×1024 table bit-for-bit, and "estimate ≥ true count" is a
  * checkable invariant rather than a tolerance claim.
  *
  * Scale shape: the build is a map-side ×`depth` expand whose partial
  * aggregation bounds the shuffle at depth×width rows per partition at
  * ANY corpus size; bucket sums are the mergeable summary (unions of
  * corpora = elementwise sums; streaming micro-batches merge the same
  * way, which is exactly what the complete-mode streaming agg does).
  */
object CountMin {
  val P = 2147483647L // 2^31-1 (Mersenne); keys ≤ ~3e7 and a ≤ 131071
  val W = 1024L       // keep k*a+b ≤ ~4e12 — no int64 overflow at 30x
  val hashes: Seq[(Int, Long, Long)] =
    Seq((0, 31L, 7L), (1, 131071L, 911L), (2, 8191L, 271L))

  /** One row per depth: struct(d, bucket) for `key`. */
  def bucketsOf(key: Column): Column =
    explode(array(hashes.map { case (d, a, b) =>
      struct(lit(d).as("d"), ((key * a + b) % P % W).as("bucket"))
    }: _*)).as("h")

  /** The (d, bucket, c) sketch table of an int64 key column — works on
    * batch AND streaming DataFrames (plain groupBy agg; in a stream the
    * agg state IS the sketch and micro-batches merge into it). */
  def sketch(keys: DataFrame, keyCol: String): DataFrame =
    keys.select(bucketsOf(col(keyCol)))
      .select(col("h.d").as("d"), col("h.bucket").as("bucket"))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for `probes` (small/broadcastable): min over depth
    * of the matching bucket counts. LEFT join + coalesce-to-0 so the min
    * is always over all `depth` rows: a never-seen key whose bucket is
    * empty at some depth estimates 0 (the true CMS semantics — an empty
    * bucket bounds the count at 0) instead of overestimating from the
    * matched depths only, or vanishing from the output entirely when all
    * its buckets are empty. */
  def estimate(sketchDf: DataFrame, probes: DataFrame,
      keyCol: String): DataFrame =
    probes.select(col("*"), bucketsOf(col(keyCol)))
      .select(col(keyCol), col("h.d").as("d"), col("h.bucket").as("bucket"))
      .join(broadcast(sketchDf), Seq("d", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
}
