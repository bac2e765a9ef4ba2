package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ZoneMaps

/** Streaming zone-map sidecar maintenance — the online twin of
  * operators/ZoneMaps' batch sidecar (st45): events arrive on the
  * ingest stream and ONE complete-mode per-block rollup is the entire
  * state — (blk) → (n_rows, min_ts, max_ts), which merges additively
  * across micro-batches (count sums, min/max fold — the st18
  * state-store-is-the-rollup recipe through the SHARED
  * ZoneMaps.sidecarRollup definition, so streamed == batch holds
  * bit-for-bit over every arrived prefix). The pruning readout answers
  * "which blocks can a `ts >= cut` scan skip?" straight from the
  * state.
  *
  * Why this matters online: the zone-map store is only useful if it is
  * CURRENT — a pruned scan consulting a stale sidecar would wrongly
  * skip blocks that have since grown past the cut. Streaming
  * maintenance keeps the sidecar exact without ever rescanning the
  * fact: state is BLOCK-domain sized (arrived rows / 512 — the same
  * size as the sidecar artifact itself, the object it maintains; in
  * append-order ingest only the newest block's entry changes, closed
  * blocks are immutable — a production sink emits them append-only,
  * the documented compaction path).
  */
object StreamingZoneMap {

  /** `ev`: streaming (event_id, ts, value) rows. Returns the per-block
    * sidecar rollup (ts AND value-cents min/max — both prune levels
    * stay current); run it in complete mode into the serving sink. */
  def sidecar(ev: DataFrame): DataFrame = ZoneMaps.sidecarRollup(ev)

  /** The prune decision over the accumulated state: blocks whose
    * max_ts is below the cut — exactly the set the batch
    * ZoneMaps.prunedRange skips. */
  def prunable(state: DataFrame, cut: String): DataFrame =
    state.filter(col("max_ts") < lit(cut).cast("timestamp"))
      .select(col("blk")).orderBy(col("blk"))
}
