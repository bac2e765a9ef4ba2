package graft.streaming

/** The (series, time, tiebreak, value) row every online smoother consumes,
  * and the ONE definition of its deterministic in-batch fold order —
  * shared by [[StreamingEwma]] and [[StreamingHoltWinters]] so the
  * backfill==online invariants of both (StreamingSpec st13b/st16) can
  * never drift apart on the ordering (round-7 review: the two copies of
  * the sort key were one precision fix away from divergence).
  */
object SeriesPoint {

  case class Point(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      value: Double)

  /** Full-precision, overflow-free ordering matching the batch backfill's
    * `ORDER BY ts, event_id`: epoch seconds and nanos-of-second ride
    * separate tuple slots because a single nanos-since-epoch Long
    * overflows ±292 years from 1970 (a year-2300 event would sort
    * negative, i.e. FIRST, silently corrupting the fold); `getTime`
    * alone is milliseconds, which would collapse distinct microsecond
    * events into event_id order. `floorDiv` keeps pre-epoch timestamps
    * correct (getNanos is always in [0, 1e9)).
    */
  def orderKey(p: Point): (Long, Int, Long) =
    (Math.floorDiv(p.ts.getTime, 1000L), p.ts.getNanos, p.event_id)

  /** HALF_UP cents — the ONE streaming-side copy of the batch
    * `round(value*100)` Catalyst semantics (HALF_UP = away from zero),
    * shared by every integer-state smoother for the same reason orderKey
    * is shared: two copies of a canon are one precision fix away from
    * divergence. Sign-correct (round-8 review): a plain
    * `floor(v*100+0.5)` agrees with Catalyst only on non-negative v —
    * −12.5 cents would round to −12 streaming vs −13 batch, silently
    * breaking every streaming fixpoint the day a source carries negative
    * values; mirroring through |v| restores away-from-zero for both
    * signs. */
  def cents(v: Double): Long =
    if (v >= 0) math.floor(v * 100.0 + 0.5).toLong
    else -math.floor(-v * 100.0 + 0.5).toLong

  /** Epoch microseconds with the same overflow-free split as orderKey. */
  def epochUs(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
}
