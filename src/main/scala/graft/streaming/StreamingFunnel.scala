package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the online twin of q_funnel (st40):
  * per user, the view → click → purchase stage progression advances in
  * O(1) state (stage ordinal + the three stage timestamps) as events
  * stream in, and the per-stage distinct-user counts read out equal to
  * the batch funnel over the arrived prefix exactly.
  *
  * Twin argument: the batch funnel is min-based (t_view = min view ts;
  * t_click = min click ts STRICTLY after t_view; t_purchase = min
  * purchase ts strictly after t_click). Folding events in event-time
  * order computes the same values greedily — the first view seen IS
  * min(view ts), the first qualifying click after it IS the min click
  * past t_view — and timestamp TIES can't disturb it (an event at ts ==
  * the previous stage's time never qualifies under strict >, whichever
  * side of the tie folds first). Stage is monotone per user, so the
  * update-mode emission stream needs no retraction: the readout takes
  * each user's max emitted stage.
  *
  * ORDERING PRECONDITION (the [[StreamingStateRuns]] contract): rows
  * fold in ts order within each micro-batch only; per-user event-time
  * order across micro-batches comes from the source (the engine
  * gateway's monotone ingestion; see [[StreamingRate]] for the
  * buffering recipe for reordering sources).
  *
  * Scale shape: state is 4 numbers per ACTIVE user (never per event),
  * the shuffle is one user-key exchange per micro-batch, and the
  * readout is a user-domain-sized agg over the sink — RocksDB holds
  * the user domain at scale (the st9 posture).
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String)

  case class UserStage(user_id: Long, stage: Int,
      t_view_us: Long, t_click_us: Long, t_purchase_us: Long)

  /** (stage, t_view_us, t_click_us, t_purchase_us). */
  private type St = (Int, Long, Long, Long)

  private def us(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** `events` must carry user_id, ts, event_type; emits the user's
    * stage state once per micro-batch that touches it (Update mode). */
  def stages(events: DataFrame): Dataset[UserStage] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_type").cast("string"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, UserStage](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[St]) =>
          var (stage, tv, tc, tp) =
            state.getOption.getOrElse((0, -1L, -1L, -1L))
          rows.toSeq.sortBy(r => us(r.ts)).foreach { r =>
            val t = us(r.ts)
            if (stage == 0 && r.event_type == "view") {
              stage = 1; tv = t
            } else if (stage == 1 && r.event_type == "click" && t > tv) {
              stage = 2; tc = t
            } else if (stage == 2 && r.event_type == "purchase" && t > tc) {
              stage = 3; tp = t
            }
          }
          state.update((stage, tv, tc, tp))
          Iterator.single(UserStage(uid, stage, tv, tc, tp))
      }
  }

  /** Per-stage distinct-user funnel over the emission sink — IDENTICAL
    * to q_funnel over the arrived prefix: a user at final stage k
    * counts toward every stage ≤ k; stages no user reached emit no row
    * (the batch groupBy drops empty stages). */
  def readout(emitted: DataFrame): DataFrame = {
    val fin = emitted.groupBy(col("user_id"))
      .agg(max(col("stage")).as("stage"))
    val steps = Seq((1, "view"), (2, "click"), (3, "purchase"))
    steps.map { case (k, step) =>
      fin.filter(col("stage") >= k)
        .agg(count(lit(1)).as("n_users"))
        .select(lit(k).as("stage"), lit(step).as("step"), col("n_users"))
    }.reduce(_.unionAll(_))
      .filter(col("n_users") > 0L)
      .orderBy(col("stage"))
  }
}
