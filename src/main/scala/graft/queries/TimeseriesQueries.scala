package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Timeseries analytics beyond the reference's reach (SURVEY §2.4 e/j
  * extensions): pivot, distribution windows, sessionization, gap filling.
  * These are the batch formulations of the TSDB workhorses; the streaming
  * twins live in StreamingSpec (session_window, windowed rollups).
  *
  * Scale shapes: pivot = one hash agg with a fixed column set (values
  * enumerated, never inferred by a driver-side distinct at scale);
  * sessionization and gap-fill are single-shuffle window passes per series
  * key; the gap-fill grid is generated per-user by a generator (explode of
  * sequence), NOT a cross join.
  */
object TimeseriesQueries extends QuerySet {

  val queries: Map[String, Q] = Map(
    // Pivot: per-user event-type counts as columns (explicit value list —
    // at 100 TB you never let pivot() run its inference query).
    "q_pivot" -> { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("user_id") +:
          types.map(tp => coalesce(col(tp), lit(0L)).as(tp)): _*)
        .orderBy(col("user_id"))
    },

    // Distribution window functions: percent_rank / cume_dist / nth_value.
    "q19b_distribution" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value"), col("event_id"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"),
          micro(percent_rank().over(w)).as("pct_rank_micro"),
          micro(cume_dist().over(w)).as("cdist_micro"),
          nth_value(col("value"), 2).over(wf).as("second_lowest"))
        .orderBy(col("event_id"))
    },

    // Sessionization (batch): a session break is a >30 min gap per user;
    // session id = running count of breaks; then per-session stats.
    "q_sessionize" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("gap_s",
          col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double"))
        .withColumn("new_session",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          ntz(min(col("ts"))).as("session_start"),
          r6(max(col("ts")).cast("double") - min(col("ts")).cast("double"))
            .as("duration_s"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // Fixed-bin value histogram per event type (the dashboard workhorse):
    // bin width 25, integer bin ids — one hash agg, no sort until output.
    "q_histogram" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"),
          floor(col("value") / 25.0).cast("int").as("bin"))
        .agg(count(lit(1)).as("n"),
          r6(min(col("value"))).as("lo"),
          r6(max(col("value"))).as("hi"))
        .orderBy(col("event_type"), col("bin"))
    },

    // Cohort retention: users grouped by first-seen week; how many were
    // active k weeks later. Two hash aggs + one equi-join — no windows.
    "q_cohort_retention" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val cohort = e.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val active = e.select(col("user_id"),
        date_trunc("week", col("ts")).as("active_week")).distinct()
      active.join(cohort, Seq("user_id"))
        .withColumn("week_offset",
          datediff(col("active_week"), col("cohort_week")) / 7)
        .groupBy(ntz(col("cohort_week")).as("cohort_week"),
          col("week_offset").cast("int").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // Ordered funnel: view -> click -> purchase, each step strictly after
    // the previous one, per user; stage-completion counts.
    "q_funnel" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      v.select(lit(1).as("stage"), lit("view").as("step"), col("user_id"))
        .union(c.select(lit(2).as("stage"), lit("click").as("step"), col("user_id")))
        .union(p.select(lit(3).as("stage"), lit("purchase").as("step"), col("user_id")))
        .groupBy(col("stage"), col("step"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("stage"))
    },

    // Gap filling + forward fill (interpolation): hourly grid for one day
    // per user (generator, not cross join), left join observed hourly
    // averages, carry the last observation forward.
    "q_gapfill" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val grid = e.select(col("user_id")).distinct()
        .select(col("user_id"), explode(expr(
          "sequence(timestamp'2024-01-05 00:00:00', timestamp'2024-01-05 23:00:00', interval 1 hour)"))
          .as("hour"))
      val obs = e
        .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(avg(col("value")).as("avg_v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "hour"), "left")
        .select(col("user_id"), ntz(col("hour")).as("hour"),
          r6(last(col("avg_v"), ignoreNulls = true).over(w)).as("filled"),
          col("avg_v").isNotNull.as("is_observed"))
        .orderBy(col("user_id"), col("hour"))
    },

    // GAP FILL, fill(linear) mode (InfluxQL's other fill; q_gapfill is
    // fill(previous)): interior gaps interpolate between the bracketing
    // observations, edge gaps (no previous or no next) stay null. Same
    // per-user generated grid; TWO window passes over ONE exchange — the
    // backward pass (last observed value+hour) and the forward pass
    // (first observed value+hour) share the user_id hash partitioning, so
    // the plan is one shuffle + two in-partition sorts at any scale. The
    // time fraction is exact integer epoch-second math on both engines.
    "q_gapfill_linear" -> { (s, dir) =>
      val e = t(s, dir, "events")
      val grid = e.select(col("user_id")).distinct()
        .select(col("user_id"), explode(expr(
          "sequence(timestamp'2024-01-05 00:00:00', timestamp'2024-01-05 23:00:00', interval 1 hour)"))
          .as("hour"))
      val obs = e
        .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-06 00:00:00").cast("timestamp"))
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(avg(col("value")).as("avg_v"))
      val wb = Window.partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsHour = when(col("avg_v").isNotNull, col("hour"))
      grid.join(obs, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour"), col("avg_v"),
          last(col("avg_v"), ignoreNulls = true).over(wb).as("pv"),
          last(obsHour, ignoreNulls = true).over(wb).as("pt"),
          first(col("avg_v"), ignoreNulls = true).over(wf).as("nv"),
          first(obsHour, ignoreNulls = true).over(wf).as("nt"))
        .select(col("user_id"), ntz(col("hour")).as("hour"),
          r6(when(col("avg_v").isNotNull, col("avg_v"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("nv") - col("pv")) *
                (col("hour").cast("long") - col("pt").cast("long"))
                  .cast("double") /
                (col("nt").cast("long") - col("pt").cast("long"))
                  .cast("double"))).as("filled_linear"),
          col("avg_v").isNotNull.as("is_observed"))
        .orderBy(col("user_id"), col("hour"))
    },

    // DERIVATIVE / non_negative_derivative (InfluxDB's headline transform):
    // per-series rate of change between consecutive points, counter
    // resets (negative deltas) clamped to null. One lag-window pass per
    // partition key — a single shuffle at any scale. Rates are quantized
    // to micro-units per second AFTER the per-row division (both engines
    // compute the identical double from identical operands).
    // VECTOR BINARY OPS (PromQL's `a op b` with on(hour) matching — the
    // Grafana "ratio of two series" panel): hourly count vectors for
    // four event types combined as sum, difference, conversion ratio
    // (purchase/view) and error rate (error/(error+click)), half-up
    // integer micros. PromQL inner-matching drops timestamps missing on
    // either side; here that is a FILTER on the conditional agg (an
    // absent (hour,type) is count 0, and every matched h-row has ≥ 1),
    // so the whole operator is ONE hash aggregate on the hour bucket —
    // no join at all, where the naive translation runs four self-joins.
    // Both engines truncate toward zero on integer division (DuckDB's
    // // included), so positive or negative operands agree; all
    // operands here are positive anyway.
    "q_vector_binop" -> { (s, dir) =>
      def n(ty: String) =
        sum(when(col("event_type") === ty, 1L).otherwise(0L))
      val h = t(s, dir, "events")
        .filter(col("event_type")
          .isin("purchase", "view", "error", "click"))
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(n("purchase").as("n_purchase"), n("view").as("n_view"),
          n("error").as("n_error"), n("click").as("n_click"))
        .filter(col("n_purchase") > 0 && col("n_view") > 0 &&
          col("n_error") > 0 && col("n_click") > 0)
      h.select(ntz(col("hour")).as("hour"),
          col("n_purchase"), col("n_view"), col("n_error"), col("n_click"),
          (col("n_purchase") + col("n_view")).as("both_count"),
          (col("n_click") - col("n_error")).as("click_minus_error"),
          intDiv(col("n_purchase") * 1000000L +
            intDiv(col("n_view"), lit(2L)), col("n_view"))
            .as("conv_ratio_micro"),
          intDiv(col("n_error") * 1000000L +
            intDiv(col("n_error") + col("n_click"), lit(2L)),
            col("n_error") + col("n_click")).as("err_rate_micro"))
        .orderBy(col("hour"))
    },

    // RSI + CMO momentum readout (Wilder's Relative Strength Index and
    // the Chande Momentum Oscillator, the two classic gain/loss-ratio
    // indicators — public formulas; InfluxQL ships the same family as
    // technical-analysis functions): per series, split consecutive-point
    // deltas into gain and loss sums in EXACT int64 cents, then
    //   RSI = 100·Σgain/(Σgain+Σloss), CMO = 100·(Σgain−Σloss)/(Σgain+Σloss)
    // — pure rationals of integers, computed as half-up INTEGER division.
    // Both engines truncate toward zero on integer division (DuckDB's
    // INTEGER // included — verified -7 // 2 = -3, same as Catalyst's
    // IntegralDivide); the abs-then-sign form for CMO is kept for
    // clarity of the half-up rounding, not out of necessity.
    // NO floating point anywhere in this operator.
    // Constant series (denominator 0) report NULL.
    // One lag window + one rollup on the series key; catalog-sized.
    "q_tech_indicators" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val g = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100).cast("long").as("c"))
        .withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("d", col("c") - col("prev"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("d") > 0, col("d")).otherwise(0L)).as("sum_gain"),
          sum(when(col("d") < 0, -col("d")).otherwise(0L)).as("sum_loss"))
        .withColumn("den", col("sum_gain") + col("sum_loss"))
      g.select(col("user_id"), col("n_pairs"), col("sum_gain"),
          col("sum_loss"),
          when(col("den") > 0, intDiv(
            col("sum_gain") * 100000000L + intDiv(col("den"), lit(2L)),
            col("den"))).as("rsi_micro"),
          when(col("den") > 0,
            when(col("sum_gain") >= col("sum_loss"), lit(1L))
              .otherwise(lit(-1L)) *
            intDiv(abs(col("sum_gain") - col("sum_loss")) * 100000000L +
              intDiv(col("den"), lit(2L)), col("den"))).as("cmo_micro"))
        .orderBy(col("user_id"))
    },

    // CHANGES + RESETS (the two PromQL counter-shape diagnostics this
    // surface still lacked): per series, how many consecutive-point
    // value changes and how many decreases (counter resets — what
    // rate()/increase() must correct for; q_rate_counter APPLIES the
    // correction, this reports the diagnostic itself). Pure comparisons
    // on the stored doubles — no arithmetic, so cross-engine exact by
    // construction. One lag window + one rollup on the series key;
    // catalog-sized output.
    "q_changes_resets" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_v", lag(col("value"), 1).over(w))
        .filter(col("prev_v").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("value") =!= col("prev_v"), 1L).otherwise(0L))
            .as("n_changes"),
          sum(when(col("value") < col("prev_v"), 1L).otherwise(0L))
            .as("n_resets"))
        .orderBy(col("user_id"))
    },

    // PROMETHEUS histogram_quantile: the estimator every PromQL
    // deployment serves p95 dashboards from — bucket the raw values
    // into FIXED le-bounds (25/50/100/200/+Inf) per (event_type, day),
    // then linearly interpolate inside the first bucket whose
    // cumulative count crosses 0.95·total. This is the SCALE path for
    // percentiles: the data-sized stage is one map-side-combinable
    // count per (series, day, bucket) — 5 rows per series-day however
    // many raw points — and the interpolation runs on that tiny
    // rollup. All-integer: rank target compared as cum·1e6 ≥
    // 95e4·total (exact rational), result in micro-units via one
    // half-up int64 division (numerator provably ≥ 0, so trunc ==
    // DuckDB's floor //). NULL values fall to the +Inf bucket on both
    // engines (NULL <= bound is not-true in WHEN/CASE), whose answer
    // is pinned to the top finite bound — Prometheus's own +Inf rule.
    "q_histogram_quantile" -> { (s, dir) =>
      val bk = t(s, dir, "events")
        .select(col("event_type"),
          intDiv(unix_micros(col("ts")), lit(86400000000L)).as("day"),
          when(col("value") <= 25, 0L).when(col("value") <= 50, 1L)
            .when(col("value") <= 100, 2L).when(col("value") <= 200, 3L)
            .otherwise(4L).as("b"))
        .groupBy(col("event_type"), col("day"), col("b"))
        .agg(count(lit(1)).as("cnt"))
      val wOrd = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("b"))
      val wAll = Window.partitionBy(col("event_type"), col("day"))
      val pick = bk
        .withColumn("cum", sum(col("cnt")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("cnt")).over(wAll))
        .filter(col("cum") * 1000000L >= col("total") * 950000L)
        .withColumn("rk", row_number().over(wOrd))
        .filter(col("rk") === 1)
        .withColumn("cum_prev", col("cum") - col("cnt"))
      val lo = when(col("b") === 0, 0L).when(col("b") === 1, 25L)
        .when(col("b") === 2, 50L).otherwise(100L)
      val hi = when(col("b") === 0, 25L).when(col("b") === 1, 50L)
        .when(col("b") === 2, 100L).otherwise(200L)
      pick.select(col("event_type"), col("day"), col("total").as("n"),
          when(col("b") === 4, lit(200000000L)).otherwise(
            lo * 1000000L + intDiv(
              (hi - lo) * (col("total") * 950000L - col("cum_prev") * 1000000L)
                + intDiv(col("cnt"), lit(2L)),
              col("cnt"))).as("p95_micro"))
        .orderBy(col("event_type"), col("day"))
    },

    // WEEK-OVER-WEEK ratio (Grafana's `offset 7d` comparison): hourly
    // event counts per type, each bucket paired with the bucket exactly
    // 168 hours earlier, ratio in half-up micro-units (NULL when no
    // prior week — the honest answer, not a gap-filled 0). The raw
    // scan collapses to a (type × hour) rollup FIRST — map-side
    // combinable, catalog×time-sized — and the offset pairing is a
    // self equi-join ON THAT ROLLUP, so 100 TB pays one count shuffle
    // and a join of two tiny aggregates (vs. joining raw events to
    // raw events shifted a week, which shuffles the corpus twice).
    "q_wow_ratio" -> { (s, dir) =>
      val h = t(s, dir, "events")
        .groupBy(col("event_type"),
          intDiv(unix_micros(col("ts")), lit(3600000000L)).as("hb"))
        .agg(count(lit(1)).as("cnt"))
      val prev = h.select(col("event_type"), (col("hb") + 168L).as("hb"),
        col("cnt").as("prev_cnt"))
      h.join(prev, Seq("event_type", "hb"), "left")
        .select(col("event_type"), col("hb").as("hour_bucket"), col("cnt"),
          col("prev_cnt"),
          intDiv(col("cnt") * 1000000L + intDiv(col("prev_cnt"), lit(2L)),
            col("prev_cnt")).as("wow_ratio_micro"))
        .orderBy(col("event_type"), col("hour_bucket"))
    },

    // BOLLINGER BANDS with an ALL-INTEGER breach test: the classic
    // mean ± 2σ band over a trailing 20-point window, but σ is never
    // materialized — a point is outside the band iff
    // (n·c − Σc)² > 4·(n·Σc² − (Σc)²), the band inequality multiplied
    // through by n² so it stays in exact int64 (c ≤ ~2e4 cents, n=20 →
    // every product < 2^63). fp never enters, so the boolean is
    // bit-identical cross-engine — the q_tech_indicators discipline
    // applied to a variance test. One window on the series key; 100 TB
    // pays exactly one user_id exchange and a 20-row frame.
    "q_bollinger" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-19, Window.currentRow)
      val base = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("value") * 100).cast("long").as("c"))
        .withColumn("s", sum(col("c")).over(w))
        .withColumn("ss", sum(col("c") * col("c")).over(w))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("n") === 20)
      val dev = col("n") * col("c") - col("s")
      val varN2 = col("n") * col("ss") - col("s") * col("s")
      base.select(col("user_id"), col("event_id"),
          col("c").as("value_cents"),
          intDiv(col("s") * 10000L + intDiv(col("n"), lit(2L)), col("n"))
            .as("mean_micro"),
          (dev > 0 && dev * dev > lit(4L) * varN2).as("breach_hi"),
          (dev < 0 && dev * dev > lit(4L) * varN2).as("breach_lo"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // POPULATION STABILITY INDEX (the drift metric every feature-store
    // monitors): week-over-week PSI of the value distribution per
    // event_type over the 5 fixed histogram buckets, Laplace-smoothed
    // (cnt+1)/(tot+5) so empty buckets stay finite. The data-sized
    // stage is ONE map-side-combinable (type, week, bucket) count; the
    // dense bucket grid, the offset self-join and the PSI formula all
    // run on that catalog×time-sized rollup. fp discipline: p and q are
    // exact-int ratios evaluated in one fixed order, each bucket's
    // (p−q)·ln(p/q) micro-floored BEFORE the integer sum (the BM25
    // pattern), so the sum order cannot flip low bits cross-engine.
    "q_drift_psi" -> { (s, dir) =>
      val b = t(s, dir, "events")
        .select(col("event_type"),
          intDiv(unix_micros(col("ts")), lit(604800000000L)).as("wk"),
          when(col("value") <= 25, 0L).when(col("value") <= 50, 1L)
            .when(col("value") <= 100, 2L).when(col("value") <= 200, 3L)
            .otherwise(4L).as("bk"))
        .groupBy(col("event_type"), col("wk"), col("bk"))
        .agg(count(lit(1)).as("cnt"))
      val tot = b.groupBy(col("event_type"), col("wk"))
        .agg(sum(col("cnt")).as("tot"))
      val grid = tot
        .select(col("event_type"), col("wk"), col("tot"),
          explode(sequence(lit(0L), lit(4L))).as("bk"))
        .join(b, Seq("event_type", "wk", "bk"), "left")
        .select(col("event_type"), col("wk"), col("bk"),
          coalesce(col("cnt"), lit(0L)).as("cnt"), col("tot"))
      val prev = grid.select(col("event_type"), (col("wk") + 1L).as("wk"),
        col("bk"), col("cnt").as("qcnt"), col("tot").as("qtot"))
      val p = (col("cnt") + 1L).cast("double") /
        (col("tot") + 5L).cast("double")
      val q = (col("qcnt") + 1L).cast("double") /
        (col("qtot") + 5L).cast("double")
      grid.join(prev, Seq("event_type", "wk", "bk"))
        .select(col("event_type"), col("wk"),
          floor((p - q) * log(p / q) * 1000000.0 + 0.5).cast("long")
            .as("term"))
        .groupBy(col("event_type"), col("wk"))
        .agg(sum(col("term")).as("psi_micro"))
        .orderBy(col("event_type"), col("wk"))
    },

    // TWO-SAMPLE KOLMOGOROV-SMIRNOV drift (Kolmogorov 1933, Smirnov
    // 1939 — the EXACT nonparametric member of the drift family:
    // q_drift_psi needs a bucket grid, q_text_kl_drift a smoothing
    // prior; KS is bucket-free and assumption-free, D = max |ECDF
    // difference|): week-over-week per event_type on the value
    // distribution, the same pairing frame as q_drift_psi. ALL-INTEGER
    // exactness: values go to exact cents, both weeks' counts meet on
    // the UNION value grid (full outer join, zero-filled), cumulative
    // counts come from one value-ordered window, and the ECDF gap is
    // cross-multiplied — D·nA·nB = max |cumA·nB − cumB·nA| — so
    // ks_micro = Dmax·1e6 div (nA·nB) never touches a float; int64-
    // safe while nA·nB ≤ 9.2e12 (~3M rows per (type, week) side — the
    // q_eval_auc documented-bound posture; past it, pre-divide the
    // cents domain). Scale shape: ONE (type, week, cents) hash agg is
    // the only fact-sized stage (value domain is price-bounded, so the
    // grid saturates); the windows partition by (type, week) — value-
    // domain-sized partitions, thousands of them; weeks missing a
    // predecessor drop via the nA/nB > 0 guard, not a special case.
    "q_drift_ks" -> { (s, dir) =>
      // checkpointed once: the per-(type, week, cents) counts feed the
      // current side AND the shifted previous side
      val v = t(s, dir, "events")
        .select(col("event_type"),
          intDiv(unix_micros(col("ts")), lit(604800000000L)).as("wk"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("wk"), col("cents"))
        .agg(count(lit(1)).as("pcnt"))
        .localCheckpoint(eager = true)
      val prev = v.select(col("event_type"), (col("wk") + 1L).as("wk"),
        col("cents"), col("pcnt").as("qcnt"))
      val wOrd = Window.partitionBy(col("event_type"), col("wk"))
        .orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"), col("wk"))
      v.join(prev, Seq("event_type", "wk", "cents"), "full_outer")
        .na.fill(0L, Seq("pcnt", "qcnt"))
        .withColumn("cumA", sum(col("pcnt")).over(wOrd))
        .withColumn("cumB", sum(col("qcnt")).over(wOrd))
        .withColumn("nA", sum(col("pcnt")).over(wAll))
        .withColumn("nB", sum(col("qcnt")).over(wAll))
        .filter(col("nA") > 0L && col("nB") > 0L)
        .withColumn("d",
          abs(col("cumA") * col("nB") - col("cumB") * col("nA")))
        .groupBy(col("event_type"), col("wk"))
        .agg(max(col("d")).as("dmax"),
          max(col("nA")).as("n_cur"), max(col("nB")).as("n_prev"))
        .select(col("event_type"), col("wk"), col("n_cur"),
          col("n_prev"),
          intDiv(col("dmax") * lit(1000000L),
            col("n_cur") * col("n_prev")).as("ks_micro"))
        .orderBy(col("event_type"), col("wk"))
    },

    // MARKOV TRANSITION MATRIX over the event-type alphabet: P(next |
    // current) per user-ordered stream, probabilities as half-up
    // micro-units of exact counts. One lead window on the user_id
    // partitioning + one ≤|types|²-key hash agg — the q_event_sequences
    // shape one order lower; output is alphabet²-sized at any SF.
    "q_markov_transitions" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val c = t(s, dir, "events")
        .select(col("event_type").as("cur"),
          lead(col("event_type"), 1).over(w).as("nxt"))
        .filter(col("nxt").isNotNull)
        .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("cnt"))
      val totW = Window.partitionBy(col("cur"))
      c.withColumn("tot", sum(col("cnt")).over(totW))
        .select(col("cur"), col("nxt"), col("cnt"),
          intDiv(col("cnt") * 1000000L + intDiv(col("tot"), lit(2L)),
            col("tot")).as("prob_micro"))
        .orderBy(col("cur"), col("nxt"))
    },

    // MULTI-TOUCH ATTRIBUTION (first-touch vs last-touch): every
    // purchase credited to the first and the most recent non-purchase
    // event type preceding it in the user's stream — the two window
    // passes marketing warehouses run nightly. first/last with
    // ignoreNulls over an UNBOUNDED PRECEDING..1 PRECEDING frame skips
    // the intervening purchases without a second scan; output is a
    // (touch × touch)-sized rollup with exact cents revenue. One
    // user_id exchange end-to-end.
    "q_attribution" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val np = when(col("event_type") =!= "purchase", col("event_type"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("value"),
          first(np, ignoreNulls = true).over(w).as("ft"),
          last(np, ignoreNulls = true).over(w).as("lt"))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("ft"), lit("(none)")).as("first_touch"),
          coalesce(col("lt"), lit("(none)")).as("last_touch"))
        .agg(count(lit(1)).as("purchases"),
          sum(round(col("value") * 100).cast("long")).as("revenue_cents"))
        .orderBy(col("first_touch"), col("last_touch"))
    },

    // SAX SYMBOLIZATION (Lin et al.'s Symbolic Aggregate approXimation,
    // the iSAX-family preprocessing step): each (user, day) series is
    // PAA-compressed to four 6-hour segment means (half-up integer
    // cents) and quantized against fixed breakpoints into an a–d
    // alphabet word. Two map-side-combinable hash aggs — the segment
    // rollup then the word concat; collect order is pinned by sorting
    // the (seg, symbol) structs, never by collect_list arrival order.
    "q_sax" -> { (s, dir) =>
      val us = unix_micros(col("ts"))
      val paa = t(s, dir, "events")
        .select(col("user_id"),
          intDiv(us, lit(86400000000L)).as("day"),
          intDiv(pmod(us, lit(86400000000L)), lit(21600000000L)).as("seg"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy(col("user_id"), col("day"), col("seg"))
        .agg(intDiv(sum(col("c")) + intDiv(count(lit(1)), lit(2L)),
          count(lit(1))).as("m"))
      paa.select(col("user_id"), col("day"), struct(col("seg"),
          when(col("m") <= 2500, "a").when(col("m") <= 5000, "b")
            .when(col("m") <= 10000, "c").otherwise("d").as("sym")).as("p"))
        .groupBy(col("user_id"), col("day"))
        .agg(array_join(transform(array_sort(collect_list(col("p"))),
          x => x.getField("sym")), "").as("sax_word"))
        .orderBy(col("user_id"), col("day"))
    },

    "q_derivative" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_v", lag(col("value"), 1).over(w))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("dt_us",
          unix_micros(col("ts")) - unix_micros(col("prev_ts")))
        .filter(col("prev_v").isNotNull && col("dt_us") > 0)
        .withColumn("rate_micro",
          micro((col("value") - col("prev_v")) /
            (col("dt_us").cast("double") / 1000000.0)))
        .select(col("event_id"), col("user_id"), col("rate_micro"),
          when(col("value") >= col("prev_v"), col("rate_micro"))
            .as("nn_rate_micro"))
        .orderBy(col("event_id"))
    },

    // EWMA (InfluxDB's EXPONENTIAL_MOVING_AVERAGE): per series, the
    // exponentially-weighted mean of the trailing 20 points with decay
    // 0.9, normalized over the weights actually present (so the warm-up
    // rows are well-defined). ONE window pass collects the trailing
    // values (20 doubles/row, bounded), then a codegen'd higher-order
    // fold scores newest-first with pow(0.9, k) weights — the SAME
    // newest-first order and pow the oracle's ORDER BY ... DESC
    // aggregate uses, keeping fp summation order identical across
    // engines. One shuffle on the series key, like every window op here.
    // NULL values are filtered BEFORE the window on both engines:
    // collect_list silently drops NULLs, which would compress Spark's
    // trailing array while the oracle's rn-distance weights kept the
    // gap — pre-filtering pins one semantics (EWMA over present values).
    "q_ewma" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-19, Window.currentRow)
      t(s, dir, "events")
        .filter(col("value").isNotNull)
        .withColumn("vals", collect_list(col("value")).over(w))
        .select(col("event_id"),
          r6(expr(
            """aggregate(
              |  zip_with(reverse(vals), sequence(0, size(vals) - 1),
              |           (v, k) -> v * pow(0.9D, k)),
              |  0D, (a, x) -> a + x)
              |/ aggregate(
              |  transform(sequence(0, size(vals) - 1),
              |            k -> pow(0.9D, k)),
              |  0D, (a, x) -> a + x)""".stripMargin)).as("ewma"))
        .orderBy(col("event_id"))
    },

    // EWMA RECURRENCE (batch twin of streaming st13): the SAME infinite
    // recurrence `ewma := 0.3*x + 0.7*ewma` (seeded by the series' first
    // value) folded over the full (ts, event_id)-ordered history of each
    // series, emitting the per-series fixpoint — so a batch backfill and
    // the online StreamingEwma produce the SAME state (StreamingSpec
    // asserts the agreement; round-6 VERDICT #7). Computed CONSTANT-
    // MEMORY (round-8: operators.SeriesFold — repartition by series +
    // external sortWithinPartitions + one mapPartitions streaming pass,
    // O(1) doubles per series), so a 100 TB backfill with arbitrarily
    // long series cannot OOM an executor; [[ewmaRecurrenceArrayFold]] is
    // the previous collect_list formulation, kept for the measured
    // comparison (SCALE.md §9). Same single shuffle on the series key;
    // identical fp op order (the sort mirrors sort_array's struct
    // order), so the DuckDB oracle's list_reduce fold still matches
    // term for term.
    "q_ewma_recurrence" -> { (s, dir) => ewmaRecurrence(s, dir) },

    // HOLT-WINTERS double exponential smoothing (InfluxQL's
    // HOLT_WINTERS, the trend-aware step past q_ewma_recurrence's
    // single smoother): per series, fold the full ordered history
    // through the level+trend recurrence
    //   l' = α·x + (1-α)·(l + b);  b' = β·(l' - l) + (1-β)·b
    // (α=0.5, β=0.3, seeded l=x₁ b=0) and emit the fixpoint plus the
    // 1-step forecast l+b — what an alerting path projects forward.
    // Computed CONSTANT-MEMORY via operators.SeriesFold (round-8, like
    // q_ewma_recurrence above): two doubles of state per series instead
    // of the full history array; [[holtWintersArrayFold]] keeps the
    // collect_list form for the measured comparison. The DuckDB oracle
    // folds a LIST-typed accumulator, not a struct: DuckDB 1.0's
    // list_reduce updates a struct accumulator FIELD-BY-FIELD (the b
    // expression would see the new l — measured, not speculated), while
    // list-typed state folds correctly. In the Scala step, computing l'
    // once and reusing it is bit-identical to the oracle's inlined
    // recomputation (same expression over the same values, strict
    // IEEE-754 both sides). One shuffle on the series key (streaming
    // st16 / StreamingHoltWinters stays the online path).
    "q_holt_winters" -> { (s, dir) => holtWinters(s, dir) },

    // ONLINE MOMENTS (Welford): exact one-pass running mean/variance per
    // series — the numerically stable recurrence (the naive
    // sum/sum-of-squares form catastrophically cancels at large n; at
    // 100 TB row counts sum² dwarfs the variance). Same
    // SeriesFold/streaming-twin discipline as q_ewma_recurrence: O(1)
    // state (n, mean, M2) per series in batch AND online
    // (StreamingWelford, st19 pins backfill == online); the DuckDB
    // oracle replays the identical op sequence through list_reduce.
    // var_run is the SAMPLE variance, pinned 0.0 at n=1 on both engines.
    "q_welford_moments" -> { (s, dir) => welfordMoments(s, dir) },

    // 1-D KALMAN FILTER (random-walk model): the adaptive-gain smoother
    // the EWMA family approximates — per series, state (x̂, P) with
    //   P⁻ = P + Q;  K = P⁻/(P⁻+R);  x̂' = x̂ + K·(z − x̂);  P' = (1−K)·P⁻
    // (Q=0.04, R=1.0, seeded x̂=z₁ P=1 — the standard scalar filter,
    // e.g. Welch & Bishop's introduction). Unlike q_ewma_recurrence's
    // fixed α, the gain K starts near 1 (trust early observations) and
    // converges to the steady-state Riccati value; p_final converging to
    // the same 0.180998 for every long series is the filter working, not
    // a bug. Same O(1)-state SeriesFold discipline as the EWMA/HW rows:
    // one shuffle on the series key, two doubles of state, arbitrarily
    // long series cannot OOM. In the Scala step K is computed once and
    // reused; the DuckDB list_reduce oracle inlines the same expression
    // twice — identical IEEE-754 value both ways (the q_holt_winters l'
    // precedent). Streaming twin: st34 (StreamingKalman fixpoint).
    "q_kalman_smooth" -> { (s, dir) =>
      graft.operators.SeriesFold.fold(
        t(s, dir, "events").filter(col("value").isNotNull),
        "user_id", Seq("ts", "event_id"), "value",
        Seq("x_raw", "p_raw"),
        seed = v => Array(v, 1.0d),
        step = (acc, z) => {
          val pp = acc(1) + 0.04d
          val k = pp / (pp + 1.0d)
          Array(acc(0) + k * (z - acc(0)), (1.0d - k) * pp)
        })
        .select(col("user_id"), col("n_points"),
          r6(col("x_raw")).as("kalman_final"),
          r6(col("p_raw")).as("p_final"))
        .orderBy(col("user_id"))
    },

    // SEQUENTIAL PATTERNS (contiguous trigrams): which 3-step event
    // paths do users actually take — the flat-support core of
    // PrefixSpan-style sequence mining, restricted to contiguous
    // subsequences so it runs as pure windows + one hash agg instead of
    // a candidate-generation loop. Per user, order the history and take
    // (e, lead(e,1), lead(e,2)); support = distinct users, plus raw
    // occurrence counts; min user support 10. Shape at 100 TB: the two
    // leads fuse into ONE Window node on the user_id partitioning every
    // events query shares, then a map-side-combinable agg on ≤|types|³
    // pattern keys — catalog-sized output, no second fact shuffle
    // (count(DISTINCT user_id) expands per-pattern user pairs, bounded
    // by users × 125 patterns).
    "q_event_sequences" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_type").as("a"),
          lead(col("event_type"), 1).over(w).as("b"),
          lead(col("event_type"), 2).over(w).as("c"))
        .filter(col("c").isNotNull)
        .groupBy(concat_ws(">", col("a"), col("b"), col("c")).as("pattern"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("user_id")).as("n_users"))
        .filter(col("n_users") >= 10L)
        .orderBy(col("n_occurrences").desc, col("pattern"))
    },

    // HOLT-WINTERS BACKTEST: walk-forward one-step-ahead evaluation of
    // the q_holt_winters smoother — at each point (after the seed) the
    // PREVIOUS state forecasts l+b, the absolute error accumulates, and
    // the state then updates on the actual. MAE per series is the number
    // that picks alpha/beta before a forecast ships; the fold is the
    // same O(1)-state SeriesFold with two extra accumulator doubles
    // (sequential sum → identical fp order on both engines).
    "q_hw_backtest" -> { (s, dir) =>
      graft.operators.SeriesFold.fold(
        t(s, dir, "events").filter(col("value").isNotNull),
        "user_id", Seq("ts", "event_id"), "value",
        Seq("level_raw", "trend_raw", "abs_err_raw", "n_err_raw"),
        seed = v => Array(v, 0.0d, 0.0d, 0.0d),
        step = (acc, x) => {
          val e = math.abs(x - (acc(0) + acc(1)))
          val l1 = 0.5d * x + 0.5d * (acc(0) + acc(1))
          Array(l1, 0.3d * (l1 - acc(0)) + 0.7d * acc(1),
            acc(2) + e, acc(3) + 1.0d)
        })
        .select(col("user_id"), col("n_points"),
          r6(col("level_raw")).as("level"),
          r6(col("trend_raw")).as("trend"),
          r6(when(col("n_err_raw") > 0.0, col("abs_err_raw")
            / col("n_err_raw")).otherwise(lit(0.0d))).as("mae"))
        .orderBy(col("user_id"))
    },

    // MODE (InfluxDB's most-frequent-value aggregate): per series, the
    // event type that occurs most often, ties broken lexicographically —
    // one count aggregate + one tiny per-series window, both shuffles on
    // the series key. (Spark's own `mode` agg breaks ties arbitrarily;
    // the explicit rank keeps the answer engine-deterministic.)
    "q_mode" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("cnt").desc, col("event_type"))
      t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"),
          col("cnt").as("mode_n"))
        .orderBy(col("user_id"))
    },

    // INTEGRAL (InfluxDB's area-under-curve aggregate): trapezoidal value
    // integral per series per day. Each trapezoid (v+prev_v)/2 * dt is a
    // per-row double computed from identical operands on both engines,
    // QUANTIZED to int64 micro value-seconds before the rollup — the
    // group sum is then exact integer math, immune to summation order
    // (the same discipline as q_text_perplexity).
    "q_integral" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .withColumn("prev_v", lag(col("value"), 1).over(w))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("prev_v").isNotNull)
        .withColumn("trap_micro",
          micro((col("value") + col("prev_v")) / 2.0 *
            ((unix_micros(col("ts")) - col("prev_us")).cast("double") /
              1000000.0)))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_segments"),
          sum(col("trap_micro")).as("integral_micro"))
        .orderBy(col("user_id"), col("day"))
    },

    // OHLC candle downsampling (open/high/low/close per hour bucket) —
    // the financial-TSDB aggregate InfluxDB spells FIRST/MAX/MIN/LAST.
    // open/close are min_by/max_by on the (ts, event_id) struct key
    // (unique, so deterministic): ONE hash aggregate with map-side
    // partials — a window + distinct formulation would pay three
    // exchanges for the same answer (review fix).
    "q_ohlc" -> { (s, dir) =>
      val ord = struct(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("bucket", date_trunc("hour", col("ts")))
        .groupBy(col("bucket"))
        .agg(min_by(col("value"), ord).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), ord).as("close"),
          count(lit(1)).as("n"))
        .select(ntz(col("bucket")).as("bucket"), col("open"), col("high"),
          col("low"), col("close"), col("n"))
        .orderBy(col("bucket"))
    },

    // Rolling z-score anomaly detection: each point scored against the
    // mean/stddev of its own trailing 10-point window per series — the
    // classic TSDB alerting primitive. One shuffle (the per-user window),
    // then map-only math; at 100 TB this is the same plan as any frame
    // window. Both engines evaluate the ordered frame identically;
    // micro() fixed-point keeps the boundary deterministic.
    "q_stat_anomaly" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-9, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          avg(col("value")).over(w).as("m"),
          stddev_samp(col("value")).over(w).as("sd"),
          count(lit(1)).over(w).as("nw"))
        .filter(col("nw") >= 5 && col("sd") > 0)
        .select(col("event_id"), col("user_id"),
          micro((col("value") - col("m")) / col("sd")).as("z_micro"))
        .filter(abs(col("z_micro")) >= 2000000)
        .orderBy(col("event_id"))
    },

    // WINSORIZATION: per-event-type clipping at the [p05, p95] band —
    // the standard robust preprocessing step before training on
    // heavy-tailed metrics. The band uses the DISCRETE ceil-rank
    // percentile computed in exact integer cents via the q18b
    // count-compress recipe (codegen'd (type,cents) count + one window
    // over the distinct values): the first cut used interpolated
    // percentile() and PASSED at sf0.01/sf0.1 but FAILED on the 10×
    // replica — Spark and DuckDB interpolate with different fp op order,
    // and the replica's heavy value ties at the boundary turned a
    // last-bit bound difference into different clip counts. Every
    // comparison here is int64, bit-exact at any scale; the clipped mean
    // rides micro-quantized cent sums (the avgMicro discipline,
    // non-negative values).
    "q_winsorize" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
      val cc = e.groupBy(col("event_type"), col("c"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wg = Window.partitionBy(col("event_type"))
      val ranked = cc.select(col("event_type"), col("c"),
        sum(col("cnt")).over(w).as("cum"),
        sum(col("cnt")).over(wg).as("n"))
      val bounds = ranked.groupBy(col("event_type"))
        .agg(
          // ceil(p*n) as (p_num*n + 99) div 100 — pure int64
          min(when(col("cum") >= intDiv(col("n") * 5 + 99, lit(100)),
            col("c"))).as("lo_c"),
          min(when(col("cum") >= intDiv(col("n") * 95 + 99, lit(100)),
            col("c"))).as("hi_c"))
      e.join(bounds, Seq("event_type"))
        .withColumn("cv",
          when(col("c") < col("lo_c"), col("lo_c"))
            .when(col("c") > col("hi_c"), col("hi_c"))
            .otherwise(col("c")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("c") < col("lo_c"), 1L).otherwise(0L))
            .as("n_clip_lo"),
          sum(when(col("c") > col("hi_c"), 1L).otherwise(0L))
            .as("n_clip_hi"),
          (min(col("lo_c")).cast("double") / 100.0).as("p05"),
          (min(col("hi_c")).cast("double") / 100.0).as("p95"),
          intDiv(sum(col("cv")) * 10000 + intDiv(count(lit(1)), lit(2)),
            count(lit(1))).as("mean_clip_micro"))
        .orderBy(col("event_type"))
    },

    // SPREAD + ELAPSED (the two InfluxQL aggregates without a dedicated
    // query yet): per series, the value range and the inter-point time
    // statistics. One lag window + one agg on the same user_id
    // partitioning; gaps are exact integer epoch-µs math end to end.
    "q_spread_elapsed" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("value"),
          unix_micros(col("ts")).as("us"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
            .as("gap_us"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_points"),
          r6(max(col("value")) - min(col("value"))).as("spread"),
          max(col("gap_us")).as("max_gap_us"),
          intDiv(max(col("us")) - min(col("us")),
            greatest(count(lit(1)) - 1L, lit(1L))).as("avg_gap_us"))
        .orderBy(col("user_id"))
    },

    // BINARY-SEGMENTATION CHANGEPOINT (Scott & Knott 1974; the offline
    // complement to q_anomaly_cusum's online alarm): per series, the
    // single best mean-shift split is the argmax over t of the CUSUM
    // deviation |S_t − (t/n)·S_n| — scaled by n to the PURE-INTEGER
    // statistic |n·S_t − t·S_n| (no division anywhere), so argmax and
    // tiebreak (earliest t) are bit-stable across engines; the two
    // segment means come out as half-up micro intDivs of the same exact
    // sums. Int64 bound: n·S_t ≤ len²·cents ≈ 1e17 at a 1e6-point
    // series of 1e5-cent values — fine at any replica (series length is
    // constant in K, the §9.11 argument). One shuffle (user_id) shared
    // by the running-sum window, the totals window and the argmax
    // window — the whole detector is one exchange.
    "q_changepoint" -> { (s, dir) =>
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wAll = Window.partitionBy(col("user_id"))
      val p = t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("cv", round(col("value") * 100).cast("long"))
        .withColumn("rn", row_number().over(wOrd).cast("long"))
        .withColumn("st", sum(col("cv")).over(wOrd.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("sn", sum(col("cv")).over(wAll))
      val wBest = Window.partitionBy(col("user_id"))
        .orderBy(col("score").desc, col("rn"))
      p.filter(col("rn") < col("n"))
        .withColumn("score", abs(col("n") * col("st")
          - col("rn") * col("sn")))
        .withColumn("rk", row_number().over(wBest))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("n"), col("rn").as("cp_pos"),
          col("score").as("cp_score"),
          intDiv(col("st") * 10000 + intDiv(col("rn"), lit(2)),
            col("rn")).as("mean_left_micro"),
          intDiv((col("sn") - col("st")) * 10000
            + intDiv(col("n") - col("rn"), lit(2)),
            col("n") - col("rn")).as("mean_right_micro"))
        .orderBy(col("user_id"))
    },

    // CUSUM changepoint detection (Page 1954): per series, normalize to
    // z-units and fold S := max(0, S + (z − k)) with slack k=0.5σ,
    // counting excursions past h=4σ — the classic drift detector (a
    // sustained mean shift accumulates where the EWMA/z-score family
    // sees only points). THE DETERMINISM TRICK: mean and σ are derived
    // from EXACT integer cent sums (Σc, Σc², n — the 2-decimal source
    // data makes them lossless int64), so both engines normalize from
    // bit-identical doubles and the max(0,·) fold — whose nonlinearity
    // would amplify any last-bit avg() summation-order drift into
    // different alarm counts — stays bit-identical term by term. The
    // int64 bound: n·Σc² and (Σc)² cap series length at ~1e7 points of
    // this magnitude — beyond that, promote the sums to DECIMAL.
    // One shuffle (user_id) shared by the moment agg, the join-back and
    // the SeriesFold; O(1) fold state (S, alarm count) per series.
    "q_anomaly_cusum" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100).cast("long").as("c"))
      val m = e.groupBy(col("user_id"))
        .agg(sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("sc2"),
          count(lit(1)).as("n"))
        .filter(col("n") > 1L)
      val norm = e.join(m, Seq("user_id"))
        .select(col("user_id"), col("ts"), col("event_id"),
          (((col("c").cast("double") / 100.0
            - col("sc").cast("double") / (lit(100.0) * col("n")))
            / sqrt((col("n") * col("sc2") - col("sc") * col("sc"))
              .cast("double")
              / (lit(10000.0) * col("n").cast("double")
                * (col("n") - 1L).cast("double"))))
            - 0.5).as("zk"))
      graft.operators.SeriesFold.fold(
        norm, "user_id", Seq("ts", "event_id"), "zk",
        Seq("cusum_raw", "alarms_raw"),
        seed = x => {
          val s0 = math.max(0.0, x)
          Array(s0, if (s0 > 4.0) 1.0 else 0.0)
        },
        step = (acc, x) => {
          val s1 = math.max(0.0, acc(0) + x)
          Array(s1, acc(1) + (if (s1 > 4.0) 1.0 else 0.0))
        })
        .select(col("user_id"), col("n_points"),
          r6(col("cusum_raw")).as("cusum_final"),
          col("alarms_raw").cast("long").as("n_alarms"))
        .orderBy(col("user_id"))
    },

    // ROBUST outlier detection: per-user median + MAD (median absolute
    // deviation), modified z-score 0.6745*(v-med)/MAD, |z| > 3.5
    // (Iglewicz-Hoaglin). Complements q_stat_anomaly's rolling mean/sd —
    // the mean/sd pair is itself dragged by the outliers it hunts; the
    // median/MAD pair has a 50% breakdown point. Scale shape: two exact-
    // percentile aggs and two joins, ALL keyed on user_id — one hash
    // partitioning reused end to end, per-group state is the percentile
    // value-count map (bounded by the per-user value domain; the
    // count-compress q18b recipe applies verbatim if it ever isn't).
    "q_anomaly_mad" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
        .filter(col("value").isNotNull)
      val med = e.groupBy(col("user_id"))
        .agg(expr("percentile(value, 0.5D)").as("med"))
      val mad = e.join(med, Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(expr("percentile(abs(value - med), 0.5D)").as("mad"))
      e.join(med, Seq("user_id")).join(mad, Seq("user_id"))
        .filter(col("mad") > 0)
        .select(col("event_id"), col("user_id"), col("value"),
          micro(lit(0.6745d) * (col("value") - col("med")) / col("mad"))
            .as("rz_micro"))
        .filter(abs(col("rz_micro")) > 3500000L)
        .orderBy(col("event_id"))
    },

    // Counter-reset-aware rate (the Prometheus increase()/rate() recipe,
    // the one TSDB primitive the family still lacked): per series ordered
    // by time, a step's contribution is v−prev when monotone and v itself
    // after a reset (the counter restarted from 0 — the standard
    // extrapolation-free lower bound). All step math is exact int64 cents
    // (2-decimal source), so sums are order-independent; only the final
    // one-per-series rate division is fp, with a fixed op order both
    // engines share. ONE user_id shuffle feeds the lag window and the
    // rollup; per-series agg state is 4 longs.
    "q_rate_counter" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("prev", lag(col("cents"), 1).over(w))
        .withColumn("inc",
          when(col("prev").isNull, 0L)
            .when(col("cents") < col("prev"), col("cents"))
            .otherwise(col("cents") - col("prev")))
        .withColumn("is_reset",
          when(col("prev").isNotNull && col("cents") < col("prev"), 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_points"),
          sum(col("is_reset")).as("n_resets"),
          sum(col("inc")).as("increase_cents"),
          min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
        .filter(col("n_points") >= 2L && col("t1") > col("t0"))
        .select(col("user_id"), col("n_points"), col("n_resets"),
          col("increase_cents"),
          micro((col("increase_cents").cast("double") / 100.0)
            / ((col("t1") - col("t0")).cast("double") / 1000000.0))
            .as("rate_micro"))
        .orderBy(col("user_id"))
    },

    // Rolling EXACT median over the trailing 11 points per series — the
    // robust twin of q_stat_anomaly's rolling mean. Exactness trick: the
    // window is collected as int64 cents and the lower median is an
    // ARRAY ELEMENT of the sorted window (no interpolation — the
    // q_winsorize 10×-replica catch showed interpolated percentiles
    // diverge between engines at value-tie mass), so every compared byte
    // is integer. Scale shape: one user_id shuffle, window state is
    // ≤11 longs per row group — constant, not series-length-bound.
    "q_moving_median" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-10, Window.currentRow)
      t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("win", collect_list(col("cents")).over(w))
        .select(col("event_id"), col("user_id"), col("cents"),
          size(col("win")).cast("long").as("n_win"),
          element_at(array_sort(col("win")),
            ((size(col("win")) + 1) / 2).cast("int")).as("med_cents"))
        .orderBy(col("event_id"))
    },

    // Per-series autocorrelation at lags 1..3 — the seasonality /
    // persistence diagnostic (flat ACF ⇒ white noise; slow decay ⇒
    // trending series worth a Holt-Winters pass). Pearson corr of
    // (v_t, v_{t+k}) from SIX exact int64 cent sums per lag, all
    // accumulated in ONE agg pass over ONE user_id shuffle; fp appears
    // only in the final per-series formula with a fixed op order (the
    // int sums are < 2^53 for series up to ~5×10^4 points at this value
    // magnitude — past that, promote to DECIMAL like q_anomaly_cusum's
    // scaladoc prescribes).
    "q_autocorr" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val lagged = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100).cast("long").as("x"))
        .withColumn("y1", lead(col("x"), 1).over(w))
        .withColumn("y2", lead(col("x"), 2).over(w))
        .withColumn("y3", lead(col("x"), 3).over(w))
      def sums(k: Int): Seq[org.apache.spark.sql.Column] = {
        val y = col(s"y$k")
        val m = y.isNotNull
        Seq(count(y).as(s"n$k"),
          sum(when(m, col("x"))).as(s"sx$k"),
          sum(y).as(s"sy$k"),
          sum(when(m, col("x") * col("x"))).as(s"sxx$k"),
          sum(y * y).as(s"syy$k"),
          sum(col("x") * y).as(s"sxy$k"))
      }
      def ac(k: Int): org.apache.spark.sql.Column = {
        val (n, sx, sy, sxx, syy, sxy) =
          (col(s"n$k"), col(s"sx$k"), col(s"sy$k"),
            col(s"sxx$k"), col(s"syy$k"), col(s"sxy$k"))
        micro((n * sxy - sx * sy).cast("double")
          / sqrt((n * sxx - sx * sx).cast("double")
            * (n * syy - sy * sy).cast("double")))
      }
      val s1 = sums(1)
      lagged.groupBy(col("user_id"))
        .agg(s1.head, (s1.tail ++ sums(2) ++ sums(3)): _*)
        .filter(col("n3") >= 3L &&
          col("n1") * col("sxx1") - col("sx1") * col("sx1") > 0L &&
          col("n1") * col("syy1") - col("sy1") * col("sy1") > 0L &&
          col("n2") * col("sxx2") - col("sx2") * col("sx2") > 0L &&
          col("n2") * col("syy2") - col("sy2") * col("sy2") > 0L &&
          col("n3") * col("sxx3") - col("sx3") * col("sx3") > 0L &&
          col("n3") * col("syy3") - col("sy3") * col("sy3") > 0L)
        .select(col("user_id"), col("n1").as("n_pairs"),
          ac(1).as("ac1_micro"), ac(2).as("ac2_micro"),
          ac(3).as("ac3_micro"))
        .orderBy(col("user_id"))
    },

    // Hour-of-day seasonal profile per event type (the STL-lite seasonal
    // component): exact integer mean (avgMicro discipline) + population
    // σ from the same int64 cent sums, one hash agg over a catalog-sized
    // (type × 24) output — the profile a deseasonalizer joins back
    // (broadcast: 120 rows at any corpus size).
    "q_seasonal_profile" -> { (s, dir) =>
      seasonalProfile(s, dir)
        .select(col("event_type"), col("hh"), col("n"),
          col("mean_micro"), col("std_micro"))
        .orderBy(col("event_type"), col("hh"))
    },

    // Seasonally-adjusted anomalies — the JOIN-BACK half of
    // q_seasonal_profile: each event scores against ITS (type, hour)
    // cell's mean/σ and the >3σ residuals surface. Every comparison is
    // integer (cents·10⁴ vs micro-units — the σ is the only fp-derived
    // quantity and it is already canonicalized to an int), so the
    // anomaly SET is bit-stable across engines; the profile side is
    // catalog-sized (type × 24 rows) at any corpus size → broadcast,
    // making the whole detector one map-only pass after the profile agg.
    "q_deseasonalize" -> { (s, dir) =>
      val d = hourlyCents(s, dir)
      val p = seasonalProfile(s, dir)
        .select(col("event_type"), col("hh"), col("mean_micro"),
          col("std_micro"))
      d.join(broadcast(p), Seq("event_type", "hh"))
        .select(col("event_id"), col("event_type"), col("hh"),
          (col("cents") * 10000 - col("mean_micro")).as("resid_micro"),
          col("std_micro"))
        .filter(abs(col("resid_micro")) > lit(3L) * col("std_micro"))
        .select(col("event_id"), col("event_type"), col("hh"),
          col("resid_micro"))
        .orderBy(col("event_id"))
    },

    // CLASSICAL SEASONAL DECOMPOSITION (the moving-average
    // trend/seasonal/remainder split — Kendall's "classical
    // decomposition", the method STL generalizes with loess): per
    // event_type hourly series, trend = centered 2×24-hour MA (the
    // standard even-period double average, here as ONE weighted window:
    // weights 1,2,…,2,1 over ±12 summed exactly then half-up divided by
    // 48 in micro-cents), seasonal = per hour-of-day mean of the
    // detrended series re-centered to zero over the 24 hours, remainder
    // = what's left. ALL-INTEGER after the one cents aggregation — both
    // engines compute bit-identical rows with no fp anywhere. Edges
    // without a full ±12 window are trimmed (lag/lead NULL + frame
    // count), the classical convention. The MA frame is POSITIONAL
    // (ROWS) by design — this data is gapless per type; gap repair is
    // q_gapfill's job, composed upstream when needed. Scale shape: one
    // fact-sized agg to (type × hour) cells, then windows over
    // catalog-sized series sharing one partitioning; the seasonal
    // profile (type × 24) broadcasts back — the q_deseasonalize plan.
    "q_stl_decompose" -> { (s, dir) =>
      val (tr, seas) = stlCore(s, dir)
      tr.join(broadcast(seas), Seq("event_type", "hh"))
        .select(col("event_type"), ntz(col("hr")).as("hr"),
          col("trend_micro"), col("seasonal_micro"),
          (col("detr_micro") - col("seasonal_micro"))
            .as("remainder_micro"))
        .orderBy(col("event_type"), col("hr"))
    },

    // SEASONALITY STRENGTH (Hyndman & Athanasopoulos, FPP: F_s =
    // max(0, 1 − Var(remainder)/Var(detrended))) — the scalar that says
    // whether q_stl_decompose's seasonal component is real structure or
    // noise, per series (0.16–0.60 on this corpus: genuine hour-of-day
    // signal). ALL-INTEGER to the last step: components come from the
    // ONE shared stlCore (this metric scores exactly what the
    // decomposition reports), micros round to cents and means round
    // half-up through POSITIVE-SHIFTED divisions ((x + 5e17 + 5e5) div
    // 1e6 − 5e11; + n·1e9 for the mean) so Spark's truncating
    // IntegralDivide equals DuckDB's flooring // on the possibly-
    // negative inputs (the q_graph_modularity trick); centered integer
    // deviations bound the square sums at ~2.8e17 (int64-safe at any
    // corpus since hourly cents are value-range-bounded — the
    // q_cross_corr mean argument), and the final ratio converts the
    // SAME exact int64s to double once on both engines. Scale shape:
    // everything after the fact-sized hourly agg is catalog-sized
    // (type × hours); the two-pass mean/deviation is two hash aggs and
    // a broadcast join.
    "q_seasonal_strength" -> { (s, dir) =>
      val (tr, seas) = stlCore(s, dir)
      def toCents(c: org.apache.spark.sql.Column) =
        intDiv(c + lit(500000000000000000L) + lit(500000L),
          lit(1000000L)) - lit(500000000000L)
      // checkpoint: rem feeds the mean pass AND the deviation pass, and
      // its subtree holds the fact-sized hourly agg — unsevered, the
      // plan audit read FOUR fact scans for one catalog-sized metric
      // (the q_dtw/assortativity lesson, third instance this round)
      val rem = tr.join(broadcast(seas), Seq("event_type", "hh"))
        .select(col("event_type"), toCents(col("detr_micro")).as("dc"),
          toCents(col("detr_micro") - col("seasonal_micro")).as("rc"))
        .localCheckpoint(eager = true)
      def meanShift(sc: org.apache.spark.sql.Column,
          n: org.apache.spark.sql.Column) =
        intDiv(sc + n * lit(1000000000L) + intDiv(n, lit(2L)), n) -
          lit(1000000000L)
      val m = rem.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("dc")).as("sdc"),
          sum(col("rc")).as("src"))
        .select(col("event_type"), col("n"),
          meanShift(col("sdc"), col("n")).as("md"),
          meanShift(col("src"), col("n")).as("mr"))
      rem.join(broadcast(m), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(min(col("n")).as("n_hours"),
          sum((col("dc") - col("md")) * (col("dc") - col("md")))
            .as("sd2"),
          sum((col("rc") - col("mr")) * (col("rc") - col("mr")))
            .as("sr2"))
        .filter(col("sd2") > 0L)
        .select(col("event_type"), col("n_hours"),
          greatest(lit(0L), micro(lit(1.0) -
            col("sr2").cast("double") / col("sd2").cast("double")))
            .as("strength_micro"))
        .orderBy(col("event_type"))
    },

    // LTTB-lite visualization downsampling (largest-triangle-three-
    // buckets, Steinarsson 2013) — THE standard TSDB chart decimator:
    // per series, 30-point buckets each keep the one point maximizing
    // the triangle area against the NEIGHBOR BUCKET AVERAGES (the
    // parallel variant: true LTTB anchors on the previously SELECTED
    // point — a sequential dependency; the bucket-average anchor is the
    // documented trade that makes every bucket independent, i.e. one
    // window + two co-partitioned joins instead of a series-ordered
    // fold). First/last points always kept (the LTTB contract).
    // Determinism end to end: times in µs offsets and values in cents
    // make the 2×area cross product EXACT int64 (neighbor-anchor gaps
    // bound the products at ~1e16 ≪ 2^63), ties break on event_id.
    // ONE user_id hash partitioning serves the ranking window, the
    // bucket-stats agg and both joins; the stats side is rows/30.
    "q_downsample_lttb" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wAll = Window.partitionBy(col("user_id"))
      val b = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t_us"),
          round(col("value") * 100).cast("long").as("cents"),
          col("ts"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_pts", count(lit(1)).over(wAll))
        .withColumn("bk", intDiv(col("rn") - 1L, lit(30L)))
        .withColumn("bk_max", intDiv(col("n_pts") - 1L, lit(30L)))
      val stats = b.groupBy(col("user_id"), col("bk"))
        .agg(intDiv(sum(col("t_us")), count(lit(1))).as("at_us"),
          intDiv(sum(col("cents")), count(lit(1))).as("ac"))
      val p = stats.select(col("user_id"), (col("bk") + 1L).as("bk"),
        col("at_us").as("p_at"), col("ac").as("p_ac"))
      val nx = stats.select(col("user_id"), (col("bk") - 1L).as("bk"),
        col("at_us").as("n_at"), col("ac").as("n_ac"))
      val area2 = abs((col("t_us") - col("p_at")) * (col("n_ac") - col("p_ac"))
        - (col("n_at") - col("p_at")) * (col("cents") - col("p_ac")))
      val wSel = Window.partitionBy(col("user_id"), col("bk"))
        .orderBy(col("area2").desc, col("event_id"))
      val mid = b.filter(col("bk") > 0L && col("bk") < col("bk_max"))
        .join(p, Seq("user_id", "bk"))
        .join(nx, Seq("user_id", "bk"))
        .withColumn("area2", area2)
        .withColumn("rk", row_number().over(wSel))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("bk"), col("event_id"),
          col("t_us"), col("cents"), col("area2"))
      val edges = b.filter(col("rn") === 1L || col("rn") === col("n_pts"))
        .select(col("user_id"), col("bk"), col("event_id"),
          col("t_us"), col("cents"), lit(0L).as("area2"))
      mid.unionByName(edges)
        .orderBy(col("user_id"), col("bk"), col("event_id"))
    },

    // Concurrent-session sweep line — "how many sessions were open at
    // once, per hour" (the ops/capacity question every TSDB gets):
    // sessionized intervals become ±1 edge events and concurrency is
    // their running sum. THE SCALE SHAPE IS THE POINT: the naive form
    // is one GLOBAL ordered window (a single-partition serialization —
    // exactly what dies first on a cluster); this plan is the standard
    // DISTRIBUTED PREFIX SUM instead — per-HOUR running sums (parallel
    // across hour partitions) plus a catalog-sized cumulative offset
    // join, algebraically identical to the global window at any data
    // size. All integer end to end (µs edges, ±1 deltas, total ordering
    // (t, delta, user, session) with ends before starts at equal t —
    // touching sessions never double-count).
    "q_concurrency" -> { (s, dir) =>
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = wU.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val iv = t(s, dir, "events")
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(wU))
        .withColumn("new_s",
          when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_s")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
      // partial-sum granularity is HOUR: the prefix-sum identity holds
      // at any granularity with identical results, and hour partitions
      // bound per-partition sort depth 24× tighter than days. Measured
      // honestly: at 100× replicas day and hour forms time the SAME
      // (7.6× vs 8.8×, inside the same-box noise envelope) because the
      // factor is dominated by sessionizing 100× events upstream, not
      // by the sweep — the granularity choice matters only when the
      // edge stream itself is the large side
      val sweep = iv.select(col("t0").as("t_us"), lit(1L).as("delta"),
          col("user_id"), col("session_id"))
        .unionByName(iv.select((col("t1") + 1L).as("t_us"),
          lit(-1L).as("delta"), col("user_id"), col("session_id")))
        .withColumn("hb", intDiv(col("t_us"), lit(3600000000L)))
      val wPart = Window.partitionBy(col("hb"))
        .orderBy(col("t_us"), col("delta"), col("user_id"),
          col("session_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val run = sweep.withColumn("part_run", sum(col("delta")).over(wPart))
      val wOff = Window.orderBy(col("hb"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val totals = sweep.groupBy(col("hb"))
        .agg(sum(col("delta")).as("hb_total"),
          count(lit(1)).as("hb_edges"))
      val offs = totals.select(col("hb"),
        coalesce(sum(col("hb_total")).over(wOff), lit(0L)).as("off"))
      // concurrency is piecewise-constant, changing only at edges — so
      // an hour's true max is max(level CARRIED INTO the hour, levels
      // after each edge within it), and hours with no edges at all
      // still carry a level (review catch: the edge-rows-only rollup
      // omitted empty hours entirely and ignored the carried level
      // where an hour's first edge was a −1). The hour GRID and both
      // cumulative windows are catalog-sized (hours in the span) at
      // any corpus size.
      val emax = run.join(broadcast(offs), Seq("hb"))
        .groupBy(col("hb").as("hour_bucket"))
        .agg(max(col("part_run") + col("off")).as("edge_max"))
      val grid = sweep.agg(min(col("hb")).as("h0"), max(col("hb")).as("h1"))
        .select(explode(expr("sequence(h0, h1)")).as("hour_bucket"))
      grid
        .join(broadcast(totals.withColumnRenamed("hb", "hour_bucket")),
          Seq("hour_bucket"), "left")
        .withColumn("end_level",
          sum(coalesce(col("hb_total"), lit(0L)))
            .over(Window.orderBy(col("hour_bucket"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("carry_in",
          col("end_level") - coalesce(col("hb_total"), lit(0L)))
        .join(broadcast(emax), Seq("hour_bucket"), "left")
        .select(col("hour_bucket"),
          greatest(col("carry_in"),
            coalesce(col("edge_max"), col("carry_in")))
            .as("max_concurrent"),
          coalesce(col("hb_edges"), lit(0L)).as("n_edges"))
        .orderBy(col("hour_bucket"))
    },

    // State-run compression (gaps-and-islands): consecutive same-type
    // events per series collapse to runs with length and elapsed time —
    // the InfluxDB ELAPSED/state-duration analog and the classic
    // islands formulation: grp = rn_series − rn_(series,state) is
    // constant exactly within a run, so runs fall out of ONE extra
    // window over the same user_id partitioning plus a hash agg. Runs
    // ≥3 surface (the "stuck state" alert shape). All integer.
    "q_state_runs" -> { (s, dir) =>
      val wAll = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wTyp = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("grp",
          (row_number().over(wAll) - row_number().over(wTyp)).cast("long"))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(count(lit(1)).as("run_len"),
          min(unix_micros(col("ts"))).as("t_start_us"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .as("elapsed_us"),
          min(col("event_id")).as("first_event_id"))
        .filter(col("run_len") >= 3L)
        .select(col("user_id"), col("event_type"), col("run_len"),
          col("t_start_us"), col("elapsed_us"), col("first_event_id"))
        .orderBy(col("user_id"), col("t_start_us"), col("event_type"))
    },

    // Cross-series correlation MATRIX — pairwise Pearson between the
    // hourly rollups of every event-type pair (the multi-series
    // analytics a one-table-per-series engine structurally cannot run —
    // SURVEY Q-F). Shape: rows collapse to (type, hour) EXACT integer
    // MEANS first (the aggregate-first discipline: the pair join carries
    // series×hours rows, never raw events), one hour-keyed self-join
    // with type_a < type_b, then the q_autocorr six-sum integer recipe
    // per pair — fp only in the final 10-row formula. The hourly series
    // is the floor-MEAN, not the sum, deliberately: means are bounded
    // by the VALUE RANGE at any corpus size, so the six int64 moment
    // sums can never overflow however many series roll into an hour —
    // the sum form measured an ANSI long-overflow at 30× replicas (the
    // per-hour sum grows with corpus; its square crosses 2^63), caught
    // by ScaleBench before it shipped.
    "q_cross_corr" -> { (s, dir) =>
      val h = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"),
          intDiv(unix_micros(col("ts")), lit(3600000000L)).as("hb"))
        .agg(intDiv(sum(round(col("value") * 100).cast("long")),
          count(lit(1))).as("cents"))
      val a = h.select(col("event_type").as("type_a"), col("hb"),
        col("cents").as("x"))
      val b = h.select(col("event_type").as("type_b"), col("hb"),
        col("cents").as("y"))
      a.join(b, Seq("hb")).filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .filter(col("n") >= 3L &&
          col("n") * col("sxx") - col("sx") * col("sx") > 0L &&
          col("n") * col("syy") - col("sy") * col("sy") > 0L)
        .select(col("type_a"), col("type_b"), col("n"),
          micro((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double")
            / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")
              * (col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double"))).as("corr_micro"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // DYNAMIC TIME WARPING similarity (Sakoe & Chiba 1978) between the
    // PAA-compressed daily-shape series of the 50 most-active users —
    // the alignment-TOLERANT member of the series-similarity family
    // (q_cross_corr = phase-locked Pearson; DTW matches "same shape,
    // shifted"): each user's valued events collapse to a 24-bucket PAA
    // vector (floor-mean cents per bucket over the global hour span,
    // missing buckets 0), pairs ranked by banded DTW distance (band 4).
    // ALL-INTEGER: cents in, exact int64 DTW out — the native dtw_band
    // expression (functions/Dtw.scala, codegen'd two-row DP) and the
    // oracle's recursive-CTE anti-diagonal DP compute the same number
    // bit-for-bit. Scale shape: AGGREGATE-FIRST — the only fact-sized
    // stage is one (user, bucket) hash agg (the PAA compression is
    // what makes DTW scale: raw-length DTW is O(len²) per pair);
    // blocking = top-50 activity truncation (the q_link_predict
    // recipe), so the pair table is 1225 rows BY CONSTRUCTION at any
    // corpus size and rides one broadcast nested-loop over vector rows
    // (PlanShapeSpec allowCross: both sides ≤ 50 rows). The global
    // hour-span bounds are a documented 2-scalar driver collect off
    // the fact agg (the q_zorder_key policy); the activity top-50 is
    // a distributed TakeOrderedAndProject over the user-domain count
    // table (orderBy+limit, no single-partition rank window).
    "q_dtw" -> { (s, dir) =>
      import graft.functions.DtwOps
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("user_id"),
          intDiv(unix_micros(col("ts")), lit(3600000000L)).as("hb"),
          round(col("value") * 100).cast("long").as("cents"))
      val top = topActive(
        ev.groupBy(col("user_id")).agg(count(lit(1)).as("n")))
      val bRow = ev.agg(min(col("hb")), max(col("hb"))).first()
      val (mn, span) = (bRow.getLong(0), bRow.getLong(1) - bRow.getLong(0) + 1)
      // true FLOOR-mean: intDiv truncates toward zero, DuckDB's //
      // floors — subtracting pmod (non-negative for a positive count)
      // makes the numerator exactly divisible, so the truncating
      // division IS floor division for any sign of sum(cents)
      val sc = sum(col("cents"))
      val nEv = count(lit(1))
      val bk = ev.join(broadcast(top), Seq("user_id"))
        .groupBy(col("user_id"),
          intDiv((col("hb") - lit(mn)) * 24, lit(span)).as("bucket"))
        .agg(intDiv(sc - pmod(sc, nEv), nEv).as("pv"))
      val grid = top.select(col("user_id"),
        explode(sequence(lit(0L), lit(23L))).as("bucket"))
      // checkpoint before the self-join: exchange reuse does not unify
      // aliased sides (the q_link_predict zn lesson — without this the
      // ENTIRE PAA subtree, fact scan included, runs once per side)
      val vecs = grid.join(bk, Seq("user_id", "bucket"), "left")
        .groupBy(col("user_id"))
        .agg(transform(array_sort(collect_list(struct(col("bucket"),
          coalesce(col("pv"), lit(0L)).as("pv")))),
          x => x.getField("pv")).as("v"))
        .localCheckpoint(eager = true)
      vecs.select(col("user_id").as("user_a"), col("v").as("x"))
        .join(vecs.select(col("user_id").as("user_b"), col("v").as("y")),
          col("user_a") < col("user_b"))
        .select(col("user_a"), col("user_b"),
          DtwOps.dtw_band(col("x"), col("y"), 4).as("dtw_dist"))
        .orderBy(col("dtw_dist"), col("user_a"), col("user_b"))
        .limit(100)
    },

    // SRE MULTI-WINDOW error-budget burn rate (the Google SRE workbook
    // alert): burn = error_rate / budget (20% here) over a short (1 h)
    // AND a long (6 h) window, alerting only when BOTH exceed 1 — the
    // short window gives fast detection, the long one suppresses blips.
    // Shape: the raw corpus collapses to an HOURLY rollup first (one
    // hash agg, map-side partials), so the trailing-window pass runs
    // over a CATALOG-SIZED frame (hours in the span) where the single
    // global ordering is a deliberate non-cost — the q_concurrency
    // measurement showed exactly this: offset/grid windows over
    // hour-count rows are noise next to the corpus-sized agg below
    // them. All-integer half-up rates (burn in micro).
    "q_burn_rate" -> { (s, dir) =>
      val w6 = Window.orderBy(col("hb")).rowsBetween(-5, Window.currentRow)
      def burn(err: org.apache.spark.sql.Column,
          tot: org.apache.spark.sql.Column) =
        intDiv(err * 5000000L + intDiv(tot, lit(2)), tot)
      t(s, dir, "events")
        .groupBy(intDiv(unix_micros(col("ts")), lit(3600000000L)).as("hb"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("n_err"))
        .withColumn("t6", sum(col("n_total")).over(w6))
        .withColumn("e6", sum(col("n_err")).over(w6))
        .select(col("hb"), col("n_total"), col("n_err"),
          burn(col("n_err"), col("n_total")).as("burn1_micro"),
          burn(col("e6"), col("t6")).as("burn6_micro"))
        .filter(col("burn1_micro") > 1000000L &&
          col("burn6_micro") > 1000000L)
        .orderBy(col("hb"))
    },

    // PREDICT_LINEAR / DERIV (the two PromQL trend primitives): per-series
    // ordinary-least-squares fit of value on time, reporting the slope
    // (deriv) and the value the line reaches one hour past the series'
    // last point (predict_linear — the "disk full in N hours" alert
    // shape). All five regression sums (n, Σt, Σv, Σtv, Σt²) are EXACT
    // int64 — t is epoch-second offset from the series' own first point
    // (bounded by series span: 2.6e6 s here, so Σt² ≤ ~7e14 ≪ 2^63 —
    // re-anchoring per series is what keeps the squares bounded at any
    // corpus age), v is int64 cents — so the sums are order-free and
    // engine-identical; fp enters ONLY in the final fixed-order per-series
    // formula (the q_autocorr recipe), micro-quantized. One groupBy
    // shuffle on the series key; the min-ts window shares the same
    // partitioning. Series whose points are all simultaneous (den = 0)
    // are dropped deterministically on both engines.
    "q_predict_linear" -> { (s, dir) =>
      val wmin = Window.partitionBy(col("user_id"))
      val p = t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("tt", intDiv(
          unix_micros(col("ts")) - unix_micros(min(col("ts")).over(wmin)),
          lit(1000000L)))
        .withColumn("cv", round(col("value") * 100).cast("long"))
      val sums = p.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("tt")).as("st"),
          sum(col("cv")).as("sv"), sum(col("tt") * col("cv")).as("stv"),
          sum(col("tt") * col("tt")).as("stt"), max(col("tt")).as("tmax"))
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val den = d(col("n")) * d(col("stt")) - d(col("st")) * d(col("st"))
      val slope = (d(col("n")) * d(col("stv")) - d(col("st")) * d(col("sv"))) / den
      sums.filter(col("n") >= 2 && den > 0.0)
        .select(col("user_id"), col("n"),
          micro(slope).as("deriv_micro"),
          micro((d(col("sv")) - slope * d(col("st"))) / d(col("n"))
            + slope * (d(col("tmax")) + 3600.0)).as("predict_micro"))
        .orderBy(col("user_id"))
    },

    // THEIL-SEN robust slope — the 29%-breakdown trend estimator next to
    // q_predict_linear's OLS (which one outlier drags arbitrarily; the
    // MAD-vs-mean relationship, now for slopes): the LOWER MEDIAN of all
    // pairwise slopes (v_j−v_i)/(t_j−t_i), t_j > t_i. Each slope is one
    // double division of exact int64 operands, micro-quantized PER PAIR —
    // so the median is a sorted-int ELEMENT selection (the banned-
    // interpolation canon) and byte-identical across engines. Scale
    // shape: the pair fan-out is a per-series self-join — O(L²) in
    // series LENGTH, which the data model bounds (~100 points/series;
    // series COUNT is what grows, and the join key is the series id, so
    // cost is linear in series count at any corpus size — the same
    // argument as the §9.11 window family); simultaneous-point pairs
    // (dt = 0) are excluded on both engines.
    "q_theil_sen" -> { (s, dir) =>
      val wmin = Window.partitionBy(col("user_id"))
      val p = t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("tt", intDiv(
          unix_micros(col("ts")) - unix_micros(min(col("ts")).over(wmin)),
          lit(1000000L)))
        .withColumn("cv", round(col("value") * 100).cast("long"))
        .select(col("user_id"), col("tt"), col("cv"))
      val a = p.select(col("user_id"), col("tt").as("ta"), col("cv").as("ca"))
      val b = p.select(col("user_id"), col("tt").as("tb"), col("cv").as("cb"))
      // force the sort-merge self-join: under the broadcast threshold the
      // planner builds a hashed relation of the WHOLE events side and
      // probes the quadratic fan-out through it — measured 5.3 s at sf0.1
      // vs 3.3 s on the 10× REPLICA, where AQE picks SMJ (both sides
      // share the user_id partitioning, and the downstream median window
      // reuses it). The merge hint makes the fixture plan THE scale plan.
      val sl = a.join(b.hint("merge"), Seq("user_id"))
        .filter(col("tb") > col("ta"))
        .select(col("user_id"),
          micro((col("cb") - col("ca")).cast("double")
            / (col("tb") - col("ta")).cast("double")).as("slope_micro"))
      // pair count per series computed ANALYTICALLY from the per-second
      // point multiplicities — cnt = C(L,2) − Σ_t C(k_t,2), every term
      // even before its halving so the integer arithmetic is exact —
      // instead of the former count() window, whose unbounded frame
      // buffered the QUADRATIC pair table a second time (r16: one full
      // WindowExec pass over the pair fan-out removed; the count now
      // partial-aggregates over the series-point table and broadcasts)
      val cnts = p.groupBy(col("user_id"), col("tt"))
        .agg(count(lit(1)).as("k"))
        .groupBy(col("user_id"))
        .agg(sum(col("k")).as("len"),
          sum(col("k") * (col("k") - 1)).as("t2"))
        .select(col("user_id"),
          (intDiv(col("len") * (col("len") - 1), lit(2L))
            - intDiv(col("t2"), lit(2L))).as("cnt"))
      val wr = Window.partitionBy(col("user_id")).orderBy(col("slope_micro"))
      sl.withColumn("rk", row_number().over(wr))
        .join(broadcast(cnts), Seq("user_id"))
        .filter(col("rk") === intDiv(col("cnt") + 1, lit(2)))
        .select(col("user_id"), col("cnt").as("n_pairs"),
          col("slope_micro").as("ts_slope_micro"))
        .orderBy(col("user_id"))
    },

    // AR(2) AUTOREGRESSIVE FORECAST — the lag-feature member of the
    // trend family (q_predict_linear regresses on TIME, Theil-Sen on
    // pairwise slopes; AR regresses the series on ITS OWN PAST — the
    // Yule-Walker shape, Box & Jenkins): per series, through-origin
    // least squares of value on its two lags, then a one-step-ahead
    // forecast from the last two observations. Exactness: lag features
    // are exact int64 cents from one series window; all five
    // normal-equation sums are int64 (cents² ≈ 1e10/row — no overflow
    // at any replica); the 2×2 solve is a FIXED-ORDER double expression
    // of those exact sums (det, then each coefficient — both engines
    // evaluate the identical operation sequence on identical bits),
    // micro-quantized on output. Scale shape: one shuffle on the series
    // key; the lag window, the tail row_number and the sum agg all
    // share that partitioning, so the whole operator is one exchange
    // and series-cardinality output — the §9.11 window-family argument.
    "q_ar_forecast" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wLast = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val p = t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("cv", round(col("value") * 100).cast("long"))
        .withColumn("x1", lag(col("cv"), 1).over(w))
        .withColumn("x2", lag(col("cv"), 2).over(w))
      val sums = p.filter(col("x2").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("x1") * col("x1")).as("s11"),
          sum(col("x1") * col("x2")).as("s12"),
          sum(col("x2") * col("x2")).as("s22"),
          sum(col("x1") * col("cv")).as("sy1"),
          sum(col("x2") * col("cv")).as("sy2"))
      val last = p.withColumn("rn", row_number().over(wLast))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("cv").as("lv"), col("x1").as("pv"))
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      sums
        .withColumn("det", d(col("s11")) * d(col("s22"))
          - d(col("s12")) * d(col("s12")))
        .filter(col("n") >= 3 && col("det") > 0.0)
        .withColumn("b1", (d(col("s22")) * d(col("sy1"))
          - d(col("s12")) * d(col("sy2"))) / col("det"))
        .withColumn("b2", (d(col("s11")) * d(col("sy2"))
          - d(col("s12")) * d(col("sy1"))) / col("det"))
        .join(last, Seq("user_id"))
        .select(col("user_id"), col("n"),
          micro(col("b1")).as("ar1_micro"),
          micro(col("b2")).as("ar2_micro"),
          // one-step forecast in micro-CENTS: b1·y_T + b2·y_{T−1}
          micro(col("b1") * d(col("lv")) + col("b2") * d(col("pv")))
            .as("forecast_micro"))
        .orderBy(col("user_id"))
    },

    // COHORT RATE TRIANGLE — the monetization companion to
    // q_cohort_retention (which counts active users per all-events
    // cohort): users cohorted by the epoch-week of their FIRST purchase, each later week
    // reporting what fraction of the cohort purchased again. All exact
    // integer: epoch-week via intDiv on µs, retention as the half-up
    // integer-division micro (the q_burn_rate recipe) — no fp anywhere.
    // Scale shape: one distinct over (user, week) pairs (shuffle carries
    // user-week keys, not events), a per-user min, and two catalog-sized
    // aggregates — the join back to cohort sizes is cohort-cardinality
    // (weeks), broadcast at any corpus size. Purchases (not all events)
    // keep the measure NON-VACUOUS on this corpus: every user has
    // some-event activity every week, purchase-week occupancy is ~91%,
    // so the triangle carries real 92-96% rates, not a wall of 100%s.
    "q_cohort_rates" -> { (s, dir) =>
      val uw = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          intDiv(unix_micros(col("ts")), lit(604800000000L)).as("wk"))
        .distinct()
      val c = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      val cs = c.groupBy(col("cohort_wk"))
        .agg(count(lit(1)).as("cohort_size"))
      uw.join(c, Seq("user_id"))
        .groupBy(col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(cs), Seq("cohort_wk"))
        .select(col("cohort_wk"), col("week_offset"), col("cohort_size"),
          col("n_active"),
          intDiv(col("n_active") * 1000000L +
            intDiv(col("cohort_size"), lit(2)), col("cohort_size"))
            .as("retention_micro"))
        .orderBy(col("cohort_wk"), col("week_offset"))
    },

    // A/B TEST readout — experimentation analytics on the same engine:
    // users split 50/50 by the stateless multiplicative hash (the
    // q_train_split discipline: any engine/cluster/rerun assigns the
    // same variant), metric = total purchase value per user, compared by
    // a Welch z-score. The sums feeding the statistic are EXACT int64
    // (per-user cent totals, their squares bounded far under 2^63 by the
    // value range); fp enters only in the one fixed-order final formula,
    // micro-quantized (the q_predict_linear recipe). Scale shape: one
    // per-user aggregate (map-side partials), one 2-row variant
    // aggregate, one 1-row pivot — nothing after the first shuffle is
    // bigger than the variant count. The z here is honestly
    // insignificant (|z| < 1.96 — the split is random, as it should be);
    // the gate pins the ARITHMETIC, and a planted effect would surface
    // through the same plan.
    "q_ab_test" -> { (s, dir) =>
      val p = t(s, dir, "events")
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .withColumn("cv", round(col("value") * 100).cast("long"))
      val u = p.groupBy(col("user_id")).agg(sum(col("cv")).as("tot"))
        .withColumn("variant",
          pmod(pmod(col("user_id"), lit(1000003L)) * 2654435761L, lit(2L)))
      val g = u.groupBy(col("variant"))
        .agg(count(lit(1)).as("n"), sum(col("tot")).as("s"),
          sum(col("tot") * col("tot")).as("ss"))
      def pick(v: Int, c: String) =
        max(when(col("variant") === v, col(c)))
      val w = g.agg(
        pick(0, "n").as("n0"), pick(1, "n").as("n1"),
        pick(0, "s").as("s0"), pick(1, "s").as("s1"),
        pick(0, "ss").as("ss0"), pick(1, "ss").as("ss1"))
      def d(c: String) = col(c).cast("double")
      val m0 = d("s0") / d("n0")
      val m1 = d("s1") / d("n1")
      val z = (m1 - m0) / sqrt(
        (d("ss0") / d("n0") - m0 * m0) / d("n0") +
          (d("ss1") / d("n1") - m1 * m1) / d("n1"))
      w.select(col("n0"), col("n1"),
        floor(m0 * 10000.0 + 0.5).cast("long").as("mean0_micro"),
        floor(m1 * 10000.0 + 0.5).cast("long").as("mean1_micro"),
        floor(z * 1000000.0 + 0.5).cast("long").as("z_micro"))
    },

    // DIFFERENCE + CUMULATIVE_SUM + MOVING_AVERAGE — the three remaining
    // InfluxQL per-point transformations, in ONE window pass: all three
    // frames (lag, running, trailing-7) share the (user_id)/(ts,
    // event_id) window spec, so Catalyst fuses them into a single Window
    // node over one hash exchange (the q_gapfill_linear fuse). All
    // integer: deltas and running sums in exact cents, the trailing-7
    // mean as the half-up integer-division micro (the seasonal-profile
    // mean recipe) — no fp anywhere, byte-identical across engines.
    "q_series_transforms" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val w7 = w.rowsBetween(-6, Window.currentRow)
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events").filter(col("value").isNotNull)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .withColumn("diff_cents",
          col("cents") - lag(col("cents"), 1).over(w))
        .withColumn("cum_cents", sum(col("cents")).over(wc))
        .withColumn("s7", sum(col("cents")).over(w7))
        .withColumn("n7", count(lit(1)).over(w7))
        .select(col("user_id"), col("event_id"), col("cents"),
          col("diff_cents"), col("cum_cents"),
          intDiv(col("s7") * 10000L + intDiv(col("n7"), lit(2)),
            col("n7")).as("ma7_micro"))
        .orderBy(col("user_id"), col("event_id"))
    }
  )

  /** (event_id, event_type, hh, cents) — the event-level base both
    * seasonal queries read (one definition; review catch: the profile
    * derivation existed twice and was one sigma-canon edit from
    * divergence). */
  private def hourlyCents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        hour(col("ts")).cast("long").as("hh"),
        round(col("value") * 100).cast("long").as("cents"))

  /** The (type × hour) seasonal profile: avgMicro-exact mean +
    * population σ from the same int64 cent sums — THE profile
    * definition q_seasonal_profile publishes and q_deseasonalize
    * scores against (the SQL twin is [[seasonalProfileSql]]). */
  private def seasonalProfile(s: SparkSession, dir: String): DataFrame =
    hourlyCents(s, dir)
      .groupBy(col("event_type"), col("hh"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents")).as("sc"),
        sum(col("cents") * col("cents")).as("scc"))
      .select(col("event_type"), col("hh"), col("n"),
        intDiv(col("sc") * 10000 + intDiv(col("n"), lit(2)), col("n"))
          .as("mean_micro"),
        micro(sqrt((col("n") * col("scc") - col("sc") * col("sc"))
          .cast("double")) / col("n").cast("double") / lit(100.0))
          .as("std_micro"))

  /** Constant-memory q_ewma_recurrence: one streaming fold per series
    * (operators.SeriesFold), state = a single double. Bit-identical to
    * [[ewmaRecurrenceArrayFold]] and to the DuckDB list_reduce oracle. */
  def ewmaRecurrence(s: SparkSession, dir: String): DataFrame =
    graft.operators.SeriesFold.fold(
      t(s, dir, "events").filter(col("value").isNotNull),
      "user_id", Seq("ts", "event_id"), "value", Seq("ewma_raw"),
      seed = v => Array(v),
      step = (acc, x) => Array(0.3d * x + 0.7d * acc(0)))
      .select(col("user_id"), col("n_points"),
        r6(col("ewma_raw")).as("ewma_final"))
      .orderBy(col("user_id"))

  /** Constant-memory q_holt_winters: state = (level, trend). l' is
    * computed once and reused — bit-identical to the Catalyst/DuckDB
    * folds that inline its recomputation (same expression, same values,
    * strict IEEE-754). Rounding and the l+b forecast stay in the
    * DataFrame layer, exactly as before. */
  def holtWinters(s: SparkSession, dir: String): DataFrame =
    graft.operators.SeriesFold.fold(
      t(s, dir, "events").filter(col("value").isNotNull),
      "user_id", Seq("ts", "event_id"), "value",
      Seq("level_raw", "trend_raw"),
      seed = v => Array(v, 0.0d),
      step = (acc, x) => {
        val l1 = 0.5d * x + 0.5d * (acc(0) + acc(1))
        Array(l1, 0.3d * (l1 - acc(0)) + 0.7d * acc(1))
      })
      .select(col("user_id"), col("n_points"),
        r6(col("level_raw")).as("level"),
        r6(col("trend_raw")).as("trend"),
        r6(col("level_raw") + col("trend_raw")).as("forecast_next"))
      .orderBy(col("user_id"))

  /** Constant-memory q_welford_moments: state = (count, mean, M2);
    * the streaming twin (StreamingWelford) runs the identical update in
    * the identical order — st19 pins the fixpoint. */
  def welfordMoments(s: SparkSession, dir: String): DataFrame =
    graft.operators.SeriesFold.fold(
      t(s, dir, "events").filter(col("value").isNotNull),
      "user_id", Seq("ts", "event_id"), "value",
      Seq("cnt_raw", "mean_raw", "m2_raw"),
      seed = v => Array(1.0d, v, 0.0d),
      step = (acc, x) => {
        val n = acc(0) + 1.0d
        val d = x - acc(1)
        val m = acc(1) + d / n
        Array(n, m, acc(2) + d * (x - m))
      })
      .select(col("user_id"), col("n_points"),
        r6(col("mean_raw")).as("mean_run"),
        r6(when(col("n_points") > 1L,
          col("m2_raw") / (col("n_points") - 1L).cast("double"))
          .otherwise(lit(0.0d))).as("var_run"))
      .orderBy(col("user_id"))

  /** The PREVIOUS q_ewma_recurrence formulation (collect_list the full
    * series history into one array, fold with aggregate()): correct and
    * whole-stage-codegen'd, but per-KEY memory is the series length —
    * kept public for the measured long-series comparison (SCALE.md §9)
    * and as the documented contrast to [[ewmaRecurrence]]. */
  def ewmaRecurrenceArrayFold(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        expr("transform(sort_array(collect_list(struct(ts, event_id, " +
          "value))), p -> p.value)").as("vals"),
        count(lit(1)).as("n_points"))
      .select(col("user_id"), col("n_points"),
        r6(expr(
          """aggregate(slice(vals, 2, size(vals) - 1),
            |  element_at(vals, 1),
            |  (acc, x) -> 0.3D * x + 0.7D * acc)""".stripMargin))
          .as("ewma_final"))
      .orderBy(col("user_id"))

  /** The previous q_holt_winters formulation — see
    * [[ewmaRecurrenceArrayFold]]'s note; array-typed accumulator, l'
    * inlined twice (the DuckDB fold-order twin). */
  def holtWintersArrayFold(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        expr("transform(sort_array(collect_list(struct(ts, event_id, " +
          "value))), p -> p.value)").as("vals"),
        count(lit(1)).as("n_points"))
      .select(col("user_id"), col("n_points"),
        expr("""aggregate(
          |  slice(vals, 2, size(vals) - 1),
          |  array(element_at(vals, 1), CAST(0.0D AS DOUBLE)),
          |  (acc, x) -> array(
          |    0.5D * x + 0.5D * (element_at(acc, 1) + element_at(acc, 2)),
          |    0.3D * ((0.5D * x + 0.5D * (element_at(acc, 1)
          |      + element_at(acc, 2))) - element_at(acc, 1))
          |      + 0.7D * element_at(acc, 2)))""".stripMargin).as("st"))
      .select(col("user_id"), col("n_points"),
        r6(element_at(col("st"), 1)).as("level"),
        r6(element_at(col("st"), 2)).as("trend"),
        r6(element_at(col("st"), 1) + element_at(col("st"), 2))
          .as("forecast_next"))
      .orderBy(col("user_id"))

  /** The shared seasonal-profile CTE chain (d: event-level cents, g:
    * six int sums per cell, p: the avgMicro mean + sigma canon) — ONE
    * SQL twin of [[seasonalProfile]], interpolated into both oracle
    * entries so the cross-engine profile definition cannot fork. */
  private val seasonalProfileSql: String =
    """d AS (
      |  SELECT event_id, event_type, CAST(hour(ts) AS BIGINT) AS hh,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE value IS NOT NULL),
      |g AS (
      |  SELECT event_type, hh, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(cents) AS BIGINT) AS sc,
      |    CAST(sum(cents*cents) AS BIGINT) AS scc
      |  FROM d GROUP BY event_type, hh),
      |p AS (
      |  SELECT event_type, hh, n,
      |    (sc * 10000 + n // 2) // n AS mean_micro,
      |    CAST(floor(sqrt(CAST(n*scc - sc*sc AS DOUBLE)) / CAST(n AS DOUBLE)
      |      / 100.0 * 1000000.0 + 0.5) AS BIGINT) AS std_micro
      |  FROM g)""".stripMargin

  /** The classical-decomposition core shared by q_stl_decompose and
    * q_seasonal_strength (one definition — the metric scores exactly
    * the components the decomposition reports): returns (tr — per
    * (type, hour) trend/detrended micros, seas — per (type,
    * hour-of-day) seasonal micros). Arithmetic documented at the
    * q_stl_decompose entry. */
  /** q_dtw's activity blocking — top-50 users by event count via
    * orderBy+limit: a DISTRIBUTED TakeOrderedAndProject over the
    * user-domain count table (round 12, "what's wrong" #1 — the rank
    * window it replaced sorted that whole table in one partition).
    * Deterministic by the (n desc, user_id) total order; plan shape
    * pinned by PlanShapeSpec. */
  private[graft] def topActive(counts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    counts.orderBy(col("n").desc, col("user_id")).limit(50)
      .select(col("user_id"))

  private def stlCore(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val g = t(s, dir, "events").filter(col("value").isNotNull)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(sum(round(col("value") * 100).cast("long")).as("hc"))
    val wo = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val w23 = wo.rowsBetween(-11, 11)
    val tr = g
      .withColumn("s23", sum(col("hc")).over(w23))
      .withColumn("n23", count(lit(1)).over(w23))
      .withColumn("lag12", lag(col("hc"), 12).over(wo))
      .withColumn("lead12", lead(col("hc"), 12).over(wo))
      .filter(col("lag12").isNotNull && col("lead12").isNotNull &&
        col("n23") === 23)
      .withColumn("trend_micro", intDiv(
        (col("s23") * 2 + col("lag12") + col("lead12")) * 1000000L
          + lit(24L), lit(48L)))
      .withColumn("detr_micro",
        col("hc") * 1000000L - col("trend_micro"))
      .withColumn("hh", hour(col("hr")).cast("long"))
    val wType = Window.partitionBy(col("event_type"))
    val seas = tr.groupBy(col("event_type"), col("hh"))
      .agg(intDiv(sum(col("detr_micro")) + intDiv(count(lit(1)), lit(2)),
        count(lit(1))).as("s_raw"))
      .withColumn("s_mean", intDiv(
        sum(col("s_raw")).over(wType)
          + intDiv(count(lit(1)).over(wType), lit(2)),
        count(lit(1)).over(wType)))
      .select(col("event_type"), col("hh"),
        (col("s_raw") - col("s_mean")).as("seasonal_micro"))
    (tr, seas)
  }

  /** The classical-decomposition WITH-prefix shared by the
    * q_stl_decompose and q_seasonal_strength oracles (the stlCore
    * twin). */
  private def stlCtes: String =
    """WITH g AS (
      |  SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS hr,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS hc
      |  FROM events WHERE value IS NOT NULL GROUP BY event_type, hr),
      |tr0 AS (
      |  SELECT event_type, hr, hc,
      |    CAST(sum(hc) OVER w23 AS BIGINT) AS s23,
      |    count(*) OVER w23 AS n23,
      |    lag(hc, 12) OVER wo AS lag12,
      |    lead(hc, 12) OVER wo AS lead12
      |  FROM g
      |  WINDOW wo AS (PARTITION BY event_type ORDER BY hr),
      |    w23 AS (PARTITION BY event_type ORDER BY hr
      |            ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING)),
      |tr AS (
      |  SELECT event_type, hr, hour(hr) AS hh,
      |    ((s23 * 2 + lag12 + lead12) * 1000000 + 24) // 48 AS trend_micro,
      |    hc * 1000000
      |      - ((s23 * 2 + lag12 + lead12) * 1000000 + 24) // 48 AS detr_micro
      |  FROM tr0
      |  WHERE lag12 IS NOT NULL AND lead12 IS NOT NULL AND n23 = 23),
      |se AS (
      |  SELECT event_type, hh,
      |    (CAST(sum(detr_micro) AS BIGINT) + count(*) // 2) // count(*)
      |      AS s_raw
      |  FROM tr GROUP BY event_type, hh),
      |sc AS (
      |  SELECT event_type, hh,
      |    s_raw - (CAST(sum(s_raw) OVER wt AS BIGINT)
      |             + (count(*) OVER wt) // 2) // (count(*) OVER wt)
      |      AS seasonal_micro
      |  FROM se WINDOW wt AS (PARTITION BY event_type))""".stripMargin

  val oracle: Map[String, String] = Map(
    // one window spec, three frames, all integer
    "q_series_transforms" ->
      """WITH p AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL)
        |SELECT user_id, event_id, cents,
        |  CAST(cents - lag(cents, 1) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
        |    AS diff_cents,
        |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_cents,
        |  CAST((CAST(sum(cents) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) * 10000
        |    + CAST(count(*) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) // 2)
        |    // CAST(count(*) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS BIGINT) AS ma7_micro
        |FROM p ORDER BY user_id, event_id""".stripMargin,

    // all-integer retention triangle (half-up integer division)
    "q_cohort_rates" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id),
        |cs AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_size
        |       FROM c GROUP BY cohort_wk),
        |act AS (
        |  SELECT c.cohort_wk, uw.wk - c.cohort_wk AS week_offset,
        |         CAST(count(*) AS BIGINT) AS n_active
        |  FROM uw JOIN c USING (user_id)
        |  GROUP BY c.cohort_wk, week_offset)
        |SELECT a.cohort_wk AS cohort_wk,
        |  CAST(a.week_offset AS BIGINT) AS week_offset,
        |  cs.cohort_size, a.n_active,
        |  CAST((a.n_active * 1000000 + cs.cohort_size // 2)
        |    // cs.cohort_size AS BIGINT) AS retention_micro
        |FROM act a JOIN cs USING (cohort_wk)
        |ORDER BY cohort_wk, week_offset""".stripMargin,

    // exact int sums; the one fp formula mirrored term for term
    "q_ab_test" ->
      """WITH p AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cv
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |u AS (
        |  SELECT user_id, ((user_id % 1000003) * 2654435761) % 2 AS variant,
        |         CAST(sum(cv) AS BIGINT) AS tot
        |  FROM p GROUP BY user_id),
        |g AS (
        |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(tot) AS BIGINT) AS s,
        |         CAST(sum(tot * tot) AS BIGINT) AS ss
        |  FROM u GROUP BY variant),
        |w AS (
        |  SELECT
        |    max(CASE WHEN variant = 0 THEN n END) AS n0,
        |    max(CASE WHEN variant = 1 THEN n END) AS n1,
        |    max(CASE WHEN variant = 0 THEN s END) AS s0,
        |    max(CASE WHEN variant = 1 THEN s END) AS s1,
        |    max(CASE WHEN variant = 0 THEN ss END) AS ss0,
        |    max(CASE WHEN variant = 1 THEN ss END) AS ss1
        |  FROM g)
        |SELECT n0, n1,
        |  CAST(floor(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) * 10000.0
        |    + 0.5) AS BIGINT) AS mean0_micro,
        |  CAST(floor(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) * 10000.0
        |    + 0.5) AS BIGINT) AS mean1_micro,
        |  CAST(floor(
        |    (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |    / sqrt(
        |      (CAST(ss0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |        - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |          * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
        |        / CAST(n0 AS DOUBLE)
        |      + (CAST(ss1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |        - (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |          * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
        |        / CAST(n1 AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS z_micro
        |FROM w""".stripMargin,

    // same int sums, same fixed-order double formula, same micro floor
    "q_predict_linear" ->
      """WITH p AS (
        |  SELECT user_id,
        |    (epoch_us(ts) - epoch_us(min(ts) OVER (PARTITION BY user_id)))
        |      // 1000000 AS tt,
        |    CAST(round(value * 100) AS BIGINT) AS cv
        |  FROM events WHERE value IS NOT NULL),
        |s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(tt) AS BIGINT) AS st, CAST(sum(cv) AS BIGINT) AS sv,
        |    CAST(sum(tt * cv) AS BIGINT) AS stv,
        |    CAST(sum(tt * tt) AS BIGINT) AS stt,
        |    CAST(max(tt) AS BIGINT) AS tmax
        |  FROM p GROUP BY user_id),
        |f AS (
        |  SELECT user_id, n, sv, st, tmax,
        |    (CAST(n AS DOUBLE) * CAST(stv AS DOUBLE)
        |       - CAST(st AS DOUBLE) * CAST(sv AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
        |       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS slope
        |  FROM s
        |  WHERE n >= 2 AND CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
        |       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) > 0)
        |SELECT user_id, n,
        |  CAST(floor(slope * 1000000.0 + 0.5) AS BIGINT) AS deriv_micro,
        |  CAST(floor(((CAST(sv AS DOUBLE) - slope * CAST(st AS DOUBLE))
        |      / CAST(n AS DOUBLE)
        |      + slope * (CAST(tmax AS DOUBLE) + 3600.0))
        |    * 1000000.0 + 0.5) AS BIGINT) AS predict_micro
        |FROM f ORDER BY user_id""".stripMargin,

    // per-pair micro quantization, then a sorted-int lower-median element
    "q_theil_sen" ->
      """WITH p AS (
        |  SELECT user_id,
        |    (epoch_us(ts) - epoch_us(min(ts) OVER (PARTITION BY user_id)))
        |      // 1000000 AS tt,
        |    CAST(round(value * 100) AS BIGINT) AS cv
        |  FROM events WHERE value IS NOT NULL),
        |sl AS (
        |  SELECT a.user_id,
        |    CAST(floor(CAST(b.cv - a.cv AS DOUBLE)
        |        / CAST(b.tt - a.tt AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |      AS slope_micro
        |  FROM p a JOIN p b ON a.user_id = b.user_id AND b.tt > a.tt),
        |r AS (
        |  SELECT user_id, slope_micro,
        |    row_number() OVER (PARTITION BY user_id ORDER BY slope_micro)
        |      AS rk,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS cnt
        |  FROM sl)
        |SELECT user_id, cnt AS n_pairs, slope_micro AS ts_slope_micro
        |FROM r WHERE rk = (cnt + 1) // 2
        |ORDER BY user_id""".stripMargin,

    // the 2x2 solve mirrors the Spark column order exactly: det first,
    // then each coefficient as (exact-int doubles) / det
    "q_ar_forecast" ->
      """WITH p AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cv,
        |    lag(CAST(round(value * 100) AS BIGINT), 1) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS x1,
        |    lag(CAST(round(value * 100) AS BIGINT), 2) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS x2
        |  FROM events WHERE value IS NOT NULL),
        |s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
        |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
        |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
        |    CAST(sum(x1 * cv) AS BIGINT) AS sy1,
        |    CAST(sum(x2 * cv) AS BIGINT) AS sy2
        |  FROM p WHERE x2 IS NOT NULL GROUP BY user_id),
        |last AS (
        |  SELECT user_id, cv AS lv, x1 AS pv FROM (
        |    SELECT user_id, cv, x1, row_number() OVER
        |      (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM p) WHERE rn = 1),
        |f AS (
        |  SELECT user_id, n, s11, s12, s22, sy1, sy2,
        |    CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)
        |      - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE) AS det
        |  FROM s WHERE n >= 3),
        |g AS (
        |  SELECT user_id, n,
        |    (CAST(s22 AS DOUBLE) * CAST(sy1 AS DOUBLE)
        |       - CAST(s12 AS DOUBLE) * CAST(sy2 AS DOUBLE)) / det AS b1,
        |    (CAST(s11 AS DOUBLE) * CAST(sy2 AS DOUBLE)
        |       - CAST(s12 AS DOUBLE) * CAST(sy1 AS DOUBLE)) / det AS b2
        |  FROM f WHERE det > 0.0)
        |SELECT g.user_id, g.n,
        |  CAST(floor(b1 * 1000000.0 + 0.5) AS BIGINT) AS ar1_micro,
        |  CAST(floor(b2 * 1000000.0 + 0.5) AS BIGINT) AS ar2_micro,
        |  CAST(floor((b1 * CAST(l.lv AS DOUBLE) + b2 * CAST(l.pv AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS forecast_micro
        |FROM g JOIN last l ON g.user_id = l.user_id
        |ORDER BY g.user_id""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q19b_distribution" ->
      """SELECT event_id,
        |  CAST(floor(percent_rank() OVER w * 1000000.0 + 0.5) AS BIGINT) AS pct_rank_micro,
        |  CAST(floor(cume_dist() OVER w * 1000000.0 + 0.5) AS BIGINT) AS cdist_micro,
        |  nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY value, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_lowest
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         epoch(ts) - epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts) AS session_start,
        |       round(epoch(max(ts)) - epoch(min(ts)), 6) AS duration_s
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_histogram" ->
      """SELECT event_type, CAST(floor(value / 25.0) AS INT) AS bin,
        |       count(*) AS n,
        |       round(min(value), 6) AS lo,
        |       round(max(value), 6) AS hi
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin,

    "q_cohort_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort_week
        |  FROM events GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS active_week
        |  FROM events)
        |SELECT c.cohort_week,
        |       CAST(datediff('day', CAST(c.cohort_week AS DATE), CAST(a.active_week AS DATE)) / 7 AS INT) AS week_offset,
        |       count(DISTINCT a.user_id) AS n_active
        |FROM active a JOIN cohort c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "q_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |  GROUP BY e.user_id)
        |SELECT stage, step, count(DISTINCT user_id) AS n_users FROM (
        |  SELECT 1 AS stage, 'view' AS step, user_id FROM v
        |  UNION ALL SELECT 2, 'click', user_id FROM c
        |  UNION ALL SELECT 3, 'purchase', user_id FROM p)
        |GROUP BY stage, step ORDER BY stage""".stripMargin,

    "q_gapfill" ->
      """WITH grid AS (
        |  SELECT u.user_id, h.hour
        |  FROM (SELECT DISTINCT user_id FROM events) u,
        |       (SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
        |                                      TIMESTAMP '2024-01-05 23:00:00',
        |                                      INTERVAL 1 HOUR)) AS hour) h),
        |obs AS (
        |  SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS hour, avg(value) AS avg_v
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-06 00:00:00'
        |  GROUP BY 1, 2)
        |SELECT g.user_id, g.hour,
        |  round(last_value(o.avg_v IGNORE NULLS)
        |    OVER (PARTITION BY g.user_id ORDER BY g.hour
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled,
        |  (o.avg_v IS NOT NULL) AS is_observed
        |FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.hour = g.hour
        |ORDER BY g.user_id, g.hour""".stripMargin,

    "q_gapfill_linear" ->
      """WITH grid AS (
        |  SELECT u.user_id, h.hour
        |  FROM (SELECT DISTINCT user_id FROM events) u,
        |       (SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
        |                                      TIMESTAMP '2024-01-05 23:00:00',
        |                                      INTERVAL 1 HOUR)) AS hour) h),
        |obs AS (
        |  SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS hour, avg(value) AS avg_v
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-06 00:00:00'
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT g.user_id, g.hour, o.avg_v
        |  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.hour = g.hour),
        |w AS (
        |  SELECT user_id, hour, avg_v,
        |    last_value(avg_v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN avg_v IS NOT NULL THEN hour END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |    first_value(avg_v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN avg_v IS NOT NULL THEN hour END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY hour
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        |  FROM j)
        |SELECT user_id, hour,
        |  round(CASE WHEN avg_v IS NOT NULL THEN avg_v
        |             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |               pv + (nv - pv)
        |                 * CAST(epoch(hour)::BIGINT - epoch(pt)::BIGINT AS DOUBLE)
        |                 / CAST(epoch(nt)::BIGINT - epoch(pt)::BIGINT AS DOUBLE)
        |        END, 6) AS filled_linear,
        |  (avg_v IS NOT NULL) AS is_observed
        |FROM w ORDER BY user_id, hour""".stripMargin,

    // the oracle keeps the textbook four-join PromQL form — the Spark
    // side's single conditional aggregate must be algebraically
    // invisible against it
    "q_vector_binop" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |         count(*) AS n
        |  FROM events
        |  WHERE event_type IN ('purchase','view','error','click')
        |  GROUP BY 1, 2),
        |p AS (SELECT hour, n AS n_purchase FROM h WHERE event_type = 'purchase'),
        |v AS (SELECT hour, n AS n_view FROM h WHERE event_type = 'view'),
        |e AS (SELECT hour, n AS n_error FROM h WHERE event_type = 'error'),
        |c AS (SELECT hour, n AS n_click FROM h WHERE event_type = 'click')
        |SELECT CAST(p.hour AS TIMESTAMP) AS hour,
        |  CAST(n_purchase AS BIGINT) AS n_purchase,
        |  CAST(n_view AS BIGINT) AS n_view,
        |  CAST(n_error AS BIGINT) AS n_error,
        |  CAST(n_click AS BIGINT) AS n_click,
        |  CAST(n_purchase + n_view AS BIGINT) AS both_count,
        |  CAST(n_click - n_error AS BIGINT) AS click_minus_error,
        |  CAST((n_purchase * 1000000 + n_view // 2) // n_view AS BIGINT)
        |    AS conv_ratio_micro,
        |  CAST((n_error * 1000000 + (n_error + n_click) // 2)
        |    // (n_error + n_click) AS BIGINT) AS err_rate_micro
        |FROM p JOIN v USING (hour) JOIN e USING (hour) JOIN c USING (hour)
        |ORDER BY hour""".stripMargin,

    // all-integer: cents deltas, gain/loss sums, half-up integer
    // division through abs-then-sign so // (floor) matches div (trunc)
    "q_tech_indicators" ->
      """WITH p AS (
        |  SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) AS c,
        |    lag(CAST(round(value * 100) AS BIGINT))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |d AS (SELECT user_id, c - prev AS d FROM p WHERE prev IS NOT NULL),
        |g AS (
        |  SELECT user_id,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN d > 0 THEN d ELSE 0 END) AS BIGINT)
        |      AS sum_gain,
        |    CAST(sum(CASE WHEN d < 0 THEN -d ELSE 0 END) AS BIGINT)
        |      AS sum_loss
        |  FROM d GROUP BY user_id)
        |SELECT user_id, n_pairs, sum_gain, sum_loss,
        |  CASE WHEN sum_gain + sum_loss > 0 THEN
        |    CAST((sum_gain * 100000000 + (sum_gain + sum_loss) // 2)
        |      // (sum_gain + sum_loss) AS BIGINT) END AS rsi_micro,
        |  CASE WHEN sum_gain + sum_loss > 0 THEN
        |    CAST((CASE WHEN sum_gain >= sum_loss THEN 1 ELSE -1 END) *
        |      ((abs(sum_gain - sum_loss) * 100000000
        |        + (sum_gain + sum_loss) // 2)
        |       // (sum_gain + sum_loss)) AS BIGINT) END AS cmo_micro
        |FROM g ORDER BY user_id""".stripMargin,

    // pure double comparisons on stored values — no arithmetic anywhere
    "q_changes_resets" ->
      """WITH p AS (
        |  SELECT user_id, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_v
        |  FROM events)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN value <> prev_v THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_changes,
        |  CAST(sum(CASE WHEN value < prev_v THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_resets
        |FROM p WHERE prev_v IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_derivative" ->
      """WITH d AS (
        |  SELECT event_id, user_id, value, ts,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |r AS (
        |  SELECT event_id, user_id, value, prev_v,
        |    epoch_us(ts) - epoch_us(prev_ts) AS dt_us
        |  FROM d WHERE prev_v IS NOT NULL AND epoch_us(ts) - epoch_us(prev_ts) > 0)
        |SELECT event_id, user_id, rate_micro,
        |  CASE WHEN value >= prev_v THEN rate_micro END AS nn_rate_micro
        |FROM (SELECT *,
        |  CAST(floor((value - prev_v) / (CAST(dt_us AS DOUBLE) / 1000000.0)
        |    * 1000000.0 + 0.5) AS BIGINT) AS rate_micro FROM r)
        |ORDER BY event_id""".stripMargin,

    // same newest-first summation order as the Spark fold (ORDER BY
    // rn DESC inside the aggregates) — fp addition order is part of the
    // cross-engine contract here
    "q_ewma" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE value IS NOT NULL)
        |SELECT a.event_id,
        |  round(sum(b.value * pow(0.9, a.rn - b.rn) ORDER BY b.rn DESC)
        |        / sum(pow(0.9, a.rn - b.rn) ORDER BY b.rn DESC), 6) AS ewma
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 19 AND a.rn
        |GROUP BY a.event_id
        |ORDER BY a.event_id""".stripMargin,

    // identical fold: list_reduce seeds with the first ordered element
    // and applies the same 0.3*x + 0.7*acc op pairwise, so the fp result
    // matches Spark's aggregate() term for term (r6 bridges the last ulp)
    "q_ewma_recurrence" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
        |  round(list_reduce(list(value ORDER BY ts, event_id),
        |    (acc, x) -> CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * acc),
        |    6) AS ewma_final
        |FROM events WHERE value IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_event_sequences" ->
      """WITH t AS (
        |  SELECT user_id, event_type AS a,
        |    lead(event_type, 1) OVER w AS b,
        |    lead(event_type, 2) OVER w AS c
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT a || '>' || b || '>' || c AS pattern,
        |  CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM t WHERE c IS NOT NULL
        |GROUP BY 1 HAVING count(DISTINCT user_id) >= 10
        |ORDER BY n_occurrences DESC, pattern""".stripMargin,

    // same list-state fold; the gain expression is inlined twice where
    // the Scala step computes it once (bit-identical, see scaladoc)
    "q_kalman_smooth" ->
      """WITH s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
        |    list_transform(list(value ORDER BY ts, event_id),
        |      v -> [v, 1.0::DOUBLE]) AS pts
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
        |f AS (
        |  SELECT user_id, n_points,
        |    list_reduce(pts, (acc, x) -> [
        |      acc[1] + ((acc[2] + 0.04::DOUBLE) / (acc[2] + 0.04::DOUBLE
        |        + 1.0::DOUBLE)) * (x[1] - acc[1]),
        |      (1.0::DOUBLE - (acc[2] + 0.04::DOUBLE) / (acc[2]
        |        + 0.04::DOUBLE + 1.0::DOUBLE)) * (acc[2]
        |        + 0.04::DOUBLE)]) AS st
        |  FROM s)
        |SELECT user_id, n_points, round(st[1], 6) AS kalman_final,
        |       round(st[2], 6) AS p_final
        |FROM f ORDER BY user_id""".stripMargin,

    // identical list-state fold (see the query's scaladoc for why state
    // is a list, not a struct: DuckDB 1.0 list_reduce struct aliasing)
    "q_holt_winters" ->
      """WITH s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
        |    list_transform(list(value ORDER BY ts, event_id),
        |      v -> [v, 0.0::DOUBLE]) AS pts
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
        |f AS (
        |  SELECT user_id, n_points,
        |    list_reduce(pts, (acc, x) -> [
        |      0.5::DOUBLE * x[1] + 0.5::DOUBLE * (acc[1] + acc[2]),
        |      0.3::DOUBLE * ((0.5::DOUBLE * x[1] + 0.5::DOUBLE * (acc[1]
        |        + acc[2])) - acc[1]) + 0.7::DOUBLE * acc[2]]) AS st
        |  FROM s)
        |SELECT user_id, n_points, round(st[1], 6) AS level,
        |       round(st[2], 6) AS trend,
        |       round(st[1] + st[2], 6) AS forecast_next
        |FROM f ORDER BY user_id""".stripMargin,

    // the q_holt_winters fold widened with [abs_err, n_err] accumulator
    // slots; the forecast error reads the PREVIOUS state before the
    // level/trend update, exactly like the Spark step
    "q_hw_backtest" ->
      """WITH s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
        |    list_transform(list(value ORDER BY ts, event_id),
        |      v -> [v, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE]) AS pts
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
        |f AS (
        |  SELECT user_id, n_points,
        |    list_reduce(pts, (acc, x) -> [
        |      0.5::DOUBLE * x[1] + 0.5::DOUBLE * (acc[1] + acc[2]),
        |      0.3::DOUBLE * ((0.5::DOUBLE * x[1] + 0.5::DOUBLE * (acc[1]
        |        + acc[2])) - acc[1]) + 0.7::DOUBLE * acc[2],
        |      acc[3] + abs(x[1] - (acc[1] + acc[2])),
        |      acc[4] + 1.0::DOUBLE]) AS st
        |  FROM s)
        |SELECT user_id, n_points, round(st[1], 6) AS level,
        |       round(st[2], 6) AS trend,
        |       round(CASE WHEN st[4] > 0.0 THEN st[3] / st[4]
        |                  ELSE 0.0::DOUBLE END, 6) AS mae
        |FROM f ORDER BY user_id""".stripMargin,

    // Welford fold with [n, mean, M2] list state; every operand
    // expression is spelled out so the double ops replay the Spark
    // SeriesFold step EXACTLY (n' = n+1; d = x−mean; mean' = mean+d/n';
    // M2' = M2 + d·(x−mean'))
    "q_welford_moments" ->
      """WITH s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
        |    list_transform(list(value ORDER BY ts, event_id),
        |      v -> [1.0::DOUBLE, v, 0.0::DOUBLE]) AS pts
        |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
        |f AS (
        |  SELECT user_id, n_points,
        |    list_reduce(pts, (acc, x) -> [
        |      acc[1] + 1.0::DOUBLE,
        |      acc[2] + (x[2] - acc[2]) / (acc[1] + 1.0::DOUBLE),
        |      acc[3] + (x[2] - acc[2])
        |        * (x[2] - (acc[2] + (x[2] - acc[2]) / (acc[1] + 1.0::DOUBLE)))
        |    ]) AS st
        |  FROM s)
        |SELECT user_id, n_points, round(st[2], 6) AS mean_run,
        |       round(CASE WHEN n_points > 1
        |                  THEN st[3] / CAST(n_points - 1 AS DOUBLE)
        |                  ELSE 0.0::DOUBLE END, 6) AS var_run
        |FROM f ORDER BY user_id""".stripMargin,

    "q_mode" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY user_id, event_type),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY cnt DESC, event_type) AS rnk FROM c)
        |SELECT user_id, event_type AS mode_type, CAST(cnt AS BIGINT) AS mode_n
        |FROM r WHERE rnk = 1 ORDER BY user_id""".stripMargin,

    "q_integral" ->
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, value, ts, event_id,
        |    lag(value) OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |      ORDER BY ts, event_id) AS prev_v,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |tr AS (
        |  SELECT user_id, day,
        |    CAST(floor((value + prev_v) / 2.0 *
        |      (CAST(epoch_us(ts) - prev_us AS DOUBLE) / 1000000.0)
        |      * 1000000.0 + 0.5) AS BIGINT) AS trap_micro
        |  FROM d WHERE prev_v IS NOT NULL)
        |SELECT user_id, day,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(trap_micro) AS BIGINT) AS integral_micro
        |FROM tr GROUP BY user_id, day ORDER BY user_id, day""".stripMargin,

    "q_ohlc" ->
      """WITH b AS (SELECT *, date_trunc('hour', ts)::TIMESTAMP AS bucket
        |           FROM events),
        |w AS (
        |  SELECT bucket,
        |    first_value(value) OVER (PARTITION BY bucket ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS open,
        |    max(value) OVER (PARTITION BY bucket) AS high,
        |    min(value) OVER (PARTITION BY bucket) AS low,
        |    last_value(value) OVER (PARTITION BY bucket ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close,
        |    count(*) OVER (PARTITION BY bucket) AS n
        |  FROM b)
        |SELECT DISTINCT bucket, open, high, low, close, CAST(n AS BIGINT) AS n
        |FROM w ORDER BY bucket""".stripMargin,

    "q_stat_anomaly" ->
      """WITH scored AS (
        |  SELECT event_id, user_id, value,
        |    avg(value) OVER w AS m,
        |    stddev_samp(value) OVER w AS sd,
        |    count(*) OVER w AS nw
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |       CAST(floor((value - m) / sd * 1000000.0 + 0.5) AS BIGINT) AS z_micro
        |FROM scored
        |WHERE nw >= 5 AND sd > 0
        |  AND abs(CAST(floor((value - m) / sd * 1000000.0 + 0.5) AS BIGINT)) >= 2000000
        |ORDER BY event_id""".stripMargin,

    // discrete ceil-rank percentile in exact integer cents (count-
    // compress + cumulative window) — every comparison int64, so the
    // 10×-replica tie shapes that broke interpolated percentile order
    // cannot flip a clip count
    "q_winsorize" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |cc AS (
        |  SELECT event_type, c, count(*) AS cnt FROM e GROUP BY event_type, c),
        |ranked AS (
        |  SELECT event_type, c,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM cc),
        |b AS (
        |  SELECT event_type,
        |    min(CASE WHEN cum >= (n*5 + 99) // 100 THEN c END) AS lo_c,
        |    min(CASE WHEN cum >= (n*95 + 99) // 100 THEN c END) AS hi_c
        |  FROM ranked GROUP BY event_type),
        |cl AS (
        |  SELECT e.event_type, e.c, b.lo_c, b.hi_c,
        |    CASE WHEN e.c < b.lo_c THEN b.lo_c
        |         WHEN e.c > b.hi_c THEN b.hi_c
        |         ELSE e.c END AS cv
        |  FROM e JOIN b USING (event_type))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN c < lo_c THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |  CAST(sum(CASE WHEN c > hi_c THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |  CAST(min(lo_c) AS DOUBLE) / 100.0 AS p05,
        |  CAST(min(hi_c) AS DOUBLE) / 100.0 AS p95,
        |  CAST((sum(cv) * 10000 + count(*) // 2) // count(*) AS BIGINT)
        |    AS mean_clip_micro
        |FROM cl GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_spread_elapsed" ->
      """WITH g AS (
        |  SELECT user_id, value, epoch_us(ts) AS us,
        |    epoch_us(ts) - lag(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
        |  round(max(value) - min(value), 6) AS spread,
        |  CAST(max(gap_us) AS BIGINT) AS max_gap_us,
        |  (max(us) - min(us)) // greatest(count(*) - 1, 1) AS avg_gap_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    // exact-integer moment derivation + list_reduce fold, op order
    // identical to the Spark SeriesFold (see the query's scaladoc); the
    // the scaled statistic keeps everything integer; argmax + earliest-t
    // tiebreak via row_number mirrors the Spark window exactly
    "q_changepoint" ->
      """WITH p AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cv,
        |    CAST(row_number() OVER wo AS BIGINT) AS rn,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS st,
        |    CAST(count(*) OVER wa AS BIGINT) AS n,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER wa
        |      AS BIGINT) AS sn
        |  FROM events WHERE value IS NOT NULL
        |  WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id),
        |    wa AS (PARTITION BY user_id)),
        |sc AS (
        |  SELECT user_id, n, rn, st, sn,
        |    abs(n * st - rn * sn) AS score,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY abs(n * st - rn * sn) DESC, rn) AS rk
        |  FROM p WHERE rn < n)
        |SELECT user_id, n, rn AS cp_pos, score AS cp_score,
        |  (st * 10000 + rn // 2) // rn AS mean_left_micro,
        |  ((sn - st) * 10000 + (n - rn) // 2) // (n - rn)
        |    AS mean_right_micro
        |FROM sc WHERE rk = 1 ORDER BY user_id""".stripMargin,

    // neutral [0,0] prepend makes DuckDB's seed-from-first-element
    // semantics equal the Spark seed
    "q_anomaly_cusum" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, CAST(round(value*100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |m AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS sc,
        |         CAST(sum(c*c) AS BIGINT) AS sc2, count(*) AS n
        |  FROM e GROUP BY user_id HAVING count(*) > 1),
        |norm AS (
        |  SELECT e.user_id, e.ts, e.event_id,
        |    ((CAST(e.c AS DOUBLE)/100.0 - CAST(m.sc AS DOUBLE)/(100.0*m.n))
        |     / sqrt(CAST(m.n*m.sc2 - m.sc*m.sc AS DOUBLE)
        |            / (10000.0*CAST(m.n AS DOUBLE)*CAST(m.n-1 AS DOUBLE))))
        |    - 0.5 AS zk
        |  FROM e JOIN m USING (user_id)),
        |s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
        |    list_reduce(list_prepend([0.0::DOUBLE, 0.0::DOUBLE],
        |        list_transform(list(zk ORDER BY ts, event_id),
        |          v -> [v, 0.0::DOUBLE])),
        |      (acc, p) -> [
        |        greatest(0.0::DOUBLE, acc[1] + p[1]),
        |        acc[2] + (CASE WHEN greatest(0.0::DOUBLE, acc[1] + p[1])
        |                       > 4.0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)
        |      ]) AS st
        |  FROM norm GROUP BY user_id)
        |SELECT user_id, n_points, round(st[1], 6) AS cusum_final,
        |       CAST(st[2] AS BIGINT) AS n_alarms
        |FROM s ORDER BY user_id""".stripMargin,

    "q_anomaly_mad" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value FROM events WHERE value IS NOT NULL),
        |med AS (
        |  SELECT user_id, percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
        |  FROM e GROUP BY user_id),
        |mad AS (
        |  SELECT e.user_id,
        |    percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(e.value - med.med)) AS mad
        |  FROM e JOIN med USING (user_id) GROUP BY e.user_id),
        |sc AS (
        |  SELECT e.event_id, e.user_id, e.value,
        |    CAST(floor(0.6745 * (e.value - med.med) / mad.mad * 1000000.0 + 0.5)
        |      AS BIGINT) AS rz_micro
        |  FROM e JOIN med USING (user_id) JOIN mad ON mad.user_id = e.user_id
        |  WHERE mad.mad > 0)
        |SELECT event_id, user_id, value, rz_micro
        |FROM sc WHERE abs(rz_micro) > 3500000
        |ORDER BY event_id""".stripMargin,

    // exact int64 cent steps; the only fp op is the final per-series
    // division with the same fixed order as the Spark micro() form
    "q_rate_counter" ->
      """WITH d AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    lag(CAST(round(value * 100) AS BIGINT))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events WHERE value IS NOT NULL),
        |s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL THEN 0
        |         WHEN cents < prev THEN cents
        |         ELSE cents - prev END AS inc,
        |    CASE WHEN prev IS NOT NULL AND cents < prev
        |         THEN 1 ELSE 0 END AS is_reset
        |  FROM d)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(sum(is_reset) AS BIGINT) AS n_resets,
        |  CAST(sum(inc) AS BIGINT) AS increase_cents,
        |  CAST(floor((CAST(sum(inc) AS DOUBLE) / 100.0)
        |    / (CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS DOUBLE)
        |       / 1000000.0) * 1000000.0 + 0.5) AS BIGINT) AS rate_micro
        |FROM s GROUP BY user_id
        |HAVING count(*) >= 2 AND max(epoch_us(ts)) > min(epoch_us(ts))
        |ORDER BY user_id""".stripMargin,

    // lower median as a sorted-window ARRAY ELEMENT (1-based on both
    // engines), never interpolation — all-integer comparison
    "q_moving_median" ->
      """WITH d AS (
        |  SELECT event_id, user_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    list(CAST(round(value * 100) AS BIGINT))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS win
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_id, user_id, cents,
        |  CAST(len(win) AS BIGINT) AS n_win,
        |  list_sort(win)[CAST((len(win) + 1) // 2 AS BIGINT)] AS med_cents
        |FROM d ORDER BY event_id""".stripMargin,

    // six exact int64 sums per lag; fp only in the final fixed-order
    // per-series formula (same floor(x*1e6+0.5) canon as micro())
    "q_autocorr" ->
      """WITH d AS (
        |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS x,
        |    lead(CAST(round(value * 100) AS BIGINT), 1)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y1,
        |    lead(CAST(round(value * 100) AS BIGINT), 2)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y2,
        |    lead(CAST(round(value * 100) AS BIGINT), 3)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y3
        |  FROM events WHERE value IS NOT NULL),
        |a AS (
        |  SELECT user_id,
        |    CAST(count(y1) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN y1 IS NOT NULL THEN x END) AS BIGINT) AS sx1,
        |    CAST(sum(y1) AS BIGINT) AS sy1,
        |    CAST(sum(CASE WHEN y1 IS NOT NULL THEN x*x END) AS BIGINT) AS sxx1,
        |    CAST(sum(y1*y1) AS BIGINT) AS syy1,
        |    CAST(sum(x*y1) AS BIGINT) AS sxy1,
        |    CAST(count(y2) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN y2 IS NOT NULL THEN x END) AS BIGINT) AS sx2,
        |    CAST(sum(y2) AS BIGINT) AS sy2,
        |    CAST(sum(CASE WHEN y2 IS NOT NULL THEN x*x END) AS BIGINT) AS sxx2,
        |    CAST(sum(y2*y2) AS BIGINT) AS syy2,
        |    CAST(sum(x*y2) AS BIGINT) AS sxy2,
        |    CAST(count(y3) AS BIGINT) AS n3,
        |    CAST(sum(CASE WHEN y3 IS NOT NULL THEN x END) AS BIGINT) AS sx3,
        |    CAST(sum(y3) AS BIGINT) AS sy3,
        |    CAST(sum(CASE WHEN y3 IS NOT NULL THEN x*x END) AS BIGINT) AS sxx3,
        |    CAST(sum(y3*y3) AS BIGINT) AS syy3,
        |    CAST(sum(x*y3) AS BIGINT) AS sxy3
        |  FROM d GROUP BY user_id)
        |SELECT user_id, n1 AS n_pairs,
        |  CAST(floor(CAST(n1*sxy1 - sx1*sy1 AS DOUBLE)
        |    / sqrt(CAST(n1*sxx1 - sx1*sx1 AS DOUBLE)
        |           * CAST(n1*syy1 - sy1*sy1 AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS ac1_micro,
        |  CAST(floor(CAST(n2*sxy2 - sx2*sy2 AS DOUBLE)
        |    / sqrt(CAST(n2*sxx2 - sx2*sx2 AS DOUBLE)
        |           * CAST(n2*syy2 - sy2*sy2 AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS ac2_micro,
        |  CAST(floor(CAST(n3*sxy3 - sx3*sy3 AS DOUBLE)
        |    / sqrt(CAST(n3*sxx3 - sx3*sx3 AS DOUBLE)
        |           * CAST(n3*syy3 - sy3*sy3 AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS ac3_micro
        |FROM a
        |WHERE n3 >= 3
        |  AND n1*sxx1 - sx1*sx1 > 0 AND n1*syy1 - sy1*sy1 > 0
        |  AND n2*sxx2 - sx2*sx2 > 0 AND n2*syy2 - sy2*sy2 > 0
        |  AND n3*sxx3 - sx3*sx3 > 0 AND n3*syy3 - sy3*sy3 > 0
        |ORDER BY user_id""".stripMargin,

    // avgMicro mean + population sigma from the same exact cent sums
    "q_seasonal_profile" ->
      s"""WITH $seasonalProfileSql
        |SELECT event_type, hh, n, mean_micro, std_micro
        |FROM p ORDER BY event_type, hh""".stripMargin,

    // all-integer residual-vs-3sigma comparison (sigma canonicalized to
    // micro first), so the anomaly set cannot drift between engines
    "q_deseasonalize" ->
      s"""WITH $seasonalProfileSql
        |SELECT d.event_id, d.event_type, d.hh,
        |  d.cents * 10000 - p.mean_micro AS resid_micro
        |FROM d JOIN p USING (event_type, hh)
        |WHERE abs(d.cents * 10000 - p.mean_micro) > 3 * p.std_micro
        |ORDER BY event_id""".stripMargin,

    // all-integer after the cents agg: the weighted 2x24 MA, the hour-of-
    // day means and the recentering all mirror Spark's intDiv math
    "q_stl_decompose" ->
      s"""$stlCtes
        |SELECT t.event_type, t.hr, t.trend_micro, s.seasonal_micro,
        |  t.detr_micro - s.seasonal_micro AS remainder_micro
        |FROM tr t JOIN sc s USING (event_type, hh)
        |ORDER BY t.event_type, t.hr""".stripMargin,

    // the SAME stlCtes; positive-shifted divisions mirror the Spark
    // side exactly (floor == trunc on non-negative numerators)
    "q_seasonal_strength" ->
      s"""$stlCtes,
        |rem AS (
        |  SELECT t.event_type,
        |    (t.detr_micro + 500000000000000000 + 500000) // 1000000
        |      - 500000000000 AS dc,
        |    (t.detr_micro - s.seasonal_micro + 500000000000000000
        |      + 500000) // 1000000 - 500000000000 AS rc
        |  FROM tr t JOIN sc s USING (event_type, hh)),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    (CAST(sum(dc) AS BIGINT) + count(*) * 1000000000
        |      + count(*) // 2) // count(*) - 1000000000 AS md,
        |    (CAST(sum(rc) AS BIGINT) + count(*) * 1000000000
        |      + count(*) // 2) // count(*) - 1000000000 AS mr
        |  FROM rem GROUP BY event_type),
        |v AS (
        |  SELECT r.event_type, min(m.n) AS n,
        |    CAST(sum((r.dc - m.md) * (r.dc - m.md)) AS BIGINT) AS sd2,
        |    CAST(sum((r.rc - m.mr) * (r.rc - m.mr)) AS BIGINT) AS sr2
        |  FROM rem r JOIN m ON r.event_type = m.event_type
        |  GROUP BY r.event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n_hours,
        |  greatest(CAST(0 AS BIGINT),
        |    CAST(floor((1.0 - CAST(sr2 AS DOUBLE) / CAST(sd2 AS DOUBLE))
        |      * 1000000.0 + 0.5) AS BIGINT)) AS strength_micro
        |FROM v WHERE sd2 > 0 ORDER BY event_type""".stripMargin,

    // exact int64 cross products (µs × cents), floor-average anchors,
    // event_id tiebreak — every selected point identical across engines
    "q_downsample_lttb" ->
      """WITH d AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t_us,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_pts
        |  FROM events WHERE value IS NOT NULL),
        |b AS (
        |  SELECT *, CAST((rn - 1) // 30 AS BIGINT) AS bk,
        |    CAST((n_pts - 1) // 30 AS BIGINT) AS bk_max
        |  FROM d),
        |stats AS (
        |  SELECT user_id, bk,
        |    CAST(sum(t_us) // count(*) AS BIGINT) AS at_us,
        |    CAST(sum(cents) // count(*) AS BIGINT) AS ac
        |  FROM b GROUP BY user_id, bk),
        |mid AS (
        |  SELECT b.user_id, b.bk, b.event_id, b.t_us, b.cents,
        |    abs((b.t_us - p.at_us) * (nx.ac - p.ac)
        |        - (nx.at_us - p.at_us) * (b.cents - p.ac)) AS area2,
        |    row_number() OVER (PARTITION BY b.user_id, b.bk
        |      ORDER BY abs((b.t_us - p.at_us) * (nx.ac - p.ac)
        |        - (nx.at_us - p.at_us) * (b.cents - p.ac)) DESC,
        |        b.event_id) AS rk
        |  FROM b
        |  JOIN stats p ON p.user_id = b.user_id AND p.bk = b.bk - 1
        |  JOIN stats nx ON nx.user_id = b.user_id AND nx.bk = b.bk + 1
        |  WHERE b.bk > 0 AND b.bk < b.bk_max),
        |sel AS (
        |  SELECT user_id, bk, event_id, t_us, cents, area2
        |  FROM mid WHERE rk = 1
        |  UNION ALL
        |  SELECT user_id, bk, event_id, t_us, cents, CAST(0 AS BIGINT)
        |  FROM b WHERE rn = 1 OR rn = n_pts)
        |SELECT user_id, bk, event_id, t_us, cents, area2
        |FROM sel ORDER BY user_id, bk, event_id""".stripMargin,

    // the same distributed prefix-sum decomposition (per-hour running
    // sums + cumulative offsets) extended with the hour GRID so empty
    // hours report their carried level too
    "q_concurrency" ->
      """WITH d AS (
        |  SELECT user_id, ts, event_id,
        |    epoch_us(ts) - lag(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM d),
        |iv AS (
        |  SELECT user_id, session_id,
        |    min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
        |  FROM s GROUP BY user_id, session_id),
        |sweep AS (
        |  SELECT t0 AS t_us, CAST(1 AS BIGINT) AS delta,
        |         user_id, session_id,
        |         CAST(t0 // 3600000000 AS BIGINT) AS hb FROM iv
        |  UNION ALL
        |  SELECT t1 + 1, CAST(-1 AS BIGINT), user_id, session_id,
        |         CAST((t1 + 1) // 3600000000 AS BIGINT) FROM iv),
        |run AS (
        |  SELECT t_us, hb,
        |    sum(delta) OVER (PARTITION BY hb
        |      ORDER BY t_us, delta, user_id, session_id
        |      ROWS UNBOUNDED PRECEDING) AS part_run
        |  FROM sweep),
        |totals AS (
        |  SELECT hb, CAST(sum(delta) AS BIGINT) AS hb_total,
        |    CAST(count(*) AS BIGINT) AS hb_edges
        |  FROM sweep GROUP BY hb),
        |offs AS (
        |  SELECT hb,
        |    CAST(coalesce(sum(hb_total) OVER (ORDER BY hb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS off
        |  FROM totals),
        |emax AS (
        |  SELECT r.hb AS hour_bucket,
        |    CAST(max(r.part_run + o.off) AS BIGINT) AS edge_max
        |  FROM run r JOIN offs o USING (hb) GROUP BY r.hb),
        |grid AS (
        |  SELECT unnest(generate_series(min(hb), max(hb))) AS hour_bucket
        |  FROM sweep),
        |lev AS (
        |  SELECT g.hour_bucket,
        |    CAST(coalesce(t.hb_edges, 0) AS BIGINT) AS n_edges,
        |    CAST(sum(coalesce(t.hb_total, 0)) OVER (ORDER BY g.hour_bucket
        |      ROWS UNBOUNDED PRECEDING) - coalesce(t.hb_total, 0)
        |      AS BIGINT) AS carry_in
        |  FROM grid g LEFT JOIN totals t ON t.hb = g.hour_bucket)
        |SELECT l.hour_bucket,
        |  greatest(l.carry_in, coalesce(e.edge_max, l.carry_in))
        |    AS max_concurrent,
        |  l.n_edges
        |FROM lev l LEFT JOIN emax e USING (hour_bucket)
        |ORDER BY hour_bucket""".stripMargin,

    // the rn-difference islands trick, identical on both engines
    "q_state_runs" ->
      """WITH d AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rnt
        |  FROM events)
        |SELECT user_id, event_type,
        |  CAST(count(*) AS BIGINT) AS run_len,
        |  CAST(min(epoch_us(ts)) AS BIGINT) AS t_start_us,
        |  CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT)
        |    AS elapsed_us,
        |  CAST(min(event_id) AS BIGINT) AS first_event_id
        |FROM d GROUP BY user_id, event_type, rn - rnt
        |HAVING count(*) >= 3
        |ORDER BY user_id, t_start_us, event_type""".stripMargin,

    // aggregate-first pair join over exact hourly floor-mean cents
    // (bounded by value range at any corpus size — overflow-proof);
    // the q_autocorr six-sum recipe per type pair
    "q_cross_corr" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hb,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) // count(*)
        |      AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.cents AS x, b.cents AS y
        |  FROM h a JOIN h b ON a.hb = b.hb AND a.event_type < b.event_type),
        |g AS (
        |  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM p GROUP BY 1, 2)
        |SELECT type_a, type_b, n,
        |  CAST(floor(CAST(n*sxy - sx*sy AS DOUBLE)
        |    / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
        |           * CAST(n*syy - sy*sy AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS corr_micro
        |FROM g WHERE n >= 3 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
        |ORDER BY type_a, type_b""".stripMargin,

    // hourly rollup first; catalog-sized trailing windows; the same
    // half-up integer burn arithmetic
    "q_burn_rate" ->
      """WITH h AS (
        |  SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hb,
        |    CAST(count(*) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_err
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT hb, n_total, n_err,
        |    CAST(sum(n_total) OVER (ORDER BY hb
        |      ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS t6,
        |    CAST(sum(n_err) OVER (ORDER BY hb
        |      ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS e6
        |  FROM h)
        |SELECT hb, n_total, n_err,
        |  (n_err * 5000000 + n_total // 2) // n_total AS burn1_micro,
        |  (e6 * 5000000 + t6 // 2) // t6 AS burn6_micro
        |FROM w
        |WHERE (n_err * 5000000 + n_total // 2) // n_total > 1000000
        |  AND (e6 * 5000000 + t6 // 2) // t6 > 1000000
        |ORDER BY hb""".stripMargin,

    // same fixed le-buckets, cumulative crossing, and half-up integer
    // interpolation; numerator ≥ 0 so // == Spark's IntegralDivide
    "q_histogram_quantile" ->
      """WITH pts AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, value
        |  FROM events),
        |bk AS (
        |  SELECT event_type, day,
        |    CASE WHEN value <= 25 THEN 0 WHEN value <= 50 THEN 1
        |         WHEN value <= 100 THEN 2 WHEN value <= 200 THEN 3
        |         ELSE 4 END AS b,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM pts GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT event_type, day, b, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type, day ORDER BY b)
        |      AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type, day)
        |      AS BIGINT) AS total
        |  FROM bk),
        |sel AS (
        |  SELECT *, cum - cnt AS cum_prev,
        |    row_number() OVER (PARTITION BY event_type, day ORDER BY b) AS rk
        |  FROM cum WHERE cum * 1000000 >= 950000 * total),
        |pick AS (SELECT * FROM sel WHERE rk = 1),
        |bounds AS (SELECT * FROM (VALUES (0, 0, 25), (1, 25, 50),
        |  (2, 50, 100), (3, 100, 200)) AS t(b, lo, hi))
        |SELECT p.event_type AS event_type, p.day AS day, p.total AS n,
        |  CAST(CASE WHEN p.b = 4 THEN 200000000
        |    ELSE bo.lo * 1000000
        |      + ((bo.hi - bo.lo) * (950000 * p.total - 1000000 * p.cum_prev)
        |         + p.cnt // 2) // p.cnt
        |  END AS BIGINT) AS p95_micro
        |FROM pick p LEFT JOIN bounds bo ON bo.b = p.b
        |ORDER BY event_type, day""".stripMargin,

    // hourly rollup, self-join at offset 168h, half-up micro ratio
    "q_wow_ratio" ->
      """WITH h AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT c.event_type AS event_type, c.hb AS hour_bucket,
        |  c.cnt AS cnt, p.cnt AS prev_cnt,
        |  CAST((c.cnt * 1000000 + p.cnt // 2) // p.cnt AS BIGINT)
        |    AS wow_ratio_micro
        |FROM h c LEFT JOIN h p
        |  ON p.event_type = c.event_type AND p.hb = c.hb - 168
        |ORDER BY event_type, hour_bucket""".stripMargin,

    // same 20-row frame; the band test stays in int64 on both engines
    "q_bollinger" ->
      """WITH c AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(round(value*100) AS BIGINT) AS c
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id, c,
        |    CAST(sum(c) OVER win AS BIGINT) AS s,
        |    CAST(sum(c*c) OVER win AS BIGINT) AS ss,
        |    CAST(count(*) OVER win AS BIGINT) AS n
        |  FROM c
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, c AS value_cents,
        |  CAST((s*10000 + n//2)//n AS BIGINT) AS mean_micro,
        |  (n*c - s) > 0 AND (n*c - s)*(n*c - s) > 4*(n*ss - s*s)
        |    AS breach_hi,
        |  (n*c - s) < 0 AND (n*c - s)*(n*c - s) > 4*(n*ss - s*s)
        |    AS breach_lo
        |FROM w WHERE n = 20
        |ORDER BY user_id, event_id""".stripMargin,

    // same buckets, Laplace smoothing, per-bucket micro floor BEFORE
    // the sum (the BM25 fp discipline)
    "q_drift_psi" ->
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts)//604800000000 AS wk,
        |    CASE WHEN value <= 25 THEN 0 WHEN value <= 50 THEN 1
        |         WHEN value <= 100 THEN 2 WHEN value <= 200 THEN 3
        |         ELSE 4 END AS bk,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1,2,3),
        |tot AS (SELECT event_type, wk, CAST(sum(cnt) AS BIGINT) AS tot
        |        FROM b GROUP BY 1,2),
        |grid AS (
        |  SELECT t.event_type, t.wk, g.bk,
        |    coalesce(b.cnt, 0) AS cnt, t.tot
        |  FROM tot t CROSS JOIN (SELECT unnest(range(5)) AS bk) g
        |  LEFT JOIN b ON b.event_type = t.event_type AND b.wk = t.wk
        |    AND b.bk = g.bk),
        |pq AS (
        |  SELECT c.event_type, c.wk,
        |    (CAST(c.cnt+1 AS DOUBLE))/(CAST(c.tot+5 AS DOUBLE)) AS p,
        |    (CAST(p0.cnt+1 AS DOUBLE))/(CAST(p0.tot+5 AS DOUBLE)) AS q
        |  FROM grid c JOIN grid p0
        |    ON p0.event_type = c.event_type AND p0.wk = c.wk - 1
        |      AND p0.bk = c.bk)
        |SELECT event_type, wk,
        |  CAST(sum(CAST(floor((p-q)*ln(p/q)*1000000.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS psi_micro
        |FROM pq GROUP BY 1,2 ORDER BY event_type, wk""".stripMargin,

    // same cents grid, same full-outer union grid (COALESCE via the
    // FULL JOIN's zero fills), same cross-multiplied integer ECDF gap
    "q_drift_ks" ->
      """WITH v AS (
        |  SELECT event_type, epoch_us(ts)//604800000000 AS wk,
        |    CAST(round(value * 100) AS BIGINT) AS cents,
        |    CAST(count(*) AS BIGINT) AS pcnt
        |  FROM events GROUP BY 1,2,3),
        |pv AS (SELECT event_type, wk + 1 AS wk, cents,
        |         pcnt AS qcnt FROM v),
        |m AS (
        |  SELECT coalesce(v.event_type, pv.event_type) AS event_type,
        |    coalesce(v.wk, pv.wk) AS wk,
        |    coalesce(v.cents, pv.cents) AS cents,
        |    coalesce(v.pcnt, 0) AS pcnt, coalesce(pv.qcnt, 0) AS qcnt
        |  FROM v FULL OUTER JOIN pv
        |    ON pv.event_type = v.event_type AND pv.wk = v.wk
        |      AND pv.cents = v.cents),
        |c AS (
        |  SELECT event_type, wk, cents, pcnt, qcnt,
        |    sum(pcnt) OVER (PARTITION BY event_type, wk ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumA,
        |    sum(qcnt) OVER (PARTITION BY event_type, wk ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumB,
        |    sum(pcnt) OVER (PARTITION BY event_type, wk) AS nA,
        |    sum(qcnt) OVER (PARTITION BY event_type, wk) AS nB
        |  FROM m)
        |SELECT event_type, CAST(wk AS BIGINT) AS wk,
        |  CAST(max(nA) AS BIGINT) AS n_cur,
        |  CAST(max(nB) AS BIGINT) AS n_prev,
        |  CAST(max(abs(cumA*nB - cumB*nA)) * 1000000
        |       // (max(nA) * max(nB)) AS BIGINT) AS ks_micro
        |FROM c WHERE nA > 0 AND nB > 0
        |GROUP BY 1,2 ORDER BY event_type, wk""".stripMargin,

    // same lead pairing and half-up row-normalized probabilities
    "q_markov_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |c AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt FROM p
        |      WHERE nxt IS NOT NULL GROUP BY 1,2),
        |t AS (SELECT cur, CAST(sum(cnt) AS BIGINT) AS tot FROM c
        |      GROUP BY 1)
        |SELECT c.cur AS cur, c.nxt AS nxt, c.cnt AS cnt,
        |  CAST((c.cnt*1000000 + t.tot//2)//t.tot AS BIGINT) AS prob_micro
        |FROM c JOIN t ON t.cur = c.cur
        |ORDER BY cur, nxt""".stripMargin,

    // same IGNORE NULLS first/last over the preceding-rows frame
    "q_attribution" ->
      """WITH x AS (
        |  SELECT user_id, event_id, event_type, value,
        |    first_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS ft,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS lt
        |  FROM events)
        |SELECT coalesce(ft, '(none)') AS first_touch,
        |  coalesce(lt, '(none)') AS last_touch,
        |  CAST(count(*) AS BIGINT) AS purchases,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM x WHERE event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY first_touch, last_touch""".stripMargin,

    // same 6-hour PAA segments, breakpoints, and seg-ordered concat
    "q_sax" ->
      """WITH seg AS (
        |  SELECT user_id, epoch_us(ts)//86400000000 AS day,
        |    (epoch_us(ts)%86400000000)//21600000000 AS seg,
        |    CAST(round(value*100) AS BIGINT) AS c
        |  FROM events),
        |paa AS (
        |  SELECT user_id, day, seg,
        |    CAST((sum(c) + count(*)//2)//count(*) AS BIGINT) AS m
        |  FROM seg GROUP BY 1,2,3),
        |sym AS (
        |  SELECT user_id, day, seg,
        |    CASE WHEN m <= 2500 THEN 'a' WHEN m <= 5000 THEN 'b'
        |         WHEN m <= 10000 THEN 'c' ELSE 'd' END AS s
        |  FROM paa)
        |SELECT user_id, day, string_agg(s, '' ORDER BY seg) AS sax_word
        |FROM sym GROUP BY 1,2 ORDER BY user_id, day""".stripMargin,

    // DTW as a recursive CTE over ANTI-DIAGONALS: cell (i,j) needs
    // (i−1,j), (i,j−1) — same diagonal d−1 — and (i−1,j−1) — diagonal
    // d−2 — so each recursion step carries the last TWO diagonals as
    // LIST columns and computes the next with one list_transform; no
    // within-step dependency remains (the reason a row-by-row unroll
    // can't work in set-based recursion). 47 steps (2·24−1 diagonals),
    // 1225 pair rows per step. INF (2^40) marks out-of-band/off-matrix
    // cells; every in-band cell keeps an in-band predecessor (band
    // connectivity), so INF never chains into a real path. Validated
    // cell-for-cell against an independent full-matrix DP at both
    // oracle SFs before shipping.
    "q_dtw" ->
      """WITH RECURSIVE
        |ev AS (SELECT user_id, epoch_us(ts)//3600000000 AS hb,
        |              CAST(round(value*100) AS BIGINT) AS cents
        |       FROM events WHERE value IS NOT NULL),
        |top AS (SELECT user_id FROM (
        |    SELECT user_id,
        |           row_number() OVER (ORDER BY count(*) DESC, user_id) AS rk
        |    FROM ev GROUP BY user_id) WHERE rk <= 50),
        |bnd AS (SELECT min(hb) AS mn, max(hb) - min(hb) + 1 AS span FROM ev),
        |bk AS (SELECT e.user_id, (e.hb - bnd.mn) * 24 // bnd.span AS bucket,
        |              sum(e.cents) AS sc, count(*) AS n
        |       FROM ev e JOIN top USING (user_id), bnd GROUP BY 1, 2),
        |grid AS (SELECT user_id, g.range AS bucket FROM top, range(24) g),
        |vecs AS (SELECT user_id, list(coalesce(sc // n, 0) ORDER BY bucket) AS v
        |         FROM grid LEFT JOIN bk USING (user_id, bucket)
        |         GROUP BY user_id),
        |pairs AS (SELECT a.user_id AS ua, b2.user_id AS ub, a.v AS x, b2.v AS y
        |          FROM vecs a JOIN vecs b2 ON a.user_id < b2.user_id),
        |dp AS (
        |  SELECT ua, ub, 0 AS d,
        |    list_transform(range(24), i -> CASE WHEN i = 0 THEN abs(x[1] - y[1])
        |      ELSE 1099511627776 END) AS cur,
        |    list_transform(range(24), i -> 1099511627776) AS prev, x, y
        |  FROM pairs
        |  UNION ALL
        |  SELECT ua, ub, d + 1,
        |    list_transform(range(24), i ->
        |      CASE WHEN d + 1 - i < 0 OR d + 1 - i > 23 OR abs(2*i - d - 1) > 4
        |        THEN 1099511627776
        |      ELSE abs(x[i+1] - y[d+2-i]) + least(
        |        CASE WHEN i > 0 THEN cur[i] ELSE 1099511627776 END,
        |        cur[i+1],
        |        CASE WHEN i > 0 THEN prev[i] ELSE 1099511627776 END)
        |      END) AS cur,
        |    cur AS prev, x, y
        |  FROM dp WHERE d < 46)
        |SELECT ua AS user_a, ub AS user_b, CAST(cur[24] AS BIGINT) AS dtw_dist
        |FROM dp WHERE d = 46
        |ORDER BY dtw_dist, user_a, user_b LIMIT 100""".stripMargin
  )
}
