package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.WeightedAvg

/** Aggregations (SURVEY.md §2.4 d: Q14-Q18 + UDAF + approx sketches).
  *
  * The reference delegates all aggregation to GlueSQL 0.9 and its own result
  * decoder cannot even return an aggregate row (SURVEY Q-E,
  * refluxdb src/utils/db.rs:34-49); "pre-calculated stats" is an explicit
  * TODO (README.md:58). Spark gives partial (map-side) + final hash
  * aggregation for free — at 100 TB the partial agg is what keeps the
  * shuffle small.
  *
  * Exactness policy: SUMs in DECIMAL(18,2) (bit-equal across engines);
  * AVGs of 2-decimal data as integer-exact micro-units (QuerySet.avgMicro);
  * percentiles as round-6 doubles (interpolation of 2-decimal values stays
  * strictly off the rounding boundaries).
  */
object AggQueries extends QuerySet {

  val queries: Map[String, Q] = Map(
    // Q14: the TPC-H Q1 shape — multi-aggregate hash agg with group keys.
    "q14_groupby_agg" -> { (s, dir) =>
      val one = lit(1).cast("decimal(18,2)")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          avgMicro(col("l_quantity"), count(lit(1))).as("avg_qty_micro"),
          avgMicro(col("l_extendedprice"), count(lit(1))).as("avg_price_micro"),
          avgMicro(col("l_discount"), count(lit(1))).as("avg_disc_micro"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Q15: COUNT(DISTINCT) x2 (expand + two-phase agg) with HAVING.
    // Two COUNT(DISTINCT) + COUNT(*): written as three aggregations joined
    // on the group key instead of one multi-distinct aggregate — Spark
    // plans the latter via Expand (3× the input rows through one shuffle),
    // while each branch here partial-aggregates map-side BEFORE its
    // shuffle, so the shuffled volume is near-distinct already. Join sides
    // are one row per supplier (tiny, broadcastable). Same result set.
    "q15_distinct_having" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val parts = li.select(col("l_suppkey"), col("l_partkey")).distinct()
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_parts"))
      val orders = li.select(col("l_suppkey"), col("l_orderkey")).distinct()
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_orders"))
      val rows = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_rows"))
      parts.join(orders, Seq("l_suppkey")).join(rows, Seq("l_suppkey"))
        .filter(col("n_parts") >= 400)
        .orderBy(col("l_suppkey"))
    },

    // Q16: rollup + grouping() marker.
    "q16_rollup" -> { (s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          decSum(col("o_totalprice")).as("total"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"))
        .orderBy(col("g_status"), col("g_prio"),
          col("o_orderstatus").asc_nulls_last,
          col("o_orderpriority").asc_nulls_last)
    },

    // Q16b: cube over status x order-year.
    "q16b_cube" -> { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .cube(col("o_orderstatus"), col("yr"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("yr")).cast("int").as("g_yr"))
        .orderBy(col("g_status"), col("g_yr"),
          col("o_orderstatus").asc_nulls_last, col("yr").asc_nulls_last)
    },

    // Q16c: explicit GROUPING SETS (status-only, priority-only, grand total).
    "q16c_grouping_sets" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"))
        .orderBy(col("g_status"), col("g_prio"),
          col("o_orderstatus").asc_nulls_last,
          col("o_orderpriority").asc_nulls_last)
    },

    // Q17: conditional aggregation + scalar conditionals
    // (CASE WHEN / nullif / coalesce / greatest inside agg).
    "q17_conditional_agg" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", dec(col("o_totalprice")))
            .otherwise(dec(lit(0)))).cast("double").as("open_total"),
          avgMicro(when(col("o_orderstatus") === "F", 1.0).otherwise(0.0),
            count(lit(1))).as("pct_f_micro"),
          max(greatest(col("o_totalprice"), lit(250000.0))).as("max_or_250k"),
          sum(when(nullif(col("o_orderstatus"), lit("P")).isNull, 1L)
            .otherwise(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))
    },

    // Q18: exact percentiles per group (oracle: quantile_cont).
    "q18_percentile" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          r6(expr("percentile(l_quantity, 0.5)")).as("median_qty"),
          r6(expr("percentile(l_extendedprice, 0.9)")).as("p90_price"),
          r6(expr("percentile(l_discount, 0.25)")).as("p25_disc"))
        .orderBy(col("l_returnflag"))
    },

    // Q18b: the SAME exact interpolated percentiles as q18, via the
    // count-compress formulation that scales where q18's plan does not.
    // `percentile(...)` is a TypedImperativeAggregate (ObjectHashAggregate):
    // per-group value→count maps updated row-by-row OUTSIDE whole-stage
    // codegen — measured as the join/window/agg family's largest constant
    // factor at 30× data (SCALE.md §9.3). This form compresses the input
    // to (group, value) → count in a codegen'd hash aggregate FIRST (the
    // map-side partial shrinks the shuffle to the distinct-value set), then
    // runs one small window over the distinct values per group to find the
    // two values bracketing the target rank, interpolating with the exact
    // fp operations of Spark's Percentile (0-based pos = p*(n-1);
    // (hi-pos)*vLo + (pos-lo)*vHi; integral pos short-circuits to vLo) —
    // bit-identical to q18, same oracle. Groups whose column is entirely
    // NULL would drop out of the inner join (q18 keeps a NULL cell); the
    // synthetic data has no such group, and a production caller can left
    // join from the group list.
    "q18b_percentile_sorted" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir, "lineitem")
      val g = "l_returnflag"
      def pct(c: String, p: Double, alias: String) = {
        val counts = li.filter(col(c).isNotNull)
          .groupBy(col(g), col(c)).agg(count(lit(1)).as("cnt"))
        val byVal = Window.partitionBy(col(g)).orderBy(col(c))
        val whole = Window.partitionBy(col(g))
        val ranked = counts
          .withColumn("cum", sum(col("cnt")).over(byVal))
          .withColumn("pos",
            lit(p) * (sum(col("cnt")).over(whole) - lit(1L)).cast("double"))
        val lo = floor(col("pos"))
        val hi = ceil(col("pos"))
        // 0-based rank k is covered by a value's run iff cum-cnt <= k <= cum-1
        def covered(k: org.apache.spark.sql.Column) =
          (col("cum") - col("cnt")).cast("double") <= k &&
            k <= (col("cum") - 1L).cast("double")
        ranked
          .filter(covered(lo) || covered(hi))
          .groupBy(col(g))
          .agg(
            max(when(covered(lo), col(c).cast("double"))).as("v_lo"),
            max(when(covered(hi), col(c).cast("double"))).as("v_hi"),
            max(col("pos")).as("pos"))
          .select(col(g),
            r6(when(floor(col("pos")) === ceil(col("pos")), col("v_lo"))
              .otherwise((ceil(col("pos")) - col("pos")) * col("v_lo") +
                (col("pos") - floor(col("pos"))) * col("v_hi"))).as(alias))
      }
      pct("l_quantity", 0.5, "median_qty")
        .join(pct("l_extendedprice", 0.9, "p90_price"), Seq(g))
        .join(pct("l_discount", 0.25, "p25_disc"), Seq(g))
        .orderBy(col(g))
    },

    // EXACT WEIGHTED MEDIAN per group (the survey-statistics classic the
    // percentile family lacks: q18/q18b weight every ROW equally; here
    // each price is weighted by its quantity — "the price at which half
    // the UNITS ship"): lower weighted median = smallest value whose
    // cumulative weight reaches half the total, decided by the
    // ALL-INTEGER test 2·cum ≥ W (no halves, no fp). Scale shape: one
    // (group, value) hash agg collapses the fact table to the DISTINCT
    // VALUE domain before any window (the q18b discipline), then one
    // per-group cumulative window + a min — at 100 TB the window input
    // is price-domain-sized, never row-sized.
    "q_weighted_median" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val g = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("gw"))
      val byVal = Window.partitionBy(col("flag")).orderBy(col("cents"))
      val whole = Window.partitionBy(col("flag"))
      g.withColumn("cum", sum(col("gw")).over(byVal))
        .withColumn("tot", sum(col("gw")).over(whole))
        .filter(lit(2L) * col("cum") >= col("tot"))
        .groupBy(col("flag").as("l_returnflag"))
        .agg(min(col("cents")).as("median_cents"),
          min(col("tot")).as("total_weight"))
        .orderBy(col("l_returnflag"))
    },

    // KEY-SKEW PROFILE — the observability readout that says which join/
    // agg keys need salting BEFORE a 100 TB run hits the straggler (the
    // advisory side of operators/Skew.scala; q_profile_columns profiles
    // value domains, this profiles GROUP-SIZE concentration): per
    // candidate shuffle key of the events fact (user_id, event_type),
    // the key count, row total, top-1 and top-10 key shares, and the
    // exact Gini coefficient of group sizes. ALL-INTEGER via the
    // count-of-counts decomposition: the fact-sized stage is ONE (key)
    // count agg per column (fan-out ×2 map-side, the two profiled keys
    // ride one scan); everything after lives on the count-of-counts
    // DOMAIN (how many keys have count c — saturates at any corpus).
    // Gini over a run of k tied keys sorted ascending contributes
    // c·(k·prev + k(k+1)/2) to the rank-weighted sum S, and
    // G = (2S − (n+1)T) / (nT) — exact while n·T ≤ 9.2e12 (the
    // q_eval_auc documented-bound posture; past it, pre-bucket counts).
    // Top-10 share takes min(k, 10 − keys_before) keys from the
    // count-DESC walk — the partial-run form, no per-key sort anywhere.
    "q_skew_profile" -> { (s, dir) =>
      skewReadout(t(s, dir, "events")
        .select(explode(array(
          struct(lit("user_id").as("col_name"),
            col("user_id").cast("string").as("k")),
          struct(lit("event_type").as("col_name"),
            col("event_type").as("k")))).as("e"))
        .select(col("e.col_name").as("col_name"), col("e.k").as("k"))
        .groupBy(col("col_name"), col("k"))
        .agg(count(lit(1)).as("c")))
    },

    // EQUI-DEPTH HISTOGRAM (the ANALYZE artifact — Piatetsky-Shapiro &
    // Connell 1984's equi-height buckets, what Spark's
    // `ANALYZE ... FOR COLUMNS` and every cost-based optimizer
    // persists; completes the optimizer-stats family: q_zone_maps =
    // where values LIVE, q_skew_profile = how keys CONCENTRATE,
    // q_join_cardinality = what a join PRODUCES, this = how values
    // DISTRIBUTE): 8 buckets over lineitem price cents with bounds at
    // the exact rank-ceil quantiles (bound_b = min value whose
    // cumulative count reaches ceil(b·n/8) — pure integers, no
    // interpolation: histogram bounds are real domain values by
    // construction) and per bucket the EXACT row count and distinct
    // count. Heavy values make counts unequal — that is the honest
    // artifact (a value heavier than n/8 overflows its bucket; the
    // optimizer reads exactly that from the ndv/count pair). Scale
    // shape: the q18b count-compress recipe — ONE fact-sized
    // (value → count) hash agg, then EVERYTHING runs on the price
    // domain (saturates at any corpus): a domain-ordered cumulative
    // window, an 8-row broadcast bounds join, one 8-row readout.
    "q_histogram_equidepth" -> { (s, dir) =>
      val v = t(s, dir, "lineitem")
        .select(round(col("l_extendedprice") * 100).cast("long")
          .as("cents"))
        .groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
      val wCum = Window.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      // value domain + inclusive cumulative + total (domain-sized
      // windows — the skyline output-sized-merge precedent)
      val dom = v.withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wAll))
        .localCheckpoint(eager = true) // feeds bounds AND assignment
      val buckets = (1 to 8).map(_.toLong)
      val bIds = buckets.foldLeft(Seq.empty[org.apache.spark.sql.Column])(
        (acc, b) => acc :+ lit(b))
      // 8 bucket bounds are ONE driver-sized collect (the q_basket_rules
      // nOrders policy) folded into a map-side CASE over the checkpointed
      // domain — r16: the former cents<=bound broadcast theta-join planned
      // as BroadcastNestedLoopJoin emitting up to 8× the domain, then paid
      // a (cents, cnt) re-group to take min(b); bucket = first ascending
      // bound with cents <= bound is the same min by monotonicity
      val bArr = dom
        .select(col("cents"), col("cum"), col("n"),
          explode(array(bIds: _*)).as("b"))
        .filter(col("cum") >= intDiv(col("b") * col("n") + 7L, lit(8L)))
        .groupBy(col("b")).agg(min(col("cents")).as("bound"))
        .orderBy(col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // empty value domain ⇒ bArr is empty (r16 advice: .init/.last would
      // throw where the former broadcast join returned no rows) — any
      // constant works as the CASE fallback because dom has no rows to
      // classify; the aggregate below is then the same empty frame
      val bucketCol =
        if (bArr.isEmpty) lit(1L)
        else bArr.init.foldRight(
            lit(bArr.last._1): org.apache.spark.sql.Column) {
          case ((b, bound), acc) =>
            when(col("cents") <= lit(bound), lit(b)).otherwise(acc)
        }
      dom.select(col("cents"), col("cnt"), bucketCol.as("bucket"))
        .groupBy(col("bucket"))
        .agg(min(col("cents")).as("lo_cents"),
          max(col("cents")).as("hi_cents"),
          sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("ndv"))
        .orderBy(col("bucket"))
    },

    // Statistical aggregates: sample stddev/variance, Pearson correlation,
    // covariance, least-squares regression — identical co-moment
    // definitions in both engines; magnitudes keep fp error << 1e-6 for
    // the normalized members (sd/vr/corr/slope). cov_vu is the one
    // UN-normalized cross-moment of two large-magnitude columns, and
    // native covar_samp accumulates doubles in engine-specific order —
    // at the 10× replica (1M-row groups, user_ids up to 1e7) that
    // landed a 1-ulp disagreement exactly ON a round(·,6) boundary
    // (round-16 x10 re-oracle). So cov_vu is computed from EXACT
    // integer sums (cents × user_id fits int64 per row; DECIMAL(38,0)
    // accumulation) with an identically-written double tail — every
    // double op is exactly rounded over identical operands, so both
    // engines land the same bits at ANY scale. cov(value,·) ≡
    // cov(cents,·)/100 because value is 2-decimal by construction.
    "q_stat_funcs" -> { (s, dir) =>
      val cents = round(col("value") * 100).cast("long")
      val prod = (cents * col("user_id"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))
      val dec = (c: org.apache.spark.sql.Column) =>
        c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
      t(s, dir, "events")
        .withColumn("ts_s", col("ts").cast("double"))
        .groupBy(col("event_type"))
        .agg(
          r6(stddev_samp(col("value"))).as("sd"),
          r6(var_samp(col("value"))).as("vr"),
          r6(corr(col("value"), col("ts_s"))).as("corr_vt"),
          r6(((sum(prod).cast("double") -
            sum(dec(cents)).cast("double") *
              sum(dec(col("user_id"))).cast("double") /
              count(lit(1)).cast("double")) /
            (count(lit(1)).cast("double") - 1.0d) / 100.0d))
            .as("cov_vu"),
          r6(expr("regr_slope(value, ts_s)") * 86400 * 1000).as("slope_md"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // Approx sketches (HLL distinct, approx quantile). The sketch VALUES are
    // engine-specific (DuckDB cannot reproduce Spark's HLL/KLL registers),
    // so the driver-visible gate is: emit the EXACT values (hash-compared
    // for real) plus a within_tolerance boolean per sketch, computed in the
    // query on both engines — Spark compares its sketch against its exact
    // aggregate; the oracle's expectation is literal TRUE. A sketch
    // drifting out of tolerance flips the boolean and fails the hash match,
    // which makes the tolerance check itself driver-certified (round-5
    // VERDICT item #2) instead of `no_oracle`.
    // Plan shape: the exact COUNT(DISTINCT), the HLL, and the two
    // percentiles live in SEPARATE aggregate branches joined on the
    // 6-row group key (the q15 Expand-avoidance pattern) — mixing a
    // distinct aggregate with TypedImperative ones (percentile/HLL) in
    // one Aggregate forces an Expand + object-aggregate over the whole
    // table (measured 15.8 s at sf0.1 vs ~1 s split).
    "q_approx_sketches" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val exactParts = li.select(col("l_returnflag"), col("l_partkey"))
        .distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
      val approxParts = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      val medians = li.groupBy(col("l_returnflag"))
        .agg(r6(expr("percentile(l_quantity, 0.5)")).as("exact_median_qty"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
            .as("approx_median"))
      exactParts.join(approxParts, Seq("l_returnflag"))
        .join(medians, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"),
          col("exact_median_qty"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double")
            / col("exact_parts").cast("double") <= 0.15)
            .as("parts_within_tol"),
          (abs(col("approx_median") - col("exact_median_qty")) <= 1.0)
            .as("median_within_tol"))
        .orderBy(col("l_returnflag"))
    },

    // Histogram-rollup quantiles, driver-certified (the q_approx_sketches
    // pattern): p50/p95 per event_type computed from LogHistogram's 1%
    // log bins — the SAME bin math Engine.histogramRollup persists and
    // st18 streams — next to the exact interpolated percentile. The
    // exact values hash-match DuckDB for real; the within-2% booleans
    // are pinned TRUE by the oracle, so a bin-math regression flips a
    // boolean and fails the driver's hash gate. The booleans compare
    // the bin representative against the DISCRETE rank statistic (the
    // first value whose cumulative count crosses q·n — the IDENTICAL
    // `cum >= q*total` predicate the bin selection uses, so both sides
    // share one rank convention down to the fp product): that value
    // lies INSIDE the selected bin, making the ≤2% bound structural
    // (half a 1% log bin) at EVERY data size. The r17 fix — the former
    // reference was the INTERPOLATED percentile, whose rank-vs-
    // interpolation slack is data-dependent and exceeded 2% on the
    // sparse p95 tail at sf0.001 (pre-existing at every round; the
    // sf0.01 certification never saw it). Scale shape: one
    // catalog-sized bin aggregate + per-group cumulative windows over
    // ≤ a few hundred bins, plus one per-type value-rank window for
    // the discrete reference; rep() is monotone in bin, so min(rep)
    // over cum≥target selects the first qualifying bin without a rank
    // pass.
    "q_approx_quantiles" -> { (s, dir) =>
      import graft.operators.LogHistogram
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val exact = ev.groupBy(col("event_type"))
        .agg(r6(expr("percentile(value, 0.5)")).as("p50_exact"),
          r6(expr("percentile(value, 0.95)")).as("p95_exact"))
      val wv = Window.partitionBy(col("event_type")).orderBy(col("value"))
      val disc = ev.select(col("event_type"), col("value"))
        .withColumn("rn", row_number().over(wv))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(min(when(col("rn") >= lit(0.5) * col("n"), col("value")))
            .as("d50"),
          min(when(col("rn") >= lit(0.95) * col("n"), col("value")))
            .as("d95"))
      val cum = ev
        .groupBy(col("event_type"),
          LogHistogram.binExpr(col("value")).as("bin"))
        .agg(count(lit(1)).as("w"))
        .withColumn("cum", sum(col("w")).over(
          Window.partitionBy("event_type").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("w")).over(
          Window.partitionBy("event_type")))
      def hq(q: Double) = min(when(col("cum") >= lit(q) * col("total"),
        LogHistogram.repExpr(col("bin"))))
      val approx = cum.groupBy(col("event_type"))
        .agg(hq(0.5).as("p50_hist"), hq(0.95).as("p95_hist"))
      exact.join(approx, Seq("event_type"))
        .join(disc, Seq("event_type"))
        .select(col("event_type"), col("p50_exact"), col("p95_exact"),
          (abs(col("p50_hist") - col("d50")) / col("p50_exact")
            <= 0.02).as("p50_within_tol"),
          (abs(col("p95_hist") - col("d95")) / col("p95_exact")
            <= 0.02).as("p95_within_tol"))
        .orderBy(col("event_type"))
    },

    // Custom UDAF surface (§2.4k): time-weighted average of events.value per
    // user — weight = seconds until the next event of the same user.
    // The weighting is a window (lag-free, shuffle once by user), the
    // aggregation is a typed Aggregator registered via functions.udaf.
    "q_udaf_time_weighted_avg" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wavg = udaf(WeightedAvg)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("next_ts", lead(col("ts"), 1).over(w))
        .filter(col("next_ts").isNotNull)
        .withColumn("weight",
          col("next_ts").cast("double") - col("ts").cast("double"))
        .groupBy(col("user_id"))
        .agg(r6(wavg(col("value"), col("weight"))).as("tw_avg"))
        .orderBy(col("user_id"))
    },

    // COUNT-MIN SKETCH heavy hitters (Cormode & Muthukrishnan 2005) —
    // the third frequency sketch next to HLL (distinct) and Misra-Gries
    // (st17 streaming top-k), and unlike q_approx_sketches this one is
    // FULLY cross-checked, not boolean-gated: the hash family is
    // deterministic integer arithmetic (((k·a+b) mod P) mod W,
    // P = 2³¹−1) both engines compute bit-identically, so the sketch
    // itself — not just a tolerance claim — hash-matches DuckDB.
    // Estimates carry the one-sided CMS guarantee (est ≥ true;
    // `overcount` ≥ 0 surfaces the collision error per key). Scale
    // shape: the build is one map-side ×3 expand into a d×W=3×1024
    // bucket space, so partial aggregation bounds the shuffle at
    // 3072 rows/partition at ANY corpus size — the sketch is the
    // mergeable summary (streaming twin: st37, same bucket sums per
    // micro-batch merge). The probe side is the top-20 catalog join
    // against a 3072-row broadcast.
    "q_cms_heavy_hitters" -> { (s, dir) =>
      import graft.operators.CountMin
      val li = t(s, dir, "lineitem").select(col("l_partkey"))
      val sketch = CountMin.sketch(li, "l_partkey")
      val top = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("l_partkey")).limit(20)
      CountMin.estimate(sketch, top, "l_partkey")
        .join(broadcast(top), Seq("l_partkey"))
        .select(col("l_partkey"), col("true_cnt"), col("cms_est"),
          (col("cms_est") - col("true_cnt")).as("overcount"))
        .orderBy(col("true_cnt").desc, col("l_partkey"))
    }
  )

  /** The skew readout over per-key counts — (col_name, k, c) in, one
    * advisory row per col_name out (n_keys, n_rows, max_count,
    * top-1/top-10 shares, exact Gini). ONE definition shared by
    * q_skew_profile (the oracle-gated operator over the events fact)
    * and Engine.tagSkew (the live /skew endpoint over a series' tags) —
    * the serving path grades concentration with exactly the certified
    * formula. Everything here runs on the count-of-counts DOMAIN (how
    * many keys have count c — saturates at any corpus); see the
    * q_skew_profile scaladoc for the tied-run Gini algebra and the
    * n·T ≤ 9.2e12 int64 bound. */
  private[graft] def skewReadout(keyed: DataFrame): DataFrame = {
    val cc = keyed.groupBy(col("col_name"), col("c"))
      .agg(count(lit(1)).as("nk"))
    val wAsc = Window.partitionBy(col("col_name")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDesc = Window.partitionBy(col("col_name"))
      .orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    cc
      .withColumn("prevAsc", coalesce(sum(col("nk")).over(wAsc), lit(0L)))
      .withColumn("prevDesc", coalesce(sum(col("nk")).over(wDesc), lit(0L)))
      .withColumn("sTerm",
        col("c") * (col("nk") * col("prevAsc")
          + intDiv(col("nk") * (col("nk") + 1L), lit(2L))))
      .withColumn("t10Term",
        col("c") * greatest(lit(0L),
          least(col("nk"), lit(10L) - col("prevDesc"))))
      .groupBy(col("col_name"))
      .agg(sum(col("nk")).as("n_keys"),
        sum(col("c") * col("nk")).as("n_rows"),
        max(col("c")).as("max_count"),
        sum(col("sTerm")).as("s"),
        sum(col("t10Term")).as("t10"))
      .select(col("col_name"), col("n_keys"), col("n_rows"),
        col("max_count"),
        intDiv(col("max_count") * 1000000L, col("n_rows"))
          .as("top1_share_micro"),
        intDiv(col("t10") * 1000000L, col("n_rows"))
          .as("top10_share_micro"),
        intDiv((lit(2L) * col("s")
            - (col("n_keys") + 1L) * col("n_rows")) * 1000000L,
          col("n_keys") * col("n_rows")).as("gini_micro"))
      .orderBy(col("col_name"))
  }

  val oracle: Map[String, String] = Map(
    "q14_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST((sum(CAST(round(l_quantity * 100) AS BIGINT)) * 10000 + count(*) // 2) // count(*) AS BIGINT) AS avg_qty_micro,
        |  CAST((sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 10000 + count(*) // 2) // count(*) AS BIGINT) AS avg_price_micro,
        |  CAST((sum(CAST(round(l_discount * 100) AS BIGINT)) * 10000 + count(*) // 2) // count(*) AS BIGINT) AS avg_disc_micro,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q15_distinct_having" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_orderkey) AS n_orders, count(*) AS n_rows
        |FROM lineitem GROUP BY l_suppkey
        |HAVING count(DISTINCT l_partkey) >= 400
        |ORDER BY l_suppkey""".stripMargin,

    "q16_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin,

    "q16b_cube" ->
      """SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |       CAST(GROUPING(yr) AS INT) AS g_yr
        |FROM orders GROUP BY CUBE (o_orderstatus, yr)
        |ORDER BY g_status, g_yr, o_orderstatus NULLS LAST, yr NULLS LAST""".stripMargin,

    "q16c_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin,

    "q17_conditional_agg" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS open_total,
        |  CAST((sum(CAST(round((CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END) * 100) AS BIGINT)) * 10000 + count(*) // 2) // count(*) AS BIGINT) AS pct_f_micro,
        |  max(greatest(o_totalprice, 250000.0)) AS max_or_250k,
        |  CAST(sum(CASE WHEN nullif(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q18_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
        |  round(quantile_cont(l_discount, 0.25), 6) AS p25_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // identical semantics to q18 — the Spark side differs only in plan
    "q18b_percentile_sorted" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
        |  round(quantile_cont(l_discount, 0.25), 6) AS p25_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_weighted_median" ->
      """WITH v AS (SELECT l_returnflag AS flag,
        |        CAST(round(l_extendedprice*100) AS BIGINT) AS cents,
        |        CAST(round(l_quantity) AS BIGINT) AS w
        |      FROM lineitem),
        |g AS (SELECT flag, cents, CAST(sum(w) AS BIGINT) AS gw
        |      FROM v GROUP BY 1, 2),
        |c AS (SELECT flag, cents, gw,
        |        CAST(sum(gw) OVER (PARTITION BY flag ORDER BY cents
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum,
        |        CAST(sum(gw) OVER (PARTITION BY flag) AS BIGINT) AS tot
        |      FROM g)
        |SELECT flag AS l_returnflag,
        |       CAST(min(cents) AS BIGINT) AS median_cents,
        |       CAST(min(tot) AS BIGINT) AS total_weight
        |FROM c WHERE 2*cum >= tot
        |GROUP BY flag ORDER BY l_returnflag""".stripMargin,

    // same count-of-counts decomposition, same tied-run Gini terms and
    // partial top-10 walk; all numerators non-negative so // == trunc
    "q_skew_profile" ->
      """WITH keyed AS (
        |  SELECT col_name, k, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT 'user_id' AS col_name,
        |           CAST(user_id AS VARCHAR) AS k FROM events
        |    UNION ALL
        |    SELECT 'event_type', event_type FROM events) u
        |  GROUP BY 1, 2),
        |cc AS (SELECT col_name, c, CAST(count(*) AS BIGINT) AS nk
        |       FROM keyed GROUP BY 1, 2),
        |w AS (
        |  SELECT col_name, c, nk,
        |    coalesce(sum(nk) OVER (PARTITION BY col_name ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS prevAsc,
        |    coalesce(sum(nk) OVER (PARTITION BY col_name ORDER BY c DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS prevDesc
        |  FROM cc),
        |g AS (
        |  SELECT col_name,
        |    CAST(sum(nk) AS BIGINT) AS n_keys,
        |    CAST(sum(c * nk) AS BIGINT) AS n_rows,
        |    CAST(max(c) AS BIGINT) AS max_count,
        |    CAST(sum(c * (nk * prevAsc + (nk * (nk + 1)) // 2))
        |      AS BIGINT) AS s,
        |    CAST(sum(c * greatest(0, least(nk, 10 - prevDesc)))
        |      AS BIGINT) AS t10
        |  FROM w GROUP BY 1)
        |SELECT col_name, n_keys, n_rows, max_count,
        |  CAST(max_count * 1000000 // n_rows AS BIGINT)
        |    AS top1_share_micro,
        |  CAST(t10 * 1000000 // n_rows AS BIGINT) AS top10_share_micro,
        |  CAST((2 * s - (n_keys + 1) * n_rows) * 1000000
        |       // (n_keys * n_rows) AS BIGINT) AS gini_micro
        |FROM g ORDER BY col_name""".stripMargin,

    // same count-compress domain, same ceil-rank bounds (all positive,
    // // == trunc == floor), same min-bucket assignment
    "q_histogram_equidepth" ->
      """WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1),
        |dom AS (
        |  SELECT cents, cnt,
        |    sum(cnt) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER () AS n
        |  FROM v),
        |bounds AS (
        |  SELECT b.b, min(cents) AS bound
        |  FROM dom CROSS JOIN (SELECT unnest(range(1, 9)) AS b) b
        |  WHERE cum >= (b.b * n + 7) // 8
        |  GROUP BY 1),
        |assigned AS (
        |  SELECT d.cents, d.cnt, CAST(min(bo.b) AS BIGINT) AS bucket
        |  FROM dom d JOIN bounds bo ON d.cents <= bo.bound
        |  GROUP BY 1, 2)
        |SELECT bucket, CAST(min(cents) AS BIGINT) AS lo_cents,
        |  CAST(max(cents) AS BIGINT) AS hi_cents,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS ndv
        |FROM assigned GROUP BY 1 ORDER BY bucket""".stripMargin,

    // cov_vu mirrors the Spark side's exact-integer co-moment with an
    // IDENTICALLY-WRITTEN double tail (sum(BIGINT) is exact HUGEINT
    // here, exact DECIMAL(38,0) there; each cast/op is exactly rounded
    // over identical operands — same bits at any scale)
    "q_stat_funcs" ->
      """WITH e AS (SELECT *, epoch(ts) AS ts_s,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT event_type,
        |  round(stddev_samp(value), 6) AS sd,
        |  round(var_samp(value), 6) AS vr,
        |  round(corr(value, ts_s), 6) AS corr_vt,
        |  round((CAST(sum(cents * user_id) AS DOUBLE) -
        |     CAST(sum(cents) AS DOUBLE) * CAST(sum(user_id) AS DOUBLE) /
        |     CAST(count(*) AS DOUBLE)) /
        |    (CAST(count(*) AS DOUBLE) - 1.0) / 100.0, 6) AS cov_vu,
        |  round(regr_slope(value, ts_s) * 86400 * 1000, 6) AS slope_md,
        |  count(*) AS n
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The TRUE literals are the oracle's expectation that Spark's sketches
    // stay within tolerance (see the query comment) — exact columns are
    // genuinely cross-checked.
    "q_approx_sketches" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS exact_median_qty,
        |  TRUE AS parts_within_tol,
        |  TRUE AS median_within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_approx_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50_exact,
        |  round(quantile_cont(value, 0.95), 6) AS p95_exact,
        |  TRUE AS p50_within_tol,
        |  TRUE AS p95_within_tol
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_udaf_time_weighted_avg" ->
      """WITH weighted AS (
        |  SELECT user_id, value,
        |         epoch(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch(ts) AS weight
        |  FROM events)
        |SELECT user_id,
        |       round(sum(value * weight) / sum(weight), 6) AS tw_avg
        |FROM weighted WHERE weight IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // The sketch is recomputed for real on the oracle side — same hash
    // family, same bucket sums, same min-over-depth estimate.
    "q_cms_heavy_hitters" ->
      """WITH h(d, a, b) AS (VALUES (0, 31, 7), (1, 131071, 911), (2, 8191, 271)),
        |buckets AS (
        |  SELECT h.d, (l_partkey * h.a + h.b) % 2147483647 % 1024 AS bucket
        |  FROM lineitem CROSS JOIN h),
        |sketch AS (
        |  SELECT d, bucket, CAST(count(*) AS BIGINT) AS c
        |  FROM buckets GROUP BY d, bucket),
        |top AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS true_cnt
        |  FROM lineitem GROUP BY l_partkey
        |  ORDER BY true_cnt DESC, l_partkey LIMIT 20),
        |probe AS (
        |  SELECT t.l_partkey, t.true_cnt, h.d,
        |         (t.l_partkey * h.a + h.b) % 2147483647 % 1024 AS bucket
        |  FROM top t CROSS JOIN h)
        |SELECT p.l_partkey, p.true_cnt,
        |       min(s.c) AS cms_est,
        |       min(s.c) - p.true_cnt AS overcount
        |FROM probe p JOIN sketch s USING (d, bucket)
        |GROUP BY p.l_partkey, p.true_cnt
        |ORDER BY p.true_cnt DESC, p.l_partkey""".stripMargin
  )
}
