package graft.queries

import org.apache.spark.sql.functions._

/** Scans, projections, predicates, sorts, limits, set ops
  * (SURVEY.md §2.4 a/b/f/g: Q01-Q06, Q23-Q26).
  *
  * Reference behaviors covered: full-table scan + projection
  * (refluxdb src/persistence.rs:198-220), time-range scan intent
  * (src/persistence.rs:177-180 — inclusive both ends), tag-map predicates
  * (intent of README.md:34, see SURVEY Q-C).
  */
object CoreQueries extends QuerySet {

  val queries: Map[String, Q] = Map(
    // Q01: full scan + projection. Column pruning must reach the parquet
    // scan (ReadSchema shows only 4 of 11 lineitem columns).
    "q01_scan_projection" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data:
        // order by every output column for a total, oracle-stable order.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
    },

    // Q02: time-range scan, inclusive both ends (reference intent,
    // src/persistence.rs:178-179 `>= AND <=`). Predicate pushes to parquet.
    "q02_time_range" -> { (s, dir) =>
      t(s, dir, "events")
        .filter(col("ts").between(
          lit("2024-01-10 00:00:00").cast("timestamp"),
          lit("2024-01-15 00:00:00").cast("timestamp")))
        .select(col("event_id"), ntz(col("ts")).as("ts"), col("event_type"),
          col("value"))
        .orderBy(col("event_id"))
    },

    // Q03: projection with expressions + aliasing.
    "q03_project_expr" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          // exact decimal product, rendered DOUBLE (QuerySet output-type policy)
          (dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("net_price"),
          concat_ws("/", col("l_returnflag"), col("l_linestatus")).as("flag_status"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_price"),
          col("flag_status"))
    },

    // Q04: comparison + boolean predicate tree (AND/OR/NOT).
    "q04_predicates" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter((col("l_quantity") > 45 && col("l_discount") <= 0.05) ||
          (!(col("l_returnflag") === "N") && col("l_tax") >= 0.07))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_returnflag"), col("l_tax"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_returnflag"), col("l_tax"))
    },

    // Q05: BETWEEN / IN / LIKE / IS NULL (null produced via nullif).
    "q05_between_in_like" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_size").between(10, 40) &&
          col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5") &&
          col("p_name").like("%e%"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
          nullif(col("p_type"), lit("PROMO")).isNull.as("is_promo"))
        .orderBy(col("p_partkey"))
    },

    // Q06: predicate + projection through a MAP column (GetMapValue) — the
    // intent of refluxdb tags (README.md:34; write-only in the reference,
    // SURVEY Q-C). Built from events, then filtered/read via map lookups.
    "q06_map_predicate" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          map(lit("type"), col("event_type"),
              lit("uid"), col("user_id").cast("string")).as("tags"))
        .filter(col("tags")("type") === "click")
        .select(col("event_id"), col("tags")("uid").cast("long").as("uid"))
        .orderBy(col("event_id"))
    },

    // Downsampling — the TSDB workhorse (reference intent: "pre-calculated
    // stats" TODO, refluxdb README.md:58): hourly buckets per event_type.
    "q_downsample_hourly" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          decSum(col("value")).as("sum_v"),
          r6(min(col("value"))).as("min_v"),
          r6(max(col("value"))).as("max_v"),
          avgMicro(col("value"), count(lit(1))).as("avg_micro"))
        .select(ntz(col("hour")).as("hour"), col("event_type"), col("n"),
          col("sum_v"), col("min_v"), col("max_v"), col("avg_micro"))
        .orderBy(col("hour"), col("event_type"))
    },

    // Correlated scalar subquery (decorrelated by Catalyst into a join) +
    // uncorrelated IN subquery — the spark.sql facade path (E1).
    "q_subqueries" -> { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c.c_custkey,
          |  (SELECT count(*) FROM orders_v o
          |   WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') AS n_f
          |FROM customer_v c
          |WHERE c.c_custkey IN (SELECT o_custkey FROM orders_v
          |                      WHERE o_totalprice > 400000)
          |ORDER BY c.c_custkey""".stripMargin)
    },

    // Q23: multi-column sort with ASC/DESC and explicit NULL placement.
    "q23_multi_sort" -> { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal"))
            .as("pos_bal"))
        .orderBy(col("c_mktsegment").asc, col("pos_bal").desc_nulls_last,
          col("c_custkey").asc)
    },

    // Q24: global top-k — ORDER BY + LIMIT/OFFSET compiles to
    // TakeOrderedAndProject (no full sort materialization at scale).
    "q24_limit_offset" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(100).limit(50)
    },

    // Q25: UNION ALL and UNION DISTINCT.
    "q25_union" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = o.filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      a.unionAll(b).orderBy(col("o_custkey"))
    },
    "q25b_union_distinct" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = o.filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      a.union(b).distinct().orderBy(col("o_custkey"))
    },

    // Q26: INTERSECT / EXCEPT (both distinct semantics, as in SQL).
    "q26_intersect" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      a.intersect(b).orderBy(col("o_custkey"))
    },
    "q26b_except" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      a.except(b).orderBy(col("o_custkey"))
    },

    // UNPIVOT (wide→long): the four lineitem measures stacked into
    // (measure, val) rows via Dataset.unpivot — Catalyst's Expand node,
    // a map-only ×4 row generator with NO shuffle — then one hash agg
    // per (returnflag, measure) in exact cents. The inverse surface of
    // q_pivot; at 100 TB Expand streams through whole-stage codegen and
    // the only exchange is the catalog-sized final agg.
    "q_unpivot" -> { (s, dir) =>
      val wide = t(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity").as("qty"), col("l_extendedprice").as("price"),
        col("l_discount").as("disc"), col("l_tax").as("tax"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc"), col("tax")),
          "measure", "val")
        .groupBy(col("l_returnflag"), col("measure"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("val") * 100).cast("long")).as("sum_cents"))
        .orderBy(col("l_returnflag"), col("measure"))
    },

    // Keyed SNAPSHOT DIFF — the data-engineering audit between two
    // versions of a derived table (here: per-customer order state at
    // two overlapping date windows): one keyed full-outer join emits
    // added / removed / changed rows with integer deltas, unchanged
    // rows dropped. At scale both sides aggregate FIRST (the diff joins
    // key-cardinality rows, never raw fact rows) and the join keys are
    // co-partitioned by the same groupBy hash — one shuffle per side,
    // one join, no row-level comparison fan-out. Exact integer cents
    // make "changed" bit-stable across engines.
    "q_snapshot_diff" -> { (s, dir) =>
      def snap(from: String, until: String) =
        t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
            col("o_orderdate") < lit(until).cast("timestamp"))
          .groupBy(col("o_custkey").as("k"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val a = snap("1995-01-01", "1997-01-01")
        .select(col("k"), col("n").as("na"), col("cents").as("ca"))
      val b = snap("1996-01-01", "1998-01-01")
        .select(col("k"), col("n").as("nb"), col("cents").as("cb"))
      a.join(b, Seq("k"), "full_outer")
        .filter(!(col("na").isNotNull && col("nb").isNotNull &&
          col("na") === col("nb") && col("ca") === col("cb")))
        .select(col("k").as("custkey"),
          when(col("na").isNull, "added")
            .when(col("nb").isNull, "removed")
            .otherwise("changed").as("diff_kind"),
          (coalesce(col("nb"), lit(0L)) - coalesce(col("na"), lit(0L)))
            .as("n_delta"),
          (coalesce(col("cb"), lit(0L)) - coalesce(col("ca"), lit(0L)))
            .as("cents_delta"))
        .orderBy(col("custkey"))
    },

    // Z-ORDER KEY (Morton 1966) — the multi-dimensional layout key
    // behind q_zorder_box: (partkey, suppkey) bucketed to a 64×64 grid
    // and bit-interleaved in pure int64 shift/mask arithmetic. The
    // Spark Column expression and the DuckDB oracle SQL render from
    // the SAME constant table (operators.ZOrder.spreadSteps — one
    // definition, so the oracle hash-checks the keys themselves).
    // Output is the per-key row count: every fact row's key is
    // computed, the comparison is key-domain-sized.
    "q_zorder_key" -> { (s, dir) =>
      import graft.operators.ZOrder
      val li = t(s, dir, "lineitem")
      val mx = li.agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
      val (xw, yw) = (ZOrder.bucketWidth(mx.getLong(0)),
        ZOrder.bucketWidth(mx.getLong(1)))
      li.select(ZOrder.morton(expr(s"l_partkey div $xw"),
          expr(s"l_suppkey div $yw")).as("zkey"))
        .groupBy(col("zkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("zkey"))
    },

    // Z-ORDER BOX SCAN — the layout pay-off: the box query runs
    // against the z-bucket-partitioned lineitem layout (built once per
    // dir, the SignatureStore artifact recipe), partition-PRUNED to
    // the driver-enumerated covering buckets (≤ 4096-cell grid walk —
    // a constant of the layout, not the corpus), with the exact box
    // predicate closing the superset. The oracle is the PLAIN filter
    // over the unordered table — an equivalence gate: pruning must
    // change the files read (ZOrderSpec plan-asserts that), never the
    // answer. At 100 TB this is the difference between scanning every
    // file and scanning the tile sliver under the box.
    "q_zorder_box" -> { (s, dir) =>
      graft.operators.ZOrder.boxScan(s, dir, 100L, 400L, 10L, 40L)
        .groupBy(col("l_suppkey").as("suppkey"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("cents"))
        .orderBy(col("suppkey"))
    },

    // ZONE MAPS / small materialized aggregates (Moerkotte, VLDB 1998 —
    // the min/max data-skipping stats every columnar engine persists
    // per block: parquet row-group stats, ClickHouse marks, ORC
    // indexes), over the TSDB fact the reference actually serves:
    // fixed 512-event-id blocks of events (ingest order IS roughly
    // time order — exactly the correlation zone maps monetize; the
    // uncorrelated counter-case is documented below). Per block the
    // row count, min/max event time and value cents, whether the
    // canonical time-range scan (ts ≥ 2024-01-20) could PRUNE the
    // block outright (max_ts below the cut — 12 of 20 blocks at
    // sf0.01, 123 of 196 at sf0.1), and the corpus skip share that
    // pruning delivers (repeated per row — the ece_micro one-schema
    // recipe). Lineitem would be the counter-case: its shipdate is
    // uniform across order-key blocks (measured: every block spans
    // 1995–2001), so natural-order zone maps buy ZERO skipping there —
    // the readout an engine uses to decide a table needs clustering
    // (the q_zorder family is the fix). Scale shape: ONE fact-sized
    // hash agg keyed by block id; everything downstream (prune flag,
    // share window) is block-domain sized — a deliberate output-sized
    // merge, same as the skyline/block-offset precedents.
    "q_zone_maps" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wAll = Window.partitionBy()
      t(s, dir, "events")
        .groupBy(intDiv(col("event_id"), lit(512L)).as("blk"))
        .agg(count(lit(1)).as("n_rows"),
          ntz(min(col("ts"))).as("min_ts"),
          ntz(max(col("ts"))).as("max_ts"),
          min(round(col("value") * 100).cast("long"))
            .as("min_value_cents"),
          max(round(col("value") * 100).cast("long"))
            .as("max_value_cents"))
        .withColumn("prunable",
          (col("max_ts") < lit("2024-01-20").cast("timestamp_ntz"))
            .cast("long"))
        .withColumn("skip_share_micro",
          intDiv(sum(col("prunable")).over(wAll) * lit(1000000L),
            sum(lit(1L)).over(wAll)))
        .orderBy(col("blk"))
    },

    // ZONE-MAP PRUNED SCAN — the pay-off query (the q_zorder_box
    // equivalence-gate recipe): the canonical time-range rollup runs
    // THROUGH operators/ZoneMaps — a block-partitioned events layout
    // plus a persisted per-block min/max-ts sidecar, both built once
    // per dir (staging+rename artifact). The sidecar's 1-row agg gives
    // the first surviving block (ingest order ≈ time order, so the
    // survivors are a block-id SUFFIX and the pruning predicate is ONE
    // scalar comparison on the partition column — never a block-list
    // collect); the exact ts predicate closes the superset. The oracle
    // is the PLAIN filter+agg over the unordered table — pruning must
    // change the files read (ZoneMapSpec pins the reduction), never
    // the answer. This is R11's time-range scan at 100 TB: the
    // difference between opening every file and opening the suffix
    // under the cut.
    "q_zone_scan" -> { (s, dir) =>
      graft.operators.ZoneMaps.prunedRange(s, dir, "2024-01-20")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .orderBy(col("event_type"))
    },

    // ZONE-MAP VALUE-CUT SCAN — the Q04-family `value >= X` predicate
    // THROUGH the sidecar's min/max_value_cents (round-14 VERDICT #2:
    // a ts-only sidecar made value scans open every surviving-time
    // block). Value carries no layout order, so there is no static
    // suffix — pruning is ENTIRELY the dynamic survivor semi-join
    // (broadcast block-domain survivors → DPP dir skipping), exactly
    // how engines consult per-row-group value stats. The 300-dollar
    // cut rides the distribution's heavy tail: per-block maxima span
    // 252..490 dollars, so ~26% of blocks die at sf0.1 (ZoneMapSpec
    // pins fewer-files-read + skipped-block soundness). Oracle = the
    // PLAIN filter+agg — pruning may only change the files read.
    "q_zone_scan_value" -> { (s, dir) =>
      graft.operators.ZoneMaps.prunedValueCut(s, dir, 30000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .orderBy(col("event_type"))
    },

    // COMPOSED ZONE-MAP SCAN — time AND value cuts prune in ONE pass
    // (ZoneMaps.prunedRangeValue): the survivor set intersects both
    // per-block conditions, the time level keeps its free static
    // suffix, the intersection rides one DPP semi-join — exactly how
    // row-group stats serve conjunctive predicates, and the composed
    // skip beats either cut alone (15/20 blocks dead at sf0.01 vs 12
    // and 6, 143/196 at sf0.1). Readout counts survivors per type (no event_type ORDER
    // dependence on pruning). Oracle = the plain two-predicate
    // filter+agg.
    "q_zone_scan_both" -> { (s, dir) =>
      graft.operators.ZoneMaps
        .prunedRangeValue(s, dir, "2024-01-20", 30000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .orderBy(col("event_type"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q_zorder_key" -> {
      import graft.operators.ZOrder
      val xw = "(SELECT max(l_partkey) // 64 + 1 FROM lineitem)"
      val yw = "(SELECT max(l_suppkey) // 64 + 1 FROM lineitem)"
      s"""SELECT ${ZOrder.mortonSql(s"l_partkey // $xw", s"l_suppkey // $yw")}
         |  AS zkey, CAST(count(*) AS BIGINT) AS n
         |FROM lineitem GROUP BY 1 ORDER BY zkey""".stripMargin
    },

    "q_zorder_box" ->
      """SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS cents
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 400
        |  AND l_suppkey BETWEEN 10 AND 40
        |GROUP BY 1 ORDER BY suppkey""".stripMargin,

    // same block key (non-negative, so // == Spark's truncating div),
    // same cents rounding, same prune cut; the share window mirrors
    // skip_share_micro over the block domain
    "q_zone_maps" ->
      """WITH z AS (
        |  SELECT event_id // 512 AS blk,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    min(ts) AS min_ts, max(ts) AS max_ts,
        |    CAST(min(CAST(round(value * 100) AS BIGINT))
        |      AS BIGINT) AS min_value_cents,
        |    CAST(max(CAST(round(value * 100) AS BIGINT))
        |      AS BIGINT) AS max_value_cents
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT CAST(blk AS BIGINT) AS blk, n_rows, min_ts, max_ts,
        |    min_value_cents, max_value_cents,
        |    CAST(CASE WHEN max_ts < TIMESTAMP '2024-01-20'
        |         THEN 1 ELSE 0 END AS BIGINT) AS prunable
        |  FROM z)
        |SELECT blk, n_rows, min_ts, max_ts, min_value_cents,
        |  max_value_cents, prunable,
        |  CAST(sum(prunable) OVER () * 1000000 // sum(1) OVER ()
        |    AS BIGINT) AS skip_share_micro
        |FROM p ORDER BY blk""".stripMargin,

    // the equivalence gate: the plain unpruned filter+agg — the layout
    // may only change the files read, never the answer
    "q_zone_scan" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM events WHERE ts >= TIMESTAMP '2024-01-20'
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    // the same equivalence gate for the value cut: the plain unpruned
    // filter+agg — the sidecar may only change the files read
    "q_zone_scan_value" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM events WHERE CAST(round(value * 100) AS BIGINT) >= 30000
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    // composed cuts: the plain conjunctive filter — both prune levels
    // may only change the files read
    "q_zone_scan_both" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM events WHERE ts >= TIMESTAMP '2024-01-20'
        |  AND CAST(round(value * 100) AS BIGINT) >= 30000
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q01_scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q02_time_range" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin,

    "q03_project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
        |  concat_ws('/', l_returnflag, l_linestatus) AS flag_status
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price, flag_status""".stripMargin,

    "q04_predicates" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_tax
        |FROM lineitem
        |WHERE (l_quantity > 45 AND l_discount <= 0.05)
        |   OR (NOT (l_returnflag = 'N') AND l_tax >= 0.07)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_tax""".stripMargin,

    "q05_between_in_like" ->
      """SELECT p_partkey, p_name, p_brand, p_size,
        |  (nullif(p_type, 'PROMO') IS NULL) AS is_promo
        |FROM part
        |WHERE p_size BETWEEN 10 AND 40
        |  AND p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4','Brand#5')
        |  AND p_name LIKE '%e%'
        |ORDER BY p_partkey""".stripMargin,

    "q06_map_predicate" ->
      """SELECT event_id, user_id AS uid FROM events
        |WHERE event_type = 'click' ORDER BY event_id""".stripMargin,

    "q_downsample_hourly" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  round(min(value), 6) AS min_v,
        |  round(max(value), 6) AS max_v,
        |  CAST((sum(CAST(round(value * 100) AS BIGINT)) * 10000 + count(*) // 2) // count(*) AS BIGINT) AS avg_micro
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q_subqueries" ->
      """SELECT c.c_custkey,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') AS n_f
        |FROM customer c
        |WHERE c.c_custkey IN (SELECT o_custkey FROM orders
        |                      WHERE o_totalprice > 400000)
        |ORDER BY c.c_custkey""".stripMargin,

    "q23_multi_sort" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal
        |FROM customer
        |ORDER BY c_mktsegment ASC, pos_bal DESC NULLS LAST, c_custkey ASC""".stripMargin,

    "q24_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 100""".stripMargin,

    "q25_union" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY o_custkey""".stripMargin,

    "q25b_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY o_custkey""".stripMargin,

    "q26_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "q26b_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    // DuckDB's UNPIVOT is the same wide→long stack — with INCLUDE NULLS,
    // because Spark's Dataset.unpivot RETAINS null measure values as rows
    // while DuckDB excludes them by default; INCLUDE NULLS makes the
    // equivalence structural rather than resting on lineitem's measures
    // happening to be non-null
    "q_unpivot" ->
      """WITH u AS (
        |  SELECT l_returnflag, measure, val FROM (
        |    SELECT l_returnflag, l_quantity AS qty,
        |      l_extendedprice AS price, l_discount AS disc,
        |      l_tax AS tax FROM lineitem)
        |  UNPIVOT INCLUDE NULLS (val FOR measure IN (qty, price, disc, tax)))
        |SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(val*100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM u GROUP BY 1, 2 ORDER BY l_returnflag, measure""".stripMargin,

    // aggregate-first keyed diff; exact integer cents pin "changed"
    "q_snapshot_diff" ->
      """WITH a AS (
        |  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1),
        |b AS (
        |  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1)
        |SELECT coalesce(a.k, b.k) AS custkey,
        |  CASE WHEN a.k IS NULL THEN 'added'
        |       WHEN b.k IS NULL THEN 'removed'
        |       ELSE 'changed' END AS diff_kind,
        |  coalesce(b.n, 0) - coalesce(a.n, 0) AS n_delta,
        |  coalesce(b.cents, 0) - coalesce(a.cents, 0) AS cents_delta
        |FROM a FULL OUTER JOIN b ON a.k = b.k
        |WHERE NOT (a.k IS NOT NULL AND b.k IS NOT NULL
        |           AND a.n = b.n AND a.cents = b.cents)
        |ORDER BY custkey""".stripMargin
  )
}
