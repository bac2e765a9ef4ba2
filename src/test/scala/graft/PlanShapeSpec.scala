package graft

/** Scale guardrail: no query may silently plan a cartesian product or a
  * broadcast-nested-loop join — the two shapes that die first at 100 TB.
  * Intentional exceptions are allowlisted with the reason.
  */
class PlanShapeSpec extends SparkSpec {

  // queries whose SEMANTICS are a bounded cross product (tiny inputs)
  private val allowCross = Set(
    "q11_cross_join", // 5 x 25 dims — declared bounded cross join
    "q34_cosine_topk", // 1-row broadcast query vector
    "q34b_ann_ivf", // 1-row broadcast query vector + 1-row best label
    "q34d_ann_multiprobe", // 1-row broadcast query vector + 2-row probe set
    "q34e_pq_ann", // 1-row broadcast query vector over the 50-row shortlist
    "q_bigram_pmi", // 1-row broadcast corpus total
    "q_text_tfidf", // 1-row broadcast document count into the idf table
    "q_text_bm25", // 1-row broadcast corpus totals (N, sum_dl) into the hit set
    "q_retrieval_rrf", // 1-row broadcast corpus totals (the q_text_bm25 pattern)
    "q_text_lm_bigram", // 1-row broadcast smoothing vocab size V
    "q_embed_project", // 1-row broadcast query vector (q34 pattern)
    "q_pca_project", // k-row broadcast pinned-component table (model-sized)
    "q_token_budget_mix", // 1-row broadcast global budget into the catalog-sized fractions
    // (q_dsir_resample shares dsirLr's 1-row totals broadcast, but its
    // score frame is checkpointed, so the returned plan shows no cross)
    "q_dsir_select", // 1-row broadcast corpus totals into the 8192-bucket log-ratio table
    "q_text_kl_drift", // ≤8192-bucket × source-domain declared bounded cross + 1-row totals
    "q34f_sq8_ann", // 1-row broadcast query codes + scale/norm (q34 pattern)
    "q_dtw", // 50-row top-N-blocked PAA vector table both sides — pair count 1225 by construction
    "q_eval_mrr", // 1-row broadcast corpus totals via the shared bm25Hits (q_text_bm25 pattern)
    "q_curriculum", // 1-row broadcast corpus total N into the stage split
    "q_join_cardinality") // two 1-row broadcast side totals per profiled join
  // (q_histogram_equidepth left the allowlist in r16: its 8-row
  // bucket-bounds side is now a driver collect folded into a map-side
  // CASE — no nested-loop join remains in the plan)

  test("no unbounded cartesian/nested-loop joins in any query plan") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val bad = (plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")) && !allowCross(name)
        if (bad) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded join shapes in: ${offenders.mkString(", ")}")
  }

  test("JL projection runs as the native vec_project expression, not an " +
      "interpreted HigherOrderFunction tower (round-8 perf-weak flag)") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q_embed_project")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("vec_project") && plan.contains("vec_dot_long"),
      s"native projection expressions missing from plan:\n${plan.take(3000)}")
    assert(!plan.toLowerCase.contains("lambdafunction"),
      s"interpreted lambda (HigherOrderFunction CodegenFallback) in " +
        s"plan:\n${plan.take(3000)}")
  }

  test("classifier scoring runs as the native classifier_scores " +
      "expression, not the interpreted filter/transform/aggregate tower " +
      "(round-9 BENCH hot spots #1/#2)") {
    val dir = "/root/testdata/sf0.001"
    // q_text_classifier must be fully lambda-free; the two reusers keep
    // lambdas elsewhere in their plans, so assert only on the expression
    val plan = SparkEntry.queries("q_text_classifier")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("classifier_scores"),
      s"native classifier_scores missing from plan:\n${plan.take(3000)}")
    assert(!plan.toLowerCase.contains("lambdafunction"),
      s"interpreted lambda (HigherOrderFunction CodegenFallback) in " +
        s"plan:\n${plan.take(3000)}")
    Seq("q_pipeline_clean", "q_sample_quality").foreach { name =>
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("classifier_scores"),
        s"$name lost the native classifier expression:\n${p.take(3000)}")
    }
  }

  test("q_pipeline_clean hashes text once per scan branch (shared h " +
      "projection feeds both the keepers agg and the join-back key)") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q_pipeline_clean")(spark, dir)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val projMd5 = lines.count(l => l.contains("Project") && l.contains("md5("))
    assert(projMd5 == 2,
      s"expected exactly 2 md5-bearing Projects (one per documents scan " +
        s"branch), got $projMd5:\n${plan.take(4000)}")
    assert(!lines.exists(l => l.contains("Join") && l.contains("md5(")),
      s"md5 recomputed inside a join condition (the 100 TB double-hash " +
        s"shape):\n${plan.take(4000)}")
  }

  test("dedup pipeline reuses the distinct-shingle exchange (no 4x scan)") {
    // q_dedup_jaccard_verify consumes the distinct-shingle subtree three
    // times (sizes + both intersection probes); the planner must reuse its
    // exchange, not recompute the distinct per consumer (the 4-scan
    // regression VERDICT r01 suspected). AQE defers exchange reuse to
    // runtime, so assert on the static plan with AQE off — canonical
    // subtree equality is exactly what AQE's runtime reuse needs too; if a
    // refactor breaks it, this fails.
    val dir = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq("q_dedup_jaccard_verify", "q_dedup_apply").foreach { name =>
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        val reused = "ReusedExchange".r.findAllIn(plan).size
        assert(reused >= 2,
          s"$name: expected >=2 ReusedExchange nodes, got $reused:\n" +
            plan.take(4000))
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("vocabulary-sized scoring tables broadcast into their map-side " +
      "joins (perplexity LM, tf-idf)") {
    val dir = "/root/testdata/sf0.001"
    Seq("q_text_perplexity", "q_text_tfidf").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$name: scoring join is not broadcast:\n${plan.take(3000)}")
    }
  }

  test("blocklist filter is a broadcast anti join (map-only over the " +
      "corpus), semantic decontamination broadcasts the benchmark side") {
    val dir = "/root/testdata/sf0.001"
    val anti = SparkEntry.queries("q_filter_blocklist")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(anti.contains("BroadcastHashJoin") && anti.contains("LeftAnti"),
      s"blocklist did not plan a broadcast anti join:\n${anti.take(3000)}")
    val sem = SparkEntry.queries("q_decontaminate_semantic")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(sem.contains("BroadcastHashJoin"),
      s"benchmark embeddings not broadcast:\n${sem.take(3000)}")
  }

  test("bloom decontamination probes with the native codegen expression, " +
      "not a Scala UDF") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q_decontaminate_bloom")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"no native bloom probe in plan:\n${plan.take(3000)}")
    assert(!plan.contains("UDF"),
      s"bloom probe fell back to a Scala UDF (opaque to codegen):\n" +
        plan.take(3000))
  }

  test("q18b's percentile plan stays in codegen hash aggregation — no " +
      "object-hash value-count maps") {
    // the point of the count-compress formulation: q18's percentile() is a
    // TypedImperativeAggregate forcing ObjectHashAggregate (per-row map
    // updates outside codegen, the agg family's largest measured constant
    // at 30x — SCALE.md §9.3); q18b must plan only codegen'd HashAggregate
    // + small windows over distinct values, and must agree with q18 exactly
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q18b_percentile_sorted")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"),
      s"q18b fell back to object aggregation:\n${plan.take(3000)}")
    assert(plan.contains("HashAggregate"), plan.take(3000))
    val viaMap = SparkEntry.queries("q18_percentile")(spark, dir)
      .collect().toSeq
    assert(df.collect().toSeq == viaMap, "q18b != q18 on the fixture")
  }

  test("allowlisted cross joins only broadcast single-row / tiny-dim sides") {
    val dir = "/root/testdata/sf0.001"
    allowCross.filterNot(_ == "q11_cross_join").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      // these must stay BROADCAST nested loops (1-row build side), never a
      // cartesian product — a regression to cartesian means the broadcast
      // hint was lost and the plan shuffles both sides
      assert(!plan.contains("CartesianProduct"),
        s"$name: cartesian product instead of broadcast:\n$plan")
      assert(plan.contains("BroadcastExchange"),
        s"$name: no broadcast exchange in plan:\n$plan")
    }
  }

  test("q_chunk_windows is map-only: no shuffle exchange at any corpus " +
      "size (the generator fan-out never joins or aggregates)") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q_chunk_windows")(spark, dir)
      .queryExecution.executedPlan.toString
    // the only allowed exchange is the final ORDER BY's range partition
    // (presentation order, oracle-comparison artifact); a hash/shuffle
    // exchange before it would mean the chunker stopped being map-only
    val exchanges = "Exchange (\\w+)".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq
    assert(exchanges.forall(_ == "rangepartitioning"),
      s"q_chunk_windows plans non-range exchanges ($exchanges):\n" +
        plan.take(3000))
    assert(plan.contains("Generate"), plan.take(1500))
  }

  test("q_deseasonalize joins the catalog-sized profile back as a " +
      "broadcast (map-only detector after the profile agg)") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q_deseasonalize")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"profile join-back is not broadcast:\n${plan.take(3000)}")
  }

  test("top-k selections plan as distributed TakeOrderedAndProject, not " +
      "single-partition rank windows, and the shortest-path relax join " +
      "is broadcast (round-12 punch items #2/#6)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the real selection code paths (called by q_shortest_path/q_dtw
    // before their checkpoints hide the subtree from the final plan).
    // Inputs must exceed k, else EliminateLimits folds the limit away
    // (maxRows <= k) and no TakeOrdered can appear.
    val deg = spark.range(0, 1000)
      .select(col("id").as("n"), (col("id") % 7).as("d"))
      .repartition(4) // >1 partition so a global window would matter
    val hubPlan = graft.queries.JoinQueries.hubSelect(deg)
      .queryExecution.executedPlan.toString
    assert(hubPlan.contains("TakeOrderedAndProject"),
      s"hub selection lost the TakeOrdered plan:\n$hubPlan")
    assert(!hubPlan.contains("Window"),
      s"hub selection regressed to a rank window:\n$hubPlan")
    val counts = spark.range(0, 1000)
      .select(col("id").as("user_id"), (col("id") % 5).as("n"))
      .repartition(4)
    val topPlan = graft.queries.TimeseriesQueries.topActive(counts)
      .queryExecution.executedPlan.toString
    assert(topPlan.contains("TakeOrderedAndProject"),
      s"dtw activity cut lost the TakeOrdered plan:\n$topPlan")
    assert(!topPlan.contains("Window"),
      s"dtw activity cut regressed to a rank window:\n$topPlan")
    // relax join: catalog-sized dist must broadcast into the edge side
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 5L)).toDF("u", "v", "w")
    val dist = Seq((1L, 0L)).toDF("n", "dist")
    val relaxPlan = graft.queries.JoinQueries.relaxStep(edges, dist)
      .queryExecution.executedPlan.toString
    assert(relaxPlan.contains("BroadcastHashJoin"),
      s"relax join is not broadcast:\n$relaxPlan")
    // ...and the selection is byte-identical to the rank window it
    // replaced, ties included (duplicated d values land on the n
    // tiebreak) — the determinism contract the oracle depends on
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val wHub = Window.orderBy(col("d").desc, col("n"))
    val viaWindow = deg.withColumn("rk", row_number().over(wHub))
      .filter(col("rk") <= 128)
      .select(col("n"), org.apache.spark.sql.functions.lit(0L).as("dist"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val viaTake = graft.queries.JoinQueries.hubSelect(deg)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaTake == viaWindow,
      "TakeOrdered hub selection diverged from the rank-window form")
  }

  test("q_skyline_grid's heavy pass is cell-partitioned (the global " +
      "single-partition window only ever sees local-skyline survivors)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q_skyline_grid")(spark, dir)
    val partSpecs = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w.partitionSpec.map(_.toString)
    }
    // phase 1 (innermost = last in collect order) must partition by the
    // hash cell — that is the pass that reads the full supplier aggregate
    assert(partSpecs.exists(_.exists(_.contains("cell"))),
      s"no cell-partitioned window in plan; partition specs: $partSpecs")
    // and the variant must stay bit-identical to the single-window form
    val a = SparkEntry.queries("q_skyline")(spark, dir).collect().toSeq
    val b = df.collect().toSeq
    assert(a == b, s"grid skyline diverged: ${a.diff(b)} vs ${b.diff(a)}")
  }
}
