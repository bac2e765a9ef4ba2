package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The binned range-join rewrite must (1) fire with a sampled width when
  * no conf is set (opt out via autoBin=false), (2) replace the
  * nested-loop plan with an equi-join, (3) be result-identical to the
  * native plan — including strict/inclusive bound mixes and empty
  * intervals, (4) bound per-row fan-out with a loud error, and (5) bin
  * equi-anchored joins (the as-of shape) only when opted in.
  */
class RangeJoinRuleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"


  /** Pure interval join: lineitem quantities against 12 value bands —
    * no equi key anywhere. */
  private def intervalJoin(s: SparkSession) = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val bands = s.range(12).select(
      (col("id") * 4 + 1).cast("double").as("lo"),
      (col("id") * 4 + 4).cast("double").as("hi"),
      concat(lit("band"), col("id")).as("band"))
    li.join(bands, col("l_quantity") >= col("lo") &&
      col("l_quantity") < col("hi"))
      .select(col("l_orderkey"), col("l_linenumber"), col("band"))
  }

  private def rows(s: SparkSession) =
    intervalJoin(s).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  test("opt-in binned rewrite turns the nested-loop interval join into an " +
      "equi-join with identical results") {
    val plain = intervalJoin(spark).queryExecution.executedPlan.toString
    assert(plain.contains("BroadcastNestedLoopJoin") ||
      plain.contains("CartesianProduct"), s"expected nested loop:\n$plain")
    val expected = rows(spark)
    assert(expected.nonEmpty)

    withExtendedSession { ext =>
      // NO conf set: the rule samples the bin width (p50 of hi-lo = 3.0)
      // and still rewrites — users don't hand-tune binSize
      val auto = intervalJoin(ext).queryExecution.executedPlan.toString
      assert(auto.contains("__graft_bin"),
        s"auto-width rewrite did not fire:\n$auto")
      assert(rows(ext) == expected, "auto-width rewrite changed results")

      // explicit opt-out: autoBin=false and no binSize → plans untouched
      ext.conf.set(BinnedRangeJoinRule.AutoBinConf, "false")
      val untouched = intervalJoin(ext).queryExecution.executedPlan.toString
      assert(untouched.contains("BroadcastNestedLoopJoin") ||
        untouched.contains("CartesianProduct"))

      ext.conf.set(BinnedRangeJoinRule.BinSizeConf, "4.0")
      val planned = intervalJoin(ext).queryExecution.executedPlan.toString
      assert(!planned.contains("BroadcastNestedLoopJoin") &&
        !planned.contains("CartesianProduct"),
        s"rewrite did not fire:\n$planned")
      assert(planned.contains("SortMergeJoin") ||
        planned.contains("ShuffledHashJoin") ||
        planned.contains("BroadcastHashJoin"), planned)
      assert(rows(ext) == expected, "rewrite changed results")

      // a narrower bin (more fan-out) must still be exact
      ext.conf.set(BinnedRangeJoinRule.BinSizeConf, "1.5")
      assert(rows(ext) == expected)
    }
  }

  test("timestamp interval joins rewrite too (the TSDB case: event time " +
      "vs maintenance windows)") {
    def windows(s: SparkSession) = Tables.load(s, dir, "events")
      .filter(col("event_type") === "error")
      .select(col("event_id").as("win_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
      // deterministic window set: limit without an order is plan-order-
      // dependent and the two sessions plan differently (review fix)
      .orderBy(col("win_id")).limit(20)
    def joined(s: SparkSession) = Tables.load(s, dir, "events")
      .select(col("event_id"), col("ts"))
      .join(windows(s),
        col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select(col("event_id"), col("win_id"))
    val expected = joined(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    withExtendedSession { ext =>
      ext.conf.set(BinnedRangeJoinRule.BinSizeConf, "600") // 10 min in sec
      val plan = joined(ext).queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bin"), s"rewrite did not fire:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"))
      val got = joined(ext).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, "timestamp rewrite changed results")
    }
  }

  test("equi-joins and empty intervals are left correct") {
    withExtendedSession { ext =>
      ext.conf.set(BinnedRangeJoinRule.BinSizeConf, "4.0")
      import ext.implicits._
      // an equi conjunct is present: the rule must NOT rewrite (guard)
      val a = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x")
      val b = Seq((1L, 5.0, 15.0), (2L, 25.0, 30.0)).toDF("k", "lo", "hi")
      val eq = a.join(b, a("k") === b("k") &&
        a("x") >= b("lo") && a("x") <= b("hi"))
      assert(!eq.queryExecution.executedPlan.toString.contains("__graft_bin"))
      assert(eq.count() == 1)
      // inverted (empty) interval: no crash, no rows
      val inv = Seq((0.0, -10.0, "none")).toDF("lo2", "hi2", "tag")
      val got = a.join(inv, a("x") >= inv("lo2") && a("x") <= inv("hi2"))
      assert(got.queryExecution.executedPlan.toString.contains("__graft_bin"))
      assert(got.count() == 0)
      // NULL bounds: the original join never matches them; the rewrite
      // must ignore them too — NOT trip the fan-out guard (a NULL span
      // is not a runaway span)
      val withNull = Seq((Some(5.0), Some(15.0), "ok"),
        (Some(0.0), None, "null-hi"), (None, Some(3.0), "null-lo"))
        .toDF("lo3", "hi3", "tag")
      val gotN = a.join(withNull, a("x") >= withNull("lo3") &&
        a("x") <= withNull("hi3"))
      assert(gotN.queryExecution.executedPlan.toString.contains("__graft_bin"))
      assert(gotN.collect().map(_.getAs[String]("tag")).toSeq == Seq("ok"))
    }
  }

  test("as-of join via the interval formulation rewrites to a composite " +
      "(user, bin) equi-join with q13-identical results (q13b)") {
    val expected = graft.queries.JoinQueries
      .queries("q13_asof_join")(spark, dir).collect().map(_.toString).toList
    assert(expected.nonEmpty)
    withExtendedSession { ext =>
      // equi-anchored joins bin only when opted in; width is SAMPLED
      // (no binSize conf) from the click-validity interval spans
      ext.conf.set(BinnedRangeJoinRule.EquiConf, "true")
      val df = graft.queries.JoinQueries.asofIntervalJoin(ext, dir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bin"),
        s"as-of interval join did not bin:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"))
      assert(df.collect().map(_.toString).toList == expected,
        "binned as-of result differs from q13")
    }
  }

  test("an expired known-good width survives a transient resample failure " +
      "(stale fallback, round-7 advice)") {
    import spark.implicits._
    val dir = tmpDir("rj-stale")
    Seq((0.0, 3.0), (1.0, 4.0), (2.0, 5.0)).toDF("lo", "hi")
      .write.mode("overwrite").parquet(s"$dir/iv")
    val df = spark.read.parquet(s"$dir/iv")
    val bound = df.queryExecution.analyzed
    val Seq(lo, hi) = bound.output
    val rule = new BinnedRangeJoinRule(Some(spark))
    assert(rule.sampledWidth(bound, lo, hi) == Some(3.0))

    // age the cached entry past its TTL, then break the underlying files
    // so the refresh fails mid-sampling
    val key = (bound.canonicalized, lo.canonicalized, hi.canonicalized)
    BinnedRangeJoinRule.widthCache.synchronized {
      val (v, _) = BinnedRangeJoinRule.widthCache.get(key)
      BinnedRangeJoinRule.widthCache.put(key,
        (v, System.currentTimeMillis() - BinnedRangeJoinRule.SomeTtlMs - 1))
    }
    val ivDir = new java.io.File(s"$dir/iv")
    ivDir.listFiles().foreach(_.delete())
    ivDir.delete()

    // the stale width is reused (NOT negative-cached) and re-stamped:
    // the next lookup hits the cache without touching the dead files
    assert(rule.sampledWidth(bound, lo, hi) == Some(3.0),
      "expired width was not reused on resample failure")
    assert(rule.sampledWidth(bound, lo, hi) == Some(3.0))
  }

  test("a SUCCESSFUL none-determination replaces a stale width instead of " +
      "being overridden by it") {
    import spark.implicits._
    val dir = tmpDir("rj-stale-none")
    Seq((0.0, 3.0), (1.0, 4.0), (2.0, 5.0)).toDF("lo", "hi")
      .write.mode("overwrite").parquet(s"$dir/iv")
    val df = spark.read.parquet(s"$dir/iv")
    val bound = df.queryExecution.analyzed
    val Seq(lo, hi) = bound.output
    val rule = new BinnedRangeJoinRule(Some(spark))
    assert(rule.sampledWidth(bound, lo, hi) == Some(3.0))

    val key = (bound.canonicalized, lo.canonicalized, hi.canonicalized)
    BinnedRangeJoinRule.widthCache.synchronized {
      val (v, _) = BinnedRangeJoinRule.widthCache.get(key)
      BinnedRangeJoinRule.widthCache.put(key,
        (v, System.currentTimeMillis() - BinnedRangeJoinRule.SomeTtlMs - 1))
    }
    // the interval data is legitimately GONE (retention, not a blip):
    // with missing files ignored the resample SUCCEEDS over zero rows —
    // an authoritative "no width, do not rewrite" that must replace the
    // stale 3.0, not keep re-stamping a width priced on vanished data
    val prev = spark.conf.getOption("spark.sql.files.ignoreMissingFiles")
    spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    try {
      val ivDir = new java.io.File(s"$dir/iv")
      ivDir.listFiles().foreach(_.delete())
      ivDir.delete()
      assert(rule.sampledWidth(bound, lo, hi) == None,
        "successful empty-side sample did not clear the stale width")
      assert(rule.sampledWidth(bound, lo, hi) == None)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.files.ignoreMissingFiles", v)
        case None => spark.conf.unset("spark.sql.files.ignoreMissingFiles")
      }
    }
  }

  test("runaway interval spans fail loudly (maxBinsPerRow) instead of " +
      "allocating huge per-row bin arrays") {
    withExtendedSession { ext =>
      ext.conf.set(BinnedRangeJoinRule.BinSizeConf, "1.0")
      ext.conf.set(BinnedRangeJoinRule.MaxBinsConf, "100")
      import ext.implicits._
      val pts = Seq(1.0, 2.0).toDF("x")
      val wide = Seq((0.0, 1000.0, "wide")).toDF("lo", "hi", "tag")
      val joined = pts.join(wide, $"x" >= $"lo" && $"x" <= $"hi")
      assert(joined.queryExecution.executedPlan.toString
        .contains("__graft_bin"))
      val ex = intercept[Throwable] { joined.collect() }
      val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("bin fan-out exceeds 100"),
        s"expected the fan-out guard message, got:\n$msgs")
    }
  }
}
