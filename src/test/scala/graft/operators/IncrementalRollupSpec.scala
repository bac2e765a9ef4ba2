package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The IVM contract: store ⊎ delta ≡ recompute, the store is built
  * once and REUSED (that's the entire point — the refresh never
  * rescans the base), and the refresh plan proves it structurally. */
class IncrementalRollupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def storeDir: java.io.File = {
    val src = new java.io.File(s"$dir/orders.parquet")
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3
      .stringHash(s"${src.getCanonicalPath}@${src.lastModified}"))
    new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_ivm/nation_revenue_$key")
  }

  test("incremental rollup equals the full recompute exactly") {
    val inc = IncrementalRollup.nationRevenue(spark, dir)
      .collect().map(_.toSeq.toList).toSeq
    val o = graft.Tables.load(spark, dir, "orders")
    val c = graft.Tables.load(spark, dir, "customer")
    val n = graft.Tables.load(spark, dir, "nation")
    val full = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))
      .collect().map(_.toSeq.toList).toSeq
    assert(inc == full)
    assert(inc.nonEmpty)
  }

  test("the store is built once and reused; the refresh plan reads the " +
      "store, and its only orders scan is the delta slice") {
    IncrementalRollup.nationRevenue(spark, dir).collect() // ensure built
    val d = storeDir
    assert(d.exists, s"store not materialized at $d")
    val mtime = d.lastModified
    val df = IncrementalRollup.nationRevenue(spark, dir)
    df.collect()
    assert(d.lastModified == mtime, "second refresh rebuilt the store")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivm"),
      s"refresh plan does not read the persisted store:\n${plan.take(2000)}")
    // the delta branch filters orders on the slice predicate — the
    // base 9/10ths is never rescanned at refresh time
    assert(plan.contains("pmod") || plan.contains("% 10"),
      s"no delta slice filter in refresh plan:\n${plan.take(2000)}")
  }

  test("the second registered view (hourly_activity) equals its full " +
      "recompute exactly, min/max merge included") {
    val inc = IncrementalRollup.refresh(spark, dir, "hourly_activity")
      .collect().map(_.toSeq.toList).toSeq
    val full = graft.Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .select(col("event_type"), col("hr").cast("timestamp_ntz").as("hr"),
        col("n_events"), col("sum_cents"), col("min_cents"),
        col("max_cents"))
      .orderBy(col("event_type"), col("hr"))
      .collect().map(_.toSeq.toList).toSeq
    assert(inc == full)
    assert(inc.nonEmpty)
  }

  test("dropWhere retention: staged predicate rewrite drops base partials " +
      "only — the dropped key's refresh serves the delta slice alone") {
    // COPIED corpus: the store is keyed by canonical path + mtime, so a
    // retention test on the shared testdata-keyed store would poison
    // every later refresh in this JVM and the driver's — isolate it
    val d = tmpDir("ivm_drop")
    Seq("orders", "customer", "nation").foreach { n =>
      graft.Tables.load(spark, dir, n)
        .write.mode("overwrite").parquet(s"$d/$n.parquet")
    }
    val before = IncrementalRollup.refresh(spark, d, "nation_revenue")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val victim = before.keys.min
    val dropped = IncrementalRollup.dropWhere(spark, d, "nation_revenue",
      col("n_name") === victim)
    assert(dropped == 1L, s"expected 1 store row dropped, got $dropped")
    val after = IncrementalRollup.refresh(spark, d, "nation_revenue")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // the victim now reports only its delta-slice (o_orderkey % 10 = 7)
    // orders; every other key is untouched
    val deltaOnly = graft.Tables.load(spark, d, "orders")
      .filter(pmod(col("o_orderkey"), lit(10L)) === 7L)
      .join(graft.Tables.load(spark, d, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.load(spark, d, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === victim)
      .count()
    assert(after(victim) == deltaOnly,
      s"victim serves ${after(victim)}, delta slice has $deltaOnly")
    assert(after(victim) < before(victim))
    assert((after - victim) == (before - victim),
      "retention touched keys outside the predicate")
    // idempotent on a non-matching predicate; store dir still present
    assert(IncrementalRollup.dropWhere(spark, d, "nation_revenue",
      col("n_name") === "NO_SUCH_NATION") == 0L)
    assert(IncrementalRollup.refresh(spark, d, "nation_revenue")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap == after)
  }

  test("racing first builds: the staging+rename discipline gives every " +
      "racer the same store content — first rename wins, losers delete " +
      "their staging (the SignatureStore race pin, lock-free variant)") {
    // fresh COPIED corpus → fresh store key → both threads race the
    // first build of the same store path
    val d = tmpDir("ivm_race")
    Seq("orders", "customer", "nation").foreach { n =>
      graft.Tables.load(spark, dir, n)
        .write.mode("overwrite").parquet(s"$d/$n.parquet")
    }
    import java.util.concurrent.{Callable, Executors}
    val pool = Executors.newFixedThreadPool(2)
    try {
      val futs = (1 to 2).map { _ =>
        pool.submit(new Callable[Seq[List[Any]]] {
          override def call(): Seq[List[Any]] =
            IncrementalRollup.refresh(spark, d, "nation_revenue")
              .collect().map(_.toSeq.toList).toSeq
        })
      }
      val results = futs.map(_.get())
      assert(results(0) == results(1) && results(0).nonEmpty,
        "racing refreshes disagreed")
    } finally pool.shutdown()
    // no orphaned staging dirs survive the race
    val parent = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_ivm")
    val orphans = Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.contains(".stage-"))
    assert(orphans.isEmpty,
      s"lost-race staging dirs not cleaned: ${orphans.mkString(", ")}")
  }
}
