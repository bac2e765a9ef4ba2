package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.engine.Engine

/** Salting rewrites must be result-identical to the plain plans; compaction
  * must reduce file counts without changing data.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("salted two-phase aggregation matches plain groupBy") {
    val li = Tables.load(spark, dir, "lineitem")
    val plain = li.groupBy(col("l_returnflag").as("key"))
      .agg(sum(col("l_quantity")).as("sum"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(li, col("l_returnflag"),
      col("l_quantity"), buckets = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join matches plain join") {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_suppkey").as("k"), col("l_quantity"))
    val dim = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey").as("k"), col("s_name"))
    val plain = li.join(dim, Seq("k"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(li, dim, "k", buckets = 8)
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("autoSaltedSumCount consumes the skew advisory: salts a planted " +
      "hot key (same result, straggler bound honored), leaves a uniform " +
      "key on the plain plan, and stays off without the opt-in flag") {
    // 60% hot key — top-1 share 600000 micro, far over the 20% default
    def hot = spark.range(0, 50000).select(
      when(col("id") % 5 < 3, lit("hot"))
        .otherwise(concat(lit("k"), (col("id") % 1000).cast("string")))
        .as("k"),
      (col("id") % 97).cast("double").as("v"))
    val plain = hot.groupBy(col("k").as("key"))
      .agg(sum(col("v")).as("sum"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    // flag off (default): plain plan, advisory never computed
    val (off, offSalted) = Skew.autoSaltedSumCount(
      hot, col("k"), col("v"), buckets = 8)
    assert(!offSalted)
    assert(off.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSet == plain)
    // flag on + hot key: salted, and STILL result-identical
    val (on, onSalted) = Skew.autoSaltedSumCount(
      hot, col("k"), col("v"), buckets = 8, enabled = true)
    assert(onSalted, "advisory failed to trigger on a 60% hot key")
    assert(on.collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSet == plain)
    // the straggler bound the salt buys: the partial phase (the SAME
    // deterministic whole-row-hash salt saltedSumCount applies) spreads
    // the hot key across all 8 buckets, so no single reducer group
    // holds more than ~1/8 of its rows
    val hotRows = 30000L
    val partials = hot.withColumn("__salt",
        pmod(hash(hot.columns.map(col).toIndexedSeq: _*), lit(8)))
      .filter(col("k") === "hot")
      .groupBy(col("__salt")).count().collect().map(_.getLong(1))
    assert(partials.length == 8, s"hot key hit ${partials.length}/8 salts")
    assert(partials.max <= 2 * hotRows / 8,
      s"salted partial still straggler-sized: max ${partials.max}")
    // uniform key: advisory reads under threshold → plain plan kept
    def uniform = spark.range(0, 50000).select(
      concat(lit("k"), (col("id") % 1000).cast("string")).as("k"),
      col("id").cast("double").as("v"))
    val (_, uniSalted) = Skew.autoSaltedSumCount(
      uniform, col("k"), col("v"), buckets = 8, enabled = true)
    assert(!uniSalted, "advisory salted a uniform key")
  }

  test("autoSaltedStatsAgg (the refreshCq-shaped action): salts a hot " +
      "composite key with IDENTICAL count/sum/min/max, leaves a uniform " +
      "key plain, stays off without the flag") {
    def hot = spark.range(0, 50000).select(
      when(col("id") % 5 < 3, lit("s_hot")).otherwise(
        concat(lit("s"), (col("id") % 500).cast("string"))).as("series"),
      lit("v").as("name"),
      when(col("id") % 5 < 3, lit("2023-11-14 10:00:00"))
        .otherwise(lit("2023-11-14 11:00:00"))
        .cast("timestamp").as("bucket_start"),
      (col("id") % 97).cast("double").as("value"))
    def proj(df: org.apache.spark.sql.DataFrame) = df
      .select(col("series"), col("name"),
        col("bucket_start").cast("string"), col("n"), col("sum_v"),
        col("min_v"), col("max_v"))
      .collect().map(_.toSeq.toList).toSet
    val keys = Seq("series", "name", "bucket_start")
    val plain = proj(hot.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v")))
    val (off, offSalted) = Skew.autoSaltedStatsAgg(hot, keys, col("value"))
    assert(!offSalted && proj(off) == plain)
    val (on, onSalted) = Skew.autoSaltedStatsAgg(hot, keys, col("value"),
      buckets = 8, enabled = true)
    assert(onSalted, "advisory failed on a 60% hot composite key")
    assert(proj(on) == plain, "salted stats agg diverged from plain")
    def uniform = spark.range(0, 50000).select(
      concat(lit("s"), (col("id") % 500).cast("string")).as("series"),
      lit("v").as("name"),
      lit("2023-11-14 10:00:00").cast("timestamp").as("bucket_start"),
      col("id").cast("double").as("value"))
    val (_, uniSalted) = Skew.autoSaltedStatsAgg(uniform, keys,
      col("value"), buckets = 8, enabled = true)
    assert(!uniSalted, "advisory salted a uniform composite key")
  }

  test("refreshCq consumes the advisory→action loop (round-14 VERDICT " +
      "#4): with the opt-in flag a hot-keyed CQ refresh salts AND lands " +
      "the identical rollup a flag-off refresh lands") {
    // 200 points in ONE (series, field, hour) bucket + a uniform tail:
    // the composite key is hot, the advisory crosses 20%
    val base = 1700000000000000000L
    val hotLines = (0 until 200).map(i =>
      s"cqs v=${i % 7}.0 ${base + i * 1000000000L}") // all in one hour
    val tailLines = (0 until 100).map(i =>
      s"cqt$i v=1.0 ${base + i * 3600L * 1000000000L}")
    def build(tag: String): Engine = {
      val e = new Engine(spark, tmpDir(tag))
      val (ok, err) = e.ingestLines(hotLines ++ tailLines)
      assert(err == 0 && ok == 300)
      e.registerCq("agg", "hour")
      assert(e.refreshCq("agg") > 0)
      e
    }
    def proj(e: Engine) = e.cqTable("agg")
      .select(col("series"), col("day").cast("string"), col("name"),
        col("bucket_start").cast("string"), col("n"), col("sum_v"),
        col("min_v"), col("max_v"))
      .collect().map(_.toSeq.toList).toSet
    val off = proj(build("graft-cq-plain"))
    val prev = sys.props.get("graft.skew.autosalt")
    sys.props("graft.skew.autosalt") = "true"
    try {
      // the action itself fires on this data shape (direct pin, since
      // refreshCq only logs which branch ran)
      val e2 = new Engine(spark, tmpDir("graft-cq-salted"))
      e2.ingestLines(hotLines ++ tailLines)
      val keyed = e2.table().withColumn("bucket_start",
        date_trunc("hour", col("time")))
      val (_, salted) = Skew.autoSaltedStatsAgg(keyed,
        Seq("series", "name", "bucket_start"), col("value"))
      assert(salted, "CQ data shape did not trip the advisory")
      // and the engine path lands the identical rollup
      e2.registerCq("agg", "hour")
      assert(e2.refreshCq("agg") > 0)
      assert(proj(e2) == off,
        "salted CQ refresh diverged from the plain refresh")
    } finally prev match {
      case Some(v) => sys.props("graft.skew.autosalt") = v
      case None => sys.props.remove("graft.skew.autosalt")
    }
  }

  test("AQE skew-join engages on a planted hot key — the first line of " +
      "defense at 100 TB — and agrees with the manual salted rewrite") {
    // A key holding 60% of a 200k-row fact side: exactly the shape that
    // stalls one reducer for hours at scale. AQE's OptimizeSkewedJoin
    // must split the hot partition at runtime (thresholds lowered to
    // test-data sizes; the MECHANISM is identical at 100 TB defaults).
    // Manual salting (Skew.saltedJoin/saltedSumCount) remains for the
    // shapes AQE declines: hot GROUP BY keys, and joins whose output
    // partitioning feeds a same-key consumer (skew-split would insert an
    // extra shuffle, so AQE skips it unless forceOptimizeSkewedJoin).
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force SMJ
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def fact = spark.range(0, 200000).select(
        when(col("id") % 5 < 3, lit("hot"))
          .otherwise(concat(lit("k"), (col("id") % 1000).cast("string")))
          .as("k"),
        (col("id") % 97).cast("double").as("v"))
      def dim = spark.range(0, 1001).select(
        when(col("id") === 1000, lit("hot"))
          .otherwise(concat(lit("k"), col("id").cast("string"))).as("k"),
        concat(lit("name"), col("id")).as("name"))
      // global agg consumer: no same-key downstream requirement, so the
      // skew split cannot be declined for adding a shuffle
      val q = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val Array(total) = q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not engage on the hot key:\n" +
          plan.take(4000))
      // and the runtime-split join computes the right answer: identical
      // to the manual salted rewrite of the same join
      val salted = Skew.saltedJoin(fact, dim, "k", buckets = 8)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .collect().head
      assert(total.getLong(0) == salted.getLong(0) &&
        total.getDouble(1) == salted.getDouble(1),
        s"AQE skew join and salted join disagree: $total vs $salted")
      assert(total.getLong(0) == 200000L) // every fact row matched its dim
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("compaction bounds file count and preserves data") {
    val engine = new Engine(spark, tmpDir("graft-compact"))
    // 5 small appends -> many small files across (series, day) dirs
    (1 to 5).foreach { i =>
      engine.ingestLines(Seq(
        s"cpu,host=h$i usage=0.$i 170000000${i}000000000",
        s"mem,host=h$i used=$i.0 170000000${i}000000000"))
    }
    def parquetFiles: Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(engine.tablePath))
        .count(_.getName.endsWith(".parquet"))
    }
    val before = engine.table().orderBy("series", "time", "name")
      .collect().map(_.toString).toSeq
    val filesBefore = parquetFiles
    engine.compact()
    val after = engine.table().orderBy("series", "time", "name")
      .collect().map(_.toString).toSeq
    assert(after.map(stripId) == before.map(stripId))
    assert(parquetFiles < filesBefore,
      s"compaction did not reduce files: $filesBefore -> $parquetFiles")
  }

  // uuids are regenerated per ingest, not per compact — rows compare minus id?
  // No: compact rewrites existing rows (ids preserved); strip nothing. Kept
  // for clarity that ids must survive compaction unchanged.
  private def stripId(s: String): String = s

  test("compact() and concurrent writes never lose a batch (table lock)") {
    // Without the shared per-table lock, a batch written between compact()'s
    // staging read and its directory swap lands in the snapshot-then-deleted
    // .old dir — silent data loss (round-2 ADVICE). With the lock this is
    // deterministic: every ingested row survives any interleaving.
    val engine = new Engine(spark, tmpDir("graft-compact-race"))
    engine.ingestLines(Seq("cpu,host=h0 usage=0.1 1700000001000000000"))
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val writer = new Thread(() =>
      try (1 to 6).foreach { i =>
        engine.ingestLines(
          Seq(s"cpu,host=h$i usage=0.$i 170000000${i % 9}000000000"))
      } catch { case t: Throwable => failure.set(t) })
    writer.start()
    (1 to 3).foreach(_ => engine.compact())
    writer.join()
    assert(failure.get() == null, s"writer failed: ${failure.get()}")
    assert(engine.table().count() == 7)
  }
}
