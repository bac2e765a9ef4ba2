package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.SparkSpec
import graft.engine.Engine

/** Structured Streaming inventory (SURVEY §2.4 j, st1-st8). MemoryStream
  * feeds each pipeline; memory sinks + processAllAvailable make the
  * micro-batches synchronous and deterministic.
  */
case class Evt(ts: Timestamp, series: String, value: Double, id: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private def runAppend[T](ds: DataFrame, name: String,
      mode: String = "append"): DataFrame = {
    val q = ds.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("st1: micro-batch ingest pipeline (parse -> explode -> append)") {
    val in = MemoryStream[String]
    val engine = new Engine(spark, tmpDir("graft-stream"))
    val q = engine.ingestStream(in.toDF().toDF("value"), tmpDir("graft-ckpt"))
    in.addData(
      "cpu,host=a usage=0.5,idle=0.5 1700000000000000000",
      "cpu,host=b usage=0.7 1700000060000000000",
      "garbage line")
    q.processAllAvailable()
    in.addData("mem,host=a used=123.0 1700000120000000000")
    q.processAllAvailable()
    q.stop()
    assert(engine.listSeries() == Seq("cpu", "mem"))
    assert(engine.table().count() == 4) // 3 cpu rows (fan-out) + 1 mem
    // exactly-once shape: restartable via checkpoint, no dup on re-run
    assert(engine.table().select("id").distinct().count() == 4)
  }

  test("st1c: the statsEveryBatches maintenance hook keeps the " +
      "incremental stats store warm under continuous ingest") {
    val in = MemoryStream[String]
    val engine = new Engine(spark, tmpDir("graft-stream-stats"))
    val q = engine.ingestStream(in.toDF().toDF("value"),
      tmpDir("graft-ckpt-stats"), statsEveryBatches = 1)
    in.addData("cpu load=1.0 1700000000000000000",
      "cpu load=3.0 1700000000000000000")
    q.processAllAvailable()
    // batch 0 wrote; the hook fires from id 1 on — push a second batch
    in.addData("cpu load=5.0 1700000000000000000")
    q.processAllAvailable()
    q.stop()
    assert(engine.statsStoreExists,
      "maintenance hook never built the stats store")
    val rows = engine.stats("cpu", "load").collect()
    assert(rows.length == 1)
    // the folded store must cover AT LEAST the batches up to the last
    // hook firing (batch 1 fired after batch 1's write → all 3 rows)
    assert(rows.head.getLong(1) == 3L && rows.head.getDouble(2) == 9.0,
      s"stats store stale after the hook: ${rows.head}")
  }

  test("st1b: restart from checkpoint continues without reprocessing") {
    val in = MemoryStream[String]
    val engine = new Engine(spark, tmpDir("graft-restart"))
    val ckpt = tmpDir("graft-restart-ckpt")
    val q1 = engine.ingestStream(in.toDF().toDF("value"), ckpt)
    in.addData("cpu v=1.0 1700000000000000000")
    q1.processAllAvailable()
    q1.stop()
    // second query instance, same checkpoint + source: resumes past the
    // committed offset — the first line is not ingested twice
    val q2 = engine.ingestStream(in.toDF().toDF("value"), ckpt)
    in.addData("cpu v=2.0 1700000001000000000")
    q2.processAllAvailable()
    q2.stop()
    assert(engine.table().count() == 2)
  }

  private def evts(rows: (String, String, Double, String)*): Seq[Evt] =
    rows.map { case (ts, s, v, id) => Evt(t(ts), s, v, id) }

  test("st2: tumbling window aggregation") {
    val in = MemoryStream[Evt]
    val agg = in.toDF()
      .groupBy(window(col("ts"), "1 minute"), col("series"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_v"))
      .select(col("window.start").as("ws"), col("series"), col("n"), col("avg_v"))
    in.addData(evts(
      ("2024-01-01 00:00:10", "cpu", 1.0, "a"),
      ("2024-01-01 00:00:50", "cpu", 3.0, "b"),
      ("2024-01-01 00:01:10", "cpu", 5.0, "c"),
      ("2024-01-01 00:00:20", "mem", 7.0, "d")): _*)
    val out = runAppend(agg, "st2", mode = "complete")
    val got = out.orderBy("series", "ws").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01 00:00:00.0", "cpu", 2L, 2.0),
      ("2024-01-01 00:01:00.0", "cpu", 1L, 5.0),
      ("2024-01-01 00:00:00.0", "mem", 1L, 7.0)))
  }

  test("st3: sliding window") {
    val in = MemoryStream[Evt]
    val agg = in.toDF()
      .groupBy(window(col("ts"), "2 minutes", "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    in.addData(evts(
      ("2024-01-01 00:00:30", "cpu", 1.0, "a"),
      ("2024-01-01 00:01:30", "cpu", 1.0, "b")): _*)
    val out = runAppend(agg, "st3", mode = "complete")
    val got = out.orderBy("ws").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq
    // event 1 lands in windows [-1:00,1:00) and [0:00,2:00); event 2 in
    // [0:00,2:00) and [1:00,3:00)
    assert(got == Seq(
      ("2023-12-31 23:59:00.0", 1L),
      ("2024-01-01 00:00:00.0", 2L),
      ("2024-01-01 00:01:00.0", 1L)))
  }

  test("st4: session window (30s gap)") {
    val in = MemoryStream[Evt]
    val agg = in.toDF()
      .groupBy(session_window(col("ts"), "30 seconds"), col("series"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("ss"), col("series"), col("n"))
    in.addData(evts(
      ("2024-01-01 00:00:00", "cpu", 1.0, "a"),
      ("2024-01-01 00:00:20", "cpu", 1.0, "b"), // same session (gap 20s)
      ("2024-01-01 00:02:00", "cpu", 1.0, "c")): _*) // new session
    val out = runAppend(agg, "st4", mode = "complete")
    val got = out.orderBy("ss").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toSeq
    assert(got == Seq(("2024-01-01 00:00:00.0", 2L), ("2024-01-01 00:02:00.0", 1L)))
  }

  test("st5: watermark drops late data (append mode)") {
    val in = MemoryStream[Evt]
    val agg = in.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("st5").start()
    in.addData(evts(("2024-01-01 00:00:10", "cpu", 1.0, "a")): _*)
    q.processAllAvailable()
    // advance watermark far past the first window
    in.addData(evts(("2024-01-01 00:10:00", "cpu", 1.0, "b")): _*)
    q.processAllAvailable()
    // late arrival for the long-closed first window: must be dropped
    in.addData(evts(("2024-01-01 00:00:20", "cpu", 1.0, "late")): _*)
    q.processAllAvailable()
    in.addData(evts(("2024-01-01 00:20:00", "cpu", 1.0, "c")): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("st5").orderBy("ws").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq
    // first window emitted with n=1 — the late event never counted
    assert(got.contains(("2024-01-01 00:00:00.0", 1L)))
  }

  test("st6: streaming dedup by id with watermark") {
    val in = MemoryStream[Evt]
    val dedup = in.toDF()
      .withWatermark("ts", "1 minute")
      .dropDuplicates("id")
      .select(col("id"), col("value"))
    val q = dedup.writeStream.outputMode("append").format("memory")
      .queryName("st6").start()
    in.addData(evts(
      ("2024-01-01 00:00:00", "cpu", 1.0, "x"),
      ("2024-01-01 00:00:01", "cpu", 99.0, "x"), // dup id in same batch
      ("2024-01-01 00:00:02", "cpu", 2.0, "y")): _*)
    q.processAllAvailable()
    in.addData(evts(("2024-01-01 00:00:03", "cpu", 98.0, "x")): _*) // dup later
    q.processAllAvailable()
    q.stop()
    val got = spark.table("st6").orderBy("id").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("x", 1.0), ("y", 2.0)))
  }

  test("st7: stateful per-series running stats (mapGroupsWithState)") {
    val in = MemoryStream[Evt]
    val stats = in.toDS()
      .groupByKey(_.series)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (series: String, rows: Iterator[Evt], state: GroupState[(Long, Double)]) =>
          val (n0, sum0) = state.getOption.getOrElse((0L, 0.0))
          val vs = rows.map(_.value).toSeq
          val updated = (n0 + vs.size, sum0 + vs.sum)
          state.update(updated)
          (series, updated._1, updated._2)
      }
    val q = stats.toDF("series", "n", "sum")
      .writeStream.outputMode("update").format("memory")
      .queryName("st7").start()
    in.addData(evts(
      ("2024-01-01 00:00:00", "cpu", 1.0, "a"),
      ("2024-01-01 00:00:01", "cpu", 2.0, "b")): _*)
    q.processAllAvailable()
    in.addData(evts(("2024-01-01 00:00:02", "cpu", 3.0, "c")): _*)
    q.processAllAvailable()
    q.stop()
    // state accumulates across micro-batches: last update is (3, 6.0)
    val last = spark.table("st7").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(last.contains(("cpu", 3L, 6.0)))
  }

  test("continuous downsample: raw lines -> windowed rollup table") {
    val in = MemoryStream[String]
    val engine = new Engine(spark, tmpDir("graft-rollup"))
    val q = engine.downsampleStream(in.toDF().toDF("value"),
      bucket = "1 minute", watermark = "0 seconds",
      checkpoint = tmpDir("graft-rollup-ckpt"))
    in.addData(
      "cpu,h=a usage=1.0 1700000000000000000", // 2023-11-14 22:13:20
      "cpu,h=a usage=3.0 1700000010000000000") // same minute bucket
    q.processAllAvailable()
    // advance watermark past the first minute so its window emits
    in.addData("cpu,h=a usage=9.0 1700000300000000000")
    q.processAllAvailable()
    q.stop()
    val r = engine.rollup("1 minute")
      .filter(col("series") === "cpu" && col("name") === "usage")
      .orderBy("bucket_start").collect()
    assert(r.length >= 1)
    assert(r.head.getAs[Long]("n") == 2L)
    assert(r.head.getAs[Double]("sum_v") == 4.0)
    assert(r.head.getAs[Double]("max_v") == 3.0)
  }

  test("stream-stream interval join with watermarks") {
    val clicks = MemoryStream[Evt]
    val purchases = MemoryStream[Evt]
    val c = clicks.toDF().withWatermark("ts", "1 minute")
      .select(col("series").as("cu"), col("ts").as("click_ts"),
        col("id").as("click_id"))
    val p = purchases.toDF().withWatermark("ts", "1 minute")
      .select(col("series").as("pu"), col("ts").as("purchase_ts"),
        col("id").as("purchase_id"))
    val joined = c.join(p,
      col("cu") === col("pu") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 2 MINUTES"))
      .select(col("click_id"), col("purchase_id"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ss_join").start()
    clicks.addData(evts(("2024-01-01 00:00:00", "u1", 1.0, "c1")): _*)
    purchases.addData(evts(
      ("2024-01-01 00:01:00", "u1", 9.0, "p1"), // within 2 min of c1
      ("2024-01-01 00:10:00", "u1", 9.0, "p2"), // too late after c1
      ("2024-01-01 00:01:30", "u2", 9.0, "p3")): _*) // other user
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss_join").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("c1", "p1")))
  }

  test("st8: stream-static join (enrich with dimension)") {
    val dim = Seq(("cpu", "compute"), ("mem", "memory")).toDF("series", "kind")
    val in = MemoryStream[Evt]
    val joined = in.toDF().join(dim, Seq("series"))
      .select(col("series"), col("kind"), col("value"))
    in.addData(evts(
      ("2024-01-01 00:00:00", "cpu", 1.0, "a"),
      ("2024-01-01 00:00:01", "disk", 2.0, "b"), // no dim row -> dropped
      ("2024-01-01 00:00:02", "mem", 3.0, "c")): _*)
    val out = runAppend(joined, "st8")
    val got = out.orderBy("series").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq(("cpu", "compute", 1.0), ("mem", "memory", 3.0)))
  }

  test("st9: RocksDB state store backs a large streaming keyspace") {
    // The default HDFS-backed store keeps every state key on the JVM heap —
    // a 100 TB-scale keyspace (per-entity running aggregates) OOMs the
    // executor. RocksDBStateStoreProvider (ships in spark-sql; rocksdbjni on
    // the classpath) spills state off-heap/on-disk; this pins that the
    // config works end-to-end: 5k state keys across two micro-batches,
    // state survives between batches, and the progress metrics prove the
    // RocksDB provider (not the default) was engaged.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Evt]
      val agg = in.toDF().groupBy(col("series"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName("st9").start()
      in.addData((1 to 5000).map(i =>
        Evt(t("2024-01-01 00:00:00"), s"s$i", 1.0, s"a$i")): _*)
      q.processAllAvailable()
      in.addData((1 to 5000).map(i =>
        Evt(t("2024-01-01 00:00:01"), s"s$i", 2.0, s"b$i")): _*)
      q.processAllAvailable()
      val progress = q.lastProgress.json
      q.stop()
      assert(progress.contains("rocksdb"),
        s"RocksDB provider not engaged; progress: ${progress.take(500)}")
      val got = spark.table("st9").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(got.length == 5000)
      assert(got.forall { case (_, n, s) => n == 2L && s == 3.0 })
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("st10: streaming incremental near-dup — band state persists across " +
      "micro-batches, first-seen owner wins") {
    import graft.streaming.StreamingDedup
    val text1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val unrelated = "one two three four five six seven eight nine ten"
    val another = "red orange yellow green blue indigo violet pink brown black"
    val in = MemoryStream[(Long, String)]
    val events = StreamingDedup.dupEvents(
      in.toDF().toDF("doc_id", "text"))
    val q = events.writeStream.outputMode("append").format("memory")
      .queryName("st10").start()
    try {
      // batch 1: original + a same-batch exact copy + an unrelated doc
      in.addData((1L, text1), (2L, text1), (3L, unrelated))
      q.processAllAvailable()
      // batch 2: a LATER copy of doc 1 (cross-batch state hit) + fresh doc
      in.addData((7L, text1), (8L, another))
      q.processAllAvailable()
      val got = spark.table("st10")
        .select(col("doc_id"), col("first_doc")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // identical text ⇒ all 3 bands match, always flagged; doc 1 owns
      // every band (lowest id in its first batch), docs 3 and 8 are clean
      assert(got == Set((2L, 1L), (7L, 1L)), s"got $got")
      // each dup matched on all 3 bands of the identical signature
      val perDoc = spark.table("st10").groupBy(col("doc_id"))
        .agg(countDistinct(col("bk")).as("nb"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(perDoc == Map(2L -> 3L, 7L -> 3L), s"got $perDoc")
    } finally q.stop()
  }

  test("st10b: streaming dedup bootstraps its band state from the " +
      "persisted signature store — history flagged without replay") {
    import graft.engine.SignatureStore
    import graft.streaming.StreamingDedup
    val text1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val unrelated = "one two three four five six seven eight nine ten"
    val another = "red orange yellow green blue indigo violet pink brown black"
    // the CORPUS was ingested in some earlier life of the pipeline: only
    // its signature store survives — the stream below never sees it
    val store = new SignatureStore(spark, tmpDir("st10b") + "/store")
    store.refresh(Seq((1L, text1), (3L, unrelated)).toDF("doc_id", "text"))
    val in = MemoryStream[(Long, String)]
    val events = StreamingDedup.dupEvents(
      in.toDF().toDF("doc_id", "text"), Some(store.bandOwners()))
    val q = events.writeStream.outputMode("append").format("memory")
      .queryName("st10b").start()
    try {
      in.addData((7L, text1), (8L, another))
      q.processAllAvailable()
      val got = spark.table("st10b")
        .select(col("doc_id"), col("first_doc")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // doc 7 duplicates STORED doc 1 (owner from the initial state, all
      // 3 bands — the store's agg-form md5 band keys must equal the
      // stream's map-only ones bit for bit); doc 8 is clean
      assert(got == Set((7L, 1L)), s"got $got")
      val nb = spark.table("st10b").filter(col("doc_id") === 7L)
        .select(countDistinct(col("bk"))).collect().head.getLong(0)
      assert(nb == 3L, s"expected all 3 bands to hit the stored state, got $nb")
    } finally q.stop()
  }

  test("st35: streaming exact prefix join — probing the signature store " +
      "per micro-batch equals the batch q_dedup_prefix_join pair set") {
    import graft.engine.SignatureStore
    import graft.streaming.StreamingPrefixJoin
    val dir = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // batch truth: the oracle-checked exact PPJoin-style self-join
    val batchPairs = graft.queries.DedupQueries.prefixJoinPairs(spark, dir)
      .collect().map(key).toSet
    assert(batchPairs.nonEmpty, "fixture must contain J>=0.6 pairs")
    // ascending-id arrival (the monotone-id contract shared by every
    // st fixpoint); three micro-batches so pairs straddle boundaries
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val batches = Seq(
      docs.slice(0, docs.length / 3),
      docs.slice(docs.length / 3, 2 * docs.length / 3),
      docs.slice(2 * docs.length / 3, docs.length))
    val store = new SignatureStore(spark, tmpDir("st35") + "/store")
    val streamed = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long)]
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val sigs = SignatureStore.signatures(b).localCheckpoint()
        StreamingPrefixJoin.flagAgainst(sigs, store.load())
          .collect().foreach(streamed += key(_))
        store.refresh(b) // history accumulates AFTER flagging
        ()
      }
      .start()
    try {
      batches.foreach { rs =>
        in.addData(rs.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(streamed.toSet == batchPairs,
      s"stream-only ${(streamed.toSet -- batchPairs).take(3)}, " +
        s"batch-only ${(batchPairs -- streamed).take(3)}")
    // vacuity: at least one pair crossed a micro-batch boundary (its
    // smaller doc came from the store, not the arriving batch)
    val cut1 = docs(docs.length / 3)._1
    assert(batchPairs.exists(p => p._1 < cut1 && p._2 >= cut1),
      "fixture must contain a boundary-straddling pair")
  }

  test("st36: streaming inverted-index maintenance — the latest emission " +
      "per term equals the batch q_inverted_index over all arrived docs") {
    import graft.streaming.StreamingInvertedIndex
    val dir = "/root/testdata/sf0.001"
    val batchRows = graft.SparkEntry.queries("q_inverted_index")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val batches = Seq(
      docs.slice(0, docs.length / 3),
      docs.slice(docs.length / 3, 2 * docs.length / 3),
      docs.slice(2 * docs.length / 3, docs.length))
    // each batch's emissions OVERWRITE: the surviving value per term is
    // its latest index row
    val latest =
      scala.collection.mutable.Map.empty[String, (Long, Long, String)]
    val in = MemoryStream[(Long, String)]
    val q = StreamingInvertedIndex.index(in.toDF().toDF("doc_id", "text"))
      .writeStream
      .foreachBatch { (b: Dataset[StreamingInvertedIndex.TermRow], _: Long) =>
        b.collect().foreach(r =>
          latest(r.term) = (r.df, r.total_tf, r.postings_head))
        ()
      }
      .start()
    try {
      batches.foreach { rs =>
        in.addData(rs.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(latest.toMap == batchRows,
      s"stream-only ${(latest.keySet -- batchRows.keySet).take(3)}, " +
        s"batch-only ${(batchRows.keySet -- latest.keySet).take(3)}, " +
        s"first value diff: ${batchRows.collectFirst {
          case (k, v) if latest.get(k).exists(_ != v) => (k, v, latest(k))
        }}")
    // vacuity: some term's posting head accreted across batches (head
    // doc_ids on both sides of the first micro-batch boundary)
    val cut = docs(docs.length / 3)._1
    assert(batchRows.exists { case (_, (_, _, head)) =>
      val ids = head.split(",").map(_.split(":")(0).toLong)
      ids.exists(_ < cut) && ids.exists(_ >= cut)
    }, "fixture must contain a term whose postings span micro-batches")
  }

  test("st11: streaming similarity serving — query vectors score against " +
      "the persisted IVF index per micro-batch") {
    import graft.operators.AnnIndex
    val dir = "/root/testdata/sf0.01"
    val e = graft.Tables.load(spark, dir, "embeddings")
    val indexPath =
      java.nio.file.Files.createTempDirectory("st11_index").toString
    AnnIndex.build(e.filter(col("vec_id") >= 20), indexPath, k = 8)

    val queryVecs = e.filter(col("vec_id") < 4)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val results =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Int)]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the serving shape: per micro-batch, route against the persisted
        // centroids and join only the probed inverted lists
        AnnIndex.batchQueryIndexed(spark, indexPath, batch, probes = 2, k = 3)
          .collect().foreach(r =>
            results.add((r.getLong(0), r.getLong(2), r.getInt(1))))
        ()
      }
      .start()
    try {
      in.addData(queryVecs(0), queryVecs(1))
      q.processAllAvailable()
      in.addData(queryVecs(2), queryVecs(3))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val got = results.asScala.toSeq
      // every query produced exactly k ranked results from the corpus
      assert(got.groupBy(_._1).view.mapValues(_.length).toMap ==
        Map(0L -> 3, 1L -> 3, 2L -> 3, 3L -> 3), s"got $got")
      assert(got.forall(_._2 >= 20L)) // neighbors come from the corpus side
      // and the streamed answer matches the equivalent batch probe
      val expected = AnnIndex.batchQueryIndexed(spark, indexPath,
        e.filter(col("vec_id") < 4).select(col("vec_id"), col("embedding")),
        probes = 2, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(1))).toSet
      assert(got.toSet == expected)
    } finally q.stop()
  }

  test("st12: dropDuplicatesWithinWatermark bounds dedup state by event " +
      "time (plain dropDuplicates keys grow forever)") {
    val in = MemoryStream[Evt]
    // dedup on id, but the state for an id is evictable once the watermark
    // passes it — the ONLY dedup formulation whose state is bounded on an
    // unbounded stream (plain dropDuplicates holds every key forever; at
    // 100 TB/day of events that is an OOM, not a design)
    val dedup = in.toDF()
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark(Seq("id"))
      .select(col("id"), col("value"))
    val q = dedup.writeStream.outputMode("append").format("memory")
      .queryName("st12").start()
    try {
      in.addData(evts(
        ("2024-01-01 00:00:00", "cpu", 1.0, "x"),
        ("2024-01-01 00:00:01", "cpu", 99.0, "x"), // dup within watermark
        ("2024-01-01 00:00:02", "cpu", 2.0, "y")): _*)
      q.processAllAvailable()
      // advance the watermark far past x's state lifetime
      in.addData(evts(("2024-01-01 00:05:00", "cpu", 3.0, "z")): _*)
      q.processAllAvailable()
      // x's dedup state was evicted: the same id is accepted again —
      // within-horizon duplicates suppressed, unbounded history not kept
      in.addData(evts(("2024-01-01 00:05:01", "cpu", 4.0, "x")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("st12").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq.sorted
    assert(got == Seq(("x", 1.0), ("x", 4.0), ("y", 2.0), ("z", 3.0)))
  }

  test("st13: streaming online EWMA — per-series state carries across " +
      "micro-batches and matches the offline recurrence") {
    import graft.streaming.StreamingEwma
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val smoothed = StreamingEwma.smooth(
      in.toDF().toDF("user_id", "ts", "event_id", "value"), alpha = 0.5)
    val q = smoothed.writeStream.outputMode("append").format("memory")
      .queryName("st13").start()
    try {
      // batch 1: two series; u1 gets two points (in-batch fold order by ts)
      in.addData((1L, ts(0), 10L, 4.0), (1L, ts(1), 11L, 8.0),
        (2L, ts(0), 20L, 100.0))
      q.processAllAvailable()
      // batch 2: state carries — u1's ewma continues from 6.0, not reseeds
      in.addData((1L, ts(2), 12L, 10.0), (2L, ts(1), 21L, 50.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("st13").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toMap
    // offline recurrence with alpha=0.5: u1: 4.0 -> (8+4)/2=6.0 -> (10+6)/2=8.0
    //                                   u2: 100.0 -> (50+100)/2=75.0
    assert(got == Map(10L -> 4.0, 11L -> 6.0, 12L -> 8.0,
      20L -> 100.0, 21L -> 75.0), s"got $got")
  }

  /** Shared backfill==online harness for st13b/st16: run a batch query's
    * per-series fixpoint, replay the same events through the online
    * smoother in two micro-batches (state crosses a boundary
    * mid-series), and compare at each series' last event. CONTRACT: the
    * stream sink's columns 2..N must positionally match `batchCols`
    * order (columns 0/1 are user_id/event_id). Raw doubles agree
    * exactly (identical fold order and ops); the batch side is
    * r6-rounded for the oracle, hence the 5.01e-7 bound. */
  private def assertBackfillEqualsOnline(batchQuery: String,
      sinkName: String,
      smooth: DataFrame => Dataset[_],
      batchCols: Seq[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries(batchQuery)(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        batchCols.map(c => r.getAs[Double](c)))
      .toMap
    val rows = graft.Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .orderBy(col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = smooth(in.toDF().toDF("user_id", "ts", "event_id", "value"))
      .toDF().writeStream.outputMode("append").format("memory")
      .queryName(sinkName).start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      in.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table(sinkName).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (2 until 2 + batchCols.length).map(r.getDouble)).toMap
    val lastEvent = rows.groupBy(_._1).map { case (u, rs) => u -> rs.last._3 }
    assert(batch.nonEmpty && batch.keySet == lastEvent.keySet)
    batch.foreach { case (u, bs) =>
      val ss = stream((u, lastEvent(u)))
      bs.zip(ss).zip(batchCols).foreach { case ((b0, s0), cn) =>
        assert(math.abs(s0 - b0) <= 5.01e-7,
          s"user $u $cn: batch $b0 vs stream $s0")
      }
    }
  }

  test("st13b: the batch recurrence twin (q_ewma_recurrence) equals the " +
      "streaming fixpoint over the same history — backfill == online") {
    assertBackfillEqualsOnline("q_ewma_recurrence", "st13b",
      df => graft.streaming.StreamingEwma.smooth(df, alpha = 0.3),
      Seq("ewma_final"))
  }

  test("st34: the batch Kalman twin (q_kalman_smooth) equals the " +
      "streaming adaptive-gain fixpoint over the same history — " +
      "backfill == online, state crossing a micro-batch boundary") {
    assertBackfillEqualsOnline("q_kalman_smooth", "st34",
      df => graft.streaming.StreamingKalman.smooth(df),
      Seq("kalman_final", "p_final"))
  }

  test("st15: streaming decontamination pre-filter — documents probed " +
      "against a broadcast benchmark Bloom with the native expression, " +
      "map-only and state-free") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    // benchmark shingle set, compressed once into model-sized bytes that
    // ship with the plan — the streaming twin of q_decontaminate_bloom:
    // the probe is a stateless codegen'd expression, so the stream needs
    // NO state store at all (contrast st10's per-band state)
    val bench = Seq("alpha beta gamma", "delta epsilon zeta").toDF("sh")
    def hashed(c: Column) = new XxHash64(Seq(ColumnBridge.expression(c)))
    val bloomBytes = bench.select(ColumnBridge.column(
        new BloomFilterAggregate(hashed(col("sh")), 1L << 16)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val probe = ColumnBridge.column(new BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), hashed(col("sh"))))
    val in = MemoryStream[(Long, String)]
    val hits = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)),
          |  i -> array_join(slice(split(text, ' '), i, 3), ' '))"""
          .stripMargin)).as("sh"))
      .filter(probe)
      .select(col("doc_id"), col("sh"))
    val q = hits.writeStream.outputMode("append").format("memory")
      .queryName("st15").start()
    try {
      in.addData((1L, "pre alpha beta gamma post"), (2L, "totally clean text"))
      q.processAllAvailable()
      in.addData((3L, "delta epsilon zeta trailer"), (4L, "another clean doc"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("st15").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "alpha beta gamma"), (3L, "delta epsilon zeta")),
      s"got $got")
  }

  test("st16: streaming Holt-Winters — two doubles of state per series, " +
      "and the online fixpoint equals the batch q_holt_winters backfill") {
    assertBackfillEqualsOnline("q_holt_winters", "st16",
      df => graft.streaming.StreamingHoltWinters.smooth(df),
      Seq("level", "trend"))
  }

  test("st16b: Holt-Winters hand-computed fixture — pins the recurrence " +
      "itself, not just three co-authored transcriptions agreeing") {
    // st16 and the DuckDB oracle prove Spark-batch == DuckDB == streaming,
    // but all three folds were written together: an identical
    // mis-transcription (wrong b' form, wrong seed) would pass them all.
    // These values are derived by hand from the published recurrence
    //   l' = a*x + (1-a)*(l + b);  b' = beta*(l' - l) + (1-beta)*b
    // with seed (l, b) = (x1, 0), alpha=0.5, beta=0.3 — the st13 analog.
    import graft.streaming.StreamingHoltWinters
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val q = StreamingHoltWinters
      .smooth(in.toDF().toDF("user_id", "ts", "event_id", "value"),
        alpha = 0.5, beta = 0.3)
      .writeStream.outputMode("append").format("memory")
      .queryName("st16b").start()
    try {
      in.addData((1L, ts(0), 10L, 4.0), (1L, ts(1), 11L, 10.0),
        (2L, ts(0), 20L, 100.0))
      q.processAllAvailable()
      // state (l, b) crosses the micro-batch boundary mid-series
      in.addData((1L, ts(2), 12L, 7.0), (2L, ts(1), 21L, 50.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("st16b").collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    // u1: (4, 0) -> l=.5*10+.5*4=7, b=.3*3=0.9, f=7.9
    //            -> l=.5*7+.5*7.9=7.45, b=.3*.45+.7*.9=0.765, f=8.215
    // u2: (100, 0) -> l=.5*50+.5*100=75, b=.3*(-25)=-7.5, f=67.5
    val want = Map(
      10L -> (4.0, 0.0, 4.0), 11L -> (7.0, 0.9, 7.9),
      12L -> (7.45, 0.765, 8.215),
      20L -> (100.0, 0.0, 100.0), 21L -> (75.0, -7.5, 67.5))
    assert(got.keySet == want.keySet, s"got $got")
    want.foreach { case (id, (l, b, f)) =>
      val (gl, gb, gf) = got(id)
      assert(math.abs(gl - l) < 1e-9 && math.abs(gb - b) < 1e-9 &&
        math.abs(gf - f) < 1e-9, s"event $id: got ${got(id)}, want ($l,$b,$f)")
    }
  }

  test("st20: streaming Welford moments — three doubles of state per " +
      "series, online fixpoint equals the batch q_welford_moments") {
    assertBackfillEqualsOnline("q_welford_moments", "st20",
      df => graft.streaming.StreamingWelford.moments(df),
      Seq("mean_run", "var_run"))
  }

  test("st20b: Welford hand-computed fixture — pins the recurrence " +
      "against an independent derivation") {
    // by hand from n'=n+1; d=x-mean; mean'=mean+d/n'; M2'=M2+d*(x-mean'):
    // u1: 4 -> (1,4,0); 10 -> d=6, mean=7, M2=6*3=18, var=18;
    //     7 -> d=0, mean=7, M2=18, var=18/2=9
    // u2: 100 -> (1,100,0); 50 -> d=-50, mean=75, M2=-50*(-25)=1250
    import graft.streaming.StreamingWelford
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val q = StreamingWelford
      .moments(in.toDF().toDF("user_id", "ts", "event_id", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st20b").start()
    try {
      in.addData((1L, ts(0), 10L, 4.0), (1L, ts(1), 11L, 10.0),
        (2L, ts(0), 20L, 100.0))
      q.processAllAvailable()
      // state (n, mean, M2) crosses the micro-batch boundary mid-series
      in.addData((1L, ts(2), 12L, 7.0), (2L, ts(1), 21L, 50.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("st20b").collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(3))).toMap
    val want = Map(
      10L -> (4.0, 0.0), 11L -> (7.0, 18.0), 12L -> (7.0, 9.0),
      20L -> (100.0, 0.0), 21L -> (75.0, 1250.0))
    assert(got.keySet == want.keySet, s"got $got")
    want.foreach { case (id, (m, v)) =>
      val (gm, gv) = got(id)
      assert(math.abs(gm - m) < 1e-9 && math.abs(gv - v) < 1e-9,
        s"event $id: got ${got(id)}, want ($m,$v)")
    }
  }

  test("st21: streaming CUSUM monitor — fixed reference params, one " +
      "double of state, alarms reproduce the hand-derived fold") {
    // reference mu=10, sigma=2, slack 0.5, threshold 2.0 (small h so the
    // fixture alarms): z_i = (x-10)/2 - 0.5
    // u1: x=12 -> S=max(0,0+0.5)=0.5; x=16 -> S=max(0,0.5+2.5)=3.0 ALARM;
    //     x=6 -> z=-2.5, S=max(0,3.0-2.5)=0.5 recovering
    // u2: x=8 -> S=max(0,-1.5)=0 — never alarms
    import graft.streaming.StreamingCusum
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val q = StreamingCusum
      .monitor(in.toDF().toDF("user_id", "ts", "event_id", "value"),
        mu = 10.0, sigma = 2.0, threshold = 2.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("st21").start()
    try {
      in.addData((1L, ts(0), 10L, 12.0), (2L, ts(0), 20L, 8.0))
      q.processAllAvailable()
      // S carries the micro-batch boundary: the alarm fires on batch 2
      in.addData((1L, ts(1), 11L, 16.0), (1L, ts(2), 12L, 6.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("st21").collect()
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getBoolean(3))).toMap
    val want = Map(
      10L -> (0.5, false), 11L -> (3.0, true), 12L -> (0.5, false),
      20L -> (0.0, false))
    assert(got.keySet == want.keySet, s"got $got")
    want.foreach { case (id, (s, a)) =>
      assert(math.abs(got(id)._1 - s) < 1e-9 && got(id)._2 == a,
        s"event $id: got ${got(id)}, want ($s,$a)")
    }
  }

  test("st21b: streaming CUSUM == batch SeriesFold with the same fixed " +
      "reference over the real events history") {
    import graft.streaming.StreamingCusum
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
    // reference near the corpus mean/sd (avg≈50, sd≈48) with a low bar so
    // the fixture's high-value runs actually alarm (vacuity-checked below)
    val (mu, sigma, slack, h) = (50.0, 50.0, 0.3, 1.0)
    // batch twin: the identical recurrence on the SeriesFold — final S
    // and total alarm count per series
    val batch = graft.operators.SeriesFold.fold(
      events, "user_id", Seq("ts", "event_id"), "value",
      Seq("s_raw", "alarms_raw"),
      seed = v => {
        val s0 = math.max(0.0, (v - mu) / sigma - slack)
        Array(s0, if (s0 > h) 1.0 else 0.0)
      },
      step = (acc, x) => {
        val s1 = math.max(0.0, acc(0) + ((x - mu) / sigma - slack))
        Array(s1, acc(1) + (if (s1 > h) 1.0 else 0.0))
      })
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getDouble(2), r.getDouble(3).toLong)).toMap
    val rows = events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .orderBy(col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamingCusum
      .monitor(in.toDF().toDF("user_id", "ts", "event_id", "value"),
        mu, sigma, slack, h)
      .writeStream.outputMode("append").format("memory")
      .queryName("st21b").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      in.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("st21b").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getBoolean(3)))
    val lastEvent = rows.groupBy(_._1).map { case (u, rs) => u -> rs.last._3 }
    val streamByKey = streamed.toMap
    val alarmCounts = streamed.groupBy(_._1._1)
      .map { case (u, xs) => u -> xs.count(_._2._2) }
    assert(batch.nonEmpty && batch.keySet == lastEvent.keySet)
    batch.foreach { case (u, (sFinal, nAlarms)) =>
      // identical fold order and ops → exact equality of the raw double
      assert(streamByKey((u, lastEvent(u)))._1 == sFinal,
        s"user $u final S: batch $sFinal vs stream " +
          s"${streamByKey((u, lastEvent(u)))._1}")
      assert(alarmCounts.getOrElse(u, 0) == nAlarms.toInt,
        s"user $u alarms: batch $nAlarms vs stream ${alarmCounts.get(u)}")
    }
    // the reference params are chosen so the fixture actually alarms
    assert(alarmCounts.values.sum > 0, "vacuous fixture: no alarms fired")
  }

  test("st22: deadman alert — event-time state timeout fires when a " +
      "series goes silent past the watermark, and re-arms on resume") {
    import graft.streaming.StreamingDeadman
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:${s / 60}%02d:${s % 60}%02d")
    val q = StreamingDeadman
      .alerts(in.toDF().toDF("user_id", "ts", "event_id", "value"),
        silenceMs = 30000L, watermarkDelay = "5 seconds")
      .toDF().writeStream.outputMode("append").format("memory")
      .queryName("st22").start()
    try {
      // both series alive at t=0; u2 keeps reporting, u1 goes silent
      in.addData((1L, ts(0), 10L, 1.0), (2L, ts(0), 20L, 1.0))
      q.processAllAvailable()
      in.addData((2L, ts(20), 21L, 1.0))
      q.processAllAvailable()
      // u2's t=120 event advances the watermark to 115s — far past u1's
      // 30s deadline (armed at 30s) → u1 alerts; u2's own deadline (150s)
      // is still ahead → no u2 alert
      in.addData((2L, ts(120), 22L, 1.0))
      q.processAllAvailable()
      val first = spark.table("st22").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      assert(first.toSeq == Seq((1L, "2024-01-01 00:00:00.0", 1L)),
        first.mkString(", "))
      // u1 resumes → re-arms; going silent AGAIN alerts a second episode
      // with the new last_seen and a fresh point count
      in.addData((1L, ts(130), 11L, 2.0))
      q.processAllAvailable()
      in.addData((2L, ts(300), 23L, 1.0))
      q.processAllAvailable()
      val all = spark.table("st22").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      assert(all.count(_._1 == 1L) == 2, all.mkString(", "))
      assert(all.exists(a =>
        a._1 == 1L && a._2 == "2024-01-01 00:02:10.0" && a._3 == 1L),
        all.mkString(", "))
      // the continuously-reporting series never alerted
      assert(!all.exists(_._1 == 2L), all.mkString(", "))
    } finally q.stop()
  }

  test("st14: stateful fault tolerance — EWMA state survives a " +
      "kill-and-restart from a RocksDB checkpoint") {
    import graft.streaming.StreamingEwma
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Timestamp, Long, Double)]
      def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
      val ckpt = tmpDir("graft-st14-ckpt")
      val out = tmpDir("graft-st14-out")
      // file sink: the fault-tolerant sink pairing (memory sink cannot
      // recover a checkpointed query)
      def start() = StreamingEwma.smooth(
        in.toDF().toDF("user_id", "ts", "event_id", "value"), alpha = 0.5)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
      val q1 = start()
      in.addData((1L, ts(0), 10L, 4.0), (1L, ts(1), 11L, 8.0),
        (2L, ts(0), 20L, 100.0))
      q1.processAllAvailable()
      q1.stop() // the kill: state exists only in the RocksDB checkpoint
      // data keeps arriving while the query is down
      in.addData((1L, ts(2), 12L, 10.0), (2L, ts(1), 21L, 50.0))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val got = spark.read.parquet(out).collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma"))
        .toMap
      // 12 -> 8.0 REQUIRES the restored state 6.0: a query that lost its
      // state would reseed u1 at 10.0 (and u2 at 50.0, not 75.0)
      assert(got == Map(10L -> 4.0, 11L -> 6.0, 12L -> 8.0,
        20L -> 100.0, 21L -> 75.0),
        s"state did not survive the restart: $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("st14b: OLS regression state survives a kill-and-restart from a " +
      "RocksDB checkpoint (hand-derived post-restart fit)") {
    import graft.streaming.StreamingOls
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Timestamp, Long, Double)]
      def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
      val ckpt = tmpDir("graft-st14b-ckpt")
      val out = tmpDir("graft-st14b-out")
      def start() = StreamingOls.fit(
        in.toDF().toDF("user_id", "ts", "event_id", "value"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
      val q1 = start()
      // u1 on the exact line v = 1.00 + 0.10·t (cents 100 + 10·t_s)
      in.addData((1L, ts(0), 10L, 1.0), (1L, ts(10), 11L, 2.0))
      q1.processAllAvailable()
      q1.stop() // kill: five sums + anchor live only in the checkpoint
      in.addData((1L, ts(20), 12L, 3.0))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val got = spark.read.parquet(out).collect()
        .map(r => r.getAs[Long]("event_id") ->
          (if (r.isNullAt(3)) -1L else r.getAs[Long]("deriv_micro"),
            if (r.isNullAt(4)) -1L else r.getAs[Long]("predict_micro")))
        .toMap
      // event 12's exact fit REQUIRES the restored (n=2, Σt=10, Σv=300,
      // Σtv=2000, Σt²=100, t0): slope = 10 cents/s → deriv 10,000,000;
      // predict(+3600 s past t=20) = 100 + 10·3620 = 36,300 cents.
      // A reseeded query would emit None (n = 1) at event 12.
      assert(got(12L) == ((10000000L, 36300000000L)),
        s"state did not survive the restart: $got")
      assert(got(10L) == ((-1L, -1L))) // undetermined at n = 1
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("st18: streaming quantile histogram — the state store IS the " +
      "mergeable summary; online quantiles match the batch bins") {
    import graft.operators.LogHistogram
    val in = MemoryStream[(String, String, Double)]
    // continuous groupBy(series, name, bin) count: Spark's agg state
    // holds one row per OCCUPIED BIN (catalog-sized, bounded by value
    // dynamic range — never by row count), and complete-mode output is
    // the live histogram. The same LogHistogram bin definition as the
    // engine's per-day rollup, so online == batch by construction.
    val hist = in.toDF().toDF("series", "name", "value")
      .groupBy(col("series"), col("name"),
        LogHistogram.binExpr(col("value")).as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val q = hist.writeStream.outputMode("complete").format("memory")
      .queryName("st18").start()
    try {
      in.addData((1 to 500).map(v => ("lat", "v", v * 1.0)): _*)
      q.processAllAvailable()
      in.addData((501 to 1000).map(v => ("lat", "v", v * 1.0)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("st18")
    // the streamed bins equal a batch pass over the same values —
    // same summary, built incrementally
    val batch = spark.range(1, 1001)
      .select(lit("lat").as("series"), lit("v").as("name"),
        (col("id") * 1.0).as("value"))
      .groupBy(col("series"), col("name"),
        LogHistogram.binExpr(col("value")).as("bin"))
      .agg(count(lit(1)).as("cnt"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "online bins == batch bins")
    // quantiles read live off the streamed bins, within bin error
    val p = LogHistogram.quantiles(
      streamed.select(col("bin"), col("cnt").as("w")), Seq(0.5, 0.99))
      .collect()
    assert(p(0).getLong(2) == 1000)
    assert(math.abs(p(0).getDouble(1) - 500.0) / 500.0 <= 0.01,
      s"p50=${p(0).getDouble(1)}")
    assert(math.abs(p(1).getDouble(1) - 990.0) / 990.0 <= 0.01,
      s"p99=${p(1).getDouble(1)}")
  }

  test("st19: streaming PCA moments — the aggregation state store holds " +
      "the d²-bounded second-moment summary; online model == batch") {
    import graft.operators.Pca
    val d = 6
    // two-axis fixture (the PcaSpec construction at d=6): the stream
    // accumulates moments, the model refreshes from live state anytime
    def vec(k: Int): Seq[Double] = {
      val a = 10.0 * (if (k % 2 == 0) 1 else -1) *
        (1.0 + (k * 2654435761L % 97) / 97.0)
      val b = 2.0 * (if (k % 4 < 2) 1 else -1) *
        (1.0 + (k * 48271L % 89) / 89.0)
      Seq.tabulate(d)(i =>
        a * (if (i < 3) 0.5 else 0.0) + b * (if (i >= 3) 0.5 else 0.0))
    }
    val in = MemoryStream[Seq[Double]]
    val terms = in.toDF().toDF("v")
      .select(explode(Pca.momentTermsExpr("v")).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.v")).as("s"))
    val q = terms.writeStream.outputMode("complete").format("memory")
      .queryName("st19").start()
    try {
      in.addData((0 until 120).map(vec): _*)
      q.processAllAvailable()
      in.addData((120 until 240).map(vec): _*)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("st19").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    // the state is MODEL-sized: exactly count + d sums + d(d+1)/2
    // products, however many rows streamed through
    assert(rows.length == 1 + d + d * (d + 1) / 2, rows.length)
    val online = Pca.fromMomentRows(rows)
    val batch = Pca.moments((0 until 240).map(vec).toDF("v"), "v")
    assert(online.n == 240 && batch.n == 240)
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(online.cov(i)(j) - batch.cov(i)(j)) < 1e-9,
        s"cov($i,$j): ${online.cov(i)(j)} vs ${batch.cov(i)(j)}")
    // the eigensolve on the online moments lands on the same axis
    val pOn = Pca.principalComponents(online.cov, 1).head._2
    val pBat = Pca.principalComponents(batch.cov, 1).head._2
    val dot = pOn.indices.map(i => pOn(i) * pBat(i)).sum
    assert(math.abs(dot) > 0.999999, s"axis dot=$dot")
  }

  test("st24: streaming seasonal profile — the aggregation state store " +
      "holds the catalog-sized (type, hour) integer sums; online == batch " +
      "q_seasonal_profile exactly") {
    // same recipe as st19 (PCA moments): NO custom state logic — a
    // continuous groupBy over integer cent sums IS the mergeable profile
    // (one row per (type, hour) cell regardless of row count), and the
    // batch query's exact mean/σ derivation reads identically off it
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q_seasonal_profile")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val rows = graft.Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts").cast("timestamp"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    val in = MemoryStream[(String, Timestamp, Double)]
    val agg = in.toDF().toDF("event_type", "ts", "value")
      .select(col("event_type"), hour(col("ts")).cast("long").as("hh"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("hh"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"),
        sum(col("cents") * col("cents")).as("scc"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("st24").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      in.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    // state is CELL-sized: #rows == #occupied (type, hour) cells
    val cells = spark.table("st24").collect()
    assert(cells.length == batch.size, s"${cells.length} vs ${batch.size}")
    // the batch query's exact integer mean/σ derivation over live state
    val online = spark.table("st24")
      .select(col("event_type"), col("hh"), col("n"),
        expr("(sc * 10000 + n div 2) div n").as("mean_micro"),
        floor(sqrt((col("n") * col("scc") - col("sc") * col("sc"))
          .cast("double")) / col("n").cast("double") / lit(100.0)
          * 1000000.0 + 0.5).cast("long").as("std_micro"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(online == batch, "online profile != batch q_seasonal_profile")
  }

  test("st27: streaming burn rate — the aggregation state store holds " +
      "hourly error/total counts; online == batch q_burn_rate exactly") {
    // st24's recipe on the alerting op: a continuous hourly groupBy IS
    // the mergeable rollup, and the batch query's trailing-window burn
    // derivation reads identically off the live state
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q_burn_rate")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("hb") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_err"),
          r.getAs[Long]("burn1_micro"), r.getAs[Long]("burn6_micro")))
      .toMap
    val rows = graft.Tables.load(spark, dir, "events")
      .select(col("ts").cast("timestamp"), col("event_type")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)))
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "event_type")
      .select(expr("unix_micros(ts) div 3600000000").as("hb"),
        col("event_type"))
      .groupBy(col("hb"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_err"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("st27").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      in.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    // batch burn derivation over live state (same intDiv/window math)
    val w6 = org.apache.spark.sql.expressions.Window.orderBy(col("hb"))
      .rowsBetween(-5, org.apache.spark.sql.expressions.Window.currentRow)
    val online = spark.table("st27")
      .withColumn("t6", sum(col("n_total")).over(w6))
      .withColumn("e6", sum(col("n_err")).over(w6))
      .select(col("hb"), col("n_total"), col("n_err"),
        expr("(n_err * 5000000 + n_total div 2) div n_total")
          .as("burn1_micro"),
        expr("(e6 * 5000000 + t6 div 2) div t6").as("burn6_micro"))
      .filter(col("burn1_micro") > 1000000L &&
        col("burn6_micro") > 1000000L)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(batch.nonEmpty && online == batch,
      s"online ${online.size} vs batch ${batch.size}")
  }

  test("st26: streaming state runs emit on transition — closed runs == " +
      "batch q_state_runs minus each series' still-open final run") {
    import graft.streaming.StreamingStateRuns
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q_state_runs")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("first_event_id")) ->
        (r.getAs[String]("event_type"), r.getAs[Long]("run_len"),
          r.getAs[Long]("t_start_us"), r.getAs[Long]("elapsed_us"))).toMap
    val rows = graft.Tables.load(spark, dir, "events")
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("event_type"))
      .orderBy(col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val q = StreamingStateRuns
      .runs(in.toDF().toDF("user_id", "ts", "event_id", "event_type"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st26").start()
    try {
      // a run crosses the micro-batch boundary mid-flight
      val (a, b) = rows.splitAt(rows.length / 2)
      in.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("st26").collect()
      .map(r => (r.getLong(0), r.getLong(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the batch side includes each series' final (still-open) run; the
    // stream cannot know it ended — identify the TRUE trailing run from
    // the raw ordered rows (the batch output alone cannot: a <3-point
    // final run is filtered there), drop it, and require the remainder
    // to match EXACTLY
    val lastRunFirstId: Map[Long, Long] = rows.groupBy(_._1).map {
      case (u, rs) => // rs keeps the global (ts, event_id) order
        val lastType = rs.last._4
        val trailing = rs.reverse.takeWhile(_._4 == lastType)
        u -> trailing.last._3
    }
    val closedBatch = batch.filter { case ((u, fid), _) =>
      lastRunFirstId(u) != fid }
    assert(closedBatch.nonEmpty)
    assert(streamed == closedBatch,
      s"closed-run sets differ: stream ${streamed.size} vs batch " +
        s"${closedBatch.size}")
  }

  test("st25: streaming rolling median == batch q_moving_median over " +
      "the real events history — ring-of-11 state, EXACT equality") {
    import graft.streaming.StreamingMovingMedian
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q_moving_median")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("cents"), r.getAs[Long]("n_win"),
          r.getAs[Long]("med_cents"))).toMap
    val rows = graft.Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .orderBy(col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamingMovingMedian
      .median(in.toDF().toDF("user_id", "ts", "event_id", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st25").start()
    try {
      // the ring state crosses a micro-batch boundary mid-window
      val (a, b) = rows.splitAt(rows.length / 2)
      in.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("st25").collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(batch.nonEmpty && stream.keySet == batch.keySet)
    val diffs = batch.collect {
      case (id, want) if stream(id) != want => (id, want, stream(id))
    }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
  }

  test("st23: streaming counter rate — hand-computed reset fixture, " +
      "all-integer state across a micro-batch boundary") {
    // u1: cents 500 -> seed (inc 0); 800 -> +300; 200 -> RESET, +200
    //     (elapsed 2 s, inc 5.00 -> rate 2.5/s = 2_500_000 micro)
    // u2: 100 -> seed; 100 -> +0 (flat counter, rate 0, no reset)
    import graft.streaming.StreamingRate
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val q = StreamingRate
      .rate(in.toDF().toDF("user_id", "ts", "event_id", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st23").start()
    try {
      in.addData((1L, ts(0), 10L, 5.0), (1L, ts(1), 11L, 8.0),
        (2L, ts(0), 20L, 1.0))
      q.processAllAvailable()
      // (last, inc, resets, t0) cross the boundary; the reset lands here
      in.addData((1L, ts(2), 12L, 2.0), (2L, ts(1), 21L, 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("st23").collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    val want = Map(
      10L -> (1L, 0L, 0L, None),
      11L -> (2L, 0L, 300L, Some(3000000L)),
      12L -> (3L, 1L, 500L, Some(2500000L)),
      20L -> (1L, 0L, 0L, None),
      21L -> (2L, 0L, 0L, Some(0L)))
    assert(got == want, s"got $got")
  }

  test("st23b: streaming counter rate == batch q_rate_counter over the " +
      "real events history — integer state makes the fixpoint EXACT") {
    import graft.streaming.StreamingRate
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q_rate_counter")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("n_resets"),
          r.getAs[Long]("increase_cents"), r.getAs[Long]("rate_micro")))
      .toMap
    val rows = graft.Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .orderBy(col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamingRate
      .rate(in.toDF().toDF("user_id", "ts", "event_id", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st23b").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      in.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("st23b").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    val lastEvent = rows.groupBy(_._1).map { case (u, rs) => u -> rs.last._3 }
    // batch HAVING drops nothing at this sf (every series has ≥2 points
    // over >0 elapsed) — vacuity check, then EXACT integer equality
    assert(batch.nonEmpty && batch.keySet == lastEvent.keySet)
    batch.foreach { case (u, (n, res, inc, rate)) =>
      val (sn, sres, sinc, srate) = stream((u, lastEvent(u)))
      assert((sn, sres, sinc, srate) == ((n, res, inc, rate)),
        s"user $u: batch ($n,$res,$inc,$rate) vs stream " +
          s"($sn,$sres,$sinc,$srate)")
    }
  }

  test("st29: streaming OLS trend == batch q_predict_linear over the " +
      "real events history — six longs of state, EXACT emitted micros") {
    import graft.streaming.StreamingOls
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q_predict_linear")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n"), r.getAs[Long]("deriv_micro"),
          r.getAs[Long]("predict_micro"))).toMap
    val rows = graft.Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("value").cast("double"))
      .orderBy(col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamingOls
      .fit(in.toDF().toDF("user_id", "ts", "event_id", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st29").start()
    try {
      // regression state (five sums + anchor) crosses two boundaries
      val third = rows.length / 3
      Seq(rows.take(third), rows.slice(third, 2 * third),
        rows.drop(2 * third)).foreach { c =>
        in.addData(c.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val lastEvent = rows.groupBy(_._1).map { case (u, rs) => u -> rs.last._3 }
    val stream = spark.table("st29").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    // every batch series is determined (n>=2, den>0) at this sf —
    // vacuity check, then EXACT equality of n + both emitted micros
    assert(batch.nonEmpty && batch.keySet == lastEvent.keySet)
    batch.foreach { case (u, (n, dm, pm)) =>
      val got = stream((u, lastEvent(u)))
      assert(got == ((n, dm, pm)),
        s"user $u: batch ($n,$dm,$pm) vs stream $got")
    }
  }

  test("st30: streaming chop-packing — one long of state per source, " +
      "online sequence assignment == the batch q_pack_chop rollup") {
    import graft.streaming.StreamingPack
    val dir = "/root/testdata/sf0.01"
    val batch = graft.SparkEntry.queries("q_pack_chop")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val rows = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val in = MemoryStream[(String, Long, String)]
    val q = StreamingPack
      .pack(in.toDF().toDF("source", "doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st30").start()
    try {
      // ascending-doc_id arrival; the running totals cross two boundaries
      val third = rows.length / 3
      Seq(rows.take(third), rows.slice(third, 2 * third),
        rows.drop(2 * third)).foreach { c =>
        in.addData(c.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // re-aggregate the per-doc emissions into the batch query's shape
    val streamed = spark.table("st30").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(5)))
      .groupBy { case (src, _, _, seq, _) => (src, seq) }
      .map { case ((src, seq), ds) =>
        (src, seq) -> (ds.size.toLong, ds.map(_._3).sum,
          ds.count(_._5).toLong, ds.map(_._2).min)
      }
    assert(streamed.keySet == batch.keySet,
      s"sequence-set drift: stream-only ${(streamed.keySet -- batch.keySet)
        .take(3)}, batch-only ${(batch.keySet -- streamed.keySet).take(3)}")
    val diffs = batch.collect {
      case (k, want) if streamed(k) != want => (k, want, streamed(k)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
    // vacuity: straddles exist and state crossed batch boundaries
    assert(batch.values.exists(_._3 > 0L))
  }

  test("st28: streaming SemDeDup — broadcast-table assignment + " +
      "flag-vs-history == the batch q_dedup_semdedup result across " +
      "micro-batch boundaries") {
    import graft.streaming.StreamingSemDedup
    val dir = "/root/testdata/sf0.01"
    val cents = spark.read.parquet(graft.Fixtures.semdedupCentroids)
    val corpus = graft.Tables.load(spark, dir, "embeddings")
      .unionByName(graft.queries.DedupQueries.plantedEmbeddings(spark))
      .select(col("vec_id"), col("embedding"))
    // batch truth: cids from the same corpus, dup rows from the oracle-
    // checked query itself
    val batchCids = StreamingSemDedup.assignCosine(corpus, cents)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batchDups = graft.queries.DedupQueries.semDedup(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // ascending-id arrival (the documented ordering precondition: every
    // smaller-id partner precedes its dup), batch boundaries splitting
    // both planted pairs' arrival from their partners
    val rows = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    // last cut isolates planted pair 1 across the boundary (900001
    // arrives a batch before 900002 — a history hit) while pair 2 lands
    // in one batch (an in-batch hit): both flag paths exercised
    val cuts = Seq(rows.length / 3, 2 * rows.length / 3, rows.length - 3)
    val batches = (Seq(0) ++ cuts :+ rows.length).sliding(2).toSeq
      .map { case Seq(a, b) => rows.slice(a, b) }
    val streamedCids =
      scala.collection.mutable.Map.empty[Long, Int]
    val streamedDups =
      scala.collection.mutable.Set.empty[(Long, Int, Long, Double)]
    val in = MemoryStream[(Long, Seq[Float])]
    var history = StreamingSemDedup.assignCosine(corpus.limit(0), cents)
      .cache()
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val assigned = StreamingSemDedup.assignCosine(b, cents)
          .localCheckpoint()
        StreamingSemDedup.flagAgainst(assigned, history).collect()
          .foreach(r => streamedDups +=
            ((r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))))
        assigned.select(col("vec_id"), col("cid")).collect()
          .foreach(r => streamedCids(r.getLong(0)) = r.getInt(1))
        history = history.unionByName(assigned).localCheckpoint()
        ()
      }
      .start()
    try {
      batches.foreach { rs =>
        in.addData(rs.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // streamed cids == batch cids (assignment is stateless per row; the
    // broadcast-table path must not depend on batch placement)
    assert(streamedCids.toMap == batchCids,
      s"cid drift on ${streamedCids.toMap.count {
        case (k, v) => batchCids.get(k) != Some(v) }} vectors")
    // streamed dup flags == the oracle-checked batch rows, including the
    // planted pairs whose partners arrived in EARLIER micro-batches
    assert(streamedDups.toSet == batchDups,
      s"dup-flag drift: stream-only ${(streamedDups.toSet -- batchDups)
        .take(3)}, batch-only ${(batchDups -- streamedDups).take(3)}")
    assert(batchDups.exists(_._1 >= 900001L),
      "vacuity: planted pairs must appear in the flagged set")
  }

  test("st31: streaming labeler agreement — four longs of state per " +
      "source, online confusion matrix equals the batch q_label_kappa " +
      "across a micro-batch boundary") {
    import graft.streaming.StreamingKappa
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    // two micro-batches, split mid-corpus so most sources straddle the
    // boundary and the state genuinely carries
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(Long, String, String, Long)]
    val q = StreamingKappa
      .agreement(in.toDF().toDF("doc_id", "source", "text", "n_chars"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st31").start()
    try {
      Seq(b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // final readout per source = the row with the largest n
    val online = spark.table("st31").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))))
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).maxBy(_._1) }
    val batch = graft.SparkEntry.queries("q_label_kappa")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))).toMap
    assert(online.keySet == batch.keySet,
      s"source drift: ${online.keySet} vs ${batch.keySet}")
    batch.foreach { case (s, want) =>
      assert(online(s) == want, s"source $s: online ${online(s)} != " +
        s"batch $want")
    }
    // vacuity: the boundary split must actually exercise carried state
    assert(b1.map(_._2).toSet.intersect(b2.map(_._2).toSet).nonEmpty,
      "no source straddles the micro-batch boundary")
  }

  test("st32: streaming changes/resets — last value + three longs of " +
      "state per series, online counters equal the batch " +
      "q_changes_resets across a micro-batch boundary") {
    import graft.streaming.{SeriesPoint, StreamingChanges}
    val dir = "/root/testdata/sf0.001"
    // arrival respects per-series event order (the gateway's monotone
    // contract the batch twin's lag window assumes): split on the GLOBAL
    // (ts, event_id) order so every series' points arrive in sequence
    val evts = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(t => SeriesPoint.orderKey(
        SeriesPoint.Point(t._1, t._2, t._3, t._4)))
    val (b1, b2) = evts.splitAt(evts.length / 2)
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamingChanges
      .counters(in.toDF().toDF("user_id", "ts", "event_id", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st32").start()
    try {
      Seq(b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val online = spark.table("st32").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
    val batch = graft.SparkEntry.queries("q_changes_resets")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // batch omits 1-point series (no pairs); online emits them with 0s
    batch.foreach { case (u, want) =>
      assert(online(u) == want,
        s"series $u: online ${online(u)} != batch $want")
    }
    assert(batch.nonEmpty && b1.map(_._1).toSet
      .intersect(b2.map(_._1).toSet).nonEmpty,
      "no series straddles the micro-batch boundary")
  }

  test("st33: streaming RSI/CMO — last cents value + three longs of " +
      "state per series, online readout equals the batch " +
      "q_tech_indicators across a micro-batch boundary") {
    import graft.streaming.{SeriesPoint, StreamingTech}
    val dir = "/root/testdata/sf0.001"
    val evts = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(t => SeriesPoint.orderKey(
        SeriesPoint.Point(t._1, t._2, t._3, t._4)))
    val (b1, b2) = evts.splitAt(evts.length / 2)
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamingTech
      .indicators(in.toDF().toDF("user_id", "ts", "event_id", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st33").start()
    try {
      Seq(b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    def optLong(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    val online = spark.table("st33").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        optLong(r, 4), optLong(r, 5))))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
    val batch = graft.SparkEntry.queries("q_tech_indicators")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        optLong(r, 4), optLong(r, 5))).toMap
    batch.foreach { case (u, want) =>
      assert(online(u) == want,
        s"series $u: online ${online(u)} != batch $want")
    }
    assert(batch.exists(_._2._4.isDefined),
      "vacuity: at least one series must have a determined RSI")
  }

  test("st37: streaming count-min sketch — the complete-mode aggregation " +
      "state IS the sketch; bucket sums and point estimates equal the " +
      "batch build over the same keys across micro-batch merges") {
    import graft.operators.CountMin
    val dir = "/root/testdata/sf0.001"
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey")).collect().map(_.getLong(0))
    val batchSketch = CountMin
      .sketch(li.toSeq.toDF("l_partkey"), "l_partkey")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val (b1, b2) = li.splitAt(li.length / 2)
    val in = MemoryStream[Long]
    val q = CountMin.sketch(in.toDF().toDF("l_partkey"), "l_partkey")
      .writeStream.outputMode("complete").format("memory")
      .queryName("st37").start()
    try {
      Seq(b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val online = spark.table("st37").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(online == batchSketch,
      s"first diff: ${batchSketch.collectFirst {
        case (k, v) if online.get(k) != Some(v) => (k, v, online.get(k))
      }}")
    // estimates from the streamed sketch: one-sided guarantee vs the
    // true counts, and exact agreement with the batch estimate path
    val trueCnt = li.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val top = trueCnt.toSeq.sortBy { case (k, c) => (-c, k) }.take(5)
    val est = CountMin.estimate(spark.table("st37"),
        top.map(_._1).toDF("l_partkey"), "l_partkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    top.foreach { case (k, c) =>
      assert(est(k) >= c, s"CMS underestimated key $k: ${est(k)} < $c")
    }
    // vacuity: the sketch genuinely merged across the batch boundary —
    // some bucket's count exceeds what either half alone contributes
    assert(b1.nonEmpty && b2.nonEmpty && batchSketch.values.exists(_ > 1))
  }

  test("st38: streaming AR(2) — nine longs of state per series; the " +
      "online refit at each series' last event equals batch " +
      "q_ar_forecast EXACTLY (integer micros, no epsilon) across a " +
      "micro-batch boundary") {
    import graft.streaming.{SeriesPoint, StreamingAr}
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("q_ar_forecast")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val evts = graft.Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(t => SeriesPoint.orderKey(
        SeriesPoint.Point(t._1, t._2, t._3, t._4)))
    val lastEvent = evts.groupBy(_._1).map { case (u, rs) =>
      u -> rs.last._3 }
    val (b1, b2) = evts.splitAt(evts.length / 2)
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamingAr
      .fit(in.toDF().toDF("user_id", "ts", "event_id", "value"))
      .writeStream.outputMode("append").format("memory")
      .queryName("st38").start()
    try {
      Seq(b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val online = spark.table("st38").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(batch.nonEmpty)
    batch.foreach { case (u, want) =>
      val got = online((u, lastEvent(u)))
      assert(got == want, s"series $u: online $got != batch $want")
    }
    // vacuity: some series' normal-equation sums span the boundary
    assert(b1.map(_._1).toSet.intersect(b2.map(_._1).toSet).nonEmpty,
      "no series straddles the micro-batch boundary")
  }

  test("st39: streaming association rules — one tagged complete-mode " +
      "count is the whole state (pair+item supports and the order " +
      "count); the top-lift readout equals batch q_basket_rules over " +
      "EVERY arrived prefix, exactly, across a micro-batch boundary") {
    import graft.streaming.StreamingBasket
    val dir = "/root/testdata/sf0.001"
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // orders arrive WHOLE (the operator contract): split by orderkey
    val baskets = li.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (o, rs) => (o, rs.map(_._2).distinct.sorted.toSeq) }
    val (b1, b2) = baskets.splitAt(baskets.length / 2)
    val in = MemoryStream[(Long, Seq[Long])]
    val q = StreamingBasket.counts(in.toDF().toDF("o", "ps"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("st39").start()
    def batchRules(prefix: Seq[(Long, Seq[Long])]): Seq[Seq[Any]] = {
      // the batch query over the same prefix: a lineitem.parquet with
      // exactly the arrived rows (q_basket_rules reads only these cols)
      val d = tmpDir("graft-st39")
      prefix.flatMap { case (o, ps) => ps.map(p => (o, p)) }
        .toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
      graft.SparkEntry.queries("q_basket_rules")(spark, d)
        .collect().map(_.toSeq.toList).toSeq
    }
    try {
      var arrived = Seq.empty[(Long, Seq[Long])]
      Seq(b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
        arrived = arrived ++ b
        val online = StreamingBasket.readout(spark.table("st39"))
          .collect().map(_.toSeq.toList).toSeq
        val batch = batchRules(arrived)
        assert(online == batch,
          s"prefix of ${arrived.length} orders: online top-50 != batch" +
            s" (first diff: ${online.zipAll(batch, null, null)
              .find { case (a, bb) => a != bb }})")
        assert(batch.nonEmpty, "vacuity: prefix produced no rules")
      }
    } finally q.stop()
    // vacuity: some surviving pair must accumulate support from BOTH
    // batches, or the boundary claim is untested
    def pairs(bs: Seq[(Long, Seq[Long])]): Set[(Long, Long)] =
      bs.flatMap { case (_, ps) =>
        for (i <- ps.indices; j <- i + 1 until ps.length)
          yield (ps(i), ps(j))
      }.toSet
    assert(pairs(b1).intersect(pairs(b2)).nonEmpty,
      "no co-order pair straddles the micro-batch boundary")
    // state-footprint pin (the SCALE §10 claim): the agg state IS the
    // rollup, so its size is the TOUCHED-KEY count — distinct pairs +
    // distinct items + 1 — bounded by the catalog², never by fact rows
    val items = baskets.flatMap(_._2).toSet
    assert(spark.table("st39").count() ==
      pairs(baskets).size + items.size + 1L,
      "state rows != touched (pair + item + order-count) keys")
  }

  test("st40: streaming conversion funnel — O(1) per-user stage state; " +
      "the per-stage distinct-user readout equals batch q_funnel over " +
      "EVERY arrived prefix, exactly, with stage progressions that " +
      "straddle the micro-batch boundary") {
    import graft.streaming.StreamingFunnel
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
      .sortBy(_._2.getTime) // global event-time order (the contract)
    // pick the split point FROM the data so the boundary is guaranteed
    // to cut through a stage progression: greedy-fold the funnel to
    // find a user whose qualifying click exists, then split right
    // before that click — view lands in b1, the advance in b2
    val greedy = scala.collection.mutable.Map.empty[Long, (Int, Long)]
    var cut = -1
    ev.zipWithIndex.foreach { case ((u, t, et), i) =>
      val (st, tLast) = greedy.getOrElse(u, (0, -1L))
      if (st == 0 && et == "view") greedy(u) = (1, t.getTime)
      else if (st == 1 && et == "click" && t.getTime > tLast) {
        greedy(u) = (2, t.getTime)
        if (cut < 0) cut = i // first stage-2 advance in global order
      }
    }
    assert(cut > 0, "fixture has no view→click progression at all")
    val (b1, b2) = ev.splitAt(cut)
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamingFunnel
      .stages(in.toDF().toDF("user_id", "ts", "event_type"))
      .writeStream.outputMode("update").format("memory")
      .queryName("st40").start()
    def batchFunnel(prefix: Array[(Long, java.sql.Timestamp, String)])
        : Seq[Seq[Any]] = {
      val d = tmpDir("graft-st40")
      val sp = spark
      import sp.implicits._
      prefix.zipWithIndex
        .map { case ((u, t, et), i) => (i.toLong, t, u, et) }.toSeq
        .toDF("event_id", "ts", "user_id", "event_type")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      graft.SparkEntry.queries("q_funnel")(spark, d)
        .collect().map(_.toSeq.toList).toSeq
    }
    var stageAfterB1 = Map.empty[Long, Int]
    try {
      var arrived = Array.empty[(Long, java.sql.Timestamp, String)]
      Seq(b1, b2).zipWithIndex.foreach { case (b, bi) =>
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
        arrived = arrived ++ b
        val online = StreamingFunnel.readout(spark.table("st40"))
          .collect().map(_.toSeq.toList).toSeq
        val batch = batchFunnel(arrived)
        assert(online == batch,
          s"prefix of ${arrived.length} events: online funnel != batch" +
            s" (online=$online batch=$batch)")
        assert(batch.nonEmpty, "vacuity: prefix produced no funnel rows")
        if (bi == 0) stageAfterB1 = spark.table("st40").collect()
          .map(r => r.getLong(0) -> r.getInt(1))
          .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).max }
      }
    } finally q.stop()
    // vacuity: some user must ADVANCE a stage in batch 2 on top of
    // batch-1 state, or the cross-boundary claim is untested
    val finalStage = spark.table("st40").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).max }
    assert(finalStage.exists { case (u, st) =>
      stageAfterB1.getOrElse(u, 0) >= 1 && st > stageAfterB1.getOrElse(u, 0)
    }, "no user advanced a funnel stage across the micro-batch boundary")
  }

  test("st41: streaming evaluation AUC — one tagged complete-mode " +
      "(evaluator, score) count is the whole state; the rank-sum " +
      "readout equals batch q_eval_auc over EVERY arrived prefix, " +
      "exactly, with score groups that straddle the boundary") {
    import graft.streaming.StreamingAuc
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(Long, String, String)]
    val q = StreamingAuc
      .groups(in.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("st41").start()
    def batchAuc(prefix: Array[(Long, String, String)]): Seq[Seq[Any]] = {
      val d = tmpDir("graft-st41")
      val sp = spark
      import sp.implicits._
      prefix.toSeq.toDF("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      graft.SparkEntry.queries("q_eval_auc")(spark, d)
        .collect().map(_.toSeq.toList).toSeq
    }
    try {
      var arrived = Array.empty[(Long, String, String)]
      Seq(b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
        arrived = arrived ++ b
        val online = StreamingAuc.readout(spark.table("st41"))
          .collect().map(_.toSeq.toList).toSeq
        val batch = batchAuc(arrived)
        assert(online == batch,
          s"prefix of ${arrived.length} docs: online AUC != batch" +
            s" (online=$online batch=$batch)")
        assert(batch.nonEmpty && batch.head(1).asInstanceOf[Long] > 0L,
          "vacuity: prefix produced no positives")
      }
    } finally q.stop()
    // state-footprint pin (the st39 claim): the agg state IS the tagged
    // rollup — rows == touched (evaluator, score) keys, never doc count
    val keys = StreamingAuc.groups(
      graft.Tables.load(spark, dir, "documents")).count()
    assert(spark.table("st41").count() == keys,
      "state rows != touched (evaluator, score) keys")
    // vacuity: some score group must accumulate counts from BOTH
    // batches, or the boundary claim is untested
    def grp(b: Array[(Long, String, String)]): Set[(String, Long)] = {
      val sp = spark
      import sp.implicits._
      StreamingAuc.groups(b.toSeq.toDF("doc_id", "text", "lang"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    assert(grp(b1).intersect(grp(b2)).nonEmpty,
      "no (evaluator, score) group straddles the micro-batch boundary")
  }

  test("st42: streaming DSIR scoring — stateless fixed-model map equals " +
      "batch q_dsir_select scores exactly over the training corpus, and " +
      "unseen buckets score the Laplace zero-count default") {
    import graft.queries.PipelineQueries
    val dir = "/root/testdata/sf0.001"
    val (lr, defaultLr) = PipelineQueries.dsirModelBundle(spark, dir)
    assert(lr.nonEmpty && defaultLr > 0L,
      "vacuity: empty model (default must be positive — the target " +
        "slice is smaller than the corpus)")
    val batch = PipelineQueries.dsirScores(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(Long, String)]
    val q = StreamingDsir
      .score(in.toDF().toDF("doc_id", "text"), lr, defaultLr)
      .writeStream.outputMode("append").format("memory")
      .queryName("st42").start()
    try {
      Seq(b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
      val online = spark.table("st42").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(online == batch,
        s"online scores != batch q_dsir_select scores " +
          s"(${online.size} vs ${batch.size} docs)")
      assert(batch.nonEmpty)
      // a doc of tokens the reference corpus never saw: every bucket
      // scores the default — expected computed independently from the
      // bundle with a JVM md5 (not the engine's)
      val alien = "zzqx1 zzqx2 zzqx3 zzqx4"
      val aw = alien.split(' ')
      val expected = aw.toSeq.sliding(2).map { p =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest((p(0) + " " + p(1)).getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        lr.getOrElse(java.lang.Long.parseLong(hex, 16) % 8192L, defaultLr)
      }.sum
      in.addData((999999L, alien)); q.processAllAvailable()
      val got = spark.table("st42").collect()
        .find(_.getLong(0) == 999999L).get
      assert(got.getLong(1) == expected && got.getLong(2) == 3L,
        s"alien doc scored ${got.getLong(1)}, expected $expected")
    } finally q.stop()
  }

  test("st43: streaming calibration — one (evaluator, bin) complete-mode " +
      "rollup is the whole state; the reliability/ECE readout equals " +
      "batch q_eval_calibration over EVERY arrived prefix, exactly") {
    import graft.streaming.StreamingCalibration
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(Long, String, String)]
    val q = StreamingCalibration
      .bins(in.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("st43").start()
    def batchCal(prefix: Array[(Long, String, String)]): Seq[Seq[Any]] = {
      val d = tmpDir("graft-st43")
      val sp = spark
      import sp.implicits._
      prefix.toSeq.toDF("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      graft.SparkEntry.queries("q_eval_calibration")(spark, d)
        .collect().map(_.toSeq.toList).toSeq
    }
    try {
      var arrived = Array.empty[(Long, String, String)]
      Seq(b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
        arrived = arrived ++ b
        val online = StreamingCalibration.readout(spark.table("st43"))
          .collect().map(_.toSeq.toList).toSeq
        val batch = batchCal(arrived)
        assert(online == batch,
          s"prefix of ${arrived.length} docs: online calibration != batch")
        assert(batch.size > 2, "vacuity: fewer than 3 occupied bins")
      }
    } finally q.stop()
    // state-footprint pin: the agg state IS the bin rollup — rows ==
    // touched (evaluator, bin) keys (≤ 2 × 10), never doc count
    val keys = StreamingCalibration.bins(
      graft.Tables.load(spark, dir, "documents")).count()
    assert(spark.table("st43").count() == keys,
      "state rows != touched (evaluator, bin) keys")
    assert(keys <= 20L, s"bin state exceeded the 2×10 domain bound: $keys")
  }

  test("st44: streaming confusion matrix — one (labeled, predicted) " +
      "complete-mode cell count is the whole state; the per-class " +
      "precision/recall/F1 readout equals batch q_eval_confusion over " +
      "EVERY arrived prefix, exactly") {
    import graft.streaming.StreamingConfusion
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(Long, String, String)]
    val q = StreamingConfusion
      .cells(in.toDF().toDF("doc_id", "text", "lang"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("st44").start()
    def batchConf(prefix: Array[(Long, String, String)]): Seq[Seq[Any]] = {
      val d = tmpDir("graft-st44")
      val sp = spark
      import sp.implicits._
      prefix.toSeq.toDF("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      graft.SparkEntry.queries("q_eval_confusion")(spark, d)
        .collect().map(_.toSeq.toList).toSeq
    }
    try {
      var arrived = Array.empty[(Long, String, String)]
      Seq(b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
        arrived = arrived ++ b
        val online = StreamingConfusion.readout(spark.table("st44"))
          .collect().map(_.toSeq.toList).toSeq
        val batch = batchConf(arrived)
        assert(online == batch,
          s"prefix of ${arrived.length} docs: online confusion != batch")
        assert(batch.size >= 5, "vacuity: fewer than 5 classes in readout")
      }
    } finally q.stop()
    // state-footprint pin: rows == touched (labeled, predicted) cells,
    // bounded by the class-domain square, never doc count
    val keys = StreamingConfusion.cells(
      graft.Tables.load(spark, dir, "documents")).count()
    assert(spark.table("st44").count() == keys,
      "state rows != touched (labeled, predicted) cells")
    assert(keys <= 36L, s"cell state exceeded the 6² domain bound: $keys")
  }

  test("st45: streaming zone-map sidecar maintenance — one per-block " +
      "complete-mode rollup is the whole state; the sidecar equals the " +
      "batch ZoneMaps rollup over EVERY arrived prefix, a block " +
      "straddles the boundary, and the prune decision tracks the state") {
    import graft.streaming.StreamingZoneMap
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .sortBy(_._1)
    val (b1, b2) = events.splitAt(events.length / 2)
    // the split must land INSIDE a block, or the additive-merge claim
    // (min/max folding across batches for one key) is untested
    assert(b1.last._1 / 512 == b2.head._1 / 512,
      "fixture drift: the batch boundary must straddle a block")
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = StreamingZoneMap
      .sidecar(in.toDF().toDF("event_id", "ts", "value"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("st45").start()
    def batchSidecar(prefix: Array[(Long, java.sql.Timestamp, Double)])
        : Seq[Seq[Any]] = {
      val sp = spark
      import sp.implicits._
      graft.operators.ZoneMaps.sidecarRollup(
        prefix.toSeq.toDF("event_id", "ts", "value"))
        .orderBy(col("blk"))
        .collect().map(_.toSeq.toList).toSeq
    }
    try {
      var arrived = Array.empty[(Long, java.sql.Timestamp, Double)]
      Seq(b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
        arrived = arrived ++ b
        val online = spark.table("st45").orderBy(col("blk"))
          .collect().map(_.toSeq.toList).toSeq
        assert(online == batchSidecar(arrived),
          s"prefix of ${arrived.length} events: online sidecar != batch")
      }
      // state-footprint pin: rows == touched blocks exactly
      val blocks = arrived.map(_._1 / 512).distinct.length.toLong
      assert(spark.table("st45").count() == blocks,
        "state rows != touched blocks")
      // the prune readout equals a direct recompute from the state,
      // and the straddling block is NOT prunable at a cut between the
      // two batches' times if either side reaches past it
      val cut = "2024-01-10"
      val pruned = StreamingZoneMap
        .prunable(spark.table("st45"), cut)
        .collect().map(_.getLong(0)).toSeq
      val cutTs = java.sql.Timestamp.valueOf(s"$cut 00:00:00")
      val expect = arrived.groupBy(_._1 / 512)
        .filter { case (_, rows) => rows.map(_._2).max.before(cutTs) }
        .keys.toSeq.sorted
      assert(pruned == expect, "prune decision diverged from the state")
    } finally q.stop()
  }
}
