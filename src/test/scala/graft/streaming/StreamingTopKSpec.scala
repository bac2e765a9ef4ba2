package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** st17: streaming heavy hitters with bounded Misra-Gries state.
  * The contract (MG counters UNDERESTIMATE): `cnt` lower-bounds the
  * true stream count and `cnt + err` upper-bounds it; no eviction →
  * exact; any token with true count > N/(capacity+1) survives; state
  * never exceeds capacity rows; a kill-restart replaying a batch does
  * not double-count. */
class StreamingTopKSpec extends SparkSpec {

  private def tokens(xs: Seq[String]) = xs

  test("st17a: small vocabulary stays exact (no eviction) and ranks " +
      "by true count") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val state = tmpDir("topk-exact")
    val q = StreamingTopK.maintain(in.toDF().toDF("tok"), state,
      capacity = 50)
      .option("checkpointLocation", tmpDir("topk-exact-ckpt")).start()
    try {
      in.addData(tokens(Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++
        Seq.fill(5)("gamma")): _*)
      q.processAllAvailable()
      in.addData(tokens(Seq.fill(15)("beta") ++ Seq.fill(10)("delta")): _*)
      q.processAllAvailable()
      val top = StreamingTopK.topK(spark, state, 3).collect()
      assert(top.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq ==
        Seq(("beta", 35L, 35L, true), ("alpha", 30L, 30L, true),
          ("delta", 10L, 10L, true)))
    } finally q.stop()
  }

  test("st17b: eviction keeps the heavy hitter, bounds hold against " +
      "ground truth, state stays within capacity") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val state = tmpDir("topk-evict")
    val capacity = 20
    val q = StreamingTopK.maintain(in.toDF().toDF("tok"), state, capacity)
      .option("checkpointLocation", tmpDir("topk-evict-ckpt")).start()
    val streamed = scala.collection.mutable.ArrayBuffer[String]()
    try {
      // each batch: 40 hot occurrences + 200 one-off noise tokens that
      // overflow capacity=20 and force MG evictions every batch. "cold"
      // appears in batches 0 and 4 ONLY — it gets fully evicted in
      // between and RE-ENTERS, the case where a new entrant must
      // inherit the global eviction total as err or its upper bound
      // silently excludes the counts it lost (round-8 review find)
      for (b <- 0 until 5) {
        val batch = Seq.fill(40)("hot") ++
          (0 until 200).map(i => s"noise_${b}_$i") ++
          Seq.fill(8)("warm") ++
          (if (b == 0 || b == 4) Seq.fill(2)("cold") else Seq.empty)
        streamed ++= batch
        in.addData(tokens(batch): _*)
        q.processAllAvailable()
      }
      val n = streamed.size
      val truth = streamed.groupBy(identity).view.mapValues(_.size.toLong)
      val rows = StreamingTopK.summary(spark, state).collect()
      assert(rows.length <= capacity,
        s"summary exceeded capacity: ${rows.length}")
      // the heavy-hitter guarantee: true count 200 > N/(capacity+1)
      assert(200L > n.toLong / (capacity + 1))
      val hot = rows.find(_.getString(0) == "hot")
      assert(hot.isDefined, s"hot evicted: ${rows.map(_.getString(0)).toSeq}")
      // every surviving row's bounds bracket its true count — including
      // any re-entered token (whose err must cover its evicted history)
      rows.foreach { r =>
        val (tok, cnt, err) = (r.getString(0), r.getLong(1), r.getLong(2))
        val t = truth.getOrElse(tok, 0L)
        assert(t >= cnt && t <= cnt + err,
          s"$tok: true=$t outside [$cnt, ${cnt + err}]")
      }
      // and the top-1 readout is the planted hitter with a tight lower
      // bound (its 200 occurrences dwarf the per-batch eviction noise)
      val top = StreamingTopK.topK(spark, state, 1).collect().head
      assert(top.getString(0) == "hot")
      assert(top.getLong(1) >= 100L, s"lower bound too loose: $top")
    } finally q.stop()
  }

  test("st17d: streamed over the real documents tokens == the batch " +
      "exact top-10 (capacity covers the vocabulary)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
    val state = tmpDir("topk-docs")
    val in = MemoryStream[String]
    val vocab = docs.flatMap(_.getString(1).split(" ")).distinct.length
    val q = StreamingTopK.maintain(in.toDF().toDF("tok"), state,
      capacity = vocab + 10)
      .option("checkpointLocation", tmpDir("topk-docs-ckpt")).start()
    try {
      // stream the corpus document-by-document in 3 uneven batches;
      // both sides drop empty tokens (Java split(" ") trims trailing
      // empties while SQL split keeps them — tokenize identically or a
      // trailing space in the fixture makes a phantom '' token)
      docs.grouped(math.max(1, docs.length / 3)).foreach { g =>
        in.addData(
          g.flatMap(_.getString(1).split(" ")).filter(_.nonEmpty).toSeq: _*)
        q.processAllAvailable()
      }
      val streamed = StreamingTopK.topK(spark, state, 10).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(3)))
      val exact = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(10).collect()
        .map(r => (r.getString(0), r.getLong(1), true))
      assert(streamed.toSeq == exact.toSeq)
    } finally q.stop()
  }

  test("st17c: kill-restart from the checkpoint replays without " +
      "double-counting (the versioned-state recovery contract)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val state = tmpDir("topk-restart")
    val ckpt = tmpDir("topk-restart-ckpt")
    val q1 = StreamingTopK.maintain(in.toDF().toDF("tok"), state, 50)
      .option("checkpointLocation", ckpt).start()
    in.addData(tokens(Seq.fill(10)("alpha")): _*)
    q1.processAllAvailable()
    q1.stop()
    // data added while DOWN; the restarted query replays it from the
    // checkpointed offset — the summary read is bounded to versions
    // below the replayed batch id, so nothing double-counts even if a
    // prior attempt had partially committed
    in.addData(tokens(Seq.fill(7)("alpha") ++ Seq.fill(4)("beta")): _*)
    val q2 = StreamingTopK.maintain(in.toDF().toDF("tok"), state, 50)
      .option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      val got = StreamingTopK.summary(spark, state).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("alpha" -> 17L, "beta" -> 4L), got.toString)
    } finally q2.stop()
  }
}
