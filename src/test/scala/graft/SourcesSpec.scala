package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Source/sink inventory beyond parquet (SURVEY §2.4a): CSV, JSON, rate
  * (load-gen), plus plan-shape assertions (broadcast hint) and the spark.ml
  * MinHashLSH alternative for near-dup (SURVEY Q34/near-dup note).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("CSV and JSON sources round-trip") {
    val dir = tmpDir("graft-src")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v")
    df.write.option("header", "true").csv(s"$dir/csv")
    df.write.json(s"$dir/json")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/csv").orderBy("k")
    val json = spark.read.json(s"$dir/json").select("k", "s", "v").orderBy("k")
    assert(csv.collect().map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(json.collect().map(_.getDouble(2)).toSeq == Seq(1.5, 2.5))
  }

  test("DSv2 lineprotocol source: per-field fan-out, typed values, " +
      "permissive errors, column pruning") {
    val dir = tmpDir("graft-lp")
    Files.write(Paths.get(dir, "a.lp"), java.util.List.of(
      "cpu,host=web1 usage=0.64,n=7i 1700000000000000000",
      "mem,host=web2 s=\"x\",up=true",
      "not a line"))
    val df = spark.read.format("lineprotocol").load(dir)
    assert(df.schema == graft.sources.LineProtocolSource.schema)
    val rows = df.collect()
    assert(rows.length == 5) // 2 + 2 fields fanned out + 1 error row
    val byName = rows.filter(_.getAs[String]("parse_error") == null)
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(byName("usage").getAs[Double]("value") == 0.64)
    assert(byName("n").getAs[Long]("value_long") == 7L)
    assert(byName("n").getAs[Long]("time_ns") == 1700000000000000000L)
    assert(byName("s").getAs[String]("value_str") == "x")
    assert(byName("up").getAs[Boolean]("value_bool") == true)
    assert(byName("usage").getAs[Map[String, String]]("tags") ==
      Map("host" -> "web1"))
    assert(rows.exists(r => r.getAs[String]("parse_error") != null))
    // column pruning reaches the scan: the pruned read schema is visible
    // in the physical plan's scan description
    val pruned = df.select(col("series"), col("name"))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("columns=series,name"), scan)
    // and SQL over the source works end-to-end
    df.createOrReplaceTempView("lp_src")
    assert(spark.sql(
      "SELECT count(*) AS n FROM lp_src WHERE parse_error IS NULL")
      .head().getLong(0) == 4L)
  }

  test("DSv2 lineprotocol source splits large files at newline boundaries " +
      "into multiple partitions with no lost or duplicated lines") {
    val dir = tmpDir("graft-lp-split")
    // ~1000 lines, distinct values so loss/duplication is detectable
    val lines = (0 until 1000).map(i =>
      s"cpu,host=h${i % 7} usage=$i.5 17000000${"%02d".format(i % 100)}000000000")
    Files.write(Paths.get(dir, "big.lp"), lines.asJava)
    def read(opts: Map[String, String]) = {
      val r = spark.read.format("lineprotocol")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(dir).filter(col("parse_error").isNull)
    }
    val whole = read(Map.empty)
    assert(whole.rdd.getNumPartitions == 1)
    // tiny splitSize: the one file becomes many newline-aligned chunks
    val split = read(Map("splitSize" -> "2048"))
    assert(split.rdd.getNumPartitions > 10,
      s"expected many chunks, got ${split.rdd.getNumPartitions}")
    val wholeVals = whole.select("value").collect().map(_.getDouble(0)).sorted
    val splitVals = split.select("value").collect().map(_.getDouble(0)).sorted
    assert(splitVals.length == 1000)
    assert(splitVals.toSeq == wholeVals.toSeq,
      "chunked read lost or duplicated lines")
  }

  test("DSv2 lineprotocol source pushes series/name equality into the " +
      "reader: non-matching lines skip the full parse") {
    val dir = tmpDir("graft-lp-push")
    Files.write(Paths.get(dir, "mix.lp"), java.util.List.of(
      "cpu,host=a usage=0.1,n=1i",
      "mem,host=a used=0.7",
      "cpu,host=b usage=0.2,n=2i",
      "disk,host=a io=9.0",
      "not a line"))
    def filtered = spark.read.format("lineprotocol").load(dir)
      .filter(col("series") === "cpu")
    // correctness: exactly the cpu rows (2 lines x 2 fields)
    graft.sources.LineProtocolSource.linesParsed.set(0L)
    val rows = filtered.collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[String]("series") == "cpu"))
    // the skip really happened BEFORE parse: only the 2 cpu lines of the
    // 5 in the file were fully parsed
    assert(graft.sources.LineProtocolSource.linesParsed.get() == 2L,
      s"parsed ${graft.sources.LineProtocolSource.linesParsed.get()} lines")
    // pushed filters are visible on the scan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=["), s"no pushed filter in scan:\n$plan")
    // name pushdown drops non-matching fields, same residual-safe contract
    val byName = spark.read.format("lineprotocol").load(dir)
      .filter(col("name") === "usage")
    assert(byName.collect().map(_.getAs[Double]("value")).sorted.toSeq ==
      Seq(0.1, 0.2))
  }

  test("series pushdown lexes the measurement exactly like the parser: " +
      "leading whitespace and tab separators don't lose rows") {
    val dir = tmpDir("graft-lp-push-lex")
    // the full parser trims and splits on ' ' OR '\t' — the pushdown's
    // measurement lexer must agree or filtered scans silently drop rows
    Files.write(Paths.get(dir, "ws.lp"), java.util.List.of(
      "  cpu,host=a usage=0.1", // leading whitespace
      "cpu\tusage=0.2", // tab-separated segments
      "mem,host=a used=0.9"))
    // truth: no filter in the plan at all → nothing pushed to the reader
    val truth = spark.read.format("lineprotocol").load(dir).collect()
      .filter(r => r.getAs[String]("series") == "cpu")
    val pushed = spark.read.format("lineprotocol").load(dir)
      .filter(col("series") === "cpu").collect()
    assert(truth.length == 2 && pushed.length == truth.length,
      s"pushdown dropped rows: truth ${truth.length}, pushed ${pushed.length}")
  }

  test("DSv2 lineprotocol source streams a spool dir: new files per " +
      "micro-batch, checkpoint restart without reprocessing") {
    val dir = tmpDir("graft-lp-stream")
    val ckpt = tmpDir("graft-lp-ckpt")
    def addFile(n: Int, lines: String*): Unit = {
      // gateway contract: write hidden tmp, atomic-rename visible
      val tmp = Paths.get(dir, s".batch-$n.txt.tmp")
      Files.write(tmp, String.join("\n", lines: _*).getBytes)
      Files.move(tmp, Paths.get(dir, s"batch-$n.txt"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val out = tmpDir("graft-lp-out")
    addFile(1, "cpu,host=a v=1.0 1700000000000000000")
    def start() = spark.readStream.format("lineprotocol").load(dir)
      .filter(col("parse_error").isNull)
      .select(col("series"), col("name"), col("value"))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").format("parquet").option("path", out).start()
    def sunk() = spark.read.parquet(out).collect()
    val q = start()
    try {
      q.processAllAvailable()
      assert(sunk().length == 1)
      addFile(2, "cpu,host=b v=2.0 1700000001000000000",
        "mem,host=b used=0.5,free=0.5 1700000001000000000")
      q.processAllAvailable()
      assert(sunk().length == 4) // 1 + 1 + 2-field fanout
    } finally q.stop()
    // restart from checkpoint: only the file added AFTER the stop is read
    addFile(3, "cpu,host=c v=3.0 1700000002000000000")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = sunk()
      assert(got.length == 5, s"restart lost/replayed rows: ${got.length}")
      assert(got.count(r => r.getString(0) == "cpu") == 3)
      assert(got.map(_.getDouble(2)).sorted.toSeq ==
        Seq(0.5, 0.5, 1.0, 2.0, 3.0))
    } finally q2.stop()
  }

  test("lineprotocol works as a SQL table (CREATE TABLE USING) and " +
      "reports its size to the planner (broadcast eligibility)") {
    val dir = tmpDir("graft-lp-ddl")
    Files.write(Paths.get(dir, "a.lp"), java.util.List.of(
      "cpu,host=a usage=0.5", "mem,host=b used=0.25"))
    // SQL DDL surface: the TableProvider serves CREATE TABLE ... USING
    spark.sql("DROP TABLE IF EXISTS lp_ddl")
    spark.sql(
      s"CREATE TABLE lp_ddl USING lineprotocol OPTIONS (path '$dir')")
    try {
      val rows = spark.sql(
        "SELECT series, name, value FROM lp_ddl WHERE parse_error IS NULL")
        .collect()
      assert(rows.map(_.getString(0)).sorted.toSeq == Seq("cpu", "mem"))
      // the scan reports file-size statistics, so a join against it can
      // plan as a broadcast without hints or conf overrides
      val joined = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
        .join(spark.table("lp_ddl").filter(col("parse_error").isNull)
          .select(col("series"), col("value").as("lp_v")),
          col("event_type") === col("series"), "left")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"small lineprotocol table not broadcast:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS lp_ddl")
  }

  test("bounded streaming offsets never lose a backlog: files older than " +
      "the lag window behind the NEWEST mtime still ingest (floor anchor)") {
    val dir = tmpDir("graft-lp-backlog")
    val ckpt = tmpDir("graft-lp-backlog-ckpt")
    val out = tmpDir("graft-lp-backlog-out")
    def addFile(n: Int, ageMs: Long, line: String): Unit = {
      val p = Paths.get(dir, s"f-$n.txt")
      Files.write(p, line.getBytes)
      Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() - ageMs))
    }
    // a 1s lag window, and a backlog file 60s OLDER than the fresh one:
    // an offset windowed against the newest mtime would drop it silently;
    // windowing against the committed floor (0 on first start) keeps it
    addFile(1, 60000, "cpu,host=old v=1.0")
    addFile(2, 0, "cpu,host=new v=2.0")
    val q = spark.readStream.format("lineprotocol")
      .option("spoolLagMs", "1000").load(dir)
      .filter(col("parse_error").isNull)
      .select(col("series"), col("tags")("host").as("host"), col("value"))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").format("parquet").option("path", out).start()
    try {
      q.processAllAvailable()
      val hosts = spark.read.parquet(out).collect()
        .map(_.getAs[String]("host")).sorted.toSeq
      assert(hosts == Seq("new", "old"),
        s"backlog file lost by the offset window: got $hosts")
    } finally q.stop()
  }

  test("legacy (pre-upgrade) offsets replay with real lengths: an " +
      "uncommitted legacy batch re-reads its files instead of planning " +
      "zero-length partitions and losing them") {
    import graft.sources.{LineProtocolInputPartition, LineProtocolOffset, LineProtocolScanBuilder}
    val dir = tmpDir("graft-lp-legacy")
    val p = Paths.get(dir, "f-legacy.txt")
    Files.write(p, "cpu,host=a v=1.0\ncpu,host=b v=2.0\n".getBytes)
    // the old unbounded offset format was a bare JSON array of file names
    val legacy = LineProtocolOffset.fromJson(s"""["${p.toString}"]""")
    assert(legacy.recent.head._3 == -1L,
      "legacy entries must deserialize with UNKNOWN (-1) length, " +
        "not 0 — zero would plan an empty read and mark the file seen")
    val stream = new LineProtocolScanBuilder(dir, 16L * 1024 * 1024, 1000L,
      spark).build().toMicroBatchStream(tmpDir("graft-lp-legacy-ckpt"))
    // replay of an uncommitted pre-upgrade batch: start is a fresh
    // initial offset, end is the legacy offset restored from checkpoint
    val parts = stream.planInputPartitions(stream.initialOffset(), legacy)
    val planned =
      parts.map(_.asInstanceOf[LineProtocolInputPartition].length).sum
    assert(planned == Files.size(p),
      s"legacy replay planned $planned bytes, expected ${Files.size(p)}")
  }

  test("rate source generates load (streaming load-gen)") {
    val q = spark.readStream.format("rate").option("rowsPerSecond", "500")
      .load()
      .writeStream.format("memory").queryName("rate_out").start()
    val deadline = System.currentTimeMillis() + 15000
    while (spark.table("rate_out").isEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(200)
    q.stop()
    assert(!spark.table("rate_out").isEmpty)
  }

  test("broadcast hint is honored in the physical plan (q07)") {
    val plan = SparkEntry.queries("q07_inner_join")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("time-range filter pushes down to the parquet scan (q02)") {
    val ex = SparkEntry.queries("q01_scan_projection")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // strict: the scan must read EXACTLY the 4 projected columns
    assert(ex.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double>"),
      s"column pruning missing:\n$ex")
    val q4 = SparkEntry.queries("q04_predicates")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(q4.contains("PushedFilters: [Or("), s"no pushed filters in:\n$q4")
  }

  test("spark.ml MinHashLSH finds planted near-duplicates") {
    import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH, Tokenizer}
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and once"), // near-dup of 0
      (2L, "completely different content about spark catalyst optimizer rules"),
      (3L, "unrelated words concerning parquet column pruning and pushdown"))
      .toDF("id", "text")
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val words = tok.transform(docs)
    val cv = new CountVectorizer().setInputCol("words").setOutputCol("features")
      .setBinary(true).fit(words)
    val vecs = cv.transform(words)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
    val model = lsh.fit(vecs)
    val pairs = model.approxSimilarityJoin(vecs, vecs, 0.5, "dist")
      .filter(col("datasetA.id") < col("datasetB.id"))
      .select(col("datasetA.id"), col("datasetB.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"planted pair not found: $pairs")
    assert(!pairs.contains((2L, 3L)))
  }
}
