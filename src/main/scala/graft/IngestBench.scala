package graft

import org.apache.spark.sql.SparkSession

import graft.engine.Engine

/** Ingest throughput: synthetic line-protocol batch through the full
  * parse -> explode -> partitioned-append pipeline (reference E3 path).
  * Prints one JSON line with lines/sec and rows/sec.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nLines = sys.env.getOrElse("SPARK_GRAFT_INGEST_LINES", "200000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = java.nio.file.Files.createTempDirectory("graft-ingest-bench")
    val engine = new Engine(spark, wh.toString)
    // 2 fields per line -> 2 rows per line; 8 series; 30 days of event time
    val base = 1700000000000000000L
    val lines = spark.range(nLines).map { i =>
      val day = i % 30
      s"series_${i % 8},host=h${i % 4},dc=dc${i % 2} cpu=${(i % 100) / 100.0},mem=${(i % 47) / 47.0} ${base + day * 86400000000000L + i}"
    }.toDF("value")
    lines.cache()
    lines.count() // materialize the source outside the timed section

    val mode = sys.env.getOrElse("SPARK_GRAFT_INGEST_MODE", "full")

    if (mode == "variants") {
      // BASELINE.md §Measured: same parse work through the three custom-
      // function surfaces, all ending in (series, name, value) rows into a
      // noop sink. One untimed warm-up each, then median of 3.
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.functions.{col, explode}
      graft.ingest.IngestPipeline.registerUdfs(spark)
      def mapPartitionsPlan: DataFrame =
        graft.ingest.IngestPipeline.parseAll(spark, lines)
          .select(col("series"), col("name"), col("value"))
      def exprPlan: DataFrame = lines
        .select(graft.functions.ParseLine.parse_line_expr(col("value")).as("r"))
        .select(col("r.measurement").as("series"), explode(col("r.fields")))
        .toDF("series", "name", "value")
      def udfPlan: DataFrame = lines
        .selectExpr("parse_line(value) AS r")
        .select(col("r._1").as("series"), explode(col("r._3")))
        .toDF("series", "name", "value")
      def time(df: => DataFrame): Double = {
        df.write.format("noop").mode("overwrite").save() // warm
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        ts(1)
      }
      val out = Seq(
        "mapPartitions" -> time(mapPartitionsPlan),
        "expression" -> time(exprPlan),
        "udf" -> time(udfPlan)
      ).map { case (k, s) =>
        s""""$k":{"sec":${math.round(s * 1000) / 1000.0},"lines_per_sec":${(nLines / s).toLong}}"""
      }.mkString(",")
      println(s"""{"metric":"parse_variants","lines":$nLines,$out}""")
      spark.stop()
      return
    }

    if (mode == "state") {
      // SCALE.md §10 evidence: the flatMapGroupsWithState family's
      // throughput AND state-store footprint, measured at two key
      // cardinalities (the batch family has §9 factors; the streaming
      // ops had fixpoint proofs but no measured state table). Per op ×
      // key count: K series × P points of globally-ordered synthetic
      // events through the real operator into a noop sink in 5 micro-
      // batches; rows/s from wall time, state rows from the query's own
      // StateOperatorProgress (numRowsTotal — what RocksDB would hold).
      // The claim under test: state rows == series count (O(1)/series,
      // row-count-independent) and rows/s roughly flat in K.
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import java.sql.Timestamp
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val baseKeys = sys.env.getOrElse("SPARK_GRAFT_STATE_KEYS", "2000").toInt
      val pts = sys.env.getOrElse("SPARK_GRAFT_STATE_POINTS", "40").toInt
      val t0us = 1700000000000000L
      def numRows(k: Int): Seq[(Long, Timestamp, Long, Double)] =
        (0 until pts).flatMap { p =>
          (0 until k).map { s =>
            // per-series sawtooth: monotone within a tooth, one counter
            // reset every 8 points (exercises rate's reset branch)
            val v = 1.0 + (p % 8) * 0.25 + (s % 7) * 0.01
            (s.toLong, new Timestamp((t0us + p * 1000000L) / 1000L),
              (p.toLong * k + s), v)
          }
        } // point-major: all series advance together, globally ordered
      def typedRows(k: Int): Seq[(Long, Timestamp, Long, String)] =
        (0 until pts).flatMap { p =>
          (0 until k).map { s =>
            // runs of 4 per type, phase-shifted per series
            val ty = "t" + (((p / 4) + s) % 3)
            (s.toLong, new Timestamp((t0us + p * 1000000L) / 1000L),
              (p.toLong * k + s), ty)
          }
        }
      def drive[T](op: String, k: Int, in: MemoryStream[T],
          out: org.apache.spark.sql.DataFrame, rows: Seq[T]): String = {
        val q = out.writeStream.outputMode("append").format("noop")
          .option("checkpointLocation", java.nio.file.Files
            .createTempDirectory(s"graft-state-$op").toString)
          .start()
        val n = rows.length
        val chunk = (n + 4) / 5
        val t0 = System.nanoTime()
        // stop in finally: a mid-measure failure must not leave the query
        // running against the shared session and skew later ops' readings
        val (sec, stateRows) =
          try {
            rows.grouped(chunk).foreach { c =>
              in.addData(c: _*)
              q.processAllAvailable()
            }
            ((System.nanoTime() - t0) / 1e9,
              Option(q.lastProgress).toSeq
                .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum)
          } finally q.stop()
        f""""$op@$k":{"keys":$k,"rows":$n,"sec":$sec%.3f,"rows_per_sec":${(n / sec).toLong},"state_rows":$stateRows}"""
      }
      // K sources × P docs for the kappa monitor (text drives the real
      // classifier expression; n_chars alternates around the rule cut)
      def docRows(k: Int): Seq[(String, String, Long)] =
        (0 until pts).flatMap { p =>
          (0 until k).map { s =>
            (s"src$s", s"tok${p % 5} word${s % 3} tok${(p + s) % 7}",
              (200L + (p * 37 + s) % 200))
          }
        }
      def measure(op: String, k: Int): String =
        if (op == "state_runs") {
          val in = MemoryStream[(Long, Timestamp, Long, String)]
          drive(op, k, in, graft.streaming.StreamingStateRuns.runs(
            in.toDF().toDF("user_id", "ts", "event_id", "event_type"))
            .toDF(), typedRows(k))
        } else if (op == "kappa") {
          val in = MemoryStream[(String, String, Long)]
          drive(op, k, in, graft.streaming.StreamingKappa.agreement(
            in.toDF().toDF("source", "text", "n_chars")).toDF(), docRows(k))
        } else {
          val in = MemoryStream[(Long, Timestamp, Long, Double)]
          val df = in.toDF().toDF("user_id", "ts", "event_id", "value")
          val ds = op match {
            case "ewma" => graft.streaming.StreamingEwma.smooth(df).toDF()
            case "holt_winters" =>
              graft.streaming.StreamingHoltWinters.smooth(df).toDF()
            case "welford" =>
              graft.streaming.StreamingWelford.moments(df).toDF()
            case "cusum" => graft.streaming.StreamingCusum
              .monitor(df, mu = 1.8, sigma = 0.6).toDF()
            case "rate" => graft.streaming.StreamingRate.rate(df).toDF()
            case "ols" => graft.streaming.StreamingOls.fit(df).toDF()
            case "changes" =>
              graft.streaming.StreamingChanges.counters(df).toDF()
            case "ar" => graft.streaming.StreamingAr.fit(df).toDF()
          }
          drive(op, k, in, ds, numRows(k))
        }
      val all = Seq("ewma", "holt_winters", "welford", "cusum", "rate",
        "state_runs", "ols", "changes", "kappa", "ar")
      val ops = sys.env.get("SPARK_GRAFT_STATE_OPS")
        .map(_.split(",").map(_.trim).toSeq).getOrElse(all)
      // fail loudly BEFORE measuring: a typo'd name would otherwise
      // MatchError after the valid ops' work is already done and lost
      val unknown = ops.toSet -- all.toSet
      require(unknown.isEmpty, s"SPARK_GRAFT_STATE_OPS names unknown " +
        s"ops: ${unknown.mkString(", ")}; choose from: ${all.mkString(", ")}")
      val parts = ops.flatMap { op =>
        Seq(measure(op, baseKeys), measure(op, baseKeys * 10))
      }
      println(s"""{"metric":"stream_state","points_per_series":$pts,${parts.mkString(",")}}""")
      spark.stop()
      return
    }

    if (mode == "topk") {
      // streaming heavy hitters: one Misra-Gries merge per micro-batch
      // is the entire stateful cost (SURVEY st17) — measure the merge
      // over a skewed token batch at ingest-sized volume. Zipfian-ish
      // skew: token id = i % (i % 997 + 1) clusters mass on small ids.
      import org.apache.spark.sql.functions.col
      val toks = spark.range(nLines)
        .selectExpr("concat('tok_', id % (id % 997 + 1)) AS tok")
      toks.cache(); toks.count()
      val state = java.nio.file.Files
        .createTempDirectory("graft-topk-bench").toString
      def once(prev: org.apache.spark.sql.DataFrame, prevTotal: Long)
          : Double = {
        val t0 = System.nanoTime()
        val (rows, _) = graft.streaming.StreamingTopK.merge(
          prev, prevTotal, toks, 1000)
        assert(rows.nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }
      val empty = graft.streaming.StreamingTopK.summary(spark, state)
      once(empty, 0L) // warm
      val secs = (1 to 3).map(_ => once(empty, 0L)).sorted
      val s = secs(1)
      println(f"""{"metric":"topk_merge","tokens":$nLines,"sec":$s%.3f,"tokens_per_sec":${(nLines / s).toLong}}""")
      spark.stop()
      return
    }

    if (mode == "phash") {
      // perceptual-hash throughput: N synthetic PNGs (generated once,
      // cached) through the REAL decode+dHash mapPartitions pass, then
      // the banded Hamming self-join over the resulting hashes. Each
      // even image is a structurally distinct stripe pattern (frequency
      // pair keyed by the image id — adjacent-column comparisons see
      // different structures, not a shifted copy); each odd image is a
      // one-pixel edit of its predecessor → ~N/2 honest near-dup pairs.
      val nImg = sys.env.getOrElse("SPARK_GRAFT_PHASH_IMAGES", "20000").toInt
      val items = spark.range(nImg).map { i =>
        val base = (i - (i % 2)).toInt // odd i edits pattern of i-1
        val (fx, fy) = (base % 97 + 1, (base / 97) % 89 + 1)
        val img = new java.awt.image.BufferedImage(
          48, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 48) {
            val v = (x * fx + y * fy) % 256
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        if (i % 2 == 1) // the edit: one pixel keyed by i
          img.setRGB((i % 48).toInt, (i % 32).toInt, 0xffffff)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        graft.multimodal.MediaItem(i, bos.toByteArray, "image/png",
          bos.size().toLong)
      }
      items.cache(); items.count() // generation outside the timed section
      def once(): (Double, Double, Long) = {
        val t0 = System.nanoTime()
        val hashes = graft.multimodal.Multimodal.imageHashes(items)
        hashes.cache()
        assert(hashes.count() == nImg)
        val tHash = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val pairs = graft.multimodal.Multimodal.imageNearDups(hashes).count()
        val tJoin = (System.nanoTime() - t1) / 1e9
        hashes.unpersist()
        (tHash, tJoin, pairs)
      }
      once() // warm
      val runs = (1 to 3).map(_ => once())
      val (th, tj, pairs) = runs.sortBy(_._1).apply(1)
      println(f"""{"metric":"phash","images":$nImg,"hash_sec":$th%.3f,"images_per_sec":${(nImg / th).toLong},"join_sec":$tj%.3f,"near_dup_pairs":$pairs}""")
      spark.stop()
      return
    }

    val t0 = System.nanoTime()
    val parsed = graft.ingest.IngestPipeline.parseLines(spark, lines)
    if (mode == "parse") parsed.write.format("noop").mode("overwrite").save()
    else engine.writeBatch(parsed, "bench") // the REAL production write path
    val sec = (System.nanoTime() - t0) / 1e9

    val rows = engine.table().count()
    println(f"""{"metric":"ingest","lines":$nLines,"rows":$rows,"sec":$sec%.3f,"lines_per_sec":${(nLines / sec).toLong},"rows_per_sec":${(rows / sec).toLong}}""")
    spark.stop()
  }
}
