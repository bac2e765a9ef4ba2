package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property pins for the round-13 evaluation harnesses (the
  * q_weighted_median / graph-metric recipe): each metric recomputed by
  * an INDEPENDENT naive in-test implementation from the raw scored
  * rows, so the distributed integer formulations can't drift from the
  * textbook definitions they cite. The oracle gate proves Spark ==
  * DuckDB; these prove both == the definition.
  */
class EvalMetricsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_eval_mrr equals a naive reciprocal-rank over the collected " +
      "BM25 ranking, and is non-vacuous (some query has a relevant hit)") {
    val hits = TextQueries.bm25Hits(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val nTerms = TextQueries.bm25QueryTerms.groupBy(_._1)
      .map { case (q, ts) => q -> ts.size.toLong }
    val naive = hits.groupBy(_._1).toSeq.sortBy(_._1).map { case (q, hs) =>
      val ranked = hs.sortBy(h => (-h._4, h._2)).take(20)
      val rel = ranked.zipWithIndex
        .filter { case (h, _) => h._3 == nTerms(q) }
      val nRel = rel.size.toLong
      val first = rel.headOption.map(_._2 + 1L).getOrElse(0L)
      val rr = if (first > 0) 1000000L / first else 0L
      (q.toLong, nRel, first, rr)
    }
    val mrr = (naive.map(_._4).sum + naive.size / 2) / naive.size
    val expected = naive :+ ((0L, naive.map(_._2).sum, 0L, mrr))
    val got = graft.SparkEntry.queries("q_eval_mrr")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected.sortBy(_._1))
    assert(got.exists(r => r._1 > 0 && r._4 > 0),
      "vacuity: no query found a relevant doc in its top-20")
  }

  test("q_eval_ndcg equals a naive graded-DCG with the same integer " +
      "discount table, and tracks the true-log2 NDCG within 50 micro") {
    val disc = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
      356207L, 333333L, 315465L, 301030L, 289065L)
    val full = TextQueries.bm25Hits(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expected = full.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (q, hs) =>
        val byScore = hs.sortBy(h => (-h._4, h._2)).take(10)
        val byGain = hs.sortBy(h => (-h._3, h._2)).take(10)
        val dcg = byScore.zipWithIndex.map { case (h, i) =>
          h._3 * disc(i) }.sum
        val idcg = byGain.zipWithIndex.map { case (h, i) =>
          h._3 * disc(i) }.sum
        (q.toLong, dcg, idcg, dcg * 1000000L / idcg)
    }
    val got = graft.SparkEntry.queries("q_eval_ndcg")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    // the fixed integer table vs a live log2: same metric to ~1e-5
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    full.groupBy(_._1).toSeq.sortBy(_._1).zip(got).foreach {
      case ((_, hs), g) =>
        val byScore = hs.sortBy(h => (-h._4, h._2)).take(10)
        val byGain = hs.sortBy(h => (-h._3, h._2)).take(10)
        val dcg = byScore.zipWithIndex.map { case (h, i) =>
          h._3 / log2(i + 2.0) }.sum
        val idcg = byGain.zipWithIndex.map { case (h, i) =>
          h._3 / log2(i + 2.0) }.sum
        assert(math.abs(dcg / idcg * 1e6 - g._4) < 50.0,
          s"query ${g._1}: integer-table NDCG drifted from true log2")
    }
    assert(got.forall(r => r._4 > 0L && r._4 <= 1000000L),
      "NDCG out of (0, 1] — ranking or discount table broken")
  }

  test("q_eval_calibration equals a naive binning of the collected " +
      "scores; ECE is the n-weighted mean gap; bins stay in [0, 9]") {
    val scored = TextQueries.aucScored(
      graft.Tables.load(spark, dir, "documents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = scored.groupBy(s =>
        (s._1, math.max(0L, math.min(9L, Math.floorDiv(s._2, 100000L)))))
      .toSeq.map { case ((ev, bin), rows) =>
        val n = rows.length.toLong
        val ssc = rows.map(_._2).sum
        val nPos = rows.map(_._3).sum
        // positive-shifted half-up mean, as shipped
        val mean = (ssc + n * 1000000000L + n / 2) / n - 1000000000L
        val rate = (nPos * 1000000L + n / 2) / n
        (ev, bin, n, nPos, mean, rate, math.abs(mean - rate))
      }
    val ece = expected.groupBy(_._1).map { case (ev, rows) =>
      ev -> rows.map(r => r._3 * r._7).sum / rows.map(_._3).sum }
    val want = expected.map(r => (r._1, r._2, r._3, r._4, r._5, r._6,
      r._7, ece(r._1))).sortBy(r => (r._1, r._2))
    val got = graft.SparkEntry.queries("q_eval_calibration")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    assert(got == want)
    assert(got.forall(r => r._2 >= 0L && r._2 <= 9L))
    // non-vacuity: the clamp must be exercised by a negative score
    assert(scored.exists(_._2 < 0L),
      "vacuity: no negative classifier score reached the clamp")
  }

  test("q_eval_mcnemar equals a naive paired-decision recount, the " +
      "2×2 table partitions the corpus, and the statistic matches the " +
      "textbook (b−c)²/(b+c) within one micro") {
    val rows = TextQueries.langidPredicted(
      graft.Tables.load(spark, dir, "documents"))
      .withColumn("cs",
        graft.functions.TextOps.classifier_scores(col("text")))
      .select(col("lang"), col("predicted"),
        (col("cs").getItem(1) + col("cs").getItem(2)).as("score"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val cells = rows.map { case (lang, pred, score) =>
      val truth = lang == "en"
      ((pred == "en") == truth, (score >= 0L) == truth)
    }
    val b = cells.count(c => c._1 && !c._2).toLong
    val c = cells.count(x => !x._1 && x._2).toLong
    val expected = (rows.length.toLong,
      cells.count(x => x._1 && x._2).toLong,
      cells.count(x => !x._1 && !x._2).toLong, b, c,
      if (b + c > 0) (b - c) * (b - c) * 1000000L / (b + c) else 0L)
    val got = graft.SparkEntry.queries("q_eval_mcnemar")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).head
    assert(got == expected)
    assert(got._2 + got._3 + got._4 + got._5 == got._1,
      "2×2 table must partition the corpus")
    val textbook = math.pow((b - c).toDouble, 2) / (b + c).toDouble
    assert(math.abs(textbook * 1e6 - got._6) <= 1.0,
      "statistic drifted from the textbook definition")
    assert(b + c > 0, "vacuity: no discordant pairs")
  }

  test("q_eval_map equals a naive AP@20 with the same two-stage " +
      "flooring, and differentiates the queries (not saturated)") {
    val nTerms = TextQueries.bm25QueryTerms.groupBy(_._1)
      .map { case (q, ts) => q -> ts.size.toLong }
    val full = TextQueries.bm25Hits(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val perQ = full.groupBy(_._1).toSeq.sortBy(_._1).map { case (q, hs) =>
      val ranked = hs.sortBy(h => (-h._4, h._2))
      val rels = ranked.map(h => if (h._3 == nTerms(q)) 1L else 0L)
      val nRel = rels.sum
      var relcnt = 0L
      var sumPrec = 0L
      var top20 = 0L
      ranked.zipWithIndex.foreach { case (_, i) =>
        if (rels(i) == 1L) {
          relcnt += 1
          if (i < 20) { top20 += 1; sumPrec += relcnt * 1000000L / (i + 1) }
        }
      }
      (q.toLong, nRel, top20, sumPrec / math.min(nRel, 20L))
    }
    val mapAll = (perQ.map(_._4).sum + perQ.size / 2) / perQ.size
    val expected = (perQ :+
      ((0L, perQ.map(_._2).sum, perQ.map(_._3).sum, mapAll)))
      .sortBy(_._1)
    val got = graft.SparkEntry.queries("q_eval_map")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    val aps = got.filter(_._1 > 0).map(_._4)
    assert(aps.max > aps.min, "vacuity: MAP does not differentiate")
    assert(aps.forall(a => a >= 0L && a <= 1000000L), "AP out of [0,1]")
  }

  test("q_eval_subgroup equals a naive per-(evaluator, source) " +
      "Mann-Whitney AUC over the collected scores; its evaluator-level " +
      "aggregation base matches q_eval_auc's inputs") {
    val scored = TextQueries.aucScoredKeyed(
      graft.Tables.load(spark, dir, "documents"), Seq("source"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    def naiveAuc(rows: Seq[(Long, Long)]): Option[(Long, Long, Long)] = {
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      if (pos.isEmpty || neg.isEmpty) None
      else {
        // U statistic with half-credit ties, in exact halves
        val u2 = pos.map(p => 2L * neg.count(_ < p) +
          neg.count(_ == p)).sum
        Some((pos.length.toLong, neg.length.toLong,
          u2 * 500000L / (pos.length.toLong * neg.length.toLong)))
      }
    }
    val expected = scored.groupBy(s => (s._1, s._2)).toSeq
      .flatMap { case ((ev, src), rows) =>
        naiveAuc(rows.map(r => (r._3, r._4)).toSeq)
          .map { case (np, nn, auc) => (ev, src, np, nn, auc) }
      }.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("q_eval_subgroup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "vacuity: no non-degenerate slices")
    // slices must genuinely disagree somewhere, or slicing adds nothing
    val byEval = got.groupBy(_._1)
    assert(byEval.values.exists(rows =>
      rows.map(_._5).max - rows.map(_._5).min > 10000L),
      "vacuity: all slices within 0.01 AUC of each other")
  }

  test("q_eval_confusion equals a naive confusion matrix from the " +
      "collected langid predictions; identities tp+fn == n_labeled, " +
      "tp+fp == n_predicted, Σtp ≤ Σn hold") {
    val pred = TextQueries.langidPredicted(
      graft.Tables.load(spark, dir, "documents"))
      .select(col("labeled"), col("predicted"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val classes = (pred.map(_._1) ++ pred.map(_._2)).distinct.sorted
    val n = pred.length.toLong
    val expected = classes.map { c =>
      val tp = pred.count(p => p._1 == c && p._2 == c).toLong
      val nl = pred.count(_._1 == c).toLong
      val np = pred.count(_._2 == c).toLong
      def safe(num: Long, den: Long) = if (den > 0) num / den else 0L
      (c, nl, np, tp, np - tp, nl - tp,
        safe(tp * 1000000L, np), safe(tp * 1000000L, nl),
        safe(tp * 2000000L, nl + np),
        pred.count(p => p._1 == p._2).toLong * 1000000L / n)
    }.toSeq
    val got = graft.SparkEntry.queries("q_eval_confusion")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9))).toSeq
    assert(got == expected)
    assert(got.map(_._4).sum <= n, "Σtp exceeds the corpus")
    assert(got.exists(_._4 > 0L), "vacuity: zero true positives")
  }
}
