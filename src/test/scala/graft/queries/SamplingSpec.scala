package graft.queries

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Independent-definition pins for q_sample_systematic and
  * q_weighted_median (the GraphMetricsSpec posture): random fixtures,
  * naive in-test reference implementations over plain Seqs, and the
  * estimators' defining invariants — the oracle proves cross-engine
  * agreement, THIS proves the math.
  */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  /** Naive midpoint-systematic reference: direct rational comparison
    * per (midpoint, doc) pair — O(k·n), no closed form. */
  private def refHits(ws: Seq[Long], k: Long): Map[Int, Long] = {
    val tw = ws.sum
    var c0 = 0L
    val out = scala.collection.mutable.Map.empty[Int, Long]
    ws.zipWithIndex.foreach { case (w, i) =>
      val n = (0L until k).count(j =>
        2 * k * c0 <= (2 * j + 1) * tw && (2 * j + 1) * tw < 2 * k * (c0 + w))
      if (n > 0) out(i) = n.toLong
      c0 += w
    }
    out.toMap
  }

  test("systematic PPS: closed-form hit counts equal the direct " +
      "rational enumeration, sum to exactly k, and are proportional " +
      "to weight within 1") {
    val gen = Gen.choose(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 5000L)))
    for (i <- 0 until 60) {
      val ws = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val d = tmpDir(s"graft-sampling-$i")
      ws.zipWithIndex.map { case (w, j) => (j.toLong, "x", w) }
        .toDF("doc_id", "text", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      val got = graft.SparkEntry.queries("q_sample_systematic")(spark, d)
        .collect().map(r => r.getLong(0).toInt -> r.getLong(2)).toMap
      val ref = refHits(ws, 100L)
      assert(got == ref, s"seed $i: $got != $ref (ws=$ws)")
      assert(got.values.sum == 100L, s"seed $i: total hits != k")
      val tw = ws.sum.toDouble
      got.foreach { case (j, h) =>
        assert(math.abs(h - 100.0 * ws(j) / tw) <= 1.0 + 1e-9,
          s"seed $i doc $j: hits $h vs expectation ${100.0 * ws(j) / tw}")
      }
    }
  }

  /** Naive weighted median: expand each value w times, take the
    * element at the lower-median position of the expanded list. */
  private def refWeightedMedian(xs: Seq[(Long, Long)]): Long = {
    val expanded = xs.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
    expanded((expanded.size - 1) / 2) // smallest v with 2*cum >= W
  }

  test("weighted median: the 2·cum ≥ W rule equals the expanded-list " +
      "lower median on random fixtures") {
    val gen = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(100L, 999L), Gen.choose(1L, 9L))))
    for (i <- 0 until 60) {
      val xs = gen.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val d = tmpDir(s"graft-wmedian-$i")
      xs.zipWithIndex.map { case ((v, w), j) =>
        ("A", j.toLong, j.toLong, v / 100.0, w.toDouble)
      }.toDF("l_returnflag", "l_orderkey", "l_linenumber",
          "l_extendedprice", "l_quantity")
        .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
      val got = graft.SparkEntry.queries("q_weighted_median")(spark, d)
        .head()
      val ref = refWeightedMedian(xs)
      assert(got.getLong(1) === ref,
        s"seed $i: ${got.getLong(1)} != $ref (xs=$xs)")
      assert(got.getLong(2) === xs.map(_._2).sum, "total weight")
    }
  }
}
