package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property gate for the Count-Min sketch: the one-sided guarantee
  * (estimate ≥ true count, always) and the mergeability identity
  * (sketch(A ⊎ B) = sketch(A) + sketch(B) bucket-wise — the property
  * st37's streaming merge rides on) over arbitrary key multisets, not
  * just the lineitem fixture the oracle checks.
  */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  /** Local reference build: same hash family, plain scala Map. */
  private def refSketch(keys: Seq[Long]): Map[(Int, Long), Long] =
    keys.flatMap(k => CountMin.hashes.map { case (d, a, b) =>
      (d, (k * a + b) % CountMin.P % CountMin.W)
    }).groupBy(identity).map { case (kk, v) => kk -> v.length.toLong }

  private val keyBag: Gen[Seq[Long]] = for {
    n <- Gen.choose(1, 400)
    // skewed domain: heavy hitters + a long tail, keys up to replica
    // magnitudes (3e7) so the no-overflow bound is exercised
    ks <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.choose(0L, 9L),
      2 -> Gen.choose(0L, 999L),
      1 -> Gen.choose(0L, 30_000_000L)))
  } yield ks

  test("property: the Spark sketch equals the reference build and every " +
      "estimate dominates the true count") {
    (1 to 8).foreach { i =>
      val keys = keyBag.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val df = keys.toDF("k")
      val got = CountMin.sketch(df, "k").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == refSketch(keys), s"seed $i: sketch != reference")
      val trueCnt = keys.groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong }
      val probes = trueCnt.keys.toSeq.toDF("k")
      val est = CountMin.estimate(CountMin.sketch(df, "k"), probes, "k")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      trueCnt.foreach { case (k, c) =>
        assert(est(k) >= c, s"seed $i: CMS under-estimated $k: ${est(k)} < $c")
      }
    }
  }

  test("never-seen probe keys estimate over ALL depths (empty bucket = 0), " +
      "and keys with every bucket empty report 0 instead of vanishing") {
    val keys = Seq(1L, 2L, 3L, 1L, 2L, 1L) // tiny: most buckets empty
    val sketch = CountMin.sketch(keys.toDF("k"), "k")
    val ref = refSketch(keys)
    // probe the in-data keys AND a spread of never-seen ones
    val probeKeys = keys.distinct ++ Seq(999L, 123456L, 29_999_999L)
    val est = CountMin.estimate(sketch, probeKeys.toDF("k"), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == probeKeys.toSet,
      "every probe key must appear in the output")
    probeKeys.foreach { k =>
      val expected = CountMin.hashes.map { case (d, a, b) =>
        ref.getOrElse((d, (k * a + b) % CountMin.P % CountMin.W), 0L)
      }.min
      assert(est(k) == expected,
        s"probe $k: got ${est(k)}, want min-over-all-depths $expected")
    }
    // with a 6-element multiset over 3×1024 buckets, the never-seen keys
    // must hit at least one empty bucket → exact 0, the CMS semantics
    Seq(999L, 123456L, 29_999_999L).foreach(k => assert(est(k) == 0L))
  }

  test("property: sketches merge — sketch(A ++ B) is the bucket-wise sum " +
      "of sketch(A) and sketch(B)") {
    (1 to 5).foreach { i =>
      val a = keyBag.pureApply(Gen.Parameters.default, Seed(100L + i))
      val b = keyBag.pureApply(Gen.Parameters.default, Seed(200L + i))
      val sa = refSketch(a)
      val sb = refSketch(b)
      val merged = (sa.keySet ++ sb.keySet).map(k =>
        k -> (sa.getOrElse(k, 0L) + sb.getOrElse(k, 0L))).toMap
      val whole = CountMin.sketch((a ++ b).toDF("k"), "k").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(whole == merged, s"seed $i: merge identity broken")
    }
  }
}
