package graft.queries

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Gate for the q_basket_rules lift-headroom guard (r11 verdict item 4):
  * the int64 branch and the DECIMAL branch of JoinQueries.liftMicro must
  * compute the SAME half-up micro quotient wherever both are exact, the
  * DECIMAL branch must be exact where int64 would overflow, and the
  * design bound must fail loudly instead of clipping. Expected values
  * come from BigInt — arbitrary precision, no shared failure mode with
  * either branch. */
class BasketLiftSpec extends SparkSpec {

  import spark.implicits._

  /** floor((s_ab·N·2e6 + s_a·s_b) / (2·s_a·s_b)) in BigInt. */
  private def expected(sAb: Long, sA: Long, sB: Long, n: Long): Long =
    ((BigInt(sAb) * n * 2000000 + BigInt(sA) * sB) /
      (BigInt(sA) * sB * 2)).toLong

  private def run(rows: Seq[(Long, Long, Long)], n: Long): Map[(Long, Long, Long), Long] =
    rows.toDF("s_ab", "s_a", "s_b")
      .select(col("s_ab"), col("s_a"), col("s_b"),
        JoinQueries.liftMicro(col("s_ab"), col("s_a"), col("s_b"), n)
          .as("lift_micro"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap

  // supports with half-up boundary cases (s_ab·N·2e6 ≡ s_a·s_b mod 2·s_a·s_b)
  private val cases = Seq[(Long, Long, Long)](
    (1L, 1L, 1L), (2L, 3L, 5L), (7L, 7L, 11L), (40L, 123L, 457L),
    (999L, 1000L, 2000L), (1L, 2000000L, 2000000L),
    (1500000L, 1600000L, 1700000L))

  test("int64 branch (N ≤ 2e6) matches BigInt on boundary-heavy supports") {
    Seq(3L, 101L, 1999999L, 2000000L).foreach { n =>
      val got = run(cases.filter(c => c._1 <= n), n)
      got.foreach { case ((ab, a, b), v) =>
        assert(v == expected(ab, a, b, n),
          s"int64 branch: ($ab,$a,$b,N=$n) got $v")
      }
    }
  }

  test("DECIMAL branch (N > 2e6) is exact where the int64 formula would " +
      "overflow, and agrees with the int64 branch on shared inputs") {
    // N = 3e9 with s_ab = 2e9: the int64 numerator term is
    // 2e6·2e9·3e9 = 1.2e25 ≫ 2⁶³ — only the DECIMAL branch can do this
    val n = 3000000000L
    val big = Seq[(Long, Long, Long)](
      (2000000000L, 2500000000L, 2900000000L),
      (1L, 1L, 1L), (7L, 7L, 11L), (999L, 1000L, 2000L),
      (123456789L, 987654321L, 555555555L))
    val got = run(big, n)
    big.foreach { case (ab, a, b) =>
      assert(got((ab, a, b)) == expected(ab, a, b, n),
        s"decimal branch: ($ab,$a,$b) got ${got((ab, a, b))}")
    }
    // cross-branch agreement: same supports, N just under vs just over
    // the 2e6 switch — quotients computed by DIFFERENT arithmetic must
    // track the BigInt truth on both sides (already asserted above and
    // in the int64 test; this pins the switch point itself)
    val sw = Seq((40L, 123L, 457L))
    assert(run(sw, 2000000L)(sw.head) == expected(40L, 123L, 457L, 2000000L))
    assert(run(sw, 2000001L)(sw.head) == expected(40L, 123L, 457L, 2000001L))
  }

  test("the DECIMAL(12,0) design bound fails loudly, not by clipping") {
    val ex = intercept[IllegalArgumentException] {
      JoinQueries.liftMicro(col("a"), col("b"), col("c"), 1000000000000L)
    }
    assert(ex.getMessage.contains("DECIMAL(12,0) design bound"))
  }
}
