package graft.queries

import org.apache.spark.sql.Row

import graft.SparkSpec

/** End-to-end invariance gates for q_basket_triples' DENSITY-RELATIVE
  * support floor (minSup = max(2, ⌊2·mean pair support⌋)) under
  * catalog-fixed K× replication — the construction SCALE.md §9.23
  * claims. Two regimes, both exercised through the REAL query over
  * written parquet dirs (no reimplementation of the floor):
  *
  *  1. EXACT-EQUALITY regime (mean m < 1 + 1/(2K)): the replicated
  *     corpus's surviving triples are the base triples with supports
  *     scaled exactly K×. This is the regime the sf0.1 fixture sits in
  *     at 10×/30× (m = 1.0165).
  *  2. ONE-UNIT bound (any m): the replicated cut in base-support
  *     units is ⌈⌊2Km⌋/K⌉ ∈ {⌊2m⌋, ⌊2m⌋+1}, so the replica survivor
  *     set is sandwiched between base survivors at floor f and at
  *     f+1 — and support-1 itemsets can NEVER be admitted (mean ≥ 1),
  *     which is the fixed-floor keep-everything collapse the design
  *     exists to prevent.
  */
class AprioriFloorSpec extends SparkSpec {

  import spark.implicits._

  /** Write a minimal (lineitem, orders) pair the query reads; baskets
    * are per-customer part lists, one order per (customer, order idx). */
  private def writeDir(baskets: Map[Long, Seq[Seq[Long]]], k: Int): String = {
    val d = tmpDir("apriori")
    val rows = for {
      r <- 0 until k
      (cust, orders) <- baskets.toSeq
      (parts, oi) <- orders.zipWithIndex
      shift = r.toLong * 1000000L
    } yield (cust + shift, cust * 1000 + oi + shift * 1000, parts)
    rows.flatMap { case (_, ok, parts) => parts.map(p => (ok, p)) }
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    rows.map { case (ck, ok, _) => (ok, ck) }
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  private def triples(dir: String): Seq[(Long, Long, Long, Long)] =
    graft.SparkEntry.queries("q_basket_triples")(spark, dir)
      .collect().map { r: Row =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }.toSeq

  // base corpus, mean pair support ~1.3 (< 1 + 1/(2·3)): customers
  // 1-2 share the {1,2,3} triple (support 2), others add tail pairs
  private val sparse = Map[Long, Seq[Seq[Long]]](
    1L -> Seq(Seq(1L, 2L, 3L, 10L)),
    2L -> Seq(Seq(1L, 2L, 3L, 11L)),
    3L -> Seq(Seq(4L, 5L, 12L)),
    4L -> Seq(Seq(6L, 7L, 13L)),
    5L -> Seq(Seq(8L, 9L, 14L)),
    6L -> Seq(Seq(15L, 16L, 17L)),
    7L -> Seq(Seq(18L, 19L, 20L)))

  test("exact-equality regime: K-replication scales surviving triple " +
      "supports by exactly K and changes nothing else") {
    val base = triples(writeDir(sparse, 1))
    assert(base.nonEmpty, "fixture must produce at least one triple")
    assert(base.contains((1L, 2L, 3L, 2L)), s"expected (1,2,3)x2 in $base")
    val rep = triples(writeDir(sparse, 3))
    assert(rep == base.map { case (a, b, c, s) => (a, b, c, 3 * s) },
      s"replica != base x3:\nbase $base\nrep  $rep")
  }

  test("floor multiplier knob: -Dgraft.triples.floorMult raises the cut " +
      "operably, the default output is unchanged, and replication " +
      "invariance holds at the second multiplier too") {
    // at mult 2 the sparse fixture's floor is max(2, ⌊2·~1.3⌋) = 2 and
    // the {1,2,3} triple (support 2) survives; at mult 4 the floor is
    // ⌊4·1.3⌋ = 5 > 2 and the triple drops — the knob bites
    val dir = writeDir(sparse, 1)
    val byDefault = triples(dir)
    assert(byDefault.contains((1L, 2L, 3L, 2L)))
    try {
      sys.props("graft.triples.floorMult") = "4"
      assert(triples(dir).isEmpty,
        "mult 4 must cut the support-2 triple on the sparse fixture")
      // invariance is multiplier-independent: under K× replication the
      // mult-4 cut scales with density exactly like the mult-2 cut —
      // here both scales yield the same (empty) survivor set
      assert(triples(writeDir(sparse, 3)).isEmpty,
        "mult-4 replica admitted a triple the base cut rejected")
      // dense fixture at mult 4: floor ⌊4·1.95⌋ = 7 keeps nothing at
      // base (max support 5); replicas must agree (⌈⌊4mK⌋/K⌉ ≥ ⌊4m⌋)
      val denseDir = writeDir(dense, 1)
      val baseM4 = triples(denseDir).map { case (a, b, c, _) => (a, b, c) }
      for (k <- Seq(2, 3)) {
        val repM4 = triples(writeDir(dense, k))
          .map { case (a, b, c, _) => (a, b, c) }
        assert(repM4.toSet.subsetOf(baseM4.toSet),
          s"K=$k mult=4: replica admitted a non-base survivor")
      }
    } finally sys.props -= "graft.triples.floorMult"
    assert(triples(dir) == byDefault, "default output changed by the knob")
  }

  // mean pair support 39/20 = 1.95 → base floor ⌊3.9⌋ = 3; across
  // K ∈ {2,3,5} the effective cut in base units is 4 (⌈⌊3.9K⌋/K⌉), so
  // the AT-floor survivor (1,2,4) (support 3) drops while the floor+1
  // survivor (1,2,3) (support 5) persists — the one-unit bite, live
  private val dense = Map[Long, Seq[Seq[Long]]](
    (1L to 5L).map(c => c -> Seq(Seq(1L, 2L, 3L))) ++
      (6L to 8L).map(c => c -> Seq(Seq(1L, 2L, 4L))) ++
      Seq(9L -> Seq(Seq(5L, 6L, 7L))) ++ // support-1: must NEVER survive
      (0 to 11).map(i =>
        (10L + i) -> Seq(Seq(100L + 2 * i, 101L + 2 * i))): _*)

  test("dense regime: the replicated cut stays within one base-support " +
      "unit and never admits support-1 itemsets") {
    val base = triples(writeDir(dense, 1))
    val supports = base.map { case (a, b, c, s) => (a, b, c) -> s }.toMap
    assert(supports.nonEmpty && supports.values.forall(_ >= 2))
    for (k <- Seq(2, 3, 5)) {
      val rep = triples(writeDir(dense, k))
        .map { case (a, b, c, s) => (a, b, c) -> s }.toMap
      // supports of survivors scale exactly Kx
      rep.foreach { case (t, s) =>
        assert(supports.contains(t) && s == k * supports(t),
          s"K=$k: $t support $s not ${k}x a base survivor")
      }
      // one-unit sandwich: everything the base kept at floor+1 survives
      val baseFloorPlus = supports.filter(_._2 >= supports.values.min + 1)
      assert(baseFloorPlus.keySet.subsetOf(rep.keySet),
        s"K=$k: replica dropped a base floor+1 survivor")
      // the scale trap is impossible: (5,6,7) has support 1 at base
      assert(!rep.contains((5L, 6L, 7L)),
        s"K=$k: support-1 triple admitted — the fixed-floor collapse")
    }
  }
}
