package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property pins for the round-13 layout/pacing operators: invariants
  * that must hold by construction, recomputed from the raw tables so
  * the distributed formulations can't drift from their definitions.
  */
class LayoutQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_curriculum: stages partition the corpus exactly (Σn == N, " +
      "sizes differ by ≤ 1), budgets telescope, and quality bands are " +
      "descending and non-overlapping") {
    val rows = graft.SparkEntry.queries("q_curriculum")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val n = graft.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_._1).toSeq == (1L to 10L), "stages must be 1..10")
    assert(rows.map(_._2).sum == n, "stage sizes must partition the corpus")
    // the (rank−1)·k div N split makes sizes differ by at most 1
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1L,
      s"equal-split violated: ${rows.map(_._2).toSeq}")
    // cum_chars telescopes the per-stage budgets
    assert(rows.scanLeft(0L)(_ + _._3).tail.toSeq == rows.map(_._6).toSeq)
    // easiest-first: stage s's band sits at or above stage s+1's
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 >= b._5,
        s"stage ${a._1} min ${a._4} below stage ${b._1} max ${b._5}")
    }
    // non-vacuity: quality actually varies across stages
    assert(rows.head._5 > rows.last._4,
      "vacuity: flat quality — the ordering is untested")
  }

  test("q_zone_maps: blocks partition events exactly, min ≤ max " +
      "within every block, the prune flag matches the block's own " +
      "max_ts, pruning is SOUND (no kept row hides in a pruned " +
      "block), and the skip share is the prunable fraction") {
    val rows = graft.SparkEntry.queries("q_zone_maps")(spark, dir)
      .collect()
    val ev = graft.Tables.load(spark, dir, "events")
    assert(rows.map(_.getLong(1)).sum == ev.count(),
      "block row counts must partition the table")
    val cut = java.time.LocalDateTime.parse("2024-01-20T00:00:00")
    rows.foreach { r =>
      // timestamp_ntz outputs surface as LocalDateTime
      val minS = r.getAs[java.time.LocalDateTime](2)
      val maxS = r.getAs[java.time.LocalDateTime](3)
      assert(!minS.isAfter(maxS),
        s"block ${r.getLong(0)}: min_ts > max_ts")
      assert(r.getLong(4) <= r.getLong(5),
        s"block ${r.getLong(0)}: min_value > max_value")
      val expectPrune = if (maxS.isBefore(cut)) 1L else 0L
      assert(r.getLong(6) == expectPrune,
        s"block ${r.getLong(0)}: prunable flag wrong")
    }
    val share = rows.map(_.getLong(6)).sum * 1000000L / rows.length
    assert(rows.forall(_.getLong(7) == share), "skip share mismatch")
    // SOUNDNESS — the property that makes a zone map an index, not a
    // report: no row matching the range scan may live in a pruned block
    val pruned = rows.filter(_.getLong(6) == 1L).map(_.getLong(0)).toSet
    val leaked = ev
      .filter(col("ts") >= lit("2024-01-20").cast("timestamp"))
      .select((col("event_id") / 512).cast("long").as("blk"))
      .collect().map(_.getLong(0)).toSet.intersect(pruned)
    assert(leaked.isEmpty, s"matching rows inside pruned blocks: $leaked")
    // the zone map must agree with a direct per-block recompute
    val direct = ev.groupBy((col("event_id") / 512).cast("long")
        .as("blk"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(direct(r.getLong(0)) == r.getLong(1),
        s"block ${r.getLong(0)}: count drifted from direct recompute")
    }
    // non-vacuity: the prune cut must split the blocks (some skip, some
    // survive) or the flag is untested
    assert(rows.exists(_.getLong(6) == 1L) && rows.exists(_.getLong(6) == 0L),
      "vacuity: prune cut does not split the blocks at this SF")
  }
}
