package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property pins for the round-13 third-wave advisories: the
  * cardinality profile is checked against the JOINS IT PREDICTS
  * (actually executed at fixture scale), and the rank correlation
  * against a naive textbook Kendall tau. */
class AdvisorySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_join_cardinality's out_rows equals the real count(*) of both " +
      "profiled joins, and the straggler bound is attained by some key") {
    val got = graft.SparkEntry.queries("q_join_cardinality")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    val orders = graft.Tables.load(spark, dir, "orders")
    val li = graft.Tables.load(spark, dir, "lineitem")
    val realOl = orders.join(li,
      col("o_orderkey") === col("l_orderkey")).count()
    val a = li.select(col("l_partkey").as("pa"))
    val b = li.select(col("l_partkey").as("pb"))
    val realSelf = a.join(b, col("pa") === col("pb")).count()
    assert(got("orders_lineitem_orderkey")._4 == realOl,
      "predicted orders⋈lineitem size != executed size")
    assert(got("lineitem_self_partkey")._4 == realSelf,
      "predicted self-join size != executed size")
    // the straggler bound is real: some key's product hits max_key_rows
    val maxKey = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .agg(max(col("c") * col("c"))).head().getLong(0)
    assert(got("lineitem_self_partkey")._5 == maxKey)
    // non-vacuity: the self-join genuinely amplifies (out > input)
    assert(realSelf > li.count(), "vacuity: no key repeats")
  }

  test("q_histogram_equidepth: buckets partition the table and its " +
      "value domain exactly, bounds ascend without overlap, and depths " +
      "deviate from n/8 by at most the heaviest value's multiplicity") {
    val got = graft.SparkEntry.queries("q_histogram_equidepth")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
    val n = li.count()
    val ndv = li.distinct().count()
    val maxMult = li.groupBy(col("c")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(got.map(_._4).sum == n, "bucket rows must partition the table")
    assert(got.map(_._5).sum == ndv, "bucket ndv must partition the domain")
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 < b._2, s"buckets ${a._1}/${b._1} overlap")
    }
    got.foreach { g =>
      assert(g._2 <= g._3, s"bucket ${g._1}: lo > hi")
      assert(math.abs(g._4 - n / 8) <= maxMult,
        s"bucket ${g._1} depth ${g._4} deviates beyond a value's weight")
    }
    assert(got.map(_._1).toSeq == (1L to 8L), "buckets must be 1..8")
  }

  test("q_merge_upsert applies MERGE semantics exactly: row accounting " +
      "(base − deletes + inserts), provenance counts match the change " +
      "synthesis, and cents shift by the op deltas") {
    val orders = graft.Tables.load(spark, dir, "orders")
    val n = orders.count()
    val keys = orders.select(col("o_orderkey")).collect().map(_.getLong(0))
    val nUpd = keys.count(_ % 10 == 3).toLong
    val nDel = keys.count(_ % 10 == 7).toLong
    val nIns = keys.count(_ % 10 == 1).toLong
    val got = graft.SparkEntry.queries("q_merge_upsert")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val byProv = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(byProv("updated") == nUpd, "updated count drifted")
    assert(byProv("inserted") == nIns, "inserted count drifted")
    assert(byProv("kept") == n - nUpd - nDel, "kept count drifted")
    assert(got.map(_._3).sum == n - nDel + nIns, "merged row accounting")
    // cents deltas: updated rows shifted +777 each, inserted +111 each
    val baseCents = orders.select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expUpd = keys.filter(_ % 10 == 3).map(k => baseCents(k) + 777L).sum
    assert(got.filter(_._2 == "updated").map(_._4).sum == expUpd,
      "updated cents drifted")
    assert(nUpd > 0 && nDel > 0 && nIns > 0, "vacuity: an op class is empty")
  }

  test("q_eval_rankcorr equals a naive Kendall tau over the collected " +
      "shortlist ranks, with the documented agreement band") {
    val ranks = TextQueries.dualRanks(spark, dir)
      .filter(col("rank_bm25") <= 20)
      .select(col("query_id"), col("doc_id"), col("rank_bm25"),
        col("rank_ql"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expected = ranks.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (q, ds) =>
        val pairs = for {
          i <- ds.indices; j <- ds.indices
          if ds(i)._2 < ds(j)._2
        } yield (ds(i), ds(j))
        val conc = pairs.count { case (x, y) =>
          (x._3 < y._3) == (x._4 < y._4) }
        val p = pairs.size.toLong
        (q.toLong, ds.length.toLong, p, conc.toLong, p - conc,
          2L * conc * 1000000L / p - 1000000L)
    }
    val got = graft.SparkEntry.queries("q_eval_rankcorr")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.forall(_._2 > 1L),
      "vacuity: shortlists too small to form pairs")
    assert(got.forall(r => r._6 >= -1000000L && r._6 <= 1000000L),
      "tau out of [-1, 1]")
  }
}
