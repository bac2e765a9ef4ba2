package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Independent-definition pins for the graph family's round-12
  * additions (the EditDistanceSpec posture: the oracle proves
  * cross-engine agreement, THIS proves the formula): a hand-built
  * basket fixture whose support-2 backbone is two triangles joined by
  * a bridge, with every metric recomputed by naive in-test code over
  * plain Maps — no Spark, no SQL, no shared arithmetic helpers. */
class GraphMetricsSpec extends SparkSpec {

  import spark.implicits._

  /** Baskets (each co-order pair twice → the whole graph survives the
    * support-2 cut): triangles {1,2,3} and {4,5,6}, bridge 3–4. */
  private val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))

  private lazy val dir: String = {
    val d = tmpDir("graft-graphmetrics")
    pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i, a), (2L * i, b), (2L * i + 1, a), (2L * i + 1, b))
    }.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  private val adj: Map[Long, Seq[Long]] =
    (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }

  test("q_shortest_path equals a naive Bellman-Ford from the top-128 " +
      "hubs (here: all 6 nodes are hubs, so every dist is 0)") {
    // every node's degree is within the top 128 → all sources
    val got = graft.SparkEntry.queries("q_shortest_path")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == adj.keys.map(_ -> 0L).toMap)
  }

  test("q_graph_assortativity matches the hand formula on the " +
      "two-triangle bridge graph") {
    // naive: directed (deg u, deg v) list, plain double Pearson
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    val xy = (pairs ++ pairs.map(p => (p._2, p._1)))
      .map { case (u, v) => (deg(u).toDouble, deg(v).toDouble) }
    val n = xy.size.toDouble
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val r = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val expected = math.floor(r * 1000000.0 + 0.5).toLong
    val row = graft.SparkEntry.queries("q_graph_assortativity")(spark, dir)
      .head()
    assert(row.getLong(0) === 7L) // n_edges
    assert(row.getLong(1) === expected,
      s"assort_micro ${row.getLong(1)} != hand $expected (r=$r)")
  }

  test("q_graph_modularity matches a naive LPA + Newman-Girvan " +
      "computation over plain Maps") {
    // naive synchronous LPA, 4 rounds, ties broken by smallest label
    var lbl = adj.keys.map(k => k -> k).toMap
    for (_ <- 1 to 4) {
      lbl = adj.map { case (u, vs) =>
        val votes = vs.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
        val best = votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        u -> best
      }
    }
    val m = pairs.size.toLong
    val comms = lbl.values.toSet
    val qs = comms.toSeq.map { c =>
      val intra = 2L * pairs.count(p => lbl(p._1) == c && lbl(p._2) == c)
      val dc = adj.collect { case (u, vs) if lbl(u) == c => vs.size }
        .sum.toLong
      2L * m * intra - dc * dc
    }.sum
    val expected = (qs + 4L * m * m) * 250000L / (m * m) - 1000000L
    val row = graft.SparkEntry.queries("q_graph_modularity")(spark, dir)
      .head()
    assert(row.getLong(0) === comms.size.toLong, "n_communities")
    assert(row.getLong(1) === m, "n_edges")
    assert(row.getLong(2) === expected,
      s"q_micro ${row.getLong(2)} != hand $expected")
    // vacuity: two triangles + bridge must yield real structure (two
    // communities, strongly positive modularity)
    assert(comms.size == 2 && expected > 300000L,
      s"fixture lost its structure: $comms, q_micro=$expected")
  }
}
