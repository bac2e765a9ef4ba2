package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ConnectedComponents: correctness of the label propagation on known
  * graphs, and the reliable-checkpoint mode (the fault-tolerant posture:
  * per-round state is materialized to a checkpoint store the RDD can
  * re-read after executor loss, unlike localCheckpoint whose lineage-cut
  * blocks die with their executor). */
class ConnectedComponentsSpec extends SparkSpec {

  private def edges = {
    import spark.implicits._
    // chain 1-2-3-4 (one component), pair (10,11), triangle-ish 20-21-22
    Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 20L)).toDF("doc_a", "doc_b")
  }

  private val expected = Seq(
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
    10L -> 10L, 11L -> 10L,
    20L -> 20L, 21L -> 20L, 22L -> 20L)

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq

  test("min-label components with pointer jumping (local-checkpoint mode)") {
    assert(collect(ConnectedComponents.run(edges)) == expected)
  }

  test("reliable-checkpoint mode matches local mode, writes per-round " +
      "state to the checkpoint dir, and cuts lineage to it") {
    val dir = tmpDir("cc-ckpt")
    spark.conf.set(ConnectedComponents.CheckpointDirConf, dir)
    try {
      val labels = ConnectedComponents.run(edges)
      assert(collect(labels) == expected)
      // per-round label state actually landed in the reliable store
      def files(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles).toSeq.flatten
          .flatMap(c => if (c.isDirectory) files(c) else Seq(c))
      assert(files(new java.io.File(dir)).nonEmpty,
        "no reliable checkpoint files written")
      // lineage is cut: the result reads back from the checkpoint RDD,
      // not from a plan rooted at the input edges
      val rddTree = labels.rdd.toDebugString
      assert(rddTree.contains("ReliableCheckpointRDD"),
        s"expected a reliable checkpoint in the lineage:\n$rddTree")
    } finally {
      spark.conf.unset(ConnectedComponents.CheckpointDirConf)
    }
  }

  test("empty edge list converges to an empty labeling") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(ConnectedComponents.run(none).count() == 0)
    assert(ConnectedComponents.runStars(none).count() == 0)
  }

  test("large-star/small-star labels equal label propagation on assorted " +
      "graphs, converging in O(log n) rounds on a long chain") {
    import spark.implicits._
    assert(collect(ConnectedComponents.runStars(edges)) == expected)
    // pseudo-random graph (fixed arithmetic, no RNG): 120 nodes, edges by
    // modular strides → several nontrivial components
    val rand = (0 until 200).map { i =>
      val a = (i * 37L) % 120
      val b = (i * 53L + 11) % 120
      (a + 1, b + 1)
    }.filter(p => p._1 != p._2).toDF("doc_a", "doc_b")
    assert(collect(ConnectedComponents.runStars(rand)) ==
      collect(ConnectedComponents.run(rand)))
    // a 200-node chain has diameter 199: naive propagation needs ~200
    // rounds, star alternation must stay logarithmic in component size
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = ConnectedComponents.runStarsCounted(chain)
    assert(labels.select("component").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    assert(labels.count() == 200)
    assert(rounds <= 12, s"expected O(log n) rounds, took $rounds")
  }
}
