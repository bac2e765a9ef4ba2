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
  }
}
