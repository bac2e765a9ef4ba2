package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Proof of SCALE.md §5's claim: with the corpus partitioned by inverted
  * list, the IVF probe becomes STATIC partition pruning — the scan touches
  * only the probed `list=` directories, so query cost is proportional to
  * the probed fraction, not the corpus.
  */
class AnnPartitionSpec extends SparkSpec {

  private lazy val dir = "/root/testdata/sf0.01"
  private lazy val indexPath =
    Files.createTempDirectory("ann_index").toString

  test("IVF index probe prunes to exactly `probes` list partitions") {
    val e = Tables.load(spark, dir, "embeddings")
    AnnIndex.build(e, indexPath, k = 8)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

    Seq(1, 2).foreach { probes =>
      val res = AnnIndex.query(spark, indexPath, q, probes, k = 10)
      // plan-shape proof: the (pre-AQE) physical scan of lists/ selects
      // only the probed partition directories, via a partition filter —
      // not a full scan + post-filter
      val scans = res.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(
              _.toString.contains("lists")) => f
      }
      assert(scans.nonEmpty, "no file scan over lists/ found")
      val scan = scans.head
      assert(scan.partitionFilters.nonEmpty,
        s"probe filter did not become a partition filter:\n$scan")
      val selected = scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters)
      assert(selected.length == probes,
        s"expected $probes pruned partitions, scanned ${selected.length}")
      // execution-level proof: every file actually read sits in a probed
      // list directory
      val probed = AnnIndex.probeLists(spark, indexPath, q, probes)
        .map(l => s"list=$l").toSet
      val files = spark.read.parquet(s"$indexPath/lists")
        .filter(col("list").isin(
          AnnIndex.probeLists(spark, indexPath, q, probes): _*))
        .select(input_file_name()).distinct().collect().map(_.getString(0))
      assert(files.nonEmpty && files.forall(f => probed.exists(f.contains)),
        s"scan read outside probed partitions: ${files.mkString(", ")}")
      assert(res.count() == 10)
    }
  }

  test("index probe returns the exact in-list top-10 (persisted quantizer, " +
      "recomputed in-plan)") {
    val e = Tables.load(spark, dir, "embeddings")
    // self-contained under testOnly -z: build if the first test didn't run
    if (!new java.io.File(s"$indexPath/centroids").exists)
      AnnIndex.build(e, indexPath, k = 8)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    // use the PERSISTED centroids, not a re-train: avg() merges partial
    // sums in task order, so a re-train may differ in the final ulp and
    // flip a near-boundary assignment — the index's own centroids are the
    // ground truth the probe must agree with
    val cents = spark.read.parquet(s"$indexPath/centroids").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
    val probed = AnnIndex.probeLists(spark, indexPath, q, probes = 2)
    val qd = q.map(_.toDouble).toSeq
    val qn = math.sqrt(qd.map(v => v * v).sum)
    def dotLit(c: org.apache.spark.sql.Column) =
      aggregate(zip_with(c, typedLit(qd), (a, b) => a.cast("double") * b),
        lit(0.0), (acc, v) => acc + v)
    def nrmC(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(c, lit(0.0),
        (acc, v) => acc + v.cast("double") * v.cast("double")))
    val expected = e
      .withColumn("list", AnnIndex.assignExpr(cents, col("embedding")))
      .filter(col("list").isin(probed: _*))
      .select(col("vec_id"),
        round(dotLit(col("embedding")) / (nrmC(col("embedding")) * lit(qn)), 6)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = AnnIndex.query(spark, indexPath, q, probes = 2, k = 10)
      .select(col("vec_id"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
  }
}
