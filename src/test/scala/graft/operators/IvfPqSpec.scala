package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** IVF-PQ composition (AnnIndex.buildPq/queryPq): the partition pruning
  * of the inverted lists AND the column pruning of the PQ codes must both
  * show up in the physical plan — together they are why the composition
  * scales: probes bound the directories read, codes bound the bytes per
  * row, and the full-precision embedding column is read for shortlist
  * rows only.
  */
class IvfPqSpec extends SparkSpec {

  private lazy val dir = "/root/testdata/sf0.01"
  private lazy val indexPath = Files.createTempDirectory("ivfpq").toString

  private def ensureBuilt(): Unit =
    if (!new java.io.File(s"$indexPath/codebooks").exists) {
      AnnIndex.buildPq(Tables.load(spark, dir, "embeddings"), indexPath)
    }

  test("ADC scan prunes partitions AND never reads the embedding column") {
    ensureBuilt()
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val probes = 2
    val res = AnnIndex.queryPq(spark, indexPath, q, probes, k = 10)
    val scans = res.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("pq_lists")) => f
    }
    // two scans of the store by design: the ADC shortlist pass and the
    // rerank pass
    assert(scans.length == 2, s"expected 2 pq_lists scans, got ${scans.length}")
    scans.foreach { scan =>
      assert(scan.partitionFilters.nonEmpty,
        s"probe filter did not become a partition filter:\n$scan")
      val selected = scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters)
      assert(selected.length == probes,
        s"expected $probes pruned partitions, scanned ${selected.length}")
    }
    // the ADC pass is the scan WITHOUT the embedding column: exactly one
    // scan must be embedding-free (codes+nrm only), proving the wide
    // column never leaves parquet for the bulk of the rows
    val embFree = scans.filterNot(
      _.requiredSchema.fieldNames.contains("embedding"))
    assert(embFree.length == 1,
      s"expected exactly 1 embedding-free ADC scan; schemas were " +
        scans.map(_.requiredSchema.fieldNames.mkString("[", ",", "]"))
          .mkString(" / "))
    assert(embFree.head.requiredSchema.fieldNames.toSet
      .subsetOf(Set("vec_id", "codes", "nrm")),
      s"ADC scan reads more than codes: " +
        embFree.head.requiredSchema.fieldNames.mkString(","))
  }

  test("with a full-coverage shortlist, IVF-PQ rerank equals the exact " +
      "in-list top-10; the 50-row shortlist stays close") {
    ensureBuilt()
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    // exact within the probed lists = AnnIndex.query on the same index
    val exact = AnnIndex.query(spark, indexPath, q, probes = 2, k = 10)
      .select(col("vec_id"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = AnnIndex.queryPq(spark, indexPath, q, probes = 2, k = 10,
      shortlist = 1000000)
      .select(col("vec_id"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact,
      s"full-coverage rerank diverged from exact:\n$full\nvs\n$exact")
    val short = AnnIndex.queryPq(spark, indexPath, q, probes = 2, k = 10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val overlap = short.intersect(exact.map(_._1).toSet).size
    info(s"50-row ADC shortlist keeps $overlap/10 of the exact top-10")
    // isotropic-random worst case: ADC ordering is noisy, but a 50-row
    // shortlist out of ~125 probed rows must beat random retention
    // (50/125 -> expected 4/10) clearly
    assert(overlap >= 5, s"shortlist retention $overlap/10 below floor")
  }
}
