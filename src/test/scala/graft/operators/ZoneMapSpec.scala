package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The zone-map store contract (the ZOrderSpec recipe): pruning may
  * change only the FILES READ, never the answer; the sidecar alone
  * decides what survives; the artifact is reused, not rebuilt. */
class ZoneMapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("the pruned range scan returns exactly the plain filter's rows " +
      "and partition-prunes the block suffix") {
    val q = ZoneMaps.prunedRange(spark, dir, "2024-01-20")
    val got = q.select(col("event_id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    val want = graft.Tables.load(spark, dir, "events")
      .filter(col("ts") >= lit("2024-01-20").cast("timestamp"))
      .select(col("event_id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == want,
      s"layout path diverges: ${got.length} vs ${want.length} rows")
    assert(want.nonEmpty, "vacuity: the cut must keep rows")
    // plan shape: the scan carries a blk partition filter and lists
    // FEWER block dirs than the layout holds
    val scans = q.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in the layout path")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"the block suffix did not become a partition filter:\n$scan")
    // the survivor semi-join must plan as DYNAMIC partition pruning
    // (runtime dir skipping for non-contiguous dead blocks) ...
    val (dynamic, static) = scan.partitionFilters.partition(
      _.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    assert(dynamic.nonEmpty,
      s"survivor semi-join did not become dynamic pruning:\n$scan")
    assert(static.nonEmpty,
      s"the suffix scalar did not become a static partition filter:\n$scan")
    // ... while the static suffix alone already lists fewer dirs
    val pType = scan.relation.partitionSchema.fields(0).dataType
    val selected = scan.relation.location
      .listFiles(static, scan.dataFilters)
      .map(_.values.get(0, pType).toString.toLong).distinct
    val (layout, sidecar) = ZoneMaps.eventsLayout(spark, dir)
    val total = layout.select(col("blk")).distinct().count()
    assert(selected.length < total,
      s"no pruning: ${selected.length} of $total blocks read")
    // every pruned-away block is genuinely all-before-the-cut
    val cut = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    val skipped = sidecar.collect()
      .filter(r => !selected.contains(r.getAs[Long]("blk")))
    assert(skipped.nonEmpty, "vacuity: nothing was skipped")
    skipped.foreach { r =>
      assert(r.getAs[java.sql.Timestamp]("max_ts").before(cut),
        s"block ${r.getAs[Long]("blk")} was skipped but reaches the cut")
    }
  }

  test("a cut past the corpus prunes everything (empty, not an error); " +
      "the artifact is built once and reused") {
    val empty = ZoneMaps.prunedRange(spark, dir, "2030-01-01")
    assert(empty.count() == 0L)
    // reuse: the layout root's mtime is stable across a second call
    val src = new java.io.File(s"$dir/events.parquet")
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3
      .stringHash(s"${src.getCanonicalPath}@${src.lastModified}"))
    val root = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_zonemap/events_v2_$key")
    assert(root.exists(), "artifact root missing")
    val before = root.lastModified()
    ZoneMaps.prunedRange(spark, dir, "2024-01-10").count()
    assert(root.lastModified() == before, "artifact was rebuilt")
  }

  test("the value-cut scan returns exactly the plain filter's rows, " +
      "prunes dynamically (fewer files than the static listing), and " +
      "every skipped block's sidecar max is genuinely under the cut") {
    val minCents = 30000L
    val q = ZoneMaps.prunedValueCut(spark, dir, minCents)
    val got = q.select(col("event_id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    val want = graft.Tables.load(spark, dir, "events")
      .filter(round(col("value") * 100).cast("long") >= minCents)
      .select(col("event_id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == want,
      s"layout path diverges: ${got.length} vs ${want.length} rows")
    assert(want.nonEmpty, "vacuity: the cut must keep rows")
    // plan shape: value carries no layout order, so pruning is ENTIRELY
    // the dynamic survivor semi-join — the scan must carry a
    // DynamicPruning partition filter ...
    q.collect() // execute so runtime metrics (numFiles) are populated
    // descend through AQE wrappers (AdaptiveSparkPlanExec replans; its
    // stages wrap subtrees as leaf QueryStageExec nodes a plain collect
    // cannot see through)
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      (p match { case f: FileSourceScanExec => Seq(f)
                 case _ => Seq.empty }) ++ kids.flatMap(allScans)
    }
    val scans = allScans(q.queryExecution.executedPlan)
    val scan = scans.find(_.relation.location.rootPaths
      .exists(_.toString.contains("graft_zonemap"))).getOrElse(
      fail("no layout file scan in the value-cut path"))
    assert(scan.partitionFilters.exists(_.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.DynamicPruning])),
      s"survivor semi-join did not become dynamic pruning:\n$scan")
    // ... and at runtime it must have read FEWER files than the static
    // listing (staticFilesNum is only reported when DPP is present)
    val read = scan.metrics("numFiles").value
    val static0 = scan.metrics("staticFilesNum").value
    assert(read < static0,
      s"no dynamic pruning happened: read $read of $static0 files")
    // soundness: every block the sidecar lets be skipped is genuinely
    // all-under-the-cut (no qualifying row can hide in a skipped block)
    val (_, sidecar) = ZoneMaps.eventsLayout(spark, dir)
    val skippable = sidecar.filter(col("max_value_cents") < minCents)
      .select(col("blk")).collect().map(_.getLong(0)).toSet
    assert(skippable.nonEmpty, "vacuity: nothing was skippable")
    val hiding = graft.Tables.load(spark, dir, "events")
      .filter(round(col("value") * 100).cast("long") >= minCents)
      .filter(expr("event_id div 512").isin(skippable.toSeq: _*))
      .count()
    assert(hiding == 0L, s"$hiding qualifying rows hide in skipped blocks")
  }
}
