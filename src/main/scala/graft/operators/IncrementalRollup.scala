package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** INCREMENTAL VIEW MAINTENANCE for distributive rollups — the
  * aggregate twin of [[graft.engine.SignatureStore]]: a persisted
  * per-key PARTIAL-AGGREGATE store over the already-ingested corpus,
  * so refreshing a standing rollup costs one DELTA scan plus a
  * catalog-sized merge instead of a full recompute. This is the other
  * half of what makes a 100 TB engine serviceable: the signature store
  * keeps dedup from re-shingling the corpus per batch; this keeps the
  * reporting rollups from re-scanning it per refresh.
  *
  * Round 13: generalized from one hardcoded view to a KEYED surface —
  * a [[ViewDef]] registry ([[views]]) of maintained views, each naming
  * its group keys, per-partial merge aggregates, slice builder, and
  * readout. Registered views: `nation_revenue` (orders × dims, the
  * original — q_ivm_rollup) and `hourly_activity` (the events fact's
  * per-(event_type, hour) traffic rollup — q_ivm_events). The same
  * machinery also backs the Engine's per-(series, day, name) stats
  * store (graft.engine.Engine.statsRefresh — batch-manifest deltas).
  *
  * Algebra: the stored partials are DISTRIBUTIVE — SUM and COUNT merge
  * by addition, MIN/MAX by min/max — so store ⊎ delta ≡ recompute
  * EXACTLY (the oracle gate IS the full recompute, the q_zorder_box
  * equivalence posture). Money partials are DECIMAL(28,2) (Spark's sum
  * over DECIMAL(18,2) cast — exact, order-free); the merged sum widens
  * and converts to DOUBLE once on output (the QuerySet.decSum
  * contract). AVG-style readouts derive from (sum, count) partials;
  * holistic aggregates (exact percentile) are the documented non-goal —
  * they need the q18 full pass by nature.
  *
  * Base/delta split: here the base slice is `key % 10 ≠ 7` and the
  * delta the remaining tenth — a stand-in for the production split,
  * which is INGESTION-TIME partitioning (base = sealed partitions
  * behind the high-water mark, delta = today's partition; partition
  * pruning makes the delta scan physical, not a filter — exactly what
  * the Engine's batch-manifest variant does).
  *
  * Artifact discipline (the ZOrder.lineitemLayout recipe): the store
  * is keyed by (view, dir, source mtime) and built once; rebuild
  * happens on a changed corpus, reuse otherwise. The build lands via
  * STAGING + RENAME so a concurrent reader never sees a half-written
  * store and a lost-race builder deletes its staging dir (the
  * SignatureStore lock-discipline lesson, without needing a lock: the
  * store is immutable per key, so the first rename wins and the
  * content is identical either way).
  *
  * Retention ([[dropWhere]]) is symmetric with SignatureStore.drop:
  * a staged predicate rewrite of the store. Dropped BASE keys stay
  * dropped until the source file changes (mtime re-keys the store and
  * a fresh base builds) — retention on an immutable base slice is a
  * maintenance-window operation, same as the signature store's.
  */
object IncrementalRollup {

  /** A maintained view: group keys, how each stored partial column
    * merges, how to compute ONE slice's partials (the SAME plan builds
    * the base store — delta = false — and the per-refresh delta), and
    * the readout projecting merged partials to served columns. */
  final case class ViewDef(
      name: String,
      sourceFile: String, // fact parquet whose mtime keys the store
      groupKeys: Seq[String],
      merges: Seq[(String, Column => Column)],
      slice: (SparkSession, String, Boolean) => DataFrame,
      readout: DataFrame => DataFrame)

  /** The registry — the keyed maintenance surface. Adding a standing
    * rollup = adding an entry; refresh/drop/store discipline is shared. */
  val views: Map[String, ViewDef] = Map(
    "nation_revenue" -> ViewDef(
      name = "nation_revenue",
      sourceFile = "orders.parquet",
      groupKeys = Seq("n_name"),
      merges = Seq("sum_price" -> (sum(_)), "n_orders" -> (sum(_))),
      slice = nationRevenueSlice,
      readout = m => m.select(col("n_name"),
        col("sum_price").cast("double").as("total_price"),
        col("n_orders"))
        .orderBy(col("n_name"))),
    "hourly_activity" -> ViewDef(
      name = "hourly_activity",
      sourceFile = "events.parquet",
      groupKeys = Seq("event_type", "hr"),
      merges = Seq("n_events" -> (sum(_)), "sum_cents" -> (sum(_)),
        "min_cents" -> (min(_)), "max_cents" -> (max(_))),
      slice = hourlyActivitySlice,
      readout = m => m.select(col("event_type"),
        col("hr").cast("timestamp_ntz").as("hr"),
        col("n_events"), col("sum_cents"), col("min_cents"),
        col("max_cents"))
        .orderBy(col("event_type"), col("hr"))),
    // THIRD view (round-14 VERDICT #8) — the documents-side rollup the
    // LLM-pipeline mixing queries consume: per-source doc and token
    // totals (EXACTLY q_token_budget_mix's `totals` subtree, so the
    // budget allocator can read a maintained store instead of
    // re-tokenizing the corpus per run — at 100 TB the tokenize scan IS
    // the cost). Pure additive partials.
    "source_tokens" -> ViewDef(
      name = "source_tokens",
      sourceFile = "documents.parquet",
      groupKeys = Seq("source"),
      merges = Seq("n_docs" -> (sum(_)), "tokens_total" -> (sum(_))),
      slice = sourceTokensSlice,
      readout = m => m.select(col("source"), col("n_docs"),
        col("tokens_total"))
        .orderBy(col("source"))))

  /** One slice's per-nation partials — dims broadcast; the only
    * fact-sized work is the slice scan + one hash agg. */
  private def nationRevenueSlice(spark: SparkSession, dir: String,
      delta: Boolean): DataFrame = {
    val o = graft.Tables.load(spark, dir, "orders")
      .filter(if (delta) pmod(col("o_orderkey"), lit(10L)) === 7L
              else pmod(col("o_orderkey"), lit(10L)) =!= 7L)
    val c = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val n = graft.Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .as("sum_price"),
        count(lit(1)).as("n_orders"))
  }

  /** One slice's per-(event_type, hour) traffic partials — ALL-INTEGER
    * (exact cents, the round(value*100) canon) so the merged sums are
    * order-free; min/max exercise the non-additive merge path. One
    * fact-sized hash agg per slice, keys bounded by type × hours. */
  private def hourlyActivitySlice(spark: SparkSession, dir: String,
      delta: Boolean): DataFrame =
    graft.Tables.load(spark, dir, "events")
      .filter(if (delta) pmod(col("event_id"), lit(10L)) === 7L
              else pmod(col("event_id"), lit(10L)) =!= 7L)
      .filter(col("value").isNotNull)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))

  /** One slice's per-source (doc count, token count) partials — the
    * q_token_budget_mix whitespace tokenization verbatim (one shared
    * convention, so the maintained store and the gated allocator agree);
    * the tokenize+size scan is the only fact-sized work per slice. */
  private def sourceTokensSlice(spark: SparkSession, dir: String,
      delta: Boolean): DataFrame =
    graft.Tables.load(spark, dir, "documents")
      .filter(if (delta) pmod(col("doc_id"), lit(10L)) === 7L
              else pmod(col("doc_id"), lit(10L)) =!= 7L)
      .select(col("source"),
        size(expr("filter(split(text, ' '), w -> length(w) > 0)"))
          .cast("long").as("tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens_total"))

  private def storePath(spark: SparkSession, dir: String,
      v: ViewDef): String = {
    val src = new java.io.File(s"$dir/${v.sourceFile}")
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3
      .stringHash(s"${src.getCanonicalPath}@${src.lastModified}"))
    s"${sys.props("java.io.tmpdir")}/graft_ivm/${v.name}_$key"
  }

  /** The persisted base partials: built once per (view, dir, mtime). */
  private def store(spark: SparkSession, dir: String,
      v: ViewDef): DataFrame = {
    val out = storePath(spark, dir, v)
    val p = new Path(out)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) {
      val staging = new Path(out + ".stage-" +
        java.util.UUID.randomUUID().toString.take(8))
      v.slice(spark, dir, false)
        .write.mode("overwrite").parquet(staging.toString)
      fs.mkdirs(p.getParent)
      if (!fs.rename(staging, p)) fs.delete(staging, true) // lost the race
    }
    spark.read.parquet(out)
  }

  /** The maintained readout: stored base partials ⊎ freshly-scanned
    * delta partials, merged per the view's declared aggregates — equal
    * to the full recompute exactly. */
  def refresh(spark: SparkSession, dir: String, name: String): DataFrame = {
    val v = views(name)
    val aggs = v.merges.map { case (c, f) => f(col(c)).as(c) }
    val merged = store(spark, dir, v)
      .unionByName(v.slice(spark, dir, true))
      .groupBy(v.groupKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    v.readout(merged)
  }

  /** Retention on the persisted base store: staged rewrite dropping
    * rows matching `pred` (SignatureStore.drop symmetry — atomic dir
    * replace, a maintenance-window operation). Returns rows dropped.
    * The delta slice is recomputed per refresh, so retention governs
    * only the BASE partials; a changed source mtime re-keys the store
    * and the drop is naturally forgotten with the stale key. */
  def dropWhere(spark: SparkSession, dir: String, name: String,
      pred: Column): Long = {
    val v = views(name)
    store(spark, dir, v) // ensure built
    val out = storePath(spark, dir, v)
    val p = new Path(out)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val cur = spark.read.parquet(out)
    val dropped = cur.filter(pred).count()
    if (dropped > 0) {
      val staging = new Path(out + ".stage-" +
        java.util.UUID.randomUUID().toString.take(8))
      val kept = cur.filter(!pred)
      kept.write.mode("overwrite").parquet(staging.toString)
      fs.delete(p, true)
      if (!fs.rename(staging, p))
        throw new java.io.IOException(s"dropWhere: cannot swap in $staging")
    }
    dropped
  }

  /** Back-compat alias for the original hardcoded view (q_ivm_rollup). */
  def nationRevenue(spark: SparkSession, dir: String): DataFrame =
    refresh(spark, dir, "nation_revenue")
}
