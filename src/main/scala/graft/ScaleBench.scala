package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-posture evidence (round-6 VERDICT #1): every 100×-scale claim in
  * SCALE.md rested on plan shapes; this main produces EXECUTION evidence
  * by synthesizing a key-remapped KX replica of sf0.1 (testdata is
  * read-only, so the replica lands under /tmp) and running the heaviest
  * queries at both scales. A healthy operator scales ≈ linearly (factor
  * ≈ K + constant overheads); anything super-linear is a named bug.
  *
  * Replica construction (per replica r of K):
  *  - documents: doc_id shifted into a disjoint id range; every WORD of
  *    the text gets a fixed-width per-replica suffix (`~07`) — injective
  *    for ANY K (a Caesar rotation would collide at r % 26 — round-7
  *    review fix), so cross-replica shingle/minhash/simhash overlap is
  *    exactly zero while WITHIN-replica duplicate structure (exact dups,
  *    planted near-dups, boilerplate) is preserved EXACTLY (same suffix
  *    on every word of a replica; word-level relations are invariant
  *    under an injective per-word map). The dedup workload grows K× in
  *    documents AND K× in duplicate clusters, which is the honest way to
  *    scale a dedup benchmark (plain replication would instead create
  *    K-way cross-replica dup cliques — quadratic pair growth by data
  *    construction, not by plan regression). The suffix is fixed-width,
  *    so every replica (including r=0) carries identical text lengths.
  *  - events: event_id/user_id shifted into disjoint ranges, everything
  *    else unchanged — 10× series of the SAME length, so per-key state
  *    (q_ewma windows, recurrence folds) stays constant and only
  *    parallelism grows, matching how a TSDB fleet actually scales.
  *
  * Usage: `sbt "runMain graft.ScaleBench [K]"` (default K=10). Prints one
  * JSON line per query with base/replica medians and the scaling factor,
  * then a summary line. SPARK_GRAFT_SCALE_DIR overrides the replica
  * location; an existing replica dir is reused (delete it to rebuild).
  */
object ScaleBench {

  /** The heaviest BENCH_r06 queries that read documents/events. */
  val heavy: Seq[String] = Seq(
    "q_dedup_components", "q_dedup_apply", "q_dedup_jaccard_verify",
    "q_dedup_minhash_lsh", "q_dedup_simhash_pairs", "q_dedup_boilerplate",
    "q_decontaminate_bloom", "q_text_repetition", "q_text_levenshtein",
    "q_ewma", "q_ewma_recurrence", "q32_json_funcs",
    "q_ingest_typed", "q_ingest_generator")

  def buildReplica(spark: SparkSession, base: String, out: String,
      k: Int): Unit = {
    require(k <= 100, s"replica suffix is 2 digits; k=$k would collide")
    val docs = Tables.load(spark, base, "documents")
    val docN = (0 until k).map { r =>
      // fixed-width per-word replica tag: injective for any K, uniform
      // text length across replicas, codegen'd (split/transform/join).
      // The 1× base is built with the SAME construction (tag ~00), so
      // base and K× compare byte-for-byte in shape — suffixing only the
      // big side would bake a constant text-inflation bias into every
      // factor (round-7 review fix). n_chars is recomputed to stay
      // consistent with the transformed text.
      val tag = f"~$r%02d"
      val text = array_join(transform(split(col("text"), " "),
        w => concat(w, lit(tag))), " ")
      docs.select(
        (col("doc_id") + lit(r.toLong * 1000000000L)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.reduce(_.unionAll(_))
    docN.repartition(64).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val events = Tables.load(spark, base, "events")
    val evN = (0 until k).map { r =>
      events.select(
        (col("event_id") + lit(r.toLong * 1000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(r.toLong * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_.unionAll(_))
    evN.repartition(64).write.mode("overwrite")
      .parquet(s"$out/events.parquet")
  }

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"/tmp/graft_scale/sf0.1x$k")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the 1× BASE is built with the identical construction (same word
    // tags, same 64-file layout): factors then measure data growth
    // alone, not text-inflation or file-layout differences between the
    // original sf0.1 and the synthetic replicas (round-7 review fix)
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE",
      "/tmp/graft_scale/sf0.1x01")
    for ((dir, kk) <- Seq((baseDir, 1), (out, k))) {
      if (!new java.io.File(s"$dir/events.parquet").exists()) {
        val t0 = System.nanoTime()
        buildReplica(spark, base, dir, kk)
        System.err.println(f"[scale] built ${kk}x replica at $dir in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      } else System.err.println(s"[scale] reusing replica at $dir")
    }

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    // warm-up both datasets (codegen + file index, untimed)
    heavy.headOption.foreach { q =>
      try { run(SparkEntry.queries(q)(spark, baseDir))
            run(SparkEntry.queries(q)(spark, out)) }
      catch { case _: Throwable => () }
    }

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // a typo mixed with valid names must fail loudly, not silently
    // shrink the measured set
    val unknown = only.getOrElse(Set()) -- heavy.toSet
    require(unknown.isEmpty,
      s"SPARK_GRAFT_BENCH_ONLY names unknown queries: " +
        s"${unknown.mkString(", ")}; choose from: ${heavy.mkString(", ")}")
    val selected = heavy.filter(q => only.forall(_.contains(q)))
    val results = selected.map { name =>
      val fn = SparkEntry.queries(name)
      val tBase = median((1 to runs).map(_ => time(run(fn(spark, baseDir)))))
      val tBig = median((1 to runs).map(_ => time(run(fn(spark, out)))))
      val factor = tBig / tBase
      println(f"""{"query":"$name","base_sec":$tBase%.3f,"x${k}_sec":$tBig%.3f,"factor":$factor%.2f}""")
      (name, tBase, tBig, factor)
    }
    val sumBase = results.map(_._2).sum
    val sumBig = results.map(_._3).sum
    println(f"""{"metric":"scale_total","k":$k,"base_sec":$sumBase%.2f,"x${k}_sec":$sumBig%.2f,"factor":${sumBig / sumBase}%.2f,"queries":${results.length}}""")
    spark.stop()
  }
}
