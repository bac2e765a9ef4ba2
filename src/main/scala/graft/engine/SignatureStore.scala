package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MinHash

/** Persisted MinHash SIGNATURE STORE — the at-scale backbone of
  * incremental (cross-corpus) dedup. At 100 TB the corpus must not
  * re-shingle on every ingest batch: shingling + hashing is the dominant
  * cost of the LSH pipeline, and it is a pure function of each document,
  * so it is computed ONCE per document and persisted. A refresh is
  * map-only over the NEW documents (anti-join on doc_id to find them —
  * one id-column scan of the store, never a text scan); every dedup
  * consumer then reads signatures instead of raw text:
  *
  *  - `bandRows` feeds the banded LSH equi-join (q_dedup_cross's corpus
  *    side — the batch never re-shingles history);
  *  - `shingleRows` / the `shs` arrays feed exact-Jaccard verification
  *    and the exact prefix join (streaming.StreamingPrefixJoin, st35);
  *  - `bandOwners` bootstraps the streaming dedup state (st10's
  *    flatMapGroupsWithState initial state — a restarted stream resumes
  *    against the whole accumulated corpus without replaying it).
  *
  * One row per document: `(doc_id, n, shs, bks)` where `n` is the
  * distinct word-5-gram shingle count, `shs` the SORTED xxhash64 hashes
  * of the distinct shingles (8 bytes each — set intersections over
  * hashes equal intersections over the strings, so verification never
  * needs the text; sorted so a prefix-filter consumer can slice its
  * canonical-order prefix without re-sorting), and `bks` the 3 MinHash
  * band keys, bit-identical to the batch family's
  * (queries.DedupQueries.perDoc / operators.MinHash.bandKeys — one
  * hashing scheme everywhere, so store-backed and from-scratch plans
  * flag the same candidates).
  *
  * Precondition (holds for every driver table, asserted nowhere hot):
  * text is single-space tokenized — with empty tokens the LSH family
  * (no filter) and the prefix family (filters them) would shingle
  * differently and one array could not serve both.
  *
  * Durability: refresh APPENDS new signature files (Spark's file commit
  * protocol keeps readers consistent); [[drop]] (retention) rewrites via
  * a staging dir + atomic rename, the Engine side-table pattern. On an
  * object store the rename becomes a manifest swap; the store itself is
  * plain parquet either way.
  *
  * Reference anchor: this is the "pre-calculated" posture of
  * refluxdb's planned stats rollups (README.md:58) applied to dedup
  * signatures; the reference itself has no dedup surface.
  */
class SignatureStore(spark: SparkSession, val path: String) {

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, n INT, shs ARRAY<BIGINT>, bks ARRAY<STRING>")

  private def exists: Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** The store as a DataFrame — typed empty frame when never built
    * (empty-not-error posture, SURVEY deviation D4). */
  def load(): DataFrame =
    if (exists) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** WRITER mutual exclusion: refresh's check-then-append and drop's
    * swap are not atomic on their own — two concurrent refreshes over
    * the same store dir could both see it without a doc_id and
    * double-append it, and duplicate doc_id rows silently fan out every
    * downstream signature join (q_dedup_cross's verify join would count
    * matches once per duplicate). An exclusive create of a `.lock`
    * sibling serializes CROSS-JVM mutators (atomic create on HDFS);
    * readers stay lock-free. A lock older than 10 min is presumed
    * abandoned (writer killed mid-hold) and broken. IN-PROCESS mutators
    * additionally serialize on a JVM-wide per-path monitor (the
    * Engine.tableLock pattern, round-16): the local filesystem's
    * `create(overwrite = false)` is check-then-create, NOT atomic — two
    * same-JVM refreshes racing under load could both "acquire" the file
    * lock and double-sign (observed once in a loaded full-suite run);
    * the monitor closes that window entirely for the single-JVM driver
    * scenario, and the file lock still excludes foreign JVMs where the
    * FS create is atomic. */
  private def withWriteLock[T](body: => T): T =
      SignatureStore.pathLock(path).synchronized {
    val lock = new Path(path + ".lock")
    val fs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    var held = false
    while (!held) {
      try { fs.create(lock, false).close(); held = true }
      catch {
        case _: java.io.IOException =>
          val stale =
            try System.currentTimeMillis() -
              fs.getFileStatus(lock).getModificationTime > 600000L
            catch { case _: java.io.IOException => false }
          if (stale) { fs.delete(lock, false); () }
          else if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"signature store write-lock timeout: $lock")
          else Thread.sleep(100)
      }
    }
    try body finally { fs.delete(lock, false); () }
  }

  /** Append signatures for every doc in `docs` NOT already stored
    * (by doc_id). Returns the number of documents signed. The anti-join
    * prunes to the store's doc_id column (ReadSchema: one long per
    * stored doc); shingling runs on the new rows only. Serialized
    * against concurrent mutators by [[withWriteLock]] so the
    * see-stale-then-append sequence can never double-sign a doc_id. */
  def refresh(docs: DataFrame): Long = withWriteLock {
    val unseen = docs.select(col("doc_id"), col("text"))
      .join(load().select(col("doc_id")), Seq("doc_id"), "left_anti")
    val sigs = SignatureStore.signatures(unseen).persist()
    try {
      val added = sigs.count()
      if (added > 0)
        sigs.write.mode("append").parquet(path)
      added
    } finally { sigs.unpersist(); () }
  }

  /** Retention: remove stored signatures matching `pred` (e.g. a
    * deleted-document sweep). Rewrites the survivors through a staging
    * dir and renames — symmetric with refresh: a dropped doc re-signs on
    * the next refresh that sees it. Returns the number dropped.
    * Mutator-serialized by [[withWriteLock]]; the delete→rename swap
    * still has a reader-visible empty window on filesystems without
    * atomic dir replace (local FS) — retention is a maintenance-window
    * operation, run it when no query reads the store. */
  def drop(pred: org.apache.spark.sql.Column): Long = withWriteLock {
    if (!exists) 0L
    else {
      val cur = load().persist()
      try {
        val total = cur.count()
        val keep = cur.filter(!pred)
        val kept = keep.count()
        if (kept < total) {
          val staging = new Path(path + ".staging")
          keep.write.mode("overwrite").parquet(staging.toString)
          val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
          fs.delete(new Path(path), true)
          fs.rename(staging, new Path(path))
        }
        total - kept
      } finally { cur.unpersist(); () }
    }
  }

  /** (doc_id, n, bk) — one row per band per stored doc, the corpus side
    * of the banded LSH equi-join. */
  def bandRows(): DataFrame =
    load().select(col("doc_id"), col("n"), explode(col("bks")).as("bk"))

  /** (doc_id, sh) — one row per stored shingle hash, for explode-style
    * intersection counting. */
  def shingleRows(): DataFrame =
    load().select(col("doc_id"), explode(col("shs")).as("sh"))

  /** (bk, first_doc) — each band key's lowest stored doc_id: the initial
    * state for streaming dedup (st10), matching the batch convention
    * that the smallest id owns the content. */
  def bandOwners(): DataFrame =
    bandRows().groupBy(col("bk")).agg(min(col("doc_id")).as("first_doc"))
}

object SignatureStore {

  /** JVM-wide per-store-path monitor for [[SignatureStore.withWriteLock]]
    * (two store INSTANCES over one dir must share it — the spec's racing
    * scenario and any multi-threaded driver's). */
  private val pathLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[engine] def pathLock(path: String): Object =
    pathLocks.computeIfAbsent(path, _ => new Object)

  /** Signature rows for `docs` (doc_id, text): ONE explode + ONE
    * doc_id-keyed aggregate computes the set size, the sorted shingle
    * hash array and all 6 minhashes (the md5 stays in whole-stage
    * codegen — the measured 3-4× win over the transform-lambda form,
    * DedupQueries.perDoc's note). Band keys are assembled exactly as
    * operators.MinHash.bandKeys / the batch perDoc do. */
  def signatures(docs: DataFrame): DataFrame = {
    val aggs = Seq(
      count(lit(1)).cast("int").as("n"),
      sort_array(collect_list(xxhash64(col("sh")))).as("shs")) ++
      (1 to 6).map(i =>
        min(md5(concat(lit(s"s$i"), col("sh")))).as(s"h$i"))
    docs
      .select(col("doc_id"),
        explode(MinHash.shingleArr(col("text"))).as("sh"))
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), col("n"), col("shs"),
        array(
          concat(lit("1:"), col("h1"), col("h2")),
          concat(lit("2:"), col("h3"), col("h4")),
          concat(lit("3:"), col("h5"), col("h6"))).as("bks"))
  }

  /** The CORPUS store for a testdata dir: holds every document except
    * the doc_id%10==3 "arriving batch" (q_dedup_cross's split), built on
    * first use and reused after (refresh is idempotent — the anti-join
    * finds nothing new). Keyed by dir path + documents mtime so a
    * rebuilt replica dir never reads a stale store. */
  def forCorpus(spark: SparkSession, dir: String): SignatureStore = {
    val src = new java.io.File(s"$dir/documents.parquet")
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3
      .stringHash(s"${src.getCanonicalPath}@${src.lastModified}"))
    val store = new SignatureStore(spark,
      s"${sys.props("java.io.tmpdir")}/graft_sigstore/corpus_$key")
    store.refresh(graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 10 =!= 3))
    store
  }
}
