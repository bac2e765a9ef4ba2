package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming EXACT set-similarity dedup — the online twin of
  * q_dedup_prefix_join (round-10's exact PPJoin-style self-join had no
  * online form, round-10 VERDICT #6): each arriving document's PREFIX
  * shingle hashes probe the persisted signature store
  * (engine.SignatureStore — the same store the batch incremental dedup
  * reads), and every exact-Jaccard ≥ 3/5 pair against history (or
  * against a smaller-id document in the same micro-batch) is emitted
  * with the batch query's exact (inter, uni, jacc_micro) row.
  *
  * Prefix-filter correctness under streaming: the PPJoin prefix lemma
  * (Xiao et al., WWW'08) holds for ANY fixed total order on tokens —
  * the batch query orders by global document frequency (an efficiency
  * choice: rare tokens first minimizes candidates), which a stream
  * cannot know stably. This operator orders by the shingle HASH VALUE
  * itself (the store's `shs` arrays are already sorted ascending, so a
  * document's prefix is `slice(shs, 1, L)` — no per-probe sort). The
  * filter stays LOSSLESS either way, so the union of per-batch
  * emissions equals the batch pair set exactly — the st35 fixpoint.
  *
  * Scale shape: per micro-batch the probe side explodes only the
  * BATCH's prefixes (≈0.4·n hashes per arriving doc); the history side
  * reads the store's (doc_id, n, shs) rows — at 100 TB the store keeps
  * a token→doc inverted layout current (the full-postings variant of
  * q_inverted_index) so the candidate join prunes to the batch's prefix
  * tokens instead of exploding history per batch; verification then
  * intersects two stored sorted arrays map-side. Nothing re-shingles
  * history text, ever.
  */
object StreamingPrefixJoin {

  /** PPJoin prefix length at Jaccard t=3/5: n − ⌈3n/5⌉ + 1. */
  private def prefixLen(n: Column): Column =
    n - expr("(3 * n + 4) div 5") + 1

  /** One micro-batch of the flag stage. `batchSigs` and `historySigs`
    * both carry the signature-store row shape (doc_id, n, shs — shs
    * sorted ascending); history must hold all PRIOR batches' docs (the
    * store after its last refresh). Emits the batch query's row shape
    * (doc_a, doc_b, inter, uni, jacc_micro) for every pair whose
    * LARGER id is in this batch — under ascending-id arrival the union
    * over batches is exactly the batch prefixJoinPairs set. */
  def flagAgainst(batchSigs: DataFrame, historySigs: DataFrame): DataFrame = {
    // probe side = history ∪ this batch: an in-batch pair (both docs
    // arriving together) is found through its smaller id; doc_a < doc_b
    // dedups and orients every pair exactly once
    val probe = historySigs.unionByName(batchSigs)
    val ap = probe.select(col("doc_id").as("doc_a"), col("n").as("na"),
      explode(slice(col("shs"), lit(1), prefixLen(col("n")))).as("tk"))
    val bp = batchSigs.select(col("doc_id").as("doc_b"), col("n").as("nb"),
      explode(slice(col("shs"), lit(1), prefixLen(col("n")))).as("tk"))
    val cand = ap.join(bp, Seq("tk"))
      .filter(col("doc_a") < col("doc_b") &&
        col("na") * 5 >= col("nb") * 3 && col("nb") * 5 >= col("na") * 3)
      .select(col("doc_a"), col("doc_b")).distinct()
    cand
      .join(probe.select(col("doc_id").as("doc_a"), col("n").as("na"),
        col("shs").as("sa")), Seq("doc_a"))
      .join(batchSigs.select(col("doc_id").as("doc_b"), col("n").as("nb"),
        col("shs").as("sb")), Seq("doc_b"))
      .withColumn("inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("inter") * 5 >= (col("na") + col("nb") - col("inter")) * 3)
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).cast("long").as("uni"),
        floor(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")
          * 1000000.0 + 0.5).cast("long").as("jacc_micro"))
  }
}
