package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming SemDeDup — the online twin of q_dedup_semdedup (the one
  * first-class LLM-pipeline family that had no online form, round-8
  * VERDICT #4): arriving documents are assigned to their nearest pinned
  * centroid per micro-batch and flagged as semantic near-duplicates
  * against everything that arrived before them.
  *
  * Two stages, both batch-exact:
  *  - ASSIGN: the broadcast-TABLE assignment path ([[assignCosine]] —
  *    the AnnIndex.assignJoin shape: centroids as k broadcast rows, a
  *    per-key max(struct) argmax whose shuffle carries partial-agged
  *    (key, best-so-far), never the k-way fan-out) with
  *    q_dedup_semdedup's exact scoring: cosine against the STORED
  *    fixture norm, ties to the smallest cid via the (ccos, −cid)
  *    struct — so streamed cids equal the batch query's bit for bit.
  *  - FLAG: each arriving row joins (on cid only) the HISTORY of
  *    previously-arrived assigned rows plus its own batch's smaller ids,
  *    emitting the same (vec_id, cid, kept_rep, max_cos) row the batch
  *    semDedupPairs aggregation produces.
  *
  * Fixpoint (st28): when ids arrive in ascending order — the engine
  * gateway's monotone-id contract, same precondition family as
  * [[StreamingRate]] — every smaller-id partner of a document has
  * already arrived by the time it is scored, so the union of per-batch
  * emissions EQUALS the batch q_dedup_semdedup result exactly, across
  * any micro-batch boundary placement.
  *
  * Scale shape: the history is a parquet table PARTITIONED BY cid (the
  * same layout the batch engine reads — one store serves both paths, the
  * lambda-architecture share); a batch joins only the cid partitions its
  * rows landed in, and the join input is bounded by cluster occupancy —
  * which SemDeDup's k ≈ O(√N) recipe holds flat (semDedupScaled). The
  * centroid side stays model-sized and broadcast at any corpus size.
  */
object StreamingSemDedup {

  /** Broadcast-table cosine assignment with q_dedup_semdedup's exact
    * argmax: `cents` must carry (cid INT, centroid ARRAY<DOUBLE>,
    * cnrm DOUBLE — the STORED norm both engines divide by). Returns
    * (cid, vec_id, embedding, nrm). PRECONDITION (inherited from the
    * assignJoin shape): vec_id unique in `batch`. */
  def assignCosine(batch: DataFrame, cents: DataFrame): DataFrame = {
    import graft.functions.VecOps
    val scored = batch
      .select(col("vec_id"), col("embedding"),
        VecOps.vec_norm(col("embedding")).as("nrm"))
      .crossJoin(broadcast(cents.select(col("cid"), col("centroid"),
        col("cnrm"))))
      .withColumn("__s", struct(
        (VecOps.vec_dot(col("embedding"), col("centroid")) /
          (col("nrm") * col("cnrm"))).as("ccos"),
        (-col("cid")).as("ncid")))
    scored.groupBy(col("vec_id"))
      .agg((-max(col("__s")).getField("ncid")).as("cid"),
        first(col("embedding")).as("embedding"),
        first(col("nrm")).as("nrm"))
      .select(col("cid"), col("vec_id"), col("embedding"), col("nrm"))
  }

  /** One micro-batch of the FLAG stage: `assigned` is this batch's
    * [[assignCosine]] output, `history` the accumulated assigned rows of
    * all PRIOR batches (same schema; empty on the first batch). Emits
    * q_dedup_semdedup's row shape for every batch doc with a smaller-id
    * partner at cosine ≥ `threshold` in its cluster — partners drawn
    * from history ∪ this batch, so ascending-id arrival makes the
    * emission final (the st28 fixpoint). */
  def flagAgainst(assigned: DataFrame, history: DataFrame,
      threshold: Double = 0.8): DataFrame = {
    import graft.functions.VecOps
    val candidates = history.unionByName(assigned)
      .select(col("cid"), col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("nrm").as("na"))
    val probes = assigned
      .select(col("cid"), col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nrm").as("nb"))
    candidates.join(probes, Seq("cid"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("cid"), col("vec_a"), col("vec_b"),
        round(VecOps.vec_dot(col("ea"), col("eb"))
          / (col("na") * col("nb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .groupBy(col("vec_b"))
      .agg(min(col("cid")).as("cid"), min(col("vec_a")).as("kept_rep"),
        max(col("cos_sim")).as("max_cos"))
      .select(col("vec_b").as("vec_id"), col("cid"), col("kept_rep"),
        col("max_cos"))
  }
}
