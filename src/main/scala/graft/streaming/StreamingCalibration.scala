package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.queries.TextQueries

/** Streaming classifier calibration — the online twin of
  * q_eval_calibration (st43): documents arrive WHOLE (the st36/st39/st41
  * posture), scoring is MAP-ONLY (the shared aucScored — one native
  * classifier_scores pass + one stopword filter), and ONE complete-mode
  * (evaluator, bin) rollup is the entire state: count, positives, and
  * score sum per 10-bucket score bin, all of which merge additively
  * across micro-batches — the st18 state-store-is-the-rollup recipe,
  * no custom state machine. The readout recomputes the half-up integer
  * means, |gap|, and per-evaluator ECE with the SAME shared definitions
  * as the batch query, so streamed == batch holds bit-for-bit over
  * EVERY arrived prefix.
  *
  * Why this matters online: calibration drift (a scorer whose
  * confidence stops tracking outcomes) is the first thing to rot when
  * a corpus shifts under a live quality gate; a BIN-domain-bounded
  * online ECE (state ≤ evaluators × 10 rows at any corpus size — even
  * tighter than st41's score-domain bound) means the reliability
  * readout never rescans the corpus.
  */
object StreamingCalibration {

  /** `docs`: streaming (text, lang) rows — one per whole document.
    * Returns the (evaluator, bin) → (n, n_pos, ssc) rollup; run it in
    * complete mode into the serving sink. */
  def bins(docs: DataFrame): DataFrame =
    TextQueries.calibrationBins(TextQueries.aucScored(docs))

  /** Reliability rows + ECE over the accumulated state — IDENTICAL to
    * q_eval_calibration over the arrived prefix (shared definition). */
  def readout(state: DataFrame): DataFrame =
    TextQueries.calibrationReadout(state)
}
