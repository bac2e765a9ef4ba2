package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming INVERTED-INDEX maintenance — the online twin of
  * q_inverted_index (st36): as documents arrive, each word-bigram term's
  * state (df, total_tf, posting head) updates in place and the term
  * re-emits its CURRENT index row. A retrieval tier serving the batch
  * index stays fresh without rebuilding: the state is exactly the index
  * row, so the latest emission per term IS the index over everything
  * that has arrived — under ascending doc_id arrival (the gateway's
  * monotone-id contract) the 32-entry head equals the batch query's
  * first-32-by-id head at every prefix, making streamed == batch
  * exact (the st28 fixpoint discipline).
  *
  * Plan shape: term extraction is map-only (explode of a per-row bigram
  * transform); the ONLY shuffle is the stateful operator's exchange on
  * the term key. State per term is (df, total_tf, ≤32-entry head) —
  * bounded whatever the corpus; term-space growth rides the state store
  * (RocksDB at scale, the st9 posture). Per-document tf needs no
  * upstream aggregation: a document arrives WHOLE in one micro-batch,
  * so its occurrences sit together in the group iterator and tf is a
  * local count — nothing stateful below the one operator.
  */
object StreamingInvertedIndex {

  case class TermOcc(term: String, doc_id: Long)

  /** (df, total_tf, head as parallel arrays — case-class state keeps the
    * encoder flat; head is ≤32 (doc_id, tf) entries, doc_id-ascending). */
  case class TermState(df: Long, totalTf: Long,
      headDocs: List[Long], headTfs: List[Long])

  /** The batch query's row shape (postings_head = "doc:tf,..."). */
  case class TermRow(term: String, df: Long, total_tf: Long,
      postings_head: String)

  /** `docs` streaming frame with doc_id (long) + text (string); emits
    * each touched term's UPDATED index row per micro-batch. */
  def index(docs: DataFrame): Dataset[TermRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(size(w) - 1, 1)), " +
          "i -> concat(w[i-1], ' ', w[i]))")).as("term"))
      .filter(col("term").isNotNull)
      .as[(Long, String)]
      .map { case (d, t) => TermOcc(t, d) }
      .groupByKey(_.term)
      .flatMapGroupsWithState[TermState, TermRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (term: String, rows: Iterator[TermOcc], state: GroupState[TermState]) =>
          // a document arrives whole in one batch ⇒ its tf is local
          val batch = rows.toSeq.groupBy(_.doc_id)
            .map { case (d, os) => d -> os.size.toLong }
          val prev = state.getOption.getOrElse(TermState(0L, 0L, Nil, Nil))
          val merged = (prev.headDocs.zip(prev.headTfs) ++ batch.toSeq)
            .sortBy(_._1).take(32)
          val next = TermState(prev.df + batch.size,
            prev.totalTf + batch.values.sum,
            merged.map(_._1), merged.map(_._2))
          state.update(next)
          Iterator.single(TermRow(term, next.df, next.totalTf,
            merged.map { case (d, tf) => s"$d:$tf" }.mkString(",")))
      }
  }
}
