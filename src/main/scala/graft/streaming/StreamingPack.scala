package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the online twin of q_pack_chop (the
  * concatenate-and-chop training-sequence layout): documents arriving on
  * a stream are assigned their training sequence THE MOMENT THEY ARRIVE,
  * because chop-packing depends only on the running token total per
  * source — ONE long of state. This is the ingestion end of a training-
  * data pipeline: docs flow from curation into numbered 256-token
  * sequences continuously, no batch re-pack, and the assignment equals
  * what the batch chop over the complete corpus would produce (st30).
  *
  * State per source: the cumulative token count before the next doc
  * (a single int64 — contrast next-fit packing, whose bin state would
  * also be O(1) but whose assignments depend on bin-boundary history;
  * chop's prefix-sum dependence is what makes online == batch EXACT).
  *
  * ORDERING PRECONDITION (the [[StreamingRate]] family contract): the
  * fixpoint holds when docs arrive in ascending doc_id order per source
  * — the curation pipeline's append order. In-batch rows are sorted by
  * doc_id; cross-batch regressions would mis-place the regressed doc.
  */
object StreamingPack {

  case class Doc(source: String, doc_id: Long, tok: Long)

  case class PackedDoc(source: String, doc_id: Long, tok: Long,
      seq_id: Long, off_in_seq: Long, straddle: Boolean)

  /** `docs` must carry source, doc_id, text — text NON-NULL (the typed
    * decode's primitive tok slot dies on a null-text token count; the
    * corpus schema and the batch twin both carry text as required).
    * Emits each doc's sequence assignment under budget-token chop
    * packing per source. */
  def pack(docs: DataFrame, budget: Long = 256L): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source").cast("string"), col("doc_id").cast("long"),
        size(expr("filter(split(text, ' '), w -> length(w) > 0)"))
          .cast("long").as("tok"))
      .as[Doc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[Doc], state: GroupState[Long]) =>
          var prev = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { d =>
            val seq = prev / budget
            val straddle = d.tok > 0 && (prev + d.tok - 1) / budget > seq
            val packed = PackedDoc(src, d.doc_id, d.tok, seq,
              prev - seq * budget, straddle)
            prev += d.tok
            packed
          }
          state.update(prev)
          out.iterator
      }
  }
}
