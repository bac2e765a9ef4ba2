package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.MinHash

/** Streaming INCREMENTAL near-dup detection: as documents arrive, flag any
  * whose MinHash band key was already claimed — in this or ANY earlier
  * micro-batch — by a lower doc_id. This is online corpus dedup during
  * ingestion: a continuously-fed 100 TB corpus doesn't re-run batch LSH
  * over everything per appended shard; each shard only probes the
  * accumulated band→first-owner state.
  *
  * Plan shape: the signature is MAP-ONLY (operators.MinHash — shingle set,
  * minhashes and band keys as array expressions, no aggregation), so the
  * stateful operator's exchange on the band key is the pipeline's ONLY
  * shuffle. State per band key is a single Long (the first owner); state
  * cardinality = 3 × distinct contents, and the RocksDB state store
  * (StreamingSpec st9) keeps a 100 TB-scale keyspace off the executor
  * heap. Same band semantics as the batch pipeline (band index prefixed
  * into the key), so batch and streaming flag the same candidate pairs.
  */
object StreamingDedup {

  /** One (doc_id, band_key) row per band per arriving document. */
  case class BandRow(doc_id: Long, bk: String)

  /** `doc_id` shares `bk` with `first_doc`, the band's FIRST-SEEN owner
    * (arrival order, ties broken by min doc_id within a micro-batch — the
    * online-dedup convention: whoever arrived first keeps the content). */
  case class DupEvent(doc_id: Long, bk: String, first_doc: Long)

  /** `docs` must be a streaming frame with `doc_id` (long) and `text`
    * (string) columns; returns the append-mode stream of match events.
    * Doc-level verdicts (any band matched ⇒ near-dup candidate) are a
    * `dropDuplicates("doc_id")`/aggregation at the sink, exactly like the
    * batch pipeline's candidate→verify split.
    *
    * `initialOwners` (bk STRING, first_doc LONG — the shape
    * engine.SignatureStore.bandOwners produces) seeds the band→owner
    * state BEFORE the first micro-batch: a stream (re)started over an
    * existing corpus resumes against the whole accumulated history
    * WITHOUT replaying it — the persisted signature store holds exactly
    * the band keys the state needs, so bootstrap cost is one scan of the
    * store, not a re-shingle of 100 TB of text. */
  def dupEvents(docs: DataFrame,
      initialOwners: Option[DataFrame] = None): Dataset[DupEvent] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grouped = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(MinHash.bandKeys(MinHash.shingleArr(col("text")))).as("bk"))
      .as[BandRow]
      .groupByKey(_.bk)
    val fn = (bk: String, rows: Iterator[BandRow], state: GroupState[Long]) => {
      val batch = rows.map(_.doc_id).toSeq.sorted
      // first-seen wins: an established owner keeps the band even if a
      // lower doc_id arrives later (no retroactive re-assignment, so
      // no pair is ever silently missed under out-of-order arrival)
      val owner = state.getOption.getOrElse(batch.head)
      state.update(owner)
      batch.filter(_ != owner).distinct
        .map(d => DupEvent(d, bk, owner)).iterator
    }
    initialOwners match {
      case Some(own) =>
        val init = own
          .select(col("bk").cast("string"), col("first_doc").cast("long"))
          .as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2)
        grouped.flatMapGroupsWithState[Long, DupEvent](
          OutputMode.Append, GroupStateTimeout.NoTimeout, init)(fn)
      case None =>
        grouped.flatMapGroupsWithState[Long, DupEvent](
          OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
    }
  }
}
