package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming labeler-agreement monitoring (st31) — the online twin of
  * `q_label_kappa`: as documents arrive, both weak labelers run map-side
  * (labeler A = the native hashing-trick classifier gate, labeler B =
  * the n_chars length rule) and a per-source confusion matrix
  * accumulates in state; each batch emits the post-batch Cohen's kappa
  * readout for every source it touched. This is how a curation fleet
  * actually watches labeler drift: a kappa trend per source, updated
  * per micro-batch, not a nightly batch job.
  *
  * State per source is FOUR LONGS (n11/n10/n01/n00) — catalog-sized
  * total state at any corpus size, RocksDB-ready. The kappa arithmetic
  * is the batch query's exact fixed-order formula over exact integer
  * counts, so after any prefix of the corpus the online readout equals
  * the batch query run over that prefix EXACTLY (not an fp bound) —
  * StreamingSpec st31 pins this across a micro-batch boundary.
  */
object StreamingKappa {

  case class LabeledDoc(source: String, a: Boolean, b: Boolean)

  case class KappaReadout(source: String, n: Long, n11: Long, n10: Long,
      n01: Long, n00: Long, po_micro: Long, pe_micro: Long,
      kappa_micro: Long)

  /** `docs` must carry source, text, n_chars. Emits one readout per
    * (batch, touched source). */
  def agreement(docs: DataFrame): Dataset[KappaReadout] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("cs",
        graft.functions.TextOps.classifier_scores(col("text")))
      .select(col("source"),
        (col("cs").getItem(1) + col("cs").getItem(2) >= 0).as("a"),
        (col("n_chars") >= 300).as("b"))
      .as[LabeledDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[(Long, Long, Long, Long), KappaReadout](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[LabeledDoc],
            state: GroupState[(Long, Long, Long, Long)]) =>
          var (n11, n10, n01, n00) =
            state.getOption.getOrElse((0L, 0L, 0L, 0L))
          rows.foreach { r =>
            if (r.a && r.b) n11 += 1L
            else if (r.a) n10 += 1L
            else if (r.b) n01 += 1L
            else n00 += 1L
          }
          state.update((n11, n10, n01, n00))
          // the batch query's formula, same op order: po/pa/pb from
          // exact longs, pe from the marginals, each micro-floored
          val n = n11 + n10 + n01 + n00
          val po = (n11 + n00).toDouble / n.toDouble
          val pa = (n11 + n10).toDouble / n.toDouble
          val pb = (n11 + n01).toDouble / n.toDouble
          val pe = pa * pb + (1.0 - pa) * (1.0 - pb)
          def micro(x: Double): Long =
            math.floor(x * 1000000.0 + 0.5).toLong
          Iterator.single(KappaReadout(src, n, n11, n10, n01, n00,
            micro(po), micro(pe), micro((po - pe) / (1.0 - pe))))
      }
  }
}
