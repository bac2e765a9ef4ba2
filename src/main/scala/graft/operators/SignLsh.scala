package graft.operators

import java.util.concurrent.ConcurrentHashMap

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign-LSH bucketing for embedding columns — the shared candidate-blocking
  * key of q_dedup_embedding, q_decontaminate_semantic and q34c_knn_join.
  *
  * The bucket is the sign bit of the first `bits` vector elements packed
  * into an integer. Expected per-bucket occupancy is ~n / 2^bits, and a
  * bucketed SELF-join produces ~sum(occupancy²)/2 candidate pairs — so a
  * corpus K× larger under FIXED bits grows candidates ~K²/2^bits, the one
  * measured super-linear shape in SCALE.md §9 (fixed 8-bit: 4.48× wall-clock
  * at 50× corpus; 12-bit next to it: 1.32×). Holding occupancy constant
  * needs bits ≈ log2(n / targetOccupancy), which is what [[bitsFor]]
  * derives and what the operator entry points now use BY DEFAULT; the
  * oracle-checked queries alone pin bits=8 (their DuckDB SQL hardcodes the
  * 8-bit key, and at fixture scale auto resolves to 8 anyway).
  *
  * Recall note: more bits = fewer, purer buckets = lower recall for
  * near-but-not-sign-identical pairs (per-bit agreement for cosine c is
  * ~1 − arccos(c)/π). The near-dup threshold here is 0.8+ where agreement
  * is ≈0.8/bit on random hyperplanes — and the planted near-identical
  * pairs differ only in element 64, so any bits ≤ 63 keeps them
  * co-bucketed deterministically. The production recall knobs are
  * multiprobe (q34d) and multi-table LSH, not narrower buckets — narrower
  * buckets buy recall with quadratic candidate growth, the wrong trade at
  * scale.
  */
object SignLsh {

  /** Floor: what the oracle queries pin, and what small fixtures resolve
    * to. Ceiling: the key reads leading dims, and the planted near-dup
    * pairs differ in element 64 only — stay well below that (and keep
    * 1 << bits comfortably in Int range). */
  val MinBits = 8
  val MaxBits = 24

  /** Average bucket occupancy the auto default aims for. 32 reproduces the
    * measured-good points: n≈2k → 8 bits (clamped), n≈100k → 12 bits —
    * the exact pair measured in SCALE.md §9 (1.32× at 50× vs 4.48×). */
  val TargetOccupancy = 32L

  /** bits ≈ ceil(log2(n / targetOccupancy)), clamped to [MinBits, MaxBits].
    * Non-positive n (unknown / failed count) falls back to MinBits. */
  def bitsFor(corpusRows: Long,
      targetOccupancy: Long = TargetOccupancy): Int = {
    if (corpusRows <= 0) MinBits
    else {
      val raw = math.ceil(
        math.log(corpusRows.toDouble / targetOccupancy) / math.log(2.0)).toInt
      math.min(MaxBits, math.max(MinBits, raw))
    }
  }

  // One count per table path per JVM: the count is a metadata-cheap parquet
  // aggregate, but the operators are plan-BUILDERS and may be called
  // repeatedly (bench loops, tests). Fail-open: a failed count means MinBits
  // for THIS call only — never cached, so a transient failure (compaction
  // swap, momentary storage error) does not pin a 100k+ corpus to 8-bit
  // buckets for the JVM's lifetime. The count job also runs OUTSIDE the
  // map lock (computeIfAbsent must not block unrelated bins on a Spark job);
  // a duplicate count on a rare first-call race is the cheaper failure mode.
  private val countCache = new ConcurrentHashMap[String, java.lang.Long]()

  /** Derive the auto bucket width for a corpus, counting it at most once
    * per `cacheKey` (use the table path) per JVM. */
  def autoBits(cacheKey: String, corpus: => DataFrame): Int = {
    val cached = countCache.get(cacheKey)
    val n =
      if (cached != null) cached.longValue()
      else Try(corpus.count()) match {
        case scala.util.Success(c) =>
          countCache.putIfAbsent(cacheKey, Long.box(c)); c
        case scala.util.Failure(_) => -1L // fail-open, retry next call
      }
    bitsFor(n)
  }

  /** The packed sign-bit bucket key over the first `bits` elements. */
  def bucketExpr(embedding: Column, bits: Int): Column =
    bucketExpr(embedding, bits, 0)

  /** Bucket key over elements [offset+1, offset+bits] — table `t` of a
    * multi-table LSH uses offset = t*bits, so the tables read DISJOINT
    * sign coordinates and a near-dup pair split by one table's
    * disagreeing bit is recovered by another (the union's recall is
    * 1-(1-p^bits)^T for per-bit agreement p, vs p^bits single-table).
    * offset+bits stays ≤ 63: element 64 is the planted-pair perturbation
    * coordinate (see DedupQueries.plantedEmbeddings). */
  def bucketExpr(embedding: Column, bits: Int, offset: Int): Column = {
    require(bits >= 1 && bits <= MaxBits, s"sign-LSH bits out of range: $bits")
    require(offset >= 0 && offset + bits <= 63,
      s"sign-LSH window out of range: offset=$offset bits=$bits")
    (1 to bits).map(i =>
      when(element_at(embedding, offset + i) >= 0, lit(1 << (i - 1)))
        .otherwise(lit(0))).reduce(_ + _)
  }
}
