package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd text-classifier scoring (SURVEY §2.4k, the same
  * custom-Expression tier as [[VecOps]]).
  *
  * Why: the hashing-trick classifier canon (q_text_classifier, reused by
  * q_pipeline_clean and q_sample_quality) was expressed as a
  * `filter(split(...))` + `aggregate(transform(...))` tower — FOUR
  * `HigherOrderFunction`s, all CodegenFallback: per-document it
  * interpreted ~2·n_tok lambda calls, materialized the token array, the
  * bigram STRING array (one new string per bigram!) and two weight
  * arrays. This expression computes the identical integer arithmetic in
  * ONE pass over the raw text with zero intermediate materialization,
  * and stays inside the surrounding WholeStageCodegen span (static-call
  * shape, like ParseLine/VecProject).
  *
  * Arithmetic contract (oracle-compatibility, bit-exact):
  *  - tokens are maximal runs of non-space code points — exactly
  *    `filter(split(text, ' '), tk -> length(tk) > 0)`;
  *  - unigram hash: `fold(0, tok)` with `h' = (h*31 + cp) % 1000003`
  *    over code points — exactly `aggregate(sequence(1, length(tk)), 0,
  *    (h, i) -> (h*31 + ascii(substring(tk, i, 1))) % 1000003)` (the
  *    corpus is ASCII; for ASCII `ascii(substring)` IS the code point);
  *  - bigram hash: `fold(0, tokA || '_' || tokB)`, computed WITHOUT
  *    building the string via the Horner identity
  *    `fold(seed, s) = (seed * 31^|s| + fold(0, s)) mod p` — each
  *    token's `fold(0, tok)` and `31^|tok| mod p` come from the same
  *    single char loop;
  *  - weight: `(((h % 4096) * 2654435761) % 1000003) % 2001 - 1000`
  *    (all operands non-negative, so JVM `%` == SQL `%` here).
  *
  * Returns `ARRAY<BIGINT> [n_tok, uni_score, bi_score]` — the token
  * count rides along free, so call sites also drop their `size(w)`
  * (and with it the last lambda) from the hot path.
  */
object TextOps {

  private final val P = 1000003L

  @inline private def weight(h: Long): Long =
    (((h % 4096L) * 2654435761L) % P) % 2001L - 1000L

  def classifierScores(text: UTF8String): ArrayData = {
    val s = text.toString
    val len = s.length
    var nTok = 0L
    var uni = 0L
    var bi = 0L
    var prevRaw = 0L // fold(0, previous token)
    var raw = 0L // fold(0, current token) so far
    var pow = 1L // 31^(code points consumed of current token) mod P
    var inTok = false
    var i = 0
    while (i <= len) {
      // one virtual trailing separator closes the final token
      if (i == len || s.charAt(i) == ' ') {
        if (inTok) {
          uni += weight(raw)
          // fold(0, prev || '_' || cur) via Horner; ascii('_') == 95
          if (nTok > 0) bi += weight((((prevRaw * 31L + 95L) % P) * pow + raw) % P)
          prevRaw = raw
          nTok += 1
          raw = 0L
          pow = 1L
          inTok = false
        }
        i += 1
      } else {
        val cp = s.codePointAt(i)
        raw = (raw * 31L + cp) % P
        pow = (pow * 31L) % P
        inTok = true
        i += Character.charCount(cp)
      }
    }
    new GenericArrayData(Array(nTok, uni, bi))
  }

  /** One-pass per-document repetition statistics (the q_text_repetition
    * canon, map-only): over the RAW space-split tokens (empties kept —
    * the query's documented tokenization), bigram/trigram occurrence and
    * distinct counts plus the top bigram by (count DESC, gram ASC).
    * Gram construction mirrors the SQL form exactly, including the
    * short-document pseudo-grams: a 1-token document's "bigram" and
    * "trigram" are the token itself, a 2-token document's "trigram" is
    * the pair — `slice(w, i, k)` just runs out of tokens.
    *
    * Returns STRUCT(n2, n2d, n3, n3d, top_bigram, top_cnt). Per-row
    * hash maps are bounded by document length; the operator becomes a
    * single map stage over the scan instead of a gram-string groupBy +
    * doc-partition window (two shuffles of gram text at any corpus
    * size).
    */
  def repetitionStats(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val n2 = math.max(n - 1, 1)
    val n3 = math.max(n - 2, 1)
    val big = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n2) {
      val g = if (n == 1) toks(0) else toks(i) + " " + toks(i + 1)
      big.merge(g, 1L, _ + _)
      i += 1
    }
    val tri = new java.util.HashSet[String]()
    i = 0
    while (i < n3) {
      val last = math.min(i + 2, n - 1)
      val sb = new java.lang.StringBuilder(toks(i))
      var j = i + 1
      while (j <= last) { sb.append(' ').append(toks(j)); j += 1 }
      tri.add(sb.toString)
      i += 1
    }
    var topG: String = null
    var topC = 0L
    val it = big.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > topC ||
        (e.getValue == topC && (topG == null || e.getKey.compareTo(topG) < 0))) {
        topG = e.getKey
        topC = e.getValue
      }
    }
    new GenericInternalRow(Array[Any](n2.toLong, big.size.toLong,
      n3.toLong, tri.size.toLong, UTF8String.fromString(topG), topC))
  }

  /** Gopher/MassiveText rule inputs (q_text_gopher, map-only): one pass
    * over the space-split fields (empties kept, like the SQL split),
    * counting words, code-point word lengths, stopword hits (the
    * MassiveText "stop word" presence rule's word list) and short
    * (≤3 code points) words. The micro-unit ratios and the pass/fail
    * flag stay in the DataFrame layer — this expression only removes
    * the per-word lambda tower from the hot path.
    * Returns STRUCT(n_words, sum_wlen, stop_hits, short_words). */
  def gopherStats(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    var nWords = 0L
    var sumW = 0L
    var stop = 0L
    var short = 0L
    var i = 0
    while (i < toks.length) {
      val tk = toks(i)
      val wl = tk.codePointCount(0, tk.length).toLong
      nWords += 1L
      sumW += wl
      if (wl <= 3L) short += 1L
      // the MassiveText stop-word list (Rae et al. 2021, app. A1.1)
      if (tk == "the" || tk == "a" || tk == "of" || tk == "to" ||
        tk == "and" || tk == "in") stop += 1L
      i += 1
    }
    new GenericInternalRow(Array[Any](nWords, sumW, stop, short))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-side constructors. */
  def classifier_scores(text: Column): Column =
    ColumnBridge.column(ClassifierScores(ColumnBridge.expression(text)))
  def repetition_stats(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))
  def gopher_stats(text: Column): Column =
    ColumnBridge.column(GopherStats(ColumnBridge.expression(text)))

  /** SQL surface: `SELECT classifier_scores(text) ...`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "classifier_scores", es => ClassifierScores(es.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "repetition_stats", es => RepetitionStats(es.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gopher_stats", es => GopherStats(es.head), "built-in")
  }
}

/** [[TextOps.classifierScores]] as a native expression:
  * STRING → ARRAY<BIGINT> [n_tok, uni_score, bi_score]. */
case class ClassifierScores(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "classifier_scores"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.simpleString}")
  }
  override def nullSafeEval(t: Any): Any =
    TextOps.classifierScores(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextOps$$.MODULE$$.classifierScores($t);")
  override protected def withNewChildInternal(newChild: Expression): ClassifierScores =
    copy(child = newChild)
}

/** [[TextOps.repetitionStats]] as a native expression:
  * STRING → STRUCT(n2, n2d, n3, n3d, top_bigram, top_cnt). */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n2", LongType, nullable = false),
    StructField("n2d", LongType, nullable = false),
    StructField("n3", LongType, nullable = false),
    StructField("n3d", LongType, nullable = false),
    StructField("top_bigram", StringType, nullable = false),
    StructField("top_cnt", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.simpleString}")
  }
  override def nullSafeEval(t: Any): Any =
    TextOps.repetitionStats(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextOps$$.MODULE$$.repetitionStats($t);")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** [[TextOps.gopherStats]] as a native expression:
  * STRING → STRUCT(n_words, sum_wlen, stop_hits, short_words). */
case class GopherStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_wlen", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("short_words", LongType, nullable = false)))
  override def prettyName: String = "gopher_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.simpleString}")
  }
  override def nullSafeEval(t: Any): Any =
    TextOps.gopherStats(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextOps$$.MODULE$$.gopherStats($t);")
  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}
