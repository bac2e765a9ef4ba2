package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-side constructor. */
  def classifier_scores(text: Column): Column =
    ColumnBridge.column(ClassifierScores(ColumnBridge.expression(text)))

  /** SQL surface: `SELECT classifier_scores(text) ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "classifier_scores", es => ClassifierScores(es.head), "built-in")
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
