package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native full Damerau-Levenshtein distance (SURVEY §2.4k tier —
  * the [[TextOps]]/[[VecOps]] custom-Expression class).
  *
  * Why native: Spark ships `levenshtein` but nothing with
  * transpositions, and the record-linkage canon (typo dedup, entity
  * resolution) wants the transposition-aware metric — "hte"→"the" is
  * ONE keystroke error, not two. A Scala UDF would exit whole-stage
  * codegen and pay serialization per row; this expression stays in the
  * generated code via the static-call shape (like ParseLine/VecProject)
  * and allocates only the DP table.
  *
  * Semantics: the FULL metric (Lowrance & Wagner 1975), not the
  * restricted/OSA variant — an adjacent transposition costs 1 even with
  * later intervening edits ('CA'→'ABC' = 2, where OSA says 3). This is
  * exactly DuckDB's `damerau_levenshtein` (validated on 3 000 random
  * pairs, zero mismatches), so the oracle cross-checks the native code
  * path integer-for-integer. Distances compare on UTF-16 units; on
  * ASCII (this corpus) that equals code points on both engines.
  *
  * Cost contract: O(|a|·|b|) time and space per pair — callers bound
  * the inputs (blocking + fixed prefixes, the q_text_levenshtein
  * discipline); the expression itself never sees unbounded text.
  */
object EditDistanceOps {

  // per-task scratch (one thread per Spark task, so ThreadLocal reuse is
  // safe inside codegen): the DP table grows on demand; `da` ("last row
  // where char occurred in a") is an array for BMP chars, cleared only
  // over the touched entries after each call
  private val dpTl = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](64 * 64)
  }
  private val daTl = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](65536)
  }

  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val inf = la + lb
    val w = lb + 2 // row width of the (la+2) × (lb+2) DP table
    val need = (la + 2) * w
    var d = dpTl.get()
    if (d.length < need) { d = new Array[Int](need); dpTl.set(d) }
    d(0) = inf
    var i = 0
    while (i <= la) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val da = daTl.get()
    i = 1
    while (i <= la) {
      var db = 0 // last column in this row where a(i-1) matched b
      val ai = a.charAt(i - 1)
      var jj = 1
      while (jj <= lb) {
        val bj = b.charAt(jj - 1)
        val k = da(bj)
        val l = db
        val cost = if (ai == bj) { db = jj; 0 } else 1
        val sub = d(i * w + jj) + cost
        val ins = d((i + 1) * w + jj) + 1
        val del = d(i * w + jj + 1) + 1
        val tra = d(k * w + l) + (i - k - 1) + 1 + (jj - l - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (tra < m) m = tra
        d((i + 1) * w + jj + 1) = m
        jj += 1
      }
      da(ai) = i
      i += 1
    }
    // clear only the entries this call wrote — O(la), not O(65536)
    i = 1
    while (i <= la) { da(a.charAt(i - 1)) = 0; i += 1 }
    d((la + 1) * w + lb + 1).toLong
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-side constructor. */
  def damerau_levenshtein(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL surface: `SELECT damerau_levenshtein(a, b)` — same name as
    * DuckDB's built-in, so oracle SQL reads identically on both sides. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "damerau_levenshtein", es => DamerauLevenshtein(es.head, es(1)),
      "built-in")
}

/** [[EditDistanceOps.damerauLevenshtein]] as a native expression:
  * (STRING, STRING) → BIGINT. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "damerau_levenshtein"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (STRING, STRING), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceOps.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditDistanceOps$$.MODULE$$" +
        s".damerauLevenshtein($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}
