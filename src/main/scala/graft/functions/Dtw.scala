package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native banded Dynamic Time Warping distance (Sakoe & Chiba 1978)
  * over ARRAY<BIGINT> series — the alignment-tolerant similarity the
  * Pearson family (q_cross_corr) cannot express: two series with the
  * same shape shifted by a lag correlate poorly but DTW-match cheaply.
  *
  * Why native (the [[EditDistanceOps]] argument): the banded DP is an
  * O(n·band) inner loop per pair; as a UDF it would exit whole-stage
  * codegen and pay serialization per row. The static-call shape keeps
  * the surrounding projection in one codegen span and reuses two
  * ThreadLocal DP rows — zero allocation per call.
  *
  * Semantics: classic DTW with unit steps {(1,0),(0,1),(1,1)}, cost
  * |x_i − y_j|, Sakoe-Chiba band |i−j| ≤ band. ALL-INTEGER: inputs are
  * int64 (cents/micro series), the distance is an exact int64 both
  * engines compute bit-identically — the DuckDB oracle runs the same
  * DP as a recursive CTE over anti-diagonals (two carried LIST
  * columns), so the gate hash-checks the kernel integer-for-integer.
  *
  * Cost/feasibility contract: callers bound the series length (PAA
  * compression upstream — the q_dtw discipline) and guarantee
  * |n−m| ≤ band (equal-length PAA vectors by construction); a pair the
  * band cannot align is corrupt input and fails fast (VecOps error
  * contract) rather than returning a sentinel a ranking would absorb.
  */
object DtwOps {

  private final val Inf = 1L << 40

  // two DP rows, reused across calls (one thread per Spark task)
  private val rowsTl = new ThreadLocal[Array[Array[Long]]] {
    override def initialValue(): Array[Array[Long]] =
      Array(new Array[Long](64), new Array[Long](64))
  }

  def dtwBand(x: ArrayData, y: ArrayData, band: Int): Long = {
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 || m == 0) throw new IllegalArgumentException(
      s"dtw_band: empty series ($n, $m)")
    if (math.abs(n - m) > band) throw new IllegalArgumentException(
      s"dtw_band: band $band cannot align lengths ($n, $m)")
    var rows = rowsTl.get()
    if (rows(0).length < m) {
      rows = Array(new Array[Long](m), new Array[Long](m))
      rowsTl.set(rows)
    }
    var prev = rows(0)
    var curr = rows(1)
    var i = 0
    while (i < n) {
      val xi = x.getLong(i)
      // whole-row INF first: the next row reads one past this row's band
      var j = 0
      while (j < m) { curr(j) = Inf; j += 1 }
      j = math.max(0, i - band)
      val hi = math.min(m - 1, i + band)
      while (j <= hi) {
        val c = math.abs(xi - y.getLong(j))
        val best =
          if (i == 0 && j == 0) 0L
          else {
            var b = if (i > 0) prev(j) else Inf
            if (j > 0 && curr(j - 1) < b) b = curr(j - 1)
            if (i > 0 && j > 0 && prev(j - 1) < b) b = prev(j - 1)
            b
          }
        curr(j) = c + best
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    val d = prev(m - 1)
    if (d >= Inf) throw new IllegalArgumentException(
      s"dtw_band: no in-band alignment for lengths ($n, $m), band $band")
    d
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-side constructor (band is a plan-time constant). */
  def dtw_band(x: Column, y: Column, band: Int): Column =
    ColumnBridge.column(DtwBand(
      ColumnBridge.expression(x), ColumnBridge.expression(y), band))

  /** SQL surface: `SELECT dtw_band(x, y, 4)` — the band argument must
    * be a foldable integer expression (it parameterizes the generated
    * kernel, so it is evaluated once at registration/plan time). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dtw_band", es => {
        if (es.length != 3) throw new IllegalArgumentException(
          s"dtw_band: expected 3 arguments (x, y, band), got ${es.length}")
        val band = es(2) match {
          // foldable covers literals AND constant arithmetic (2+2)
          case e if e.foldable => e.eval() match {
            case v: Int => v
            case v: Long => v.toInt
            case v: Short => v.toInt
            case other => throw new IllegalArgumentException(
              s"dtw_band: band must be an integer constant, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"dtw_band: band must be an integer constant, got $other")
        }
        DtwBand(es.head, es(1), band)
      }, "built-in")
}

/** [[DtwOps.dtwBand]] as a native expression:
  * (ARRAY<BIGINT>, ARRAY<BIGINT>) → BIGINT. The band rides as a
  * constructor constant (plan-time literal), not a child expression. */
case class DtwBand(left: Expression, right: Expression, band: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "dtw_band"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    DtwOps.dtwBand(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], band)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DtwOps$$.MODULE$$" +
        s".dtwBand($a, $b, $band);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DtwBand =
    copy(left = newLeft, right = newRight)
}
