package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector arithmetic over ARRAY<FLOAT|DOUBLE> columns
  * (SURVEY §2.4k, the custom-Expression tier of the extension ladder).
  *
  * Why not higher-order functions: `aggregate(zip_with(a, b, ...), ...)`
  * is semantically right but `HigherOrderFunction` is CodegenFallback —
  * every element evaluates a lambda through the interpreted path and the
  * zip materializes an intermediate array per row (round-3 memory: the
  * same effect made HOF MinHash 3-4× slower than explode+agg). These
  * expressions keep the surrounding projection inside one
  * WholeStageCodegen span (static-call shape, like ParseLine) and run the
  * inner loop as tight JIT'd code over ArrayData with no per-element
  * allocation.
  *
  * Arithmetic contract (oracle-compatibility): identical to the HOF/DuckDB
  * formulation they replace — sequential left-to-right double accumulation
  * from 0.0, `cosine = dot / (sqrt(sumsq_a) * sqrt(sumsq_b))` — so results
  * are bit-identical to the previous plans and the DuckDB oracles.
  *
  * Error contract: embeddings are dense — a null element or a dimension
  * mismatch is corrupt input and fails fast with a clear message rather
  * than silently skewing similarity scores.
  */
object VecOps {

  private def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"vec_dot: dimension mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) throw new IllegalArgumentException(
        s"vec_dot: null element at position $i")
      acc += elem(a, aFloat, i) * elem(b, bFloat, i)
      i += 1
    }
    acc
  }

  def norm(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"vec_norm: null element at position $i")
      val v = elem(a, aFloat, i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  /** One-pass cosine; same value as dot/(norm*norm) because the three
    * accumulations are the same sequential sums the separate calls make. */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"vec_cosine: dimension mismatch ($n vs ${b.numElements()})")
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) throw new IllegalArgumentException(
        s"vec_cosine: null element at position $i")
      val x = elem(a, aFloat, i)
      val y = elem(b, bFloat, i)
      d += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Asymmetric-distance (ADC) lookup for product-quantized vectors:
    * codes[m] indexes subspace m's block of the flattened M×K query table,
    * so the approximate inner product is sum_m table[m*K + codes[m]].
    * K is derived from the operand shapes (table.len / codes.len). */
  def adc(codes: ArrayData, table: ArrayData): Double = {
    val m = codes.numElements()
    val k = table.numElements() / m
    if (table.numElements() != m * k || k == 0)
      throw new IllegalArgumentException(
        s"pq_adc: table length ${table.numElements()} not a multiple of code length $m")
    var acc = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) throw new IllegalArgumentException(
        s"pq_adc: null code at subspace $i")
      val c = codes.getInt(i)
      if (c < 0 || c >= k) throw new IllegalArgumentException(
        s"pq_adc: code $c out of range [0,$k) at subspace $i")
      acc += table.getDouble(i * k + c)
      i += 1
    }
    acc
  }

  private[functions] def checkVec(name: String, e: Expression): Option[String] =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => None
      case other => Some(s"$name expects ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
    }

  private[functions] def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-side constructors (Spark 4 Column↔Expression bridge). */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vec_norm(a: Column): Column =
    ColumnBridge.column(VecNorm(ColumnBridge.expression(a)))
  def vec_cosine(a: Column, b: Column): Column =
    ColumnBridge.column(VecCosine(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def pq_adc(codes: Column, table: Column): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(codes), ColumnBridge.expression(table)))

  /** SQL surface: `SELECT vec_cosine(embedding, qe) ...`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", es => VecDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm", es => VecNorm(es.head), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine", es => VecCosine(es(0), es(1)), "built-in")
  }
}

case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def checkInputDataTypes(): TypeCheckResult =
    (VecOps.checkVec(prettyName, left) orElse VecOps.checkVec(prettyName, right))
      .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], VecOps.isFloat(left),
      b.asInstanceOf[ArrayData], VecOps.isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps$$.MODULE$$.dot(" +
        s"$a, ${VecOps.isFloat(left)}, $b, ${VecOps.isFloat(right)});")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<INT>, ARRAY<DOUBLE>), got (${l.simpleString}, ${r.simpleString})")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps$$.MODULE$$.adc($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  override def checkInputDataTypes(): TypeCheckResult =
    VecOps.checkVec(prettyName, child)
      .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def nullSafeEval(a: Any): Any =
    VecOps.norm(a.asInstanceOf[ArrayData], VecOps.isFloat(child))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecOps$$.MODULE$$.norm($a, ${VecOps.isFloat(child)});")
  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  override def checkInputDataTypes(): TypeCheckResult =
    (VecOps.checkVec(prettyName, left) orElse VecOps.checkVec(prettyName, right))
      .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], VecOps.isFloat(left),
      b.asInstanceOf[ArrayData], VecOps.isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps$$.MODULE$$.cosine(" +
        s"$a, ${VecOps.isFloat(left)}, $b, ${VecOps.isFloat(right)});")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}
