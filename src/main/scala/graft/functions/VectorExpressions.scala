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

  /** JL sign projection (q_embed_project's matrix) as one tight JIT'd
    * loop: output coordinate j is Σ_i floor(v[i] · sgn(j,i) · 1e6 + 0.5)
    * over 1-based i, with sgn = ±1 from the parity of
    * h(k) = (k²·48271 + k·2654435761 + 7) mod 1000003, k = j·n + i
    * (n = input dimension; 64 on the fixture, matching the oracle's
    * hardcoded j*64+i). Multiplying by ±1 is exact in fp, so the term
    * equals the SQL's `floor(v * sign * 1e6 + 0.5)` bit for bit; the
    * ascending-i integer fold is the engine-independent canon. k ≤
    * out·n+n keeps k²·48271 far inside int64 for any realistic shape. */
  def projectSigned(v: ArrayData, isFloat: Boolean, out: Int): ArrayData = {
    val n = v.numElements()
    val res = new Array[Long](out)
    var j = 0
    while (j < out) {
      var acc = 0L
      var i = 1
      while (i <= n) {
        if (v.isNullAt(i - 1)) throw new IllegalArgumentException(
          s"vec_project: null element at position ${i - 1}")
        val x = elem(v, isFloat, i - 1)
        val k = j.toLong * n + i
        val h = (k * k * 48271L + k * 2654435761L + 7L) % 1000003L
        val s = 1L - 2L * (h % 2L)
        acc += math.floor(x * s * 1000000.0 + 0.5).toLong
        i += 1
      }
      res(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(res)
  }

  /** Dot product of two ARRAY<BIGINT> columns accumulated in DOUBLE —
    * the exact arithmetic of the SQL form it replaces
    * (`aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE) * CAST(y AS
    * DOUBLE)), 0.0D, +)`): each int64 term is cast to double BEFORE the
    * product, sequential left-to-right accumulation from 0.0. */
  def dotLong(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"vec_dot_long: dimension mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) throw new IllegalArgumentException(
        s"vec_dot_long: null element at position $i")
      acc += a.getLong(i).toDouble * b.getLong(i).toDouble
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
  def vec_project(a: Column, outDims: Int): Column =
    ColumnBridge.column(VecProject(ColumnBridge.expression(a), outDims))
  def vec_dot_long(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotL(ColumnBridge.expression(a), ColumnBridge.expression(b)))

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

/** [[VecOps.projectSigned]] as a native expression: ARRAY<FLOAT|DOUBLE>
  * → ARRAY<BIGINT> of `outDims` micro-quantized JL sign projections.
  * Replaces q_embed_project's 16×64-term `transform(aggregate(...))`
  * HigherOrderFunction tower (CodegenFallback: ~1024 interpreted lambda
  * evaluations + intermediate arrays PER ROW) with one JIT'd loop that
  * stays inside the surrounding WholeStageCodegen span. */
case class VecProject(child: Expression, outDims: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_project"
  override def checkInputDataTypes(): TypeCheckResult =
    if (outDims <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: outDims must be > 0")
    else VecOps.checkVec(prettyName, child)
      .map(TypeCheckResult.TypeCheckFailure).getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def nullSafeEval(a: Any): Any =
    VecOps.projectSigned(a.asInstanceOf[ArrayData], VecOps.isFloat(child), outDims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecOps$$.MODULE$$.projectSigned(" +
        s"$a, ${VecOps.isFloat(child)}, $outDims);")
  override protected def withNewChildInternal(newChild: Expression): VecProject =
    copy(child = newChild)
}

/** [[VecOps.dotLong]] as a native expression: dot of two ARRAY<BIGINT>
  * accumulated in double — the projected-space cosine companion of
  * [[VecProject]], same codegen rationale. */
case class VecDotL(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_long"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got (${l.simpleString}, ${r.simpleString})")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps$$.MODULE$$.dotLong($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotL =
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
