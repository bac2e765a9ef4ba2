package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.protocol.{FieldValue, LineProtocol}

/** `parse_line_expr(line)` as a native Catalyst expression (SURVEY §7.5):
  * the custom-`Expression` surface of §2.4k, one step down from a Scala UDF —
  * no Row encoder round-trip; the struct is built directly as InternalRow
  * data (UTF8String/ArrayBasedMapData), and nulls propagate via
  * UnaryExpression's null-intolerant eval.
  *
  * Returns STRUCT<measurement, tags MAP, fields MAP<STRING,DOUBLE>,
  * fields_int MAP<STRING,BIGINT>, fields_str MAP<STRING,STRING>,
  * fields_bool MAP<STRING,BOOLEAN>, ts LONG, error STRING> (FIXTURES.md
  * §A.2 + typed-field union + error slot); `ts`/`error` are null when
  * absent.
  */
case class ParseLine(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ParseLine.schema

  /** Codegen (SURVEY §7.5 stretch goal): emit a static call instead of
    * falling back to interpreted eval — the surrounding projection stays
    * inside one WholeStageCodegen span (the same staticinvoke shape many
    * built-in expressions compile to). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.ParseLine$$.MODULE$$.evalStatic($input);")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_line_expr expects STRING, got ${child.dataType.simpleString}")
  override def prettyName: String = "parse_line_expr"

  override def nullSafeEval(input: Any): Any =
    ParseLine.evalStatic(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): ParseLine =
    copy(child = newChild)
}

object ParseLine {

  /** Shared by interpreted eval and generated code (static call target). */
  def evalStatic(input: UTF8String): InternalRow = {
    def utf8Map(m: Seq[(String, Any)]): ArrayBasedMapData =
      new ArrayBasedMapData(
        new GenericArrayData(m.map(kv => UTF8String.fromString(kv._1))),
        new GenericArrayData(m.map(kv => kv._2 match {
          case s: String => UTF8String.fromString(s)
          case other     => other
        })))
    LineProtocol.parse(input.toString) match {
      case Right(r) =>
        // dedupe repeated keys (last wins) — Spark maps must not contain
        // duplicates, and this matches the parse_line UDF's .toMap
        InternalRow(
          UTF8String.fromString(r.measurement),
          utf8Map(r.tags.toMap.toSeq),
          utf8Map(r.fields.collect {
            case (k, FieldValue.FloatV(v)) => k -> v }.toMap.toSeq),
          utf8Map(r.fields.collect {
            case (k, FieldValue.IntV(v)) => k -> v }.toMap.toSeq),
          utf8Map(r.fields.collect {
            case (k, FieldValue.StringV(v)) => k -> v }.toMap.toSeq),
          utf8Map(r.fields.collect {
            case (k, FieldValue.BoolV(v)) => k -> v }.toMap.toSeq),
          r.timestamp.map(java.lang.Long.valueOf).orNull,
          null)
      case Left(err) =>
        InternalRow(null, null, null, null, null, null, null,
          UTF8String.fromString(err))
    }
  }

  val schema: StructType = StructType(Seq(
    StructField("measurement", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("fields", MapType(StringType, DoubleType)),
    StructField("fields_int", MapType(StringType, LongType)),
    StructField("fields_str", MapType(StringType, StringType)),
    StructField("fields_bool", MapType(StringType, BooleanType)),
    StructField("ts", LongType),
    StructField("error", StringType)))

  /** Column-side constructor (Spark 4: Column is ColumnNode-backed; the
    * bridge converts to/from a Catalyst Expression). */
  def parse_line_expr(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ParseLine(ColumnBridge.expression(c)))
  }

  /** SQL registration: `SELECT parse_line_expr(value) ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_line_expr", exprs => ParseLine(exprs.head), "built-in")
}
