package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.protocol.{FieldValue, LineProtocol}

/** `explode_line(line)` — a custom Catalyst GENERATOR (the UDTF rung of
  * the §2.4k extension ladder, beside the scalar ParseLine expression and
  * the WeightedAvg Aggregator): one input line-protocol string generates
  * one output row PER FIELD, with the reference's per-field fan-out
  * semantics (refluxdb src/handlers.rs:113-134) and the typed value
  * union. The output schema is exactly the DSv2 source's
  * (sources.LineProtocolSource.schema), so
  * `SELECT explode_line(value) FROM raw_lines` ≡ reading the same lines
  * through `format("lineprotocol")` — one semantics, two surfaces.
  *
  * Unparseable lines generate a single row with `parse_error` set
  * (permissive-auditable, same posture as the source and the ingest
  * quarantine); NULL input generates nothing, like explode(NULL).
  *
  * Execution: the analyzer turns a generator call in a SELECT into a
  * `Generate` node — the fan-out happens inside GenerateExec's pipeline,
  * never by materializing an intermediate array. CodegenFallback is the
  * standard posture for custom generators (GenerateExec only codegens a
  * fixed built-in set); the per-row cost is one parse, same as the
  * source's reader.
  */
case class ExplodeLine(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = graft.sources.LineProtocolSource.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"explode_line expects STRING, got ${child.dataType.simpleString}")

  override def prettyName: String = "explode_line"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else ExplodeLine.rows(v.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildInternal(newChild: Expression): ExplodeLine =
    copy(child = newChild)
}

object ExplodeLine {

  /** Per-field fan-out rows for one line (shared with tests). The typed
    * dispatch below must stay in lockstep with the DSv2 reader's pruned
    * column writers — FunctionsSpec pins byte-equivalence of the two
    * surfaces, and the tags MapData builder is shared outright. */
  def rows(line: String): Seq[InternalRow] =
    LineProtocol.parse(line) match {
      case Right(r) =>
        val tags = graft.sources.LineProtocolSource.tagsMapData(r.tags.toMap)
        val ts = r.timestamp.map(java.lang.Long.valueOf).orNull
        r.fields.map { case (name, fv) =>
          val (d, l, s, b): (Any, Any, Any, Any) = fv match {
            case FieldValue.FloatV(x) =>
              (java.lang.Double.valueOf(x), null, null, null)
            case FieldValue.IntV(x) =>
              (null, java.lang.Long.valueOf(x), null, null)
            case FieldValue.StringV(x) =>
              (null, null, UTF8String.fromString(x), null)
            case FieldValue.BoolV(x) =>
              (null, null, null, java.lang.Boolean.valueOf(x))
          }
          InternalRow(UTF8String.fromString(r.measurement),
            UTF8String.fromString(name), d, l, s, b, ts, tags, null)
        }
      case Left(err) =>
        Seq(InternalRow(null, null, null, null, null, null, null, null,
          UTF8String.fromString(err)))
    }

  /** Column-side constructor (use inside `select`, like `explode`). */
  def explode_line(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(ExplodeLine(ColumnBridge.expression(c)))
  }

  /** Arity-checked builder for SQL registration paths: a bad call count
    * must surface as the standard WRONG_NUM_ARGS analysis error naming
    * the function, not a raw NoSuchElementException from `exprs.head`
    * (round-6 ADVICE). */
  def fromArgs(exprs: Seq[Expression]): ExplodeLine = {
    if (exprs.length != 1)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map("functionName" -> "`explode_line`", "expectedNum" -> "1",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    ExplodeLine(exprs.head)
  }

  /** SQL registration: `SELECT explode_line(value) FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "explode_line", fromArgs, "built-in")
}
