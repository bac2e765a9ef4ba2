package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.protocol.{FieldValue, LineProtocol}

/** DataSource V2 batch source for InfluxDB line-protocol files:
  * `spark.read.format("lineprotocol").load(path)` (SURVEY §7.5's custom-
  * source extension point, reference ingest E3 as a first-class Spark
  * source instead of text+parse).
  *
  * One output row per FIELD per line (the reference's per-field fan-out
  * R5, refluxdb src/handlers.rs:113-134) with the typed value union;
  * unparseable lines surface as rows with `parse_error` set (permissive,
  * auditable — same posture as the ingest quarantine).
  *
  * Scale shape: one InputPartition per file (line protocol is
  * newline-framed text; a production splitter would chunk large files at
  * newline boundaries — files from UDP/HTTP gateways are micro-batch
  * sized, so per-file is the honest default), column pruning pushed into
  * the reader (`SupportsPushDownRequiredColumns` — un-projected columns
  * are never materialized into rows).
  */
class LineProtocolSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "lineprotocol"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LineProtocolSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LineProtocolTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException(
        "lineprotocol source requires a path")))
}

object LineProtocolSource {
  val schema: StructType = StructType(Seq(
    StructField("series", StringType),
    StructField("name", StringType),
    StructField("value", DoubleType),
    StructField("value_long", LongType),
    StructField("value_str", StringType),
    StructField("value_bool", BooleanType),
    StructField("time_ns", LongType),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false)),
    StructField("parse_error", StringType)))
}

class LineProtocolTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"lineprotocol:$path"
  override def schema(): StructType = LineProtocolSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LineProtocolScanBuilder(path,
      org.apache.spark.sql.SparkSession.active)
}

class LineProtocolScanBuilder(path: String,
    spark: org.apache.spark.sql.SparkSession)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = LineProtocolSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def listFiles(): Seq[String] = {
    val hadoop = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(hadoop)
    if (fs.isDirectory(p))
      fs.listStatus(p).filter(_.isFile).map(_.getPath)
        // in-flight temp and hidden files (the gateway's `.x.tmp` staging
        // names) are not yet atomically visible data
        .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
        .map(_.toString).toSeq.sorted
    else Seq(path)
  }

  private def readerFactory(): PartitionReaderFactory =
    LineProtocolReaderFactory(required,
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"lineprotocol $path, columns=${required.fieldNames.mkString(",")}"

    override def planInputPartitions(): Array[InputPartition] =
      listFiles().map(f => LineProtocolInputPartition(f): InputPartition)
        .toArray

    override def createReaderFactory(): PartitionReaderFactory =
      readerFactory()

    /** Micro-batch stream over a spool directory (SURVEY §7.5's custom
      * MicroBatchStream, completing the UDP/HTTP gateway story natively:
      * gateway spools atomically-visible files, this source tails them).
      * An offset is the SET of files seen (JSON array) — exact and
      * restart-safe for gateway-scale spools; a production source bounds
      * the offset with a compacted seen-files log like Spark's
      * FileStreamSource. Files are immutable once visible (atomic
      * rename), so (end minus start) is exactly the new data. */
    override def toMicroBatchStream(checkpointLocation: String)
        : MicroBatchStream = new MicroBatchStream {
      import org.apache.spark.sql.connector.read.streaming.Offset

      def offsetOf(files: Seq[String]): LineProtocolOffset =
        LineProtocolOffset(files.sorted)

      override def initialOffset(): Offset = offsetOf(Seq.empty)
      override def latestOffset(): Offset = offsetOf(listFiles())
      override def deserializeOffset(json: String): Offset =
        LineProtocolOffset.fromJson(json)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()

      override def planInputPartitions(start: Offset,
          end: Offset): Array[InputPartition] = {
        val seen = start.asInstanceOf[LineProtocolOffset].files.toSet
        end.asInstanceOf[LineProtocolOffset].files
          .filterNot(seen)
          .map(f => LineProtocolInputPartition(f): InputPartition)
          .toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        readerFactory()
    }
  }
}

/** Offset = sorted seen-file list, serialized as a JSON string array. */
case class LineProtocolOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    compact(render(files))
  }
}

object LineProtocolOffset {
  def fromJson(json: String): LineProtocolOffset = {
    import org.json4s.jackson.JsonMethods._
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    LineProtocolOffset(parse(json).extract[Seq[String]].sorted)
  }
}

case class LineProtocolInputPartition(file: String) extends InputPartition

case class LineProtocolReaderFactory(required: StructType,
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new LineProtocolPartitionReader(
      p.asInstanceOf[LineProtocolInputPartition].file, required, conf)
}

/** Reads one line-protocol file, parsing each line ONCE and emitting the
  * per-field fan-out rows projected to the pruned schema. */
class LineProtocolPartitionReader(file: String, required: StructType,
    conf: SerializableConfiguration) extends PartitionReader[InternalRow] {

  private val in = {
    val p = new Path(file)
    val fs = p.getFileSystem(conf.value)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p),
        java.nio.charset.StandardCharsets.UTF_8))
  }
  private var pending: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  // column writers for the pruned schema, resolved once per reader
  private val writers: Array[(String, Map[String, String], String, String,
      Option[(String, FieldValue)], Option[Long]) => Any] =
    required.fields.map { f =>
      f.name match {
        case "series" =>
          (m: String, _: Map[String, String], _: String, _: String,
              _: Option[(String, FieldValue)], _: Option[Long]) =>
            if (m == null) null else UTF8String.fromString(m)
        case "name" =>
          (_, _, _, _, fv: Option[(String, FieldValue)], _) =>
            fv.map(x => UTF8String.fromString(x._1)).orNull
        case "value" =>
          (_, _, _, _, fv, _) => fv.map(_._2).collect {
            case FieldValue.FloatV(v) => java.lang.Double.valueOf(v)
          }.orNull
        case "value_long" =>
          (_, _, _, _, fv, _) => fv.map(_._2).collect {
            case FieldValue.IntV(v) => java.lang.Long.valueOf(v)
          }.orNull
        case "value_str" =>
          (_, _, _, _, fv, _) => fv.map(_._2).collect {
            case FieldValue.StringV(v) => UTF8String.fromString(v)
          }.orNull
        case "value_bool" =>
          (_, _, _, _, fv, _) => fv.map(_._2).collect {
            case FieldValue.BoolV(v) => java.lang.Boolean.valueOf(v)
          }.orNull
        case "time_ns" =>
          (_, _, _, _, _, ts: Option[Long]) =>
            ts.map(java.lang.Long.valueOf).orNull
        case "tags" =>
          (_, tags: Map[String, String], _, _, _, _) =>
            if (tags == null) null
            else new ArrayBasedMapData(
              new GenericArrayData(tags.keys.toArray.sorted
                .map(UTF8String.fromString)),
              new GenericArrayData(tags.keys.toArray.sorted
                .map(k => UTF8String.fromString(tags(k)))))
        case "parse_error" =>
          (_, _, _, err: String, _, _) =>
            if (err == null) null else UTF8String.fromString(err)
        case other =>
          throw new IllegalArgumentException(s"unknown column $other")
      }
    }

  private def rows(line: String): Iterator[InternalRow] =
    LineProtocol.parse(line) match {
      case Right(r) =>
        val tags = r.tags.toMap
        r.fields.iterator.map { fv =>
          InternalRow.fromSeq(writers.map(w =>
            w(r.measurement, tags, line, null, Some(fv), r.timestamp)).toSeq)
        }
      case Left(err) =>
        Iterator.single(InternalRow.fromSeq(writers.map(w =>
          w(null, null, line, err, None, None)).toSeq))
    }

  override def next(): Boolean = {
    while (!pending.hasNext) {
      val line = in.readLine()
      if (line == null) return false
      if (line.nonEmpty) pending = rows(line)
    }
    current = pending.next()
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
