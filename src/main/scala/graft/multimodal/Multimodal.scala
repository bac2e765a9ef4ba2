package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata.
  *
  * This is the 100 TB-scale shape for image/audio/video columns: content is
  * an opaque BINARY column (parquet keeps it contiguous and compressed),
  * metadata is typed columns so filters/pruning never touch the bytes.
  */
case class MediaItem(
    doc_id: Long,
    content: Array[Byte],
    format: String,
    n_bytes: Long)

/** Extracted features for one media item. */
case class MediaFeatures(
    doc_id: Long,
    width: Int,
    height: Int,
    checksum: Long,
    features: Array[Double])

/** Multimodal column processing (SURVEY.md §2.4 i / builder contract).
  *
  * The decode step is a clearly-marked deterministic STUB (this container has
  * no image/audio codecs): `decodeStub` derives fake dimensions from the
  * bytes. Everything around it — the binary schema, the typed Dataset, the
  * batched per-partition processing shape, the feature vector output — is
  * the real Spark plumbing a codec-backed implementation would keep, with
  * only the stub body swapped for e.g. a JNI/ONNX call.
  */
object Multimodal {

  /** Documents → media items (text bytes stand in for image payloads). */
  def asMedia(documents: DataFrame): Dataset[MediaItem] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"),
        col("text").cast("binary").as("content"),
        concat(lit("fake/"), col("source")).as("format"),
        length(col("text")).cast("long").as("n_bytes"))
      .as[MediaItem]
  }

  /** STUB decode: deterministic fake dimensions derived from the payload.
    * A real implementation would decode the image header here. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val w = 16 + (bytes.length % 64)
    val h = 16 + (if (bytes.isEmpty) 0 else (bytes(0) & 0xff) % 64)
    (w, h)
  }

  /** STUB feature extraction over one decoded payload: byte-level statistics
    * in place of a model forward pass. Deterministic. */
  def featuresStub(bytes: Array[Byte]): Array[Double] = {
    val n = math.max(bytes.length, 1).toDouble
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    val distinct = bytes.distinct.length.toDouble
    Array(bytes.length.toDouble, sum / n, distinct, (sum % 997).toDouble)
  }

  /** Batched per-partition feature extraction — the mapPartitions shape
    * matters: a real decoder amortizes model/codec init once per partition
    * (the same reason Python pipelines use mapInPandas batches). */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      // per-partition init happens HERE once (codec/model handle)
      it.map { m =>
        val (w, h) = decodeStub(m.content)
        val sum = m.content.foldLeft(0L)((a, b) => a + (b & 0xff))
        MediaFeatures(m.doc_id, w, h, sum % 997, featuresStub(m.content))
      }
    }
  }

  /** STUB resize: a real implementation re-encodes pixels; the stub keeps
    * the contract — output payload is a deterministic function of (input,
    * target dims) with byte length proportional to the target area. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(w * h / 64, 1))
    var i = 0
    while (i < out.length) {
      out(i) = if (bytes.isEmpty) 0 else bytes(i % bytes.length)
      i += 1
    }
    out
  }

  /** STUB frame sampling: a real implementation decodes n evenly-spaced
    * video frames; the stub slices n evenly-spaced byte windows, keeping
    * the (doc_id, frame_no, payload, offset) output shape a real sampler
    * would produce. */
  def frameSampleStub(bytes: Array[Byte], n: Int): Seq[(Int, Long, Array[Byte])] = {
    val len = math.max(bytes.length, 1)
    (0 until n).map { f =>
      val off = (len.toLong * f) / n
      val end = math.min(off + 16, bytes.length.toLong).toInt
      (f, off, bytes.slice(off.toInt, end))
    }
  }

  /** Resize as a distributed op: one output row per item, new payload +
    * dims. Runs in the same mapPartitions batch shape as extractFeatures. */
  def resizeAll(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val payload = resizeStub(m.content, w, h)
        MediaItem(m.doc_id, payload, m.format + s";resized=${w}x$h",
          payload.length.toLong)
      }
    }
  }

  /** Frame sampling as a distributed op: fan-out n rows per item (the
    * video → frames explode a training pipeline runs before per-frame
    * feature extraction). */
  def sampleFrames(items: Dataset[MediaItem], n: Int)
      : Dataset[(Long, Int, Long, Array[Byte])] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.flatMap { m =>
      frameSampleStub(m.content, n).map { case (f, off, payload) =>
        (m.doc_id, f, off, payload)
      }
    }
  }

  /** Oracle-checkable projection of the pipeline (byte stats are exactly
    * recomputable from the text in SQL on both engines). */
  def featureFrame(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(asMedia(documents))
      .select(col("doc_id"), col("width"), col("height"), col("checksum"),
        element_at(col("features"), 2).as("mean_byte"),
        element_at(col("features"), 3).cast("long").as("n_distinct_bytes"))
  }
}
