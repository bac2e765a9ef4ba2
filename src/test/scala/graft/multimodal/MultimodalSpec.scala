package graft.multimodal

import graft.SparkSpec
import graft.Tables

/** The multimodal plumbing: typed binary Datasets, batched decode/resize,
  * frame fan-out. Decode bodies are deterministic stubs (no codecs in this
  * container); shapes and schemas are the real thing.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.asMedia(Tables.load(spark, "/root/testdata/sf0.001", "documents"))

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(_.features.length == 4))
  }

  test("resize produces area-proportional payloads with updated metadata") {
    val r = Multimodal.resizeAll(media, 64, 32).collect()
    assert(r.forall(_.content.length == 64 * 32 / 64))
    assert(r.forall(_.format.endsWith(";resized=64x32")))
    assert(r.forall(m => m.n_bytes == m.content.length.toLong))
  }

  test("frame sampling fans out n rows per item with ordered offsets") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
    assert(frames.length == media.count() * 4)
    val byDoc = frames.groupBy(_._1)
    byDoc.values.foreach { fs =>
      val offsets = fs.sortBy(_._2).map(_._3)
      assert(offsets.length == 4)
      assert(offsets.sorted.sameElements(offsets)) // evenly increasing
    }
  }
}
