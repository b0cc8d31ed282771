package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("media metadata extraction is deterministic and partition-parallel") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val withMedia = Multimodal.withMediaColumn(docs)
    val meta = Multimodal.extractMeta(spark, withMedia).collect()
    assert(meta.length == docs.count())
    assert(meta.forall(m => m.byteLen > 0 && m.width >= 320 && m.digest.length == 32))
    // deterministic across runs
    val meta2 = Multimodal.extractMeta(spark, withMedia).collect()
    assert(meta.sortBy(_.doc_id).toSeq == meta2.sortBy(_.doc_id).toSeq)
    assert(meta.map(_.kind).toSet.subsetOf(Set("image", "audio", "video")))
  }

  test("frame sampling fans out bounded rows per doc") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val frames = Multimodal.sampleFrames(spark, Multimodal.withMediaColumn(docs),
      everyMs = 10000L, maxFrames = 4).collect()
    val perDoc = frames.groupBy(_.doc_id).view.mapValues(_.length)
    assert(perDoc.values.forall(n => n >= 1 && n <= 4))
    assert(frames.forall(_.pixels.length == 64))
    // frames are deterministic functions of (payload, frameIdx)
    val f0 = frames.filter(f => f.doc_id == frames.head.doc_id).sortBy(_.frameIdx)
    assert(f0.map(_.ts_ms).toSeq == f0.indices.map(_ * 10000L))
  }
}
