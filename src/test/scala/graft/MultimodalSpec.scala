package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "abcdefghij" * 10), // 100 bytes
    (2L, "xy"),              // shorter than one frame
  ).toDF("doc_id", "text")

  test("metaExtract reads payload metadata without decoding") {
    val meta = Multimodal.metaExtract(Multimodal.fromDocuments(docs))
      .as[(Long, String, Long, String, String)].collect()
    assert(meta.map(m => (m._1, m._3)).toSeq == Seq((1L, 100L), (2L, 2L)))
    assert(meta.head._5 == "6162636465666768") // hex of "abcdefgh"
    assert(meta.forall(_._2 == "text"))
  }

  test("frame sampling slices payload at stride boundaries") {
    // hop = 16*4 = 64: doc1 (100 B) -> frames at 0 and 64; doc2 -> 1 frame
    val frames = Multimodal.sampleFrames(Multimodal.fromDocuments(docs), 16, 4)
      .as[(Long, Int, Array[Byte], Long)].collect()
    assert(frames.map(f => (f._1, f._2)).toSeq == Seq((1L, 0), (1L, 1), (2L, 0)))
    assert(new String(frames(0)._3, "UTF-8") == "abcdefghijabcdef")
    assert(frames(1)._4 == 16L)  // frame at offset 64 still has 16 bytes
    assert(frames(2)._4 == 2L)   // short doc -> truncated frame
  }

  test("decode-stub features flow through mapPartitions with typed encoder") {
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.fromDocuments(docs)).collect()
    assert(feats.length == 2)
    val f1 = feats.find(_.media_id == 1L).get
    assert(f1.n_bytes == 100L && f1.features.length == 8)
    assert(math.abs(f1.features(0) - 'a'.toInt / 255.0f) < 1e-6)
    val f2 = feats.find(_.media_id == 2L).get
    assert(f2.features(2) == 0.0f) // padded beyond payload
  }
}
