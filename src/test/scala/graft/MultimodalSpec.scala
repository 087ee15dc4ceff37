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

  test("imageFeatures: hand-computed entropy + nibble histogram") {
    // "aabb": counts {a:2, b:2} -> entropy = -2*(1/2)*ln(1/2) = ln 2;
    // both bytes are 0x6_, so all 4 land in nibble bucket 6
    val media = Seq((1L, "bin", "aabb".getBytes("UTF-8")))
      .toDF("media_id", "modality", "payload")
    val r = Multimodal.imageFeatures(media).collect().head
    assert(r.getAs[Long]("n_bytes") == 4L)
    assert(r.getAs[Double]("entropy") ==
      BigDecimal(math.log(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Long]("h6") == 4L)
    assert((0 until 16).filter(_ != 6).forall(i => r.getAs[Long](s"h$i") == 0L))
    // non-image payload: header fields null, byte stats still real
    assert(r.isNullAt(r.fieldIndex("format")))
  }

  test("imageFeatures: empty payload yields 0.0 entropy, never NaN") {
    val media = Seq((1L, "bin", Array.emptyByteArray))
      .toDF("media_id", "modality", "payload")
    val r = Multimodal.imageFeatures(media).collect().head
    assert(r.getAs[Long]("n_bytes") == 0L)
    assert(r.getAs[Double]("entropy") == 0.0)
  }

  test("imageFeatures recovers header dims from the synthetic corpus bytes") {
    val corpus = Seq((6L, "even doc"), (7L, "odd doc")).toDF("doc_id", "text")
    val out = Multimodal.imageFeatures(Multimodal.syntheticImageCorpus(corpus))
      .select("media_id", "format", "width", "height")
      .as[(Long, String, Int, Int)].collect().toSeq
    assert(out == Seq(
      (6L, "png", 6 % 509 + 16, 6 * 7 % 389 + 16),
      (7L, "jpeg", 7 % 509 + 16, 7 * 7 % 389 + 16)))
  }

  test("imageFeatures histogram counts sum to n_bytes on real payloads") {
    val corpus = Seq((10L, "a"), (11L, "b"), (12L, "c")).toDF("doc_id", "text")
    Multimodal.imageFeatures(Multimodal.syntheticImageCorpus(corpus))
      .collect().foreach { r =>
        val total = (0 until 16).map(i => r.getAs[Long](s"h$i")).sum
        assert(total == r.getAs[Long]("n_bytes"))
        assert(r.getAs[Double]("entropy") > 0.0)
      }
  }

  private def unhex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("imageMeta parses a genuine 1x1 PNG (the canonical 67-byte fixture)") {
    // real file bytes incl. correct CRCs and a zlib-deflated IDAT
    val png1x1 = unhex(
      "89504E470D0A1A0A 0000000D 49484452 00000001 00000001 08 06 000000" +
        "1F15C489 0000000A 49444154 789C6300010000050001 0D0A2DB4" +
        "00000000 49454E44 AE426082")
    val out = Multimodal.imageMeta(
      Seq((1L, "png", png1x1)).toDF("media_id", "modality", "payload"))
      .as[(Long, String, Int, Int, Int)].collect()
    assert(out.toSeq == Seq((1L, "png", 1, 1, 8)))
  }

  test("imageMeta walks real JPEG segments (APP0+COM+fill+TEM) to SOF0") {
    // genuine structure: SOI, JFIF APP0, COM("ABC") preceded by a fill
    // byte, standalone TEM marker, then SOF0 h=2 w=3, 3 components
    val jpeg = unhex(
      "FFD8 FFE0 0010 4A46494600 0101 00 0001 0001 00 00" +
        "FF FFFE 0005 414243 FF01" +
        "FFC0 0011 08 0002 0003 03 01 2200 02 1101 03 1101")
    val out = Multimodal.imageMeta(
      Seq((1L, "jpeg", jpeg)).toDF("media_id", "modality", "payload"))
      .as[(Long, String, Int, Int, Int)].collect()
    assert(out.toSeq == Seq((1L, "jpeg", 3, 2, 8)))
  }

  test("imageMeta yields null rows, not failures, on garbage and truncation") {
    val bad = Seq[(Long, String, Array[Byte])](
      (1L, "bin", unhex("DEADBEEF")),            // not an image
      (2L, "bin", unhex("89504E470D0A1A0A")),    // PNG sig, no IHDR
      (3L, "bin", unhex("FFD8FFFE0004")),        // JPEG COM truncated
      (4L, "bin", unhex("FFD8FFDA0002")),        // SOS before any SOF
      (5L, "bin", Array.emptyByteArray),
    ).toDF("media_id", "modality", "payload")
    val out = Multimodal.imageMeta(bad)
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Int])]
      .collect()
    assert(out.length == 5 && out.forall(r =>
      r._2.isEmpty && r._3.isEmpty && r._4.isEmpty && r._5.isEmpty))
  }

  test("synthetic corpus round-trips: decode inverts the hex assembly") {
    val corpus = Seq((6L, "even doc"), (7L, "odd doc"))
      .toDF("doc_id", "text")
    val out = Multimodal.imageMeta(Multimodal.syntheticImageCorpus(corpus))
      .as[(Long, String, Int, Int, Int)].collect().toSeq
    assert(out == Seq(
      (6L, "png", (6 % 509 + 16), (6 * 7 % 389 + 16), 8),
      (7L, "jpeg", (7 % 509 + 16), (7 * 7 % 389 + 16), 8)))
  }
}
