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

  test("audioMeta parses a hand-built PCM WAV with an odd-sized LIST chunk") {
    // RIFF(56) WAVE; LIST body 3 bytes -> ONE pad byte (the even-boundary
    // rule: a walk that forgets the pad lands mid-chunk and desyncs);
    // fmt: PCM, 2 ch, 44100 Hz, block 4, 16-bit; data: 8 bytes = 2 frames
    val wav = unhex(
      "52494646 38000000 57415645" +
        "4C495354 03000000 414243 00" +
        "666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
        "64617461 08000000 0000000000000000")
    val out = Multimodal.audioMeta(
      Seq((1L, "wav", wav)).toDF("media_id", "modality", "payload"))
      .as[(Long, String, Int, Int, Int, Int, Long, Long)].collect()
    // n_samples = 8/4 = 2; duration_ms = 2*1000/44100 = 0 (integer)
    assert(out.toSeq == Seq((1L, "wav", 1, 2, 44100, 16, 2L, 0L)))
  }

  test("audioMeta: duration arithmetic on a 1-second mono file") {
    // 8000 Hz, 1 ch, 8-bit (block 1), data = 8000 bytes claimed; body
    // bytes are absent past the header but the walk never needs them
    // for the LAST chunk (size-driven duration, like real demuxers
    // reading only the header of a streamed file)
    val hdr = unhex(
      "52494646 44000000 57415645" +
        "666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800" +
        "64617461 401F0000")
    // (riffSize header field: unvalidated by design — streamed files lie)
    val out = Multimodal.audioMeta(
      Seq((1L, "wav", hdr)).toDF("media_id", "modality", "payload"))
      .as[(Long, String, Int, Int, Int, Int, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, "wav", 1, 1, 8000, 8, 8000L, 1000L)))
  }

  test("audioMeta yields null rows on garbage, truncation, zero block_align") {
    val bad = Seq[(Long, String, Array[Byte])](
      (1L, "bin", unhex("DEADBEEF")),                     // not RIFF
      (2L, "bin", unhex("52494646 04000000 57415645")),   // no chunks
      (3L, "bin", unhex("52494646 10000000 57415645 666D742003000000")), // fmt too short
      // block_align 0 would divide by zero: must null, not throw
      (4L, "bin", unhex("52494646 28000000 57415645" +
        "666D7420 10000000 0100 0100 401F0000 401F0000 0000 0800" +
        "64617461 04000000 00000000")),
      (5L, "bin", Array.emptyByteArray),
    ).toDF("media_id", "modality", "payload")
    val out = Multimodal.audioMeta(bad).collect()
    assert(out.length == 5 && out.forall(_.isNullAt(1)))
  }

  test("videoMeta parses a v0 moov and counts trak children") {
    // ftyp(isom) + moov{ mvhd v0 (timescale 600, duration 1234), 2x trak }
    val mvhd = "0000006C 6D766864 00000000 00000000 00000000" +
      "00000258 000004D2" + "00" * 80
    val trak = "00000014 7472616B 0000000C 66726565 00000000"
    val mp4 = unhex(
      "00000010 66747970 69736F6D 00000000" +
        "0000009C 6D6F6F76" + mvhd + trak + trak)
    val out = Multimodal.videoMeta(
      Seq((1L, "mp4", mp4)).toDF("media_id", "modality", "payload"))
      .as[(Long, String, String, Int, Long, Long, Long, Int)].collect()
    // duration_ms = 1234*1000/600 = 2056 (integer division)
    assert(out.toSeq == Seq((1L, "mp4", "isom", 0, 600L, 1234L, 2056L, 2)))
  }

  test("videoMeta handles 64-bit largesize boxes and mvhd v1") {
    // a free box declared via size==1 + largesize(17) (16 hdr + 1 byte),
    // then moov{ mvhd v1: 64-bit ctime/mtime, timescale 1000, 64-bit
    // duration 90061 } -> 90061 ms exactly
    val mvhdV1 = "00000078 6D766864 01000000" + "00" * 16 +
      "000003E8" + "0000000000015FCD" + "00" * 80
    val mp4 = unhex(
      "00000010 66747970 69736F6D 00000000" +
        "00000001 66726565 0000000000000011 AA" +
        "00000080 6D6F6F76" + mvhdV1)
    val out = Multimodal.videoMeta(
      Seq((1L, "mp4", mp4)).toDF("media_id", "modality", "payload"))
      .as[(Long, String, String, Int, Long, Long, Long, Int)].collect()
    assert(out.toSeq == Seq((1L, "mp4", "isom", 1, 1000L, 90061L, 90061L, 0)))
  }

  test("videoMeta yields null rows on garbage and structural corruption") {
    val bad = Seq[(Long, String, Array[Byte])](
      (1L, "bin", unhex("DEADBEEFDEADBEEFDEADBEEFDEADBEEF")), // not ftyp
      (2L, "bin", unhex("0000001066747970 69736F6D 00000000")), // no moov
      // moov whose declared size runs past the payload end
      (3L, "bin", unhex("0000001066747970 69736F6D 00000000" +
        "000000FF 6D6F6F76")),
      (4L, "bin", Array.emptyByteArray),
    ).toDF("media_id", "modality", "payload")
    val out = Multimodal.videoMeta(bad).collect()
    assert(out.length == 4 && out.forall(_.isNullAt(1)))
  }

  test("synthetic audio/video corpora round-trip: decode inverts assembly") {
    val corpus = Seq((0L, "a"), (5L, "b"), (9L, "c")).toDF("doc_id", "text")
    val wav = Multimodal.audioMeta(Multimodal.syntheticAudioCorpus(corpus))
      .as[(Long, String, Int, Int, Int, Int, Long, Long)].collect().toSeq
    assert(wav == Seq(0L, 5L, 9L).map { id =>
      val rate = 8000 + (id % 5).toInt * 11025
      val ns = id % 9 + 1
      (id, "wav", 1, (id % 2).toInt + 1, rate, ((id % 3).toInt + 1) * 8,
        ns, ns * 1000 / rate)
    })
    val mp4 = Multimodal.videoMeta(Multimodal.syntheticVideoCorpus(corpus))
      .as[(Long, String, String, Int, Long, Long, Long, Int)].collect().toSeq
    assert(mp4 == Seq(0L, 5L, 9L).map { id =>
      val tsc = 600 + (id % 4) * 400
      val dur = tsc * (id % 20 + 1) + id % 37
      (id, "mp4", "isom", if (id % 3 == 0) 1 else 0, tsc, dur,
        dur * 1000 / tsc, (id % 3).toInt + 1)
    })
  }

  // Scala reference dHash for parity: 65 segment means over the byte
  // stream, adjacent comparison by cross-multiplication
  private def refPHash(b: Array[Byte]): Option[(Long, Long)] = {
    val n = b.length
    if (n < 65) return None
    val sums = (0 until 65).map { j =>
      val from = (j.toLong * n / 65).toInt
      val to = ((j + 1).toLong * n / 65).toInt
      (from until to).map(i => (b(i) & 0xFF).toLong).sum -> (to - from).toLong
    }
    var hi = 0L; var lo = 0L
    for (i <- 0 until 64) {
      val (sa, ca) = sums(i); val (sb, cb) = sums(i + 1)
      if (sa * cb > sb * ca) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
    }
    Some((hi, lo))
  }

  test("phash: expression matches the reference, nulls under 65 bytes") {
    val rnd = new scala.util.Random(7)
    val payloads = (0 until 50).map { _ =>
      val n = 65 + rnd.nextInt(400)
      val b = new Array[Byte](n); rnd.nextBytes(b); b
    }
    payloads.foreach { b =>
      val row = graft.functions.PHashExpr.phash(b)
      assert(Some((row.getLong(0), row.getLong(1))) == refPHash(b))
    }
    assert(graft.functions.PHashExpr.phash(new Array[Byte](64)) == null)
    // halves stay unsigned 32-bit: non-negative in both engines
    payloads.foreach { b =>
      val r = graft.functions.PHashExpr.phash(b)
      assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 32))
      assert(r.getLong(1) >= 0L && r.getLong(1) < (1L << 32))
    }
  }

  test("phash pairs: one-char perturbation is caught, md5 misses it, real corpus discriminates") {
    import org.apache.spark.sql.functions.{col, md5}
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // only payloads with a full 65-byte grid hash at all — shorter docs
    // yield NULL phash (and no pair) by contract
    val planted = base
      .filter(org.apache.spark.sql.functions
        .octet_length(org.apache.spark.sql.functions.encode(col("text"), "UTF-8")) >= 65)
      .select("doc_id").as[Long].collect().filter(_ % 10 == 0).toSet
    val corpus = Multimodal.withPerturbedCopies(base, every = 10)
    val pairs = Multimodal.phashPairs(Multimodal.fromDocuments(corpus))
      .as[(Long, Long, Long)].collect()
    // every planted (doc, perturbed copy) pair is found at tiny distance
    for (id <- planted) {
      val p = pairs.find(p => p._1 == id && p._2 == id + Multimodal.PerturbKeyBase)
      assert(p.isDefined, s"planted pair for $id missing")
      assert(p.get._3 <= 2L, s"planted pair for $id at hamming ${p.get._3}")
    }
    // the content hash flips on the same pairs (what phash adds over
    // mm_meta) — except the degenerate doc that already starts with 'q',
    // where the perturbation is the identity
    val startsQ = base.filter(col("text").startsWith("q"))
      .select("doc_id").as[Long].collect().toSet
    val hashes = corpus.select(col("doc_id"), md5(col("text")).as("h"))
      .as[(Long, String)].collect().toMap
    for (id <- planted if !startsQ(id))
      assert(hashes(id) != hashes(id + Multimodal.PerturbKeyBase))
    // on the diverse real corpus the hash discriminates: nothing except
    // the planted near-identical payloads lands within the threshold
    assert(pairs.forall(p => p._2 == p._1 + Multimodal.PerturbKeyBase),
      s"stranger pairs: ${pairs.filterNot(p => p._2 == p._1 + Multimodal.PerturbKeyBase).take(5).mkString(",")}")
    assert(pairs.length == planted.size)
  }

  test("phash pairs: both band geometries equal the adaptive default exactly") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.fromDocuments(
      Multimodal.withPerturbedCopies(base, every = 10))
    // the blocking geometry is a pure pruning choice: 4x16-bit/1-flip and
    // 2x32-bit/(2,1)-flip must produce the SAME pair set at the SAME
    // distances (the pigeonhole proof holds for both), and the adaptive
    // default (media count < cutoff here -> 4 bands) must match
    val g4 = Multimodal.phashPairsBanded(media, 7, 4).as[(Long, Long, Long)]
      .collect().toSeq
    val g2 = Multimodal.phashPairsBanded(media, 7, 2).as[(Long, Long, Long)]
      .collect().toSeq
    val auto = Multimodal.phashPairs(media).as[(Long, Long, Long)]
      .collect().toSeq
    assert(g4.nonEmpty)
    assert(g4 == g2)
    assert(g4 == auto)
    // broadcast-cap gate (round-9 ADVICE): past PHashBroadcastMaxMedia
    // the 2-band build frame goes UN-hinted instead of throwing on the
    // 8 GiB cap — broadcastMax=0 forces that path; output must be
    // identical (the hint is a strategy choice, never semantics)
    val g2NoHint = Multimodal.phashPairsBanded(media, 7, 2, broadcastMax = 0L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(g2NoHint == g2)
  }

  test("phash clusters: every perturbed copy labels to its original") {
    import org.apache.spark.sql.functions.col
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Multimodal.phashPairs(Multimodal.fromDocuments(
      Multimodal.withPerturbedCopies(base, every = 10)))
    val labels = graft.dedup.Dedup.duplicateClusters(
        pairs.select(col("media_a").as("doc_a"), col("media_b").as("doc_b")))
      .as[(Long, Long)].collect().toMap
    val expected = pairs.as[(Long, Long, Long)].collect()
      .filter(p => p._2 == p._1 + Multimodal.PerturbKeyBase)
    assert(expected.nonEmpty)
    // the copy's label equals the original's label (same component), and
    // when the original is its own component min the label IS the original
    expected.foreach { case (orig, copy, _) =>
      assert(labels(copy) == labels(orig), s"pair ($orig, $copy)")
      assert(labels(copy) <= orig)
    }
  }
}
