package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.sources.DocFileSink

/** S7+T5 (app/prepare_data.py:20-26) — per-document file materialization
  * with sanitized `{id}_{title}.txt` names. Side-effect sink, so this
  * round-trip IS the correctness check (no SQL oracle possible). */
class DocFileSinkSpec extends SparkSpec {
  import spark.implicits._

  test("1000 docs round-trip to one sanitized .txt file each") {
    val docs = (1 to 1000).map { i =>
      (i.toLong, s"Title $i: a/b?c*${i}", s"body of document $i\nsecond line")
    }.toDF("doc_id", "doc_title", "text")
    val out = Files.createTempDirectory("graft-docsink").toString
    DocFileSink.writeDocFiles(docs, out)

    val files = Files.list(Paths.get(out)).iterator().asScala.toSeq
    assert(files.length == 1000)
    // every name is fully sanitized: nothing outside [A-Za-z0-9._-]
    files.foreach { p =>
      assert(p.getFileName.toString.matches("[A-Za-z0-9._-]+\\.txt"),
        p.getFileName.toString)
    }
    // spot-check name shape + exact content for a known doc
    val f7 = Paths.get(out, "7_Title_7_a_b_c_7.txt")
    assert(Files.exists(f7), s"missing $f7")
    assert(new String(Files.readAllBytes(f7), StandardCharsets.UTF_8) ==
      "body of document 7\nsecond line")
  }

  test("sanitizer keeps safe chars and collapses runs of unsafe ones") {
    val out = Seq(("We're #1! (really)", ""), ("safe-Name_1.txt", ""))
      .toDF("t", "ignore")
      .select(DocFileSink.sanitizeFilename($"t")).as[String].collect()
    assert(out(0) == "We_re_1_really_")
    assert(out(1) == "safe-Name_1.txt")
  }
}
