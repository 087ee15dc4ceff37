package graft

import java.nio.file.Files
import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("TSV corpus round-trip preserves the reference wire format") {
    val dir = Files.createTempDirectory("graft-tsv").toString
    val docs = Seq((1L, "Title One", "alpha beta"), (2L, "T2", "gamma"))
      .toDF("doc_id", "doc_title", "text")
    Sources.writeTsv(docs, s"$dir/out")
    val back = Sources.readCorpusTsv(spark, s"$dir/out")
      .as[(Long, String, String)].collect().toSet
    assert(back == Set((1L, "Title One", "alpha beta"), (2L, "T2", "gamma")))
  }

  test("line parser drops blank and short lines (P6 guard)") {
    val lines = Seq(
      "1\tTitle\tsome text here",
      "",
      "   ",
      "2\tonly-two-fields",
      "3\tT3\ttext\twith\textra\ttabs",
      "notanumber\tT\ttext",
    ).toDF("value")
    val parsed = Sources.parseCorpusLines(lines)
      .as[(Long, String, String)].collect().toSet
    assert(parsed == Set(
      (1L, "Title", "some text here"),
      (3L, "T3", "text\twith\textra\ttabs"))) // split limit 3 keeps tail intact
  }

  test("JSONL corpus reader") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/docs.jsonl"),
      """{"doc_id": 1, "doc_title": "A", "text": "hello world"}
        |{"doc_id": 2, "doc_title": "B", "text": "again"}""".stripMargin)
    val back = Sources.readCorpusJsonl(spark, s"$dir/docs.jsonl")
      .as[(Long, String, String)].collect().toSet
    assert(back == Set((1L, "A", "hello world"), (2L, "B", "again")))
  }
}
