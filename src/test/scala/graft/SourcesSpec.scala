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

  test("JSONL round-trip: write then schema'd read; malformed lines drop") {
    val dir = Files.createTempDirectory("graft-jsonl-rt").toString
    val docs = Seq(
      (1L, "A", "tab\tand \"quote\" survive json escaping"),
      (2L, "B", "newline\\n-literal and unicode é"),
    ).toDF("doc_id", "doc_title", "text")
    Sources.writeJsonl(docs, s"$dir/out")
    val back = Sources.readCorpusJsonl(spark, s"$dir/out")
      .as[(Long, String, String)].collect().toSet
    assert(back == docs.as[(Long, String, String)].collect().toSet)
    // a corrupted shard line must DROP, not null-fill (count parity with
    // the writer matters more than salvaging a broken row)
    Files.writeString(java.nio.file.Paths.get(s"$dir/out/zz-corrupt.json"),
      "{\"doc_id\": oops not json\n")
    val again = Sources.readCorpusJsonl(spark, s"$dir/out")
      .as[(Long, String, String)].collect().toSet
    assert(again.size == 2)
  }

  test("graft.table normalizes every events.ts writer spelling to micros") {
    import org.apache.spark.sql.functions._
    // 2024-01-01 00:00:11.172425 UTC, with a truncated-away 938ns tail in
    // the nanos spelling (the harness testdata's actual shape)
    val micros = 1704067211172425L
    def write(sub: String)(df: org.apache.spark.sql.DataFrame): String = {
      val dir = Files.createTempDirectory(s"graft-ev-$sub").toString
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val asLong = write("long")(Seq((1L, micros * 1000 + 938))
      .toDF("event_id", "ts")) // INT64 nanos (nanosAsLong view of NANOS)
    val asNtz = write("ntz")(Seq((1L, micros))
      .toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")))
    val asLtz = write("ltz")(Seq((1L, micros))
      .toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts")))
    val read = Seq(asLong, asNtz, asLtz).map { dir =>
      val df = graft.table(spark, dir, "events")
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, dir)
      df.select(unix_micros(col("ts"))).as[Long].collect().toSeq
    }
    assert(read.forall(_ == Seq(micros)), read.toString)
  }

  test("ORC round-trip preserves rows and pushes filters to the scan") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    Sources.writeOrc(docs, dir)
    val back = Sources.readOrc(spark, dir, docs.schema)
    assert(back.count() == docs.count())
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    // selective reads must prune at the stripe level: the id predicate
    // has to reach the ORC scan as a pushed filter, not a post-scan Filter
    val plan = back.filter(col("doc_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("IsNotNull(doc_id),EqualTo(doc_id,7)"),
      plan)
  }
}
