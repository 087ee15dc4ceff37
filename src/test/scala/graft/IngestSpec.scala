package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.index.{IndexStore, InvertedIndex}
import graft.rank.BM25
import graft.sources.Sources

/** Single-file ingest (app/index.sh:21-41 conventions) folded into a stored
  * index must equal a full recompute that includes the new doc. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("ingestLocalFile applies the reference's filename/flattening rules") {
    val f = Files.createTempDirectory("graft-ingest-file").resolve("My Doc.txt")
    Files.writeString(f, "spark window join\nspark again\n")
    val row = Sources.ingestLocalFile(spark, f.toString, 123456L).collect().head
    assert(row.getLong(0) == 123456L)
    assert(row.getString(1) == "My Doc") // basename minus .txt
    // tr '\n' ' ' semantics: every newline (trailing included) -> space
    assert(row.getString(2) == "spark window join spark again ")
  }

  test("ingest onto a stored index equals full recompute including the doc") {
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    val dir = Files.createTempDirectory("graft-ingest-idx").toString + "/index"
    IndexStore.write(docs, dir)
    val f = Files.createTempDirectory("graft-ingest-doc").resolve("new_doc.txt")
    Files.writeString(f, "spark join window spark spark join\nwindow table\n")
    val newDoc = Sources.ingestLocalFile(spark, f.toString, 999999L)
    IndexStore.ingest(newDoc, dir)

    // stored tf after ingest == tf of the full corpus incl. the new doc
    val full = docs.select("doc_id", "text")
      .unionByName(newDoc.select("doc_id", "text"))
    val storedTf = IndexStore.postings(spark, dir).drop("term_bucket")
      .orderBy("doc_id", "term")
      .as[(Long, String, Long)].collect().toSeq
    val fullTf = InvertedIndex.termFrequency(full)
      .orderBy("doc_id", "term")
      .as[(Long, String, Long)].collect().toSeq
    assert(storedTf == fullTf)

    // served search == recompute search over the merged corpus (exercises
    // df/dl/corpus stats, not just tf)
    val stored = BM25.searchStored(spark, dir, "spark join window")
      .as[(Long, Double)].collect().toSeq
    val recompute = BM25.search(spark, full, "spark join window")
      .as[(Long, Double)].collect().toSeq
    assert(stored.nonEmpty && stored == recompute)
    // the new doc is term-heavy on the query -> it must surface in top-10
    assert(stored.map(_._1).contains(999999L))

    // re-ingesting an already-indexed doc_id must fail loudly, not silently
    // double-count stored stats (merge SUMS tf; recompute would be right)
    val ex = intercept[IllegalArgumentException] {
      IndexStore.ingest(newDoc, dir)
    }
    assert(ex.getMessage.contains("already indexed"))

    // the CLI-parity entry points are thin over the same tested functions:
    // Search.run serves the merged index; Ingest.run is the one-file flow
    val f2 = Files.createTempDirectory("graft-ingest-doc2").resolve("second.txt")
    Files.writeString(f2, "window window window join\n")
    Ingest.run(spark, dir, f2.toString, 999998L)
    val served = Search.run(spark, dir, "spark join window")
      .as[(Long, Double)].collect().toSeq
    val full2 = full.unionByName(
      Sources.ingestLocalFile(spark, f2.toString, 999998L)
        .select("doc_id", "text"))
    val recompute2 = BM25.search(spark, full2, "spark join window")
      .as[(Long, Double)].collect().toSeq
    assert(served == recompute2)
    // the CLI's phrase mode serves the same store: the ingested doc's
    // repeated bigram is found with its overlap count
    val phr = Search.runPhrase(spark, dir, "window window")
      .as[(Long, Long)].collect().toMap
    assert(phr.get(999998L).contains(2L))
  }
}
