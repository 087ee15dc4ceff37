package graft

import java.nio.file.Files

import graft.index.IndexStore
import graft.rank.BM25

/** End-to-end golden test at the reference's own entry point
  * (app/app.sh:26 runs `search.sh "football game"`): build the persisted
  * index, serve the query from it, pin the exact top-10.
  *
  * The synthetic corpus has no "football"/"game" tokens, so the pinned
  * ranking uses the flagship query (same 3-term shape); "football game"
  * itself exercises the reference's S9 empty-result path end-to-end
  * through the STORED index.
  *
  * Golden values independently computed by DuckDB over sf0.01 with the
  * identical BM25 formula (k1=1, b=0.75, ln(N/df)) — not copied from the
  * engine's own output.
  */
class GoldenSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val indexDir = {
    val dir = Files.createTempDirectory("graft-golden-idx").toString
    IndexStore.write(table(spark, "/root/testdata/sf0.01", "documents"), dir)
    dir
  }

  test("stored-index search reproduces the pinned top-10 at sf0.01") {
    val got = BM25.searchStored(spark, indexDir, "spark join window")
      .as[(Long, Double)].collect().toSeq
    val golden = Seq(
      (38L, 1.1939), (174L, 1.1761), (97L, 1.1609), (427L, 1.1572),
      (396L, 1.1568), (3L, 1.1527), (376L, 1.1518), (403L, 1.1511),
      (77L, 1.15), (293L, 1.1493))
    assert(got == golden)
  }

  test("reference demo query 'football game' is OOV -> empty, schema intact") {
    val res = BM25.searchStored(spark, indexDir, "football game")
    assert(res.count() == 0)
    assert(res.columns.toSeq == Seq("doc_id", "doc_rank"))
  }

  test("recompute path agrees with the stored path on the golden query") {
    val docs = table(spark, "/root/testdata/sf0.01", "documents")
    val recompute = BM25.search(spark, docs, "spark join window")
      .as[(Long, Double)].collect().toSeq
    val stored = BM25.searchStored(spark, indexDir, "spark join window")
      .as[(Long, Double)].collect().toSeq
    assert(recompute == stored)
  }
}
