package graft

import java.nio.file.Files

import graft.rank.BM25
import graft.sources.Sampling

/** End-to-end smoke of the app.sh-parity driver: prepare (sample + per-doc
  * files) -> index -> stored search, one call. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline run reproduces the pinned golden top-10 at sf0.01") {
    val work = Files.createTempDirectory("graft-pipeline-spec").toString
    val docs = table(spark, "/root/testdata/sf0.01", "documents")
    // sampleN >= corpus size: the sample stage passes the whole corpus
    // through, so the search result must equal GoldenSearchSpec's pin
    val got = Pipeline.run(spark, docs, work, "spark join window",
        sampleN = 1000, seed = 0L)
      .as[(Long, Double)].collect().toSeq
    val golden = Seq(
      (38L, 1.1939), (174L, 1.1761), (97L, 1.1609), (427L, 1.1572),
      (396L, 1.1568), (3L, 1.1527), (376L, 1.1518), (403L, 1.1511),
      (77L, 1.15), (293L, 1.1493))
    assert(got == golden)
    // prepare stage materialized one file per doc
    val files = new java.io.File(s"$work/data").listFiles()
    assert(files != null && files.length == 500)
  }

  test("pipeline on a strict sample searches exactly the sampled corpus") {
    val work = Files.createTempDirectory("graft-pipeline-sample").toString
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    val got = Pipeline.run(spark, docs, work, "spark join window",
        sampleN = 100, seed = 42L)
      .as[(Long, Double)].collect().toSeq
    val sampled = Sampling.deterministicSample(docs, "doc_id", 100, 42L)
      .drop("sample_key")
    val expect = BM25.search(spark, sampled, "spark join window")
      .as[(Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == expect)
    assert(new java.io.File(s"$work/data").listFiles().length == 100)
  }
}
