package graft

import graft.TypedApi._

/** The typed facade must be a zero-cost veneer: identical results to the
  * untyped operators, schemas enforced by the encoders. */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  private def docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[Doc]

  test("typed index stats equal the untyped DataFrame operators") {
    val typed = termFrequency(docs).collect().toSet
    val untyped = index.InvertedIndex.termFrequency(docs.toDF())
      .as[Posting].collect().toSet
    assert(typed == untyped && typed.nonEmpty)
    assert(docFrequency(docs).collect().toSet ==
      index.InvertedIndex.docFrequency(docs.toDF()).as[TermStat].collect().toSet)
    assert(docInfo(docs).count() == docs.count())
  }

  test("typed search returns ScoredDoc rows matching the untyped search") {
    val typed = search(docs, "spark join window").collect().toSeq
    val untyped = rank.BM25.search(spark, docs.toDF(), "spark join window")
      .as[ScoredDoc].collect().toSeq
    assert(typed == untyped && typed.size == 10)
  }
}
