package graft

import org.apache.spark.sql.Dataset

/** Typed Dataset[T] facade over the core engine (builder brief: "use
  * Dataset[T] with case-class Encoders where type safety helps").
  *
  * The untyped DataFrame operators stay the implementation — Catalyst
  * sees the same plans either way — but pipeline code composing many
  * stages gets compile-time schemas: a stage that renames a column breaks
  * the build, not the nightly run. Encoders are resolved once per call
  * site from the case classes below (the same pattern the multimodal and
  * streaming modules already use).
  */
object TypedApi {

  case class Doc(doc_id: Long, text: String)
  case class Posting(doc_id: Long, term: String, term_frequency: Long)
  case class TermStat(term: String, doc_frequency: Long)
  case class DocStat(doc_id: Long, doc_length: Long)
  case class ScoredDoc(doc_id: Long, doc_rank: Double)

  def termFrequency(docs: Dataset[Doc]): Dataset[Posting] = {
    import docs.sparkSession.implicits._
    index.InvertedIndex.termFrequency(docs.toDF()).as[Posting]
  }

  def docFrequency(docs: Dataset[Doc]): Dataset[TermStat] = {
    import docs.sparkSession.implicits._
    index.InvertedIndex.docFrequency(docs.toDF()).as[TermStat]
  }

  def docInfo(docs: Dataset[Doc]): Dataset[DocStat] = {
    import docs.sparkSession.implicits._
    index.InvertedIndex.docInfo(docs.toDF()).as[DocStat]
  }

  def search(docs: Dataset[Doc], query: String,
             topK: Int = 10): Dataset[ScoredDoc] = {
    import docs.sparkSession.implicits._
    rank.BM25.search(docs.sparkSession, docs.toDF(), query, topK = topK)
      .as[ScoredDoc]
  }
}
