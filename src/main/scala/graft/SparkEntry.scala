package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.InvertedIndex
import graft.rank.BM25

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry pairs a DataFrame plan with DuckDB oracle SQL over the same
  * parquet tables. Determinism rules (SURVEY.md §7.4): identical column
  * names+order, explicit total ORDER BY on both sides, floats rounded to 4
  * decimals, computed ints cast to BIGINT on the DuckDB side (its sum()
  * yields INT128), regex char class pinned to [a-z0-9_'].
  */
object SparkEntry {

  /** Flagship: BM25 top-10 (the reference's `search.sh "football game"`
    * against our synthetic corpus vocabulary). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    BM25.search(spark, table(spark, "/root/testdata/sf0.001", "documents"),
      "spark join window")

  val FlagshipQuery = "spark join window"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference parity: inverted index (SURVEY §2.4 A1-A5) ----
    "idx_term_frequency" -> ((s, dir) =>
      InvertedIndex.termFrequency(table(s, dir, "documents"))
        .orderBy("doc_id", "term")),
    "idx_doc_frequency" -> ((s, dir) =>
      InvertedIndex.docFrequency(table(s, dir, "documents"))
        .orderBy("term")),
    "idx_doc_info" -> ((s, dir) =>
      InvertedIndex.docInfo(table(s, dir, "documents"))
        .orderBy("doc_id")),
    "idx_corpus_info" -> ((s, dir) =>
      InvertedIndex.corpusInfo(table(s, dir, "documents"))
        .select(col("doc_n"), col("total_doc_length"),
          round(col("avg_doc_length"), 4).as("avg_doc_length"))),
    // ---- reference parity: BM25 ranking (SURVEY §2.5, §2.7, A6-A7, O1) ----
    "bm25_search" -> ((s, dir) =>
      BM25.search(s, table(s, dir, "documents"), FlagshipQuery)),
    // S9: all-OOV query must yield empty result with intact schema, not fail.
    "bm25_oov" -> ((s, dir) =>
      BM25.search(s, table(s, dir, "documents"), "zzzznotaword qqqqnotaword")),
  )

  /** DuckDB-runnable oracle SQL, one per queries key, same column names. */
  def oracleSql: Map[String, String] = Map(
    "idx_term_frequency" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_'']+')) AS term FROM documents)
        |SELECT doc_id, term, count(*) AS term_frequency
        |FROM tok GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,
    "idx_doc_frequency" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_'']+')) AS term FROM documents),
        |d AS (SELECT DISTINCT doc_id, term FROM tok)
        |SELECT term, count(*) AS doc_frequency FROM d GROUP BY term ORDER BY term""".stripMargin,
    "idx_doc_info" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '[a-z0-9_'']+')) AS BIGINT) AS doc_length
        |FROM documents ORDER BY doc_id""".stripMargin,
    "idx_corpus_info" ->
      """WITH dl AS (SELECT CAST(len(regexp_extract_all(lower(text), '[a-z0-9_'']+')) AS BIGINT) AS doc_length FROM documents)
        |SELECT count(*) AS doc_n, CAST(sum(doc_length) AS BIGINT) AS total_doc_length,
        |       round(avg(doc_length), 4) AS avg_doc_length FROM dl""".stripMargin,
    "bm25_search" -> bm25OracleSql("('spark','join','window')"),
    "bm25_oov" -> bm25OracleSql("('zzzznotaword','qqqqnotaword')"),
  )

  /** BM25 oracle pipeline (k1=1, b=0.75, raw ln(N/df) idf — app/query.py:131-135). */
  private def bm25OracleSql(termsInList: String): String =
    s"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_'']+')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term IN $termsInList GROUP BY doc_id, term),
       |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok WHERE term IN $termsInList GROUP BY term),
       |dl AS (SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '[a-z0-9_'']+')) AS BIGINT) AS dl FROM documents),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
       |scored AS (
       |  SELECT tf.doc_id,
       |         sum( ln(CAST(n AS DOUBLE)/df) * (2.0*tf) / (1.0*(0.25 + 0.75*dl/avgdl) + tf) ) AS score
       |  FROM tf JOIN dfq USING(term) JOIN dl USING(doc_id) CROSS JOIN stats
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, round(score, 4) AS doc_rank FROM scored
       |ORDER BY doc_rank DESC, doc_id LIMIT 10""".stripMargin
}
