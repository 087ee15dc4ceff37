package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index — the engine-native replacement for the
  * reference's four Cassandra tables (app/cassandra/schema.cql:5-32).
  *
  * The reference makes term lookups single-partition reads by keying
  * Cassandra on (term, corpus_name) (SURVEY.md §4 row 1). Here the postings
  * and vocabulary tables are partitioned by a term-hash bucket: a query for
  * k terms touches at most k of `buckets` directories — Catalyst partition
  * pruning does what Cassandra token routing did, and at 100 TB the
  * difference between scanning 4/64 buckets and the full table IS the
  * query latency.
  */
object IndexStore {

  val DefaultBuckets = 64

  def termBucket(term: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(term), lit(buckets.toLong))

  /** Build and persist all four index tables. Idempotent full recompute
    * (the S8/A8 design decision: recompute beats read-modify-write). */
  def write(docs: DataFrame, dir: String, buckets: Int = DefaultBuckets): Unit = {
    // persist tf across the two writes: the tokenize+explode+aggregate
    // lineage is the scale-dominant cost and would otherwise run twice
    val tf = InvertedIndex.termFrequency(docs).persist()
    try {
      // repartition on the bucket column before partitionBy: each task then
      // holds whole buckets, so every bucket directory gets O(1) files
      // instead of one per task — at 100 TB the difference between
      // buckets×tasks small files and buckets compact ones.
      tf.withColumn("term_bucket", termBucket(col("term"), buckets))
        .repartition(col("term_bucket"))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(s"$dir/term_frequency_in_doc")
      InvertedIndex.docFrequencyFromTf(tf)
        .withColumn("term_bucket", termBucket(col("term"), buckets))
        .repartition(col("term_bucket"))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(s"$dir/doc_frequency_of_term")
    } finally tf.unpersist()
    InvertedIndex.docInfo(docs)
      .write.mode("overwrite").parquet(s"$dir/doc_info")
    InvertedIndex.corpusInfo(docs)
      .write.mode("overwrite").parquet(s"$dir/corpus_info")
  }

  def postings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/term_frequency_in_doc")

  def vocabulary(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/doc_frequency_of_term")

  def docInfo(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/doc_info")

  def corpusInfo(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/corpus_info")

  /** Postings for a set of terms, with the bucket predicate attached so the
    * scan partition-prunes (the per-term point-read of app/query.py:64-73,
    * minus the driver loop). */
  def postingsForTerms(spark: SparkSession, dir: String, terms: Seq[String],
                       buckets: Int = DefaultBuckets): DataFrame =
    prunedByTerm(postings(spark, dir), terms, buckets)

  def vocabularyForTerms(spark: SparkSession, dir: String, terms: Seq[String],
                         buckets: Int = DefaultBuckets): DataFrame =
    prunedByTerm(vocabulary(spark, dir), terms, buckets)

  private def prunedByTerm(df: DataFrame, terms: Seq[String], buckets: Int): DataFrame = {
    val bucketIds = terms.map(t => bucketOf(t, buckets)).distinct
    df.filter(col("term_bucket").isin(bucketIds: _*) &&
      col("term").isin(terms: _*))
  }

  /** Spark-side xxhash64 of a literal term, evaluated eagerly so the bucket
    * list lands in the plan as partition-pruning literals. */
  def bucketOf(term: String, buckets: Int = DefaultBuckets): Long = {
    // XxHash64 over a UTF8String with Spark's default seed 42L — the same
    // expression termBucket uses, evaluated locally.
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(term)), 42L)
      .eval(null).asInstanceOf[Long]
    val m = h % buckets
    if (m < 0) m + buckets else m
  }
}
