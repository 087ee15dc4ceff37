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

  /** Build and persist all five index tables (the reference's four plus
    * positional postings for phrase/proximity queries). Idempotent full
    * recompute (the S8/A8 design decision: recompute beats
    * read-modify-write). */
  def write(docs: DataFrame, dir: String, buckets: Int = DefaultBuckets): Unit =
    writeTables(InvertedIndex.termFrequency(docs), InvertedIndex.docInfo(docs),
      Some(InvertedIndex.positionalPostings(docs)), dir, buckets)

  /** The stat tables from a (tf, doc_info) pair plus optional positional
    * postings — shared by the full build (stats from a corpus scan) and
    * the incremental merge (stats from stored tables + a delta; positional
    * absent when merging into a store written before the table existed). */
  private def writeTables(tfIn: DataFrame, info: DataFrame,
                          posOpt: Option[DataFrame], dir: String,
                          buckets: Int): Unit = {
    // the bucket count is INDEX metadata, not caller knowledge: a reader
    // pruning with the wrong modulus silently treats ~ (1 - 1/buckets) of
    // terms as OOV (confidently wrong results, no error). Written inside
    // writeTables so the ingest swap carries it too.
    val spark = tfIn.sparkSession
    import spark.implicits._
    Seq(buckets).toDF("buckets").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/index_meta")
    // persist tf across the two writes: the tokenize+explode+aggregate (or
    // merge) lineage is the scale-dominant cost and would otherwise run twice
    val tf = tfIn.persist()
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
    // positional postings share the term-hash bucketing, so a k-term
    // phrase prunes to <= k buckets exactly like the BM25 serving path
    posOpt.foreach { pos =>
      pos.withColumn("term_bucket", termBucket(col("term"), buckets))
        .repartition(col("term_bucket"))
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(s"$dir/positional_postings")
    }
    // persist doc_info across its two consumers: in the full-build path its
    // lineage is a complete corpus tokenize scan, and the corpus-stats agg
    // would otherwise re-run it
    val inf = info.persist()
    try {
      inf.write.mode("overwrite").parquet(s"$dir/doc_info")
      // the ONE corpus-stats formula, shared with the recompute path — if
      // the stored and recomputed aggregations ever drifted, searchStored
      // and search would silently disagree
      InvertedIndex.corpusInfoFromDocInfo(inf)
        .write.mode("overwrite").parquet(s"$dir/corpus_info")
    } finally inf.unpersist()
  }

  /** Merge a small delta corpus into a stored index WITHOUT re-tokenizing
    * the stored corpus (A8/S8; the batch twin of the streaming
    * incrementalIndexWriter, and the landing point for
    * Sources.ingestLocalFile's one-file flow — app/index.sh:21-41). The
    * stored tf is already aggregated, so the merge shuffles only
    * (key, partial) pairs; df/dl/corpus stats re-derive from the merged
    * tables, never from old text.
    *
    * Write-then-swap at the index root: the merge READS the tables it
    * replaces, so everything materializes into a sibling `.next` dir first,
    * then two checked renames swap it live (single-writer posix-rename
    * assumption, same as incrementalIndexWriter; a transactional table
    * format replaces the swap on a real cluster). Crash between the
    * renames leaves `<dir>.old` complete — rename it back to recover. */
  def ingest(newDocs: DataFrame, dir: String): Unit = {
    val spark = newDocs.sparkSession
    // A re-ingested doc_id would SUM its stored tf with the new tf and
    // duplicate its doc_info row — stats silently corrupt (a full recompute
    // would be right). Fail loudly instead: one broadcast-semi-join count
    // against the (small) delta before any write.
    val dup = docInfo(spark, dir)
      .join(broadcast(newDocs.select("doc_id")), Seq("doc_id"), "left_semi")
      .count()
    require(dup == 0,
      s"IndexStore.ingest: $dup doc_id(s) already indexed at $dir — " +
        "re-indexing a changed doc needs a full recompute (write), not ingest")
    val mergedTf = InvertedIndex.mergeTermFrequency(
      postings(spark, dir).drop("term_bucket"), newDocs)
    val mergedInfo = docInfo(spark, dir)
      .unionByName(InvertedIndex.docInfo(newDocs))
    // doc_ids are guaranteed new (guard above), so the positional merge is
    // a pure union; a store written before the table existed stays without
    // it (phraseMatchStored fails loudly there; re-`write` to add it)
    val mergedPos =
      if (new java.io.File(s"$dir/positional_postings").exists())
        Some(positional(spark, dir).drop("term_bucket")
          .unionByName(InvertedIndex.positionalPostings(newDocs)))
      else None
    val cur = new java.io.File(dir)
    val old = new java.io.File(s"$dir.old")
    val tmp = new java.io.File(s"$dir.next")
    // keep the STORE's bucketing, not the caller's default — re-bucketing
    // on ingest would strand the existing postings files
    writeTables(mergedTf, mergedInfo, mergedPos, tmp.getPath,
      storedBuckets(spark, dir))
    def rename(from: java.io.File, to: java.io.File): Unit =
      require(from.renameTo(to), s"IndexStore.ingest: rename $from -> $to failed")
    if (old.exists()) delete(old)
    rename(cur, old)
    rename(tmp, cur)
    delete(old)
  }

  private def delete(f: java.io.File): Unit = {
    // listFiles is null on I/O error or a concurrently-removed dir; a
    // silently-failed delete would surface later as an inexplicable rename
    // failure mid-swap — fail at the actual cause instead
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(delete)
    if (f.exists() && !f.delete())
      throw new java.io.IOException(s"IndexStore: failed to delete $f")
  }

  // Explicit read schemas: a ZERO-TOKEN corpus writes partitioned tables
  // with no part files at all (partitionBy of an empty frame), and a
  // schema-inferring read would throw UNABLE_TO_INFER_SCHEMA — an empty
  // index must serve empty results with the schema intact (the S9
  // standing), not crash the store readers. Spelled once per table,
  // matching what writeTables emits bit-for-bit.
  import org.apache.spark.sql.types._
  private val postingsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("term", StringType),
    StructField("term_frequency", LongType),
    StructField("term_bucket", LongType)))
  private val vocabularySchema = StructType(Seq(
    StructField("term", StringType), StructField("doc_frequency", LongType),
    StructField("term_bucket", LongType)))
  private val positionalSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("pos", IntegerType),
    StructField("term", StringType), StructField("term_bucket", LongType)))
  private val docInfoSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("doc_length", LongType)))
  private val corpusInfoSchema = StructType(Seq(
    StructField("doc_n", LongType), StructField("total_doc_length", LongType),
    StructField("avg_doc_length", DoubleType)))

  def postings(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(postingsSchema).parquet(s"$dir/term_frequency_in_doc")

  def vocabulary(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(vocabularySchema).parquet(s"$dir/doc_frequency_of_term")

  def positional(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(positionalSchema).parquet(s"$dir/positional_postings")

  def docInfo(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(docInfoSchema).parquet(s"$dir/doc_info")

  def corpusInfo(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(corpusInfoSchema).parquet(s"$dir/corpus_info")

  /** The bucket count a store was written with (index_meta). Eagerly read:
    * it becomes pruning literals in the serving plan. */
  def storedBuckets(spark: SparkSession, dir: String): Int =
    spark.read.parquet(s"$dir/index_meta").head().getInt(0)

  /** Postings for a set of terms, with the bucket predicate attached so the
    * scan partition-prunes (the per-term point-read of app/query.py:64-73,
    * minus the driver loop). The modulus comes from the store's own
    * metadata — a caller-supplied count could silently mis-prune. */
  def postingsForTerms(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame =
    prunedByTerm(postings(spark, dir), terms, storedBuckets(spark, dir))

  def vocabularyForTerms(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame =
    prunedByTerm(vocabulary(spark, dir), terms, storedBuckets(spark, dir))

  /** Phrase search served from the stored positional table: each term of
    * the adjacency chain reads ONLY its hash bucket (partition pruning, as
    * in searchStored), so a k-term phrase touches <= k of `buckets`
    * directories of the positional table — never the corpus, never the
    * full table. Results ≡ InvertedIndex.phraseMatch on the indexed docs. */
  def phraseMatchStored(spark: SparkSession, dir: String, phrase: String): DataFrame = {
    val buckets = storedBuckets(spark, dir)
    InvertedIndex.phraseFromPostings(InvertedIndex.phraseTerms(phrase),
      t => prunedByTerm(positional(spark, dir), Seq(t), buckets))
  }

  /** Proximity search served from the stored positional table — both
    * sides of the banded join read only their term's hash bucket. */
  def proximityMatchStored(spark: SparkSession, dir: String, termA: String,
                           termB: String, window: Int = 8): DataFrame = {
    val buckets = storedBuckets(spark, dir)
    InvertedIndex.proximityFromPostings(termA, termB, window,
      t => prunedByTerm(positional(spark, dir), Seq(t), buckets))
  }

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
