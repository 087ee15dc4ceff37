package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-line corpus IO — the reference's TSV contract (S4/S6:
  * prepare_data.py:29 writes `doc_id \t doc_title \t text` lines; the
  * mappers parse them back at mapper1.py:11-15). The engine speaks the same
  * wire format so a reference user can point us at their existing corpus
  * dumps.
  */
object Sources {

  val CorpusSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("doc_title", StringType),
    StructField("text", StringType)))

  /** Read a TSV corpus (3 fields, no header). Malformed/short lines are
    * dropped — the reference's skip guard (mapper1.py:7-13, P6) — via
    * DROPMALFORMED rather than per-line Python checks. */
  def readCorpusTsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "false")
      .option("mode", "DROPMALFORMED")
      .schema(CorpusSchema)
      .csv(path)

  /** Write a DataFrame as the reference's tab-separated output (S6:
    * query.py:144 writes ranked results as TSV). */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", "\t").csv(path)

  /** Write a corpus as JSON-Lines — the interchange format LLM data
    * pipelines actually exchange (one JSON object per line, newline
    * delimited, splittable when compressed per-file). Spark's native json
    * sink is distributed, schema'd, and codec-parameterized; one file per
    * partition, so upstream partitioning controls shard count. */
  def writeJsonl(df: DataFrame, path: String,
                 compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Read a JSON-Lines corpus with an ENFORCED schema (never inference:
    * schema inference is a full extra pass over 100 TB, and a single
    * malformed shard would silently widen column types for every reader).
    * Malformed lines drop (PERMISSIVE would null-fill, and a downstream
    * count would disagree with the writer's). */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("mode", "DROPMALFORMED").schema(schema).json(path)

  /** Parse raw text lines into the corpus shape (T4: split(\t, 3) with the
    * <3-fields guard) — for sources that arrive as unsplit lines. */
  def parseCorpusLines(lines: DataFrame, col_ : String = "value"): DataFrame = {
    val parts = split(col(col_), "\t", 3)
    lines
      .filter(length(trim(col(col_))) > 0 && size(parts) >= 3)
      .select(
        // try_cast: ANSI mode (Spark 4 default) would throw on a malformed
        // id; the reference's guard semantics are drop-not-fail.
        try_element_at(parts, lit(1)).try_cast(LongType).as("doc_id"),
        element_at(parts, 2).as("doc_title"),
        element_at(parts, 3).as("text"))
      .filter(col("doc_id").isNotNull)
  }

  /** Single-file ingest matching the reference's add-one-local-file
    * conventions (app/index.sh:21-30): the document title is the filename
    * without its `.txt` extension, newlines flatten to spaces (`tr '\n' ' '`
    * — trailing newline included), and the caller supplies the id (the
    * reference draws a random 6-digit one; determinism is ours to keep).
    * Reads through the distributed text source, so the path may live on any
    * Spark-visible filesystem. Feed the result to `IndexStore.ingest` (or
    * the streaming `incrementalIndexWriter`) to fold it into a stored
    * index. */
  def ingestLocalFile(spark: SparkSession, path: String, docId: Long): DataFrame = {
    val name = new java.io.File(path).getName
    val title = if (name.endsWith(".txt")) name.dropRight(4) else name
    spark.read.option("wholetext", "true").text(path)
      .select(lit(docId).as("doc_id"), lit(title).as("doc_title"),
        regexp_replace(col("value"), "\n", " ").as("text"))
  }

  /** JSONL corpus reader (modern pipelines): one JSON doc per line. */
  def readCorpusJsonl(spark: SparkSession, path: String): DataFrame =
    readJsonl(spark, path, CorpusSchema)

  /** ORC round-trip — the OTHER columnar interchange format a warehouse
    * hands us (Hive/Trino shops). Same contract as the parquet path:
    * columnar, splittable, predicate/pushdown-capable (the spec pins
    * that an id filter reaches the ORC scan as a pushed filter, so a
    * selective read over 100 TB of ORC prunes stripes, not rows). */
  def writeOrc(df: DataFrame, path: String,
               compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  /** Read ORC with an ENFORCED schema (same rationale as readJsonl:
    * never pay an inference pass, never let one shard widen a type). */
  def readOrc(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
