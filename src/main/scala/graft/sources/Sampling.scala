package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus sampling (S3 — app/prepare_data.py:16-17 samples ~1000 docs with
  * `sample(fraction, seed=0).limit(n)`).
  *
  * Two forms:
  *  - `bernoulliSample` is the reference's own operator verbatim. Its
  *    output depends on partition layout (Spark seeds the RNG per
  *    partition), so it is reproducible only for a fixed layout — fine for
  *    one-off corpus prep, wrong for anything that must replay identically
  *    after a repartition. Excluded from the SQL oracle for that reason
  *    (SURVEY.md §2.1).
  *  - `deterministicSample` is the engine's replacement: order every row by
  *    a seeded content hash of its id and take the first n. The "random"
  *    order is a pure function of (doc_id, seed) — independent of partition
  *    layout, stable across engines (md5 is identical in Spark and DuckDB),
  *    and replayable: the same seed always selects the same n docs.
  *
  * Scale notes (100 TB): the hash is computed in the scan projection and
  * `limit` after `orderBy` plans as TakeOrderedAndProject — a per-partition
  * top-n heap + driver merge of n rows, NOT a global sort. Sampling n docs
  * from 10^10 never shuffles the corpus.
  */
object Sampling {

  /** Seeded hash key in [0,1)-like hex space: md5("<id>:<seed>"). */
  def sampleKey(id: Column, seed: Long): Column =
    md5(concat(id.cast("string"), lit(s":$seed")))

  /** Reference-parity Bernoulli sample (partition-layout-dependent). */
  def bernoulliSample(df: DataFrame, fraction: Double, seed: Long, n: Int): DataFrame =
    df.sample(withReplacement = false, fraction, seed).limit(n)

  /** Deterministic seeded sample of n rows keyed by `idCol`: stable under
    * repartition, re-execution, and engine change. */
  def deterministicSample(df: DataFrame, idCol: String, n: Int, seed: Long): DataFrame =
    df.withColumn("sample_key", sampleKey(col(idCol), seed))
      .orderBy(col("sample_key"), col(idCol))
      .limit(n)

  /** Deterministic stratified sample: the first `nPerGroup` rows of EACH
    * group in seeded-hash order — the corpus-balancing op (equal docs per
    * language/source/domain) training pipelines run before mixing.
    * Same determinism contract as deterministicSample; one shuffle
    * (the per-group ranking window), no global sort. */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                       nPerGroup: Int, seed: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("sample_key"), col(idCol))
    df.withColumn("sample_key", sampleKey(col(idCol), seed))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= nPerGroup)
  }
}
