package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-mitigation patterns (SURVEY.md §7.4 "salting strategy for
  * skewed terms"). AQE's skew-join splitting covers sort-merge joins at
  * runtime; these cover the cases it doesn't — broadcast-ineligible skewed
  * aggregations and deterministic pre-planned salting.
  *
  * Salts are derived from row content (xxhash64), never from
  * monotonically_increasing_id or rand(), so re-execution of a failed stage
  * produces identical assignments — a correctness requirement, not a
  * nicety, under speculative execution at 1000-executor scale.
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) side gets a content-derived
    * salt in [0, salts); the small side is replicated `salts` times. The
    * shuffle then spreads each hot key over `salts` reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0)
    val bigCols = big.columns.map(col)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(bigCols: _*), lit(salts.toLong)))
    val expandedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(expandedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe count+sum aggregation: partial per (key, salt),
    * final per key. Decomposable aggregates only — which is exactly why
    * Spark's own partial aggregation usually suffices; this form exists for
    * pipelines that must bound the per-reducer key cardinality explicitly. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     salts: Int): DataFrame = {
    require(salts > 0)
    val cols = df.columns.map(col)
    df.withColumn("__salt", pmod(xxhash64(cols: _*), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("total"))
  }
}
