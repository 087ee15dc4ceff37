package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: the pre-shuffle that makes repeated
  * fact-fact joins shuffle-free (SURVEY.md §7.4 "100 TB design notes":
  * bucketing for co-located joins).
  *
  * Writing both sides bucketed+sorted on the join key means every
  * subsequent join on that key reads pre-partitioned, pre-sorted buckets —
  * SortMergeJoin without Exchange on either side. At 100 TB the one-time
  * bucket write amortizes across every downstream join and aggregation
  * keyed the same way; BucketingSpec pins the no-Exchange plan shape.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted table on `key`. Pass `path` to
    * place the data files explicitly (external table) instead of under
    * the session warehouse dir — bucketing metadata must go through the
    * catalog either way (path-only parquet writes can't record it). */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
                    buckets: Int = 32, path: Option[String] = None): Unit = {
    val w = df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(tableName)
  }

  /** Join two same-bucketed tables on their bucket keys — plans with zero
    * shuffle exchanges when bucket counts match. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
