package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch aggregates — the sub-linear-memory path for cardinality and
  * quantiles at 100 TB, where exact distinct counts would shuffle every
  * key. Sketch values are deterministic within Spark (HLL++ /
  * KLL-style percentile_approx) but engine-specific, so these queries are
  * rows-only for the driver; SketchSpec bounds their error against exact
  * answers.
  */
object Sketches {

  /** Exact vs HLL++ distinct suppliers+parts per return flag. rsd=0.02. */
  def distinctPartsPerFlag(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("approx_supps"))
      .orderBy("l_returnflag")

  /** Exact vs approximate median+p95 order price per priority. */
  def priceQuantilesPerPriority(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderpriority")
      .agg(
        percentile(col("o_totalprice"), lit(0.5)).as("exact_median"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx_median"),
        percentile(col("o_totalprice"), lit(0.95)).as("exact_p95"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(10000)).as("approx_p95"))
      .orderBy("o_orderpriority")
}
