package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AQE skew handling demonstrated under a planted 100:1 hot key: the
  * runtime re-plan must split the skewed shuffle partition instead of
  * letting one reducer drag the stage. This is the engine's answer for
  * residual skew BELOW the explicit layers (content-derived salting,
  * shingle df-caps): sort-merge fact joins rely on exactly this split at
  * 1000-executor scale, so it gets pinned like any other plan invariant.
  *
  * Thresholds are scaled down to test-fixture sizes (the hot partition is
  * ~MBs here, not GBs); the decision rule being exercised — size >
  * max(threshold, factor × median) — is the same one production hits.
  */
class AqeSkewSpec extends SparkSpec {

  /** hot key 0 carries 100k rows (~100:1 vs the 1k-row cold keys) */
  private def bigSkewed: DataFrame =
    spark.range(0, 200000).select(
      when(col("id") < 100000, 0L).otherwise(col("id") % 100 + 1).as("k"),
      col("id").as("payload"))

  private def smallDim: DataFrame =
    spark.range(0, 101).select(col("id").as("k"), (col("id") * 2).as("v"))

  /** Run `body` under conf overrides, restoring prior values after. */
  private def withConf[A](overrides: (String, String)*)(body: => A): A = {
    val conf = spark.conf
    val saved = overrides.map { case (k, _) => k -> conf.getOption(k) }
    try {
      overrides.foreach { case (k, v) => conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a planted 100:1 hot-key join") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
    ) {
      val qe = bigSkewed.join(smallDim, "k").queryExecution
      // execute THIS query execution so ITS adaptive plan finalizes (a
      // .count() would run a different QueryExecution)
      assert(qe.toRdd.count() == 200000L)
      val plan = qe.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.toLowerCase.contains("skew"),
        s"AQE did not mark/split the skewed join:\n$plan")
    }
  }

  test("same join without skew handling shows no skew markers (control)") {
    withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val qe = bigSkewed.join(smallDim, "k").queryExecution
      assert(qe.toRdd.count() == 200000L)
      assert(!qe.executedPlan.toString.toLowerCase.contains("skew=true"))
    }
  }
}
