package graft

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
  import spark.implicits._

  private val keys = Seq(
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.autoBroadcastJoinThreshold")

  test("AQE splits the skewed partition of a planted 100:1 hot-key join") {
    val conf = spark.conf
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // hot key 0 carries 100k rows (~100:1 vs the 1k-row cold keys)
      val big = spark.range(0, 200000).select(
        when(col("id") < 100000, 0L).otherwise(col("id") % 100 + 1).as("k"),
        col("id").as("payload"))
      val small = spark.range(0, 101).select(col("id").as("k"), (col("id") * 2).as("v"))
      val qe = big.join(small, "k").queryExecution
      // execute THIS query execution so ITS adaptive plan finalizes (a
      // .count() would run a different QueryExecution)
      assert(qe.toRdd.count() == 200000L)
      val plan = qe.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.toLowerCase.contains("skew"),
        s"AQE did not mark/split the skewed join:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }

  test("same join without skew handling shows no skew markers (control)") {
    val conf = spark.conf
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = spark.range(0, 200000).select(
        when(col("id") < 100000, 0L).otherwise(col("id") % 100 + 1).as("k"),
        col("id").as("payload"))
      val small = spark.range(0, 101).select(col("id").as("k"), (col("id") * 2).as("v"))
      val qe = big.join(small, "k").queryExecution
      assert(qe.toRdd.count() == 200000L)
      assert(!qe.executedPlan.toString.toLowerCase.contains("skew=true"))
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
