package graft

import org.apache.spark.sql.functions._
import graft.plans.BandedRangeJoinRule

/** The optimizer rewrite of |a-b| <= tol inequality joins. The raw
  * predicate has no equi conjunct, so stock Spark can only nested-loop it;
  * with the rule the SAME user query plans as a banded hash join with
  * identical results. */
class BandedRangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandedRangeJoinRule
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq BandedRangeJoinRule)
  }

  private def sides = {
    val ev = table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("us", unix_micros(col("ts")))
    (ev.select(col("event_id").as("id_a"), col("us").as("us_a")).limit(300),
      ev.select(col("event_id").as("id_b"), col("us").as("us_b")).limit(300))
  }

  test("rewritten inequality join matches the nested-loop results exactly") {
    val (a, b) = sides
    val cond = abs(col("us_a") - col("us_b")) <= lit(300L * 1000000L)
    val naive = a.join(b, cond && col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val rewritten = withRule {
      a.join(b, cond && col("id_a") < col("id_b"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }
    assert(rewritten == naive && naive.nonEmpty)
  }

  test("with the rule the plan is a hash join, not a nested loop") {
    val (a, b) = sides
    val cond = abs(col("us_a") - col("us_b")) <= lit(300L * 1000000L)
    withRule {
      val q = a.join(b, cond)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("Generate explode"), plan)
    }
    // without the rule the same query nested-loops (the problem is real)
    val bare = a.join(b, cond).queryExecution.executedPlan.toString
    assert(bare.contains("BroadcastNestedLoopJoin") || bare.contains("CartesianProduct"))
  }

  test("banding is exact for longs beyond 2^53 (nanosecond epochs)") {
    // double-division banding would lose ~128ns of precision here and
    // silently drop matching pairs; integer floor-division must not
    val base = 1700000000000000000L // ~2023 in epoch nanos, >> 2^53
    val tol = 1000L
    val a = Seq(("a1", base), ("a2", base + 999L), ("a3", base + 5000L))
      .toDF("id_a", "us_a")
    val b = Seq(("b1", base + 1000L), ("b2", base + 1001L), ("b3", base + 4500L))
      .toDF("id_b", "us_b")
    val cond = abs(col("us_a") - col("us_b")) <= lit(tol)
    val naive = a.join(b, cond)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    val rewritten = withRule {
      a.join(b, cond).select("id_a", "id_b").as[(String, String)].collect().toSet
    }
    assert(rewritten == naive)
    assert(naive == Set(("a1", "b1"), ("a2", "b1"), ("a2", "b2"), ("a3", "b3")))
  }

  test("joins that already have an equi key are left untouched") {
    val (a, b) = sides
    val cond = col("id_a") === col("id_b") &&
      abs(col("us_a") - col("us_b")) <= lit(1000000L)
    withRule {
      val plan = a.join(b, cond).queryExecution.executedPlan.toString
      assert(!plan.contains("Generate explode"), plan) // no needless rewrite
    }
  }
}
