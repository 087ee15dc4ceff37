package graft

import org.apache.spark.sql.functions._
import graft.relational.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans without shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      table(spark, dir, "lineitem").select("l_orderkey", "l_quantity"),
      "li_bucketed", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(
      table(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
      "ord_bucketed", "o_orderkey", buckets = 8)

    // force the sort-merge path so the assertion targets exchanges, not
    // a broadcast that would hide them at this tiny SF
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "li_bucketed", "ord_bucketed",
        "l_orderkey", "o_orderkey")
      joined.collect() // finalize AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and the same join on raw (unbucketed) tables DOES shuffle
      val raw = table(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
        .join(table(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
      raw.collect()
      assert(raw.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed group-by on the bucket key avoids the aggregate shuffle") {
    val agg = spark.table("li_bucketed").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation still shuffles:\n$plan")
  }
}
