package graft

import org.apache.spark.sql.functions._
import graft.relational.RuntimeFilters

/** Bloom runtime-filter pushdown: result parity with the plain join (no
  * false negatives by construction) and the predicate actually sitting on
  * the big side's scan, below its exchange. */
class RuntimeFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-prefiltered join returns exactly the plain join's rows") {
    val orders = table(spark, "/root/testdata/sf0.001", "orders")
    val building = table(spark, "/root/testdata/sf0.001", "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name")
    val plain = orders.join(building, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").as[Long].collect().toSorted
    val bloomed = RuntimeFilters.bloomPrefilteredJoin(
        orders, "o_custkey", building, "c_custkey")
      .select("o_orderkey").as[Long].collect().toSorted
    assert(bloomed == plain && plain.nonEmpty)
  }

  test("the might-contain predicate runs on the big side before the join") {
    val orders = table(spark, "/root/testdata/sf0.001", "orders")
    val dim = table(spark, "/root/testdata/sf0.001", "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val q = RuntimeFilters.bloomPrefilteredJoin(orders, "o_custkey", dim, "c_custkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // the REAL invariant: the predicate sits directly over the big side's
    // scan with no Exchange in between — i.e. rows are pruned before any
    // shuffle, not after (a below-the-Join-line check would still pass if
    // the optimizer hoisted the filter above the exchange)
    val lines = plan.split("\n")
    val filterLine = lines.indexWhere(_.contains("might_contain"))
    val scanLine = lines.indexWhere(_.contains("orders.parquet"), filterLine)
    assert(filterLine >= 0 && scanLine > filterLine, s"no scan under filter:\n$plan")
    val between = lines.slice(filterLine + 1, scanLine)
    assert(!between.exists(_.contains("Exchange")),
      s"exchange between might_contain filter and the orders scan:\n$plan")
  }

  private implicit class Sorted(xs: Array[Long]) {
    def toSorted: Seq[Long] = xs.toSeq.sorted
  }
}
