package graft

import org.apache.spark.sql.functions._
import graft.relational.Relational
import graft.textstats.TextAnalysis

/** Hand-computed cases for the report-shaped queries added in round 3:
  * Q10 star report, Q15 max-over-view, Q6 scan-filter aggregate, the
  * deterministic mode, and vocabulary-richness stats. Each also carries a
  * full oracle row in SparkEntry; these specs pin the semantics the SQL
  * can't state (tie-break direction, exact-decimal winner ties,
  * aggregate-before-dim-join shape). */
class ReportQueriesSpec extends SparkSpec {

  import spark.implicits._

  test("mode per group breaks count ties to the alphabetically-first key") {
    val customer = Seq((1L, "SEG_A"), (2L, "SEG_A"))
      .toDF("c_custkey", "c_mktsegment")
    // SEG_A: two priorities, both with 2 orders -> tie; '1-URGENT' < '2-HIGH'
    val orders = Seq(
      (10L, 1L, "2-HIGH"), (11L, 1L, "2-HIGH"),
      (12L, 2L, "1-URGENT"), (13L, 2L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val out = Relational.modalPriorityPerSegment(customer, orders).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "SEG_A")
    assert(out(0).getString(1) == "1-URGENT")
    assert(out(0).getLong(2) == 2L)
  }

  test("top-supplier keeps ALL suppliers tied at the exact-decimal max") {
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    // suppliers 1 and 2 both net exactly 100.00; supplier 3 nets less
    val li = Seq(
      (1L, 100.0, 0.0, "1996-02-01"),
      (2L, 200.0, 0.5, "1996-02-01"),
      (3L, 50.0, 0.0, "1996-02-01"),
      (1L, 999.0, 0.0, "1999-01-01")) // outside the window
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    val out = Relational.topSupplierRevenue(supplier, li, "1996-01-01", "1996-04-01")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.forall(_.getDouble(2) == 100.0))
  }

  test("revenue delta: only the banded, capped, in-window rows contribute") {
    val li = Seq(
      (100.0, 0.06, 10.0, "1996-05-01"), // kept: 6.0
      (100.0, 0.04, 10.0, "1996-05-01"), // discount below band
      (100.0, 0.06, 30.0, "1996-05-01"), // quantity at/above cap
      (100.0, 0.06, 10.0, "1997-05-01")) // outside window
      .toDF("l_extendedprice", "l_discount", "l_quantity", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    val out = Relational.discountRevenueDelta(li, "1996-01-01", "1997-01-01")
      .collect()(0)
    assert(out.getLong(0) == 1L)
    assert(out.getDouble(1) == 6.0)
  }

  test("returned-item report aggregates the fact side before the dim joins") {
    val customer = Seq((1L, "c1", 7L), (2L, "c2", 7L))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val nation = Seq((7L, "NATION_A")).toDF("n_nationkey", "n_name")
    val orders = Seq((10L, 1L, "1995-03-15"), (11L, 2L, "1995-03-15"),
      (12L, 1L, "1995-09-15")) // outside the quarter
      .toDF("o_orderkey", "o_custkey", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp"))
    val li = Seq(
      (10L, "R", 100.0, 0.1), // c1: 90.00
      (10L, "N", 500.0, 0.0), // not returned
      (11L, "R", 50.0, 0.0),  // c2: 50.00
      (12L, "R", 999.0, 0.0)) // order outside window
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val df = Relational.returnedItemReport(customer, orders, li, nation,
      "1995-03-01", "1995-06-01", k = 20)
    val out = df.collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(3))).toSeq ==
      Seq((1L, 90.0), (2L, 50.0))) // revenue-desc order
    // shape pin: the plan aggregates (partial+final) BELOW the customer
    // join — the dim join input is per-customer rows, not lineitem volume
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.toLowerCase.contains("cartesianproduct"))
  }

  test("top-supplier reuses the revenue-view exchange — one lineitem scan") {
    // the view max re-derives from the same aggregate subtree; at scale the
    // filtered lineitem must be scanned/shuffled ONCE, with the max side
    // consuming a ReusedExchange of the revenue view's exchange
    val df = SparkEntry.queries("rel_top_supplier")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"expected the revenue-view exchange to be reused:\n$plan")
  }

  test("sole-late-supplier: only the lone late shipper on multi-supplier orders") {
    val supplier = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val orders = Seq((100L, "1996-01-01"), (101L, "1996-01-01"),
      (102L, "1996-01-01"))
      .toDF("o_orderkey", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp"))
    def li(ok: Long, sk: Long, ship: String) = (ok, sk, ship)
    val lineitem = Seq(
      li(100L, 1L, "1996-06-01"), // late
      li(100L, 2L, "1996-01-15"), // on time -> s1 is the sole late one
      li(101L, 1L, "1996-06-01"), // late
      li(101L, 2L, "1996-06-01"), // late too -> nobody qualifies
      li(102L, 3L, "1996-06-01")) // late but single-supplier order
      .toDF("l_orderkey", "l_suppkey", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    val out = Relational.soleLateSupplier(supplier, orders, lineitem)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((1L, 1L)))
  }

  test("vocabulary stats: hapax and type counts on a constructed corpus") {
    val docs = Seq(
      (1L, "web", "aa bb aa"), // web: tokens=3, types={aa:2, bb:1}
      (2L, "web", "cc"),       // web: +1 token, +1 type (cc hapax)
      (3L, "lit", "dd dd"))    // lit: tokens=2, types={dd:2}, 0 hapax
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.vocabularyStats(docs).collect()
    val web = out.find(_.getString(0) == "web").get
    assert(web.getLong(1) == 4L && web.getLong(2) == 3L && web.getLong(3) == 2L)
    assert(web.getDouble(4) == 0.75) // 3 types / 4 tokens
    assert(math.abs(web.getDouble(5) - 0.666667) < 1e-9)
    val lit = out.find(_.getString(0) == "lit").get
    assert(lit.getLong(1) == 2L && lit.getLong(2) == 1L && lit.getLong(3) == 0L)
    assert(lit.getDouble(5) == 0.0)
  }
}
