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

  test("Q13 histogram keeps the zero-order bucket from the left join") {
    val customer = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    // cust 1: two normal orders; cust 2: one urgent (excluded -> k=0);
    // cust 3: one normal; cust 4: no orders at all (k=0)
    val orders = Seq(
      (10L, 1L, "2-HIGH"), (11L, 1L, "3-MEDIUM"),
      (12L, 2L, "1-URGENT"), (13L, 3L, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val out = Relational.orderCountDistribution(customer, orders, "1-URGENT")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // custdist desc, c_count desc: k=0 has 2 customers, k=1 and k=2 one each
    assert(out == Seq((0L, 2L), (2L, 1L), (1L, 1L)))
  }

  test("Q7 keeps both trade directions and drops same-nation flows") {
    val nation = Seq((1L, "NATION_A"), (2L, "NATION_B"))
      .toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 1L), (11L, 2L)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((20L, 1L), (21L, 2L)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((100L, 21L), (101L, 20L), (102L, 20L))
      .toDF("o_orderkey", "o_custkey")
    // A->B (order 100), B->A (order 101), A->A (order 102, dropped)
    val li = Seq(
      (100L, 10L, 100.0, 0.0, "1996-02-01"),
      (101L, 11L, 200.0, 0.5, "1996-03-01"),
      (102L, 10L, 999.0, 0.0, "1996-04-01"))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    val out = Relational.nationTradeVolume(li, orders, customer, supplier,
      nation, "NATION_A", "NATION_B")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3))).toSeq
    assert(out == Seq(("NATION_A", "NATION_B", 100.0),
      ("NATION_B", "NATION_A", 100.0)))
  }

  test("Q20 share threshold is strict and exact at the decimal boundary") {
    val part = Seq((1L, "small ring"), (2L, "red bolt"))
      .toDF("p_partkey", "p_name")
    val nation = Seq((1L, "N")).toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 1L, "s10"), (11L, 1L, "s11"), (12L, 1L, "s12"))
      .toDF("s_suppkey", "s_nationkey", "s_name")
    // part 1 total = 100: s10 ships exactly 30 (boundary, excluded at
    // 30%), s11 ships 30.01 (just over, kept), s12 the rest;
    // part 2 is not prefix-matched -> s12's 100% share there is invisible
    val li = Seq(
      (1L, 10L, 30.0), (1L, 11L, 30.01), (1L, 12L, 39.99),
      (2L, 12L, 50.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity")
    val out = Relational.excessShareSuppliers(li, part, supplier, nation,
      "N", "small", 30)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((11L, "s11"), (12L, "s12")))
  }

  test("Q16 denylisted suppliers never reach the distinct count") {
    val part = Seq((1L, "Brand#2", "MEDIUM", 5), (2L, "Brand#9", "MEDIUM", 5))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val supplier = Seq((10L, -5.0), (11L, 50.0), (12L, 50.0))
      .toDF("s_suppkey", "s_acctbal")
    val li = Seq((1L, 10L), (1L, 10L), (1L, 11L), (1L, 12L), (2L, 11L))
      .toDF("l_partkey", "l_suppkey")
    val out = Relational.supplierVariety(li, part, supplier, "Brand#9", Seq(5))
      .collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    // supplier 10 is in deficit (denied); Brand#9's part is excluded
    assert(out == Seq(("Brand#2", 2L)))
  }

  test("Q22 mean threshold is strict; only post-cutoff orders disqualify") {
    // positive balances {150,150,100,50,50} -> mean exactly 100
    val customer = Seq(
      (1L, 150.0, "SEG_A"),  // above mean, old order only -> counted
      (2L, 150.0, "SEG_A"),  // above mean, recent order -> dropped
      (3L, 100.0, "SEG_B"),  // exactly the mean (strict >) -> dropped
      (4L, 50.0, "SEG_B"),   // below mean
      (5L, 50.0, "SEG_B"),   // below mean
      (6L, -50.0, "SEG_B"))  // negative: excluded from the mean itself
      .toDF("c_custkey", "c_acctbal", "c_mktsegment")
    val orders = Seq((10L, 1L, "1999-06-01"), (11L, 2L, "2001-06-01"))
      .toDF("o_orderkey", "o_custkey", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp"))
    val out = Relational.idleCapital(customer, orders, "2001-01-01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(("SEG_A", 1L, 150.0)))
  }

  test("product profit: one decimal pass of revenue minus cost per nation-year") {
    val nation = Seq((1L, "N1", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((1L, "s1", 1L)).toDF("s_suppkey", "s_name", "s_nationkey")
    val part = Seq(
      (1L, "small widget", 10.0), (2L, "blue rod", 1.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
    val orders = Seq((10L, "1996-02-01"), (11L, "1997-02-01"))
      .toDF("o_orderkey", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp"))
    val li = Seq(
      // widget line: rev 100 * (1 - 0.1) = 90, cost 10 * 2 = 20 -> 70
      (10L, 1L, 1L, 100.0, 0.1, 2.0),
      // rod line filtered out by the name predicate
      (11L, 2L, 1L, 500.0, 0.0, 1.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
    val out = Relational.productProfit(li, orders, supplier, part, nation, "widget")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(out == Seq(("N1", 1996, 70.0)))
  }

  test("Q18 large orders: strict threshold, carried total, price-desc rank") {
    import java.sql.Timestamp
    val li = Seq(
      (100L, 200.0), (100L, 60.0),  // order 100: 260 > 250 qualifies
      (101L, 250.0),                // exactly at threshold: strict > drops
      (102L, 300.0),                // qualifies, cheaper order
    ).toDF("l_orderkey", "l_quantity")
    val orders = Seq(
      (100L, 1L, Timestamp.valueOf("1995-03-05 00:00:00"), 900.0),
      (101L, 1L, Timestamp.valueOf("1995-03-06 00:00:00"), 999.0),
      (102L, 2L, Timestamp.valueOf("1995-03-07 00:00:00"), 500.0),
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val customer = Seq((1L, "Alice"), (2L, "Bob")).toDF("c_custkey", "c_name")
    val out = Relational.largeOrders(li, orders, customer)
      .as[(Long, String, Long, String, Double, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "Alice", 100L, "1995-03-05", 900.0, 260L),
      (2L, "Bob", 102L, "1995-03-07", 500.0, 300L)))
  }

  test("basket lift: support floor, duplicate-line dedup, exact lift") {
    import spark.implicits._
    // orders: {A,B} x3, {A,C} x1 (A-C under the support floor), the last
    // order carries a duplicate B line that must not inflate support
    val li = Seq(
      (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L),
      (4L, 10L), (4L, 20L), (4L, 20L),
    ).toDF("l_orderkey", "l_partkey")
    val out = Relational.basketLift(li)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // support(10,20)=3 of 4 orders; cnt(10)=4, cnt(20)=3 -> lift=3*4/12=1
    assert(out == Seq((10L, 20L, 3L, 4L, 3L, 1.0)))
  }

  test("skyline equals the brute-force dominance filter; twins both stay") {
    import spark.implicits._
    // crafted frontier: includes a cross-bucket case (bucketWidth 10 puts
    // 95.x and 105.x in different buckets), a same-price strict-smaller
    // dominator, and equal-(price,size) twins that must BOTH survive
    val p = Seq(
      (1L, 95.50, 10), (2L, 95.50, 10),  // twins on the frontier
      (3L, 95.50, 12),                   // same price, bigger: dominated
      (4L, 96.00, 9),                    // frontier
      (5L, 105.00, 9),                   // cross-bucket: dominated by 4
      (6L, 105.00, 3),                   // frontier
      (7L, 90.00, 50),                   // cheapest: frontier
      (8L, 106.00, 3),                   // dominated by 6
    ).toDF("p_partkey", "p_retailprice", "p_size")
    val got = Relational.skyline2d(p)
      .as[(Long, Double, Long)].collect().toSeq
    val rows = p.select("p_partkey", "p_retailprice", "p_size")
      .as[(Long, Double, Int)].collect()
    val brute = rows.filter { a => !rows.exists(b =>
        b._2 <= a._2 && b._3 <= a._3 && (b._2 < a._2 || b._3 < a._3)) }
      .map(r => (r._1, r._2, r._3.toLong)).sortBy(r => (r._2, r._3, r._1))
      .toSeq
    assert(got == brute)
    assert(got.map(_._1).toSet == Set(1L, 2L, 4L, 6L, 7L))
  }

  test("skyline matches brute force on the real part table") {
    import spark.implicits._
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val got = Relational.skyline2d(part)
      .as[(Long, Double, Long)].collect().toSeq
    val rows = part.select(col("p_partkey"),
        col("p_retailprice").cast("decimal(18,2)").cast("double"),
        col("p_size").cast("long"))
      .as[(Long, Double, Long)].collect()
    val brute = rows.filter { a => !rows.exists(b =>
        b._2 <= a._2 && b._3 <= a._3 && (b._2 < a._2 || b._3 < a._3)) }
      .sortBy(r => (r._2, r._3, r._1)).toSeq
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("gap fill: spine covers every day, LOCF carries, flags observed") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 10:00:00"), "purchase", 10.0),
      (2L, 1L, Timestamp.valueOf("2024-01-01 12:00:00"), "purchase", 5.0),
      (3L, 1L, Timestamp.valueOf("2024-01-04 10:00:00"), "purchase", 7.0),
      (4L, 1L, Timestamp.valueOf("2024-01-03 10:00:00"), "click", 99.0),
      (5L, 2L, Timestamp.valueOf("2024-01-02 10:00:00"), "purchase", 3.0),
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = graft.events.Events.gapFillDaily(ev)
      .as[(Long, String, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-01-01", 15.0, true),   // same-day purchases sum
      (1L, "2024-01-02", 15.0, false),  // carried
      (1L, "2024-01-03", 15.0, false),  // click never opens a day
      (1L, "2024-01-04", 7.0, true),
      (2L, "2024-01-02", 3.0, true)))   // single-day span, no fill
  }

  test("min-cost supplier: regional min only, out-of-region cheaper offers ignored, ties both stay") {
    // region filter = EUROPE; part 1 is STANDARD, part 2 is PROMO (excluded)
    val region = Seq((1, "EUROPE"), (2, "ASIA")).toDF("r_regionkey", "r_name")
    val nation = Seq((10, "FRANCE", 1), (11, "CHINA", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq(
      (100L, "EU_CHEAP", 10, 5.0), (101L, "EU_DEAR", 10, 9.0),
      (102L, "EU_TIE", 10, 7.0), (103L, "ASIA_CHEAPEST", 11, 1.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val part = Seq((1L, "p1", "Brand#1", "STANDARD", 1, 1.0),
      (2L, "p2", "Brand#2", "PROMO", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    // offer grain = min(l_extendedprice) per (part, supplier): EU_CHEAP
    // and EU_TIE both reach 10.0 on part 1 (EU_CHEAP via its second,
    // cheaper line); ASIA_CHEAPEST's 2.0 must NOT win (out of region);
    // part 2 is filtered by type despite having the cheapest offer of all
    def li(pk: Long, sk: Long, price: Double) =
      (1L, pk, sk, 1, 1.0, price, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val lineitem = Seq(
      li(1L, 100L, 12.0), li(1L, 100L, 10.0), li(1L, 101L, 11.0),
      li(1L, 102L, 10.0), li(1L, 103L, 2.0), li(2L, 100L, 3.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val got = Relational.minCostSupplier(lineitem, supplier, nation,
        region, part)
      .select("s_name", "p_partkey", "min_cost")
      .as[(String, Long, Double)].collect().toSeq
    // order: s_acctbal desc -> EU_TIE (7.0) before EU_CHEAP (5.0)
    assert(got == Seq(("EU_TIE", 1L, 10.0), ("EU_CHEAP", 1L, 10.0)))
  }
}
