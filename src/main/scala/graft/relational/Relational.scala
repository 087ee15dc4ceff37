package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** General relational operator surface (SURVEY.md §7.3 step 2): the §2
  * operator categories widened to the TPC-H-ish testdata. Every function is
  * a pure DataFrame -> DataFrame plan; Catalyst handles pushdown, pruning,
  * join selection, partial aggregation.
  *
  * Determinism-for-oracle rules used throughout:
  *  - money/quantity aggregates accumulate as DECIMAL(18,2) (exact, order
  *    independent) and surface as DOUBLE — float summation order would
  *    otherwise diverge between Spark's partial/final shuffle tree and the
  *    oracle's sequential scan;
  *  - every result gets a total ORDER BY;
  *  - window orderings always include a unique key tie-break.
  *
  * Scale notes (100 TB): group-bys are partial+final hash aggregates;
  * dimension joins (region/nation/part/supplier) are broadcast-eligible and
  * hinted; fact-fact joins shuffle on the join key — at 1000 executors that
  * is the intended hash-partitioned exchange, with AQE handling skew.
  */
object Relational {

  /** Exact money arithmetic: DECIMAL(18,2) in, exact sums out. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Timestamp columns -> strings for oracle-comparable output (Spark
    * parquet timestamps are UTC-adjusted; DuckDB's are naive). */
  def fmtTsCols(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, date_format(col(c), "yyyy-MM-dd HH:mm:ss.SSSSSS")))

  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** TPC-H Q1-shaped pricing summary: scan-heavy filter + 6-way aggregate.
    * At scale: single shuffle of 6 groups x partial rows; filter and the
    * 7-column projection both reach the parquet scan. */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame = {
    val discPrice = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
    lineitem
      .filter(col("l_shipdate") <= ts(cutoff))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(discPrice * (lit(1) + money(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(money(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Filter + narrow projection — exists to prove scan pushdown: the plan
    * must show PushedFilters + a 5-column ReadSchema. */
  def filterProject(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= ts("2000-01-01") &&
        col("l_shipdate") < ts("2000-04-01") && col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      // (l_orderkey, l_linenumber) is NOT unique in the harness testdata
      // (one duplicate pair at sf0.1) — order by the full projection so
      // the only remaining ties are value-identical rows
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  /** Fact ⋈ dimension + aggregate: revenue per market segment. */
  def revenueBySegment(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("c_mktsegment")

  /** TPC-H Q5-shaped 6-table join: local-supplier revenue per nation in one
    * region+year window. nation/region broadcast; customer/supplier hash
    * join the fact tables on their keys. */
  def localSupplierRevenue(customer: DataFrame, orders: DataFrame,
                           lineitem: DataFrame, supplier: DataFrame,
                           nation: DataFrame, region: DataFrame,
                           regionName: String, from: String, until: String): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === regionName &&
        col("o_orderdate") >= ts(from) && col("o_orderdate") < ts(until))
      .groupBy("n_name")
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))

  /** Fact ⋈ broadcast dimension, aggregate per brand. */
  def volumeByBrand(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        sum(money(col("l_quantity"))).cast("double").as("total_qty"))
      .orderBy("p_brand")

  /** Left-semi: customers having at least one order above a threshold. */
  def bigSpenders(customer: DataFrame, orders: DataFrame, minTotal: Double): DataFrame =
    customer.join(orders.filter(col("o_totalprice") > minTotal),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-anti: customers with no order in a date window. */
  def dormantCustomers(customer: DataFrame, orders: DataFrame, from: String): DataFrame =
    customer.join(orders.filter(col("o_orderdate") >= ts(from)),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-outer join + aggregate preserving zero-order customers. */
  def orderCountsIncludingIdle(customer: DataFrame, orders: DataFrame, from: String): DataFrame =
    customer.join(orders.filter(col("o_orderdate") >= ts(from)),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(money(col("o_totalprice"))).cast("double"), lit(0.0)).as("spent"))
      .orderBy("c_custkey")

  /** FULL OUTER join: per-customer urgent vs high spend, keeping customers
    * present on either side only (nulls surfaced as 0). Completes the
    * outer-join family next to the left-outer aggregate. */
  def urgentVsHighSpendFullOuter(orders: DataFrame): DataFrame = {
    def side(prio: String, out: String) =
      orders.filter(col("o_orderpriority") === prio)
        .groupBy("o_custkey")
        .agg(sum(money(col("o_totalprice"))).cast("double").as(out))
    side("1-URGENT", "urgent_spend")
      .join(side("2-HIGH", "high_spend"), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("urgent_spend"), lit(0.0)).as("urgent_spend"),
        coalesce(col("high_spend"), lit(0.0)).as("high_spend"))
      .orderBy("o_custkey")
  }

  /** DISTINCT projection. */
  def distinctFlagStatus(lineitem: DataFrame): DataFrame =
    lineitem.select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** UNION ALL of two tagged slices. */
  def urgentOrHighUnion(orders: DataFrame): DataFrame = {
    def slice(prio: String, tag: String) =
      orders.filter(col("o_orderpriority") === prio)
        .select(col("o_orderkey"), col("o_custkey"), lit(tag).as("bucket"))
    slice("1-URGENT", "urgent").unionByName(slice("2-HIGH", "high"))
      .orderBy("o_orderkey", "bucket")
  }

  /** INTERSECT (set semantics): building-segment customers who also placed
    * a big order. */
  def buildingBigSpenders(customer: DataFrame, orders: DataFrame, minTotal: Double): DataFrame =
    customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      .intersect(orders.filter(col("o_totalprice") > minTotal)
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** EXCEPT (set semantics): customers who never placed an urgent order. */
  def neverUrgent(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .except(orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** INTERSECT ALL (bag semantics): per customer, min(#urgent, #high)
    * occurrences survive — the multiplicity-preserving form the
    * set-semantics intersect cannot express. Plans as one aggregate per
    * side + a join on counts (Catalyst's ReplaceIntersectAll), not a
    * pairwise matching — a single pair of shuffles at scale. */
  def urgentVsHighIntersectAll(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      .intersectAll(
        orders.filter(col("o_orderpriority") === "2-HIGH").select("o_custkey"))
      .orderBy("o_custkey")

  /** EXCEPT ALL (bag semantics): per customer, max(0, #urgent - #high)
    * occurrences survive. */
  def urgentVsHighExceptAll(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      .exceptAll(
        orders.filter(col("o_orderpriority") === "2-HIGH").select("o_custkey"))
      .orderBy("o_custkey")

  /** Global top-k — plans as TakeOrderedAndProject, never a full sort. */
  def topOrders(orders: DataFrame, k: Int): DataFrame =
    orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(k)

  /** Ranking window: top-n orders per customer. */
  def topOrdersPerCustomer(orders: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Running-sum window: cumulative spend per customer over time. */
  def runningSpend(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.withColumn("run_spend", sum(money(col("o_totalprice"))).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "run_spend")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Lag window: days between consecutive orders of a customer. */
  def daysBetweenOrders(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), col("prev_date")).cast("long").as("days_since_prev"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** ROLLUP: subtotals and grand total over (returnflag, linestatus). */
  def rollupFlagStatus(lineitem: DataFrame): DataFrame =
    lineitem.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** DISTINCT aggregate: distinct customers per order priority. */
  def customersPerPriority(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** Conditional aggregation (CASE inside agg). */
  def discountedRevenueByFlag(lineitem: DataFrame): DataFrame = {
    val discounted = col("l_discount") > 0.05
    val discPrice = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
    lineitem.groupBy("l_returnflag")
      .agg(
        sum(when(discounted, discPrice).otherwise(lit(0).cast(DecimalType(18, 4))))
          .cast("double").as("discounted_revenue"),
        sum(when(discounted, 1L).otherwise(0L)).as("n_discounted"))
      .orderBy("l_returnflag")
  }

  /** Scalar date-function surface: per-(year, month) order stats. */
  def ordersByYearMonth(orders: DataFrame): DataFrame =
    orders.groupBy(
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("y", "m")

  /** Scalar string-function surface: case fold, length, slicing, LIKE. */
  def customerNameFacts(customer: DataFrame): DataFrame =
    customer.select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        length(col("c_name")).cast("long").as("name_len"),
        substring(col("c_name"), 1, 9).as("name_prefix"),
        col("c_name").like("%1%").as("has_one"))
      .orderBy("c_custkey")

  /** CUBE: all grouping-set combinations over (returnflag, linestatus). */
  def cubeFlagStatus(lineitem: DataFrame): DataFrame =
    lineitem.cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Exact median (linear interpolation) — deterministic on exact inputs,
    * unlike approx_percentile. */
  def medianPricePerPriority(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderpriority")
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("median_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** TPC-H Q3 shape (shipping priority): 3-way join, filtered both sides
    * by date, revenue agg, top-k — the canonical "find the work to do
    * next" analytic. Customer dim filtered+broadcast; fact joins shuffle
    * on their keys; top-10 is TakeOrderedAndProject. */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String,
                       cutoff: String): DataFrame =
    customer.filter(col("c_mktsegment") === segment)
      .join(orders.filter(col("o_orderdate") < ts(cutoff)),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_shipdate") > ts(cutoff)),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)

  /** first_value/last_value over an explicit full-partition frame: each
    * order alongside its customer's cheapest and priciest order. */
  def firstLastPerCustomer(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        first("o_orderkey").over(w).as("cheapest_order"),
        last("o_orderkey").over(w).as("priciest_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Fixed-width value histogram: count per price bucket — the shape every
    * profiling pass runs; one groupBy on a derived bucket key. */
  def priceHistogram(orders: DataFrame, bucketWidth: Double = 50000.0): DataFrame =
    orders.groupBy(floor(col("o_totalprice") / bucketWidth).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", col("bucket") * bucketWidth)
      .select("bucket", "lo", "n")
      .orderBy("bucket")

  /** Explicit GROUPING SETS (beyond ROLLUP/CUBE): per-flag and per-status
    * subtotals WITHOUT the combined or grand-total sets — the shape ETL
    * uses when only specific marginals are wanted. One pass, one shuffle
    * (Expand + single hash aggregate), not a self-union of two group-bys. */
  def groupingSetsFlagStatus(lineitem: DataFrame): DataFrame =
    lineitem.groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Distribution window functions: quartile bucket (ntile) and
    * percent_rank of each order within its priority class. */
  def priceQuartilesPerPriority(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders.select(
        col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"))
      .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
  }

  /** Correlated-EXISTS shape (TPC-H Q4): orders with at least one line item
    * shipped more than `graceDays` after the order date, counted per
    * priority. The correlated subquery decorrelates to ONE left-semi join
    * whose condition carries the date predicate — at scale that is a single
    * hash-partitioned exchange pair on the order key, never a per-order
    * probe. */
  def latePriorityCounts(orders: DataFrame, lineitem: DataFrame,
                         graceDays: Int = 60): DataFrame =
    orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $graceDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy("o_orderpriority")

  /** HAVING / IN-subquery shape (TPC-H Q18): orders whose line items sum to
    * more than `minQty` units. The grouped HAVING side is aggregated FIRST
    * (partial+final, exact decimal sum), then joined back — semantically
    * `o_orderkey IN (SELECT ... GROUP BY ... HAVING ...)` but keeping the
    * aggregate value in the output. Both shuffles key on the order key, so
    * AQE can plan the second as a co-partitioned join. */
  def bigQuantityOrders(orders: DataFrame, lineitem: DataFrame,
                        minQty: Double = 150.0): DataFrame = {
    val big = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(money(col("l_quantity"))).cast("double").as("total_qty"))
      .filter(col("total_qty") > minQty)
    orders.join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("total_qty"))
      .orderBy("o_orderkey")
  }

  /** Correlated-average shape (TPC-H Q17): revenue impact of
    * small-quantity lineitems — those below 20% of their part's average
    * quantity — for one brand's parts. The per-part correlated avg
    * decorrelates to one aggregate + join-back on l_partkey; the brand
    * dimension prunes first and broadcasts, so only that brand's
    * lineitems ever shuffle. The threshold compare is EXACT:
    * `qty * 5 * cnt < sum_qty` over DECIMAL — never a float-divided avg
    * whose 1-ulp cross-engine drift could flip a boundary row. */
  /** TPC-H Q18 shape (large-volume orders): the `o_orderkey IN (SELECT
    * l_orderkey ... HAVING sum(qty) > t)` subquery decorrelates into ONE
    * per-order aggregate that both restricts and carries the total — the
    * fact table is reduced to one row per qualifying order BEFORE any
    * dimension join, so lineitem crosses exactly one exchange and the
    * customer dim broadcasts. Quantities are integer-valued doubles in
    * this corpus; summed as exact longs so the threshold cut is
    * order-independent. Rank by o_totalprice DESC with the o_orderkey
    * tie-break (equal-price orders would otherwise be engine-ordered). */
  def largeOrders(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, minQty: Long = 250L): DataFrame = {
    val big = lineitem.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    big.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
                           brand: String): DataFrame = {
    val parts = part.filter(col("p_brand") === brand).select("p_partkey")
    val li = lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val stats = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(money(col("l_quantity"))).as("__sq"), count(lit(1)).as("__cnt"))
    li.join(stats, col("l_partkey") === col("pk"))
      .filter(money(col("l_quantity")) * lit(5) * col("__cnt") < col("__sq"))
      .agg(count(lit(1)).as("n_small"),
        round(sum(money(col("l_extendedprice"))).cast("double") / 7.0, 4)
          .as("avg_yearly"))
  }

  /** Correlated scalar-subquery shape (TPC-H Q2's min-per-group): each
    * customer's cheapest order. The textbook decorrelation is
    * aggregate-then-join-back (two shuffles + a join); Spark-first it
    * collapses to ONE aggregation — min over (price, orderkey) structs is
    * lexicographic, so a single partial+final pass yields both the group
    * minimum and its deterministic tie-break (lowest orderkey at the
    * minimum price), no join at all. The oracle keeps the join-back
    * spelling as an independent derivation. Null prices are filtered
    * first: SQL's min() skips them, but a struct-min would sort a null
    * FIELD smallest and surface it. (Null GROUP KEYS are a second
    * spelling divergence — groupBy keeps a null-key group where the
    * oracle's join-back drops it, since null = null never joins; TPC-H's
    * NOT NULL o_custkey makes it moot here, but a generalized helper
    * must pick one semantics and filter accordingly.) */
  def cheapestOrderPerCustomer(orders: DataFrame): DataFrame =
    orders.filter(col("o_totalprice").isNotNull)
      .groupBy("o_custkey")
      .agg(min(struct(col("o_totalprice"), col("o_orderkey"))).as("m"))
      .select(col("o_custkey"), col("m.o_orderkey").as("o_orderkey"),
        col("m.o_totalprice").as("min_price"))
      .orderBy("o_custkey")

  /** Global total-order sort (no limit): plans as a RangePartitioning
    * exchange — Spark samples the sort key to build range bounds, so the
    * full order is produced by p independent partition sorts, never a
    * single-node sort. The one distributed-sort shape not already covered
    * by top-k (TakeOrderedAndProject short-circuits the exchange). */
  def ordersByPriceDesc(orders: DataFrame): DataFrame =
    orders.select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))

  /** Monthly price profile via the typed Welford/Chan moments UDAF
    * (graft.functions.MomentsAggregator) alongside exact decimal sums.
    *
    * The oracle-compared mean/stddev come from the EXACT decimal sums, not
    * the UDAF's double accumulators: double-accumulated moments are
    * merge-order-dependent at the ulp level, so a rounded comparison
    * against DuckDB's own accumulation is a midpoint coin-flip (observed
    * at sf0.001). The UDAF contributes its exactly-comparable outputs
    * (n, min, max) here and has its mean/stddev pinned ulp-tight against
    * Spark's built-ins in StatsAggregatorSpec. Mean is UNROUNDED: sx is
    * exact (< 2^53 in cents) and /n is one identical double op -> bit-equal
    * across engines, while round() at a fixed digit is a coin-flip on the
    * frequent exact decimal ties cents/n produces (Spark rounds the
    * shortest decimal repr, DuckDB the binary value). Stddev IS rounded: a
    * sqrt never lands on a decimal tie, and rounding absorbs the ulp-level
    * noise of the wide-decimal sxx -> double cast. */
  def monthlyPriceProfile(orders: DataFrame): DataFrame = {
    val p = money(col("o_totalprice"))
    val n = col("mom.n")
    orders
      .groupBy(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(graft.functions.MomentsAggregator.moments(col("o_totalprice")).as("mom"),
        sum(p).cast("double").as("sx"),
        sum(p * p).cast("double").as("sxx"))
      .select(col("y"), col("m"), n.as("n_orders"),
        (col("sx") / n).as("mean_price"),
        when(n > 1, round(
          sqrt((col("sxx") - col("sx") * col("sx") / n) / (n - 1)), 3))
          .as("stddev_price"),
        col("mom.lo").as("min_price"), col("mom.hi").as("max_price"))
      .orderBy("y", "m")
  }

  /** Star-join top-k report (TPC-H Q10 shape): revenue tied up in returned
    * items per customer over one quarter, with nation context. The fact
    * side aggregates to one row per customer BEFORE touching the customer
    * dimension, so the wide join input is bounded by customer cardinality,
    * not lineitem volume; nation broadcasts. Ordering is on the EXACT
    * decimal revenue (cast to double only at the output edge) with a key
    * tie-break, so the top-k cut is reproducible cross-engine. */
  def returnedItemReport(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, nation: DataFrame,
                         from: String, until: String, k: Int = 20): DataFrame = {
    val rev = lineitem.filter(col("l_returnflag") === "R")
      .join(orders
          .filter(col("o_orderdate") >= ts(from) && col("o_orderdate") < ts(until))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .as("__rev"))
    customer.join(rev, col("c_custkey") === col("o_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .orderBy(desc("__rev"), asc("c_custkey"))
      .limit(k)
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        col("__rev").cast("double").as("revenue"))
  }

  /** Max-over-aggregated-view shape (TPC-H Q15): the supplier(s) whose
    * shipped revenue over a window is the corpus maximum. The revenue view
    * aggregates once (partial+final on l_suppkey); the scalar max is a
    * 1-row broadcast; the equality compare happens in EXACT decimal space
    * so no float ulp can drop or duplicate the winner. Supplier is a
    * broadcast dim. */
  def topSupplierRevenue(supplier: DataFrame, lineitem: DataFrame,
                         from: String, until: String): DataFrame = {
    // l_suppkey non-null is made EXPLICIT in the shared view (the join
    // would imply it on one branch only, and that asymmetry would defeat
    // ReuseExchange — the view and its max must be the SAME subtree so
    // the filtered lineitem is scanned and shuffled once, not twice;
    // pinned in ReportQueriesSpec)
    val rev = lineitem
      .filter(col("l_shipdate") >= ts(from) && col("l_shipdate") < ts(until) &&
        col("l_suppkey").isNotNull)
      .groupBy("l_suppkey")
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .as("__rev"))
    val mx = rev.agg(max(col("__rev")).as("__mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("__rev") === col("__mx"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("__rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Forecast-revenue-change shape (TPC-H Q6): a pure scan-side filter
    * (date window, discount band, quantity cap) into a single global
    * aggregate — the canonical "does the predicate reach the parquet
    * scan" query. All compares are on raw parquet doubles (identical
    * binary values in both engines); the revenue product accumulates in
    * exact decimal. */
  def discountRevenueDelta(lineitem: DataFrame, from: String, until: String,
                           discLo: Double = 0.05, discHi: Double = 0.07,
                           maxQty: Double = 24.0): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= ts(from) && col("l_shipdate") < ts(until) &&
        col("l_discount") >= discLo && col("l_discount") <= discHi &&
        col("l_quantity") < maxQty)
      .agg(count(lit(1)).as("n_items"),
        sum(money(col("l_extendedprice")) * money(col("l_discount")))
          .cast("double").as("revenue_delta"))

  /** Deterministic MODE aggregate (argmax-of-count per group): each market
    * segment's most common order priority. Orders pre-aggregate to
    * (custkey, priority) counts BEFORE the customer join — the join input
    * shrinks from order volume to customer x priority cardinality — then
    * re-aggregate per (segment, priority). The final argmax runs a window
    * over segments x priorities rows (tens), ordered (count desc, priority
    * asc) so ties break to the alphabetically-first priority — unlike the
    * built-in `mode()`, which is nondeterministic under ties in both
    * engines and therefore not oracle-comparable. */
  def modalPriorityPerSegment(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy("o_custkey", "o_orderpriority")
      .agg(count(lit(1)).as("__n"))
    val counts = perCust
      .join(customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(sum("__n").as("n"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(desc("n"), asc("o_orderpriority"))
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("c_mktsegment"), col("o_orderpriority").as("modal_priority"),
        col("n"))
      .orderBy("c_mktsegment")
  }

  /** Double-correlated EXISTS / NOT EXISTS (TPC-H Q21 shape): suppliers
    * who were the SOLE late shipper on a multi-supplier order. The two
    * correlated subqueries ("another supplier participated" / "no other
    * supplier was late") decorrelate into one pass: per-(order, supplier)
    * late flags from a single keyed aggregate, then order-level
    * participant/late-count totals as window sums over the SAME order key
    * — no join-back, no second scan. Shuffle chain: partial+final agg on
    * (orderkey, suppkey) → join on o_orderkey → window on orderkey →
    * final agg on suppkey. `late = max(l_shipdate) > o_orderdate + grace`
    * is monotone in shipdate, so lineitem pre-aggregates to one
    * (orderkey, suppkey, max_shipdate) row BEFORE the orders join
    * (map-side combine): raw lineitems never cross an exchange, and the
    * join's big side shrinks to per-(order, supplier) rows. NULL
    * l_suppkey rows are excluded up front — a null supplier is not a
    * participant and must not disqualify a real sole-late one (the
    * oracle's correlated `q.l_suppkey <> p.l_suppkey` already ignores
    * them; this pins the same semantics). */
  def soleLateSupplier(supplier: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, graceDays: Int = 90,
                       k: Int = 10): DataFrame = {
    val perOrderSupp = lineitem
      .filter(col("l_suppkey").isNotNull)
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max("l_shipdate").as("__max_ship"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("__max_ship") > col("o_orderdate") +
          expr(s"INTERVAL $graceDays DAYS"), 1).otherwise(0).as("__late"))
    val w = Window.partitionBy("l_orderkey")
    val flagged = perOrderSupp
      .withColumn("__n_supp", count(lit(1)).over(w))
      .withColumn("__n_late", sum("__late").over(w))
      .filter(col("__late") === 1 && col("__n_supp") >= 2 &&
        col("__n_late") === 1)
    flagged.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_orders"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_orders"))
      .orderBy(desc("n_orders"), asc("s_suppkey"))
      .limit(k)
  }

  /** Scalar "subquery" as a broadcast 1-row side: orders above the global
    * mean price, counted per priority. The mean is computed exactly
    * (decimal sum / count) so the boundary predicate is reproducible. */
  def aboveAveragePerPriority(orders: DataFrame): DataFrame = {
    val mean = orders.agg(
      (sum(money(col("o_totalprice"))).cast("double") / count(lit(1))).as("mean_price"))
    orders.crossJoin(broadcast(mean))
      .filter(col("o_totalprice") > col("mean_price"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_above"))
      .orderBy("o_orderpriority")
  }

  /** Bilateral trade volume (TPC-H Q7 shape): revenue shipped between two
    * named nations, in both directions, by ship year. Each nation filter
    * is applied to its dimension BEFORE the fact joins — supplier and
    * customer shrink to two nations' worth of rows and broadcast, so the
    * only exchanges the plan keeps are lineitem⋈orders on orderkey (the
    * two fact tables). The disjunctive pair predicate
    * (A→B or B→A) runs after both nation names are attached; it cannot be
    * pushed below the join but operates on already-pruned rows. */
  def nationTradeVolume(lineitem: DataFrame, orders: DataFrame,
                        customer: DataFrame, supplier: DataFrame,
                        nation: DataFrame, nationA: String,
                        nationB: String): DataFrame = {
    val pair = Seq(nationA, nationB)
    val supp = supplier
      .join(broadcast(nation.filter(col("n_name").isin(pair: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer
      .join(broadcast(nation.filter(col("n_name").isin(pair: _*))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Market-share ratio (TPC-H Q8 shape): of all revenue from one part
    * type sold to customers in one region, the fraction supplied by one
    * nation, per order year. The share is a conditional aggregate — ONE
    * pass computes numerator (CASE WHEN supp_nation = N) and denominator
    * together; the naive two-subquery spelling would scan the join twice.
    * Both sums accumulate as DECIMAL and the final division is one double
    * op on both engines (bit-equal, no rounding needed). Part is filtered
    * to one type before its join and broadcast; region restriction
    * reaches customer through a broadcast nation⋈region dim chain. */
  def marketShare(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, supplier: DataFrame, part: DataFrame,
                  nation: DataFrame, region: DataFrame, partType: String,
                  regionName: String, suppNation: String): DataFrame = {
    val parts = part.filter(col("p_type") === partType).select("p_partkey")
    val custInRegion = customer
      .join(broadcast(nation
        .join(broadcast(region.filter(col("r_name") === regionName)),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppNations = supplier
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val rev = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
    lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNations), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custInRegion, col("o_custkey") === col("c_custkey"), "leftsemi")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(sum(when(col("supp_nation") === suppNation, rev)
        .otherwise(money(lit(0)))).cast("double").as("nation_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .select(col("o_year"),
        (col("nation_revenue") / col("total_revenue")).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Aggregate-of-aggregate distribution (TPC-H Q13 shape): how many
    * customers placed exactly k non-urgent orders, including k = 0 via
    * the left outer join. Two shuffles by construction — one on custkey
    * for the per-customer count, one on the count value for the
    * histogram — and the second input is one row per customer, so the
    * distribution agg is negligible at any scale. */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame,
                             excludePriority: String): DataFrame = {
    val perCustomer = customer.select("c_custkey")
      .join(orders.filter(col("o_orderpriority") =!= excludePriority)
        .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCustomer.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** Conditional-aggregate ratio (TPC-H Q14 shape): percent of one
    * month's shipped revenue from promo-type parts. The date window is a
    * scan-side pushed filter on lineitem (only one month's rows join);
    * the promo flag resolves through the p_partkey join and the ratio is
    * numerator/denominator from a single aggregate pass. The part join
    * stays a shuffle join — at 100 TB every part may be referenced, so
    * there is no small side to broadcast (AQE may still convert it when
    * the type filter makes one). */
  def promoRevenue(lineitem: DataFrame, part: DataFrame,
                   monthStart: String, monthEnd: String): DataFrame = {
    val rev = money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
    lineitem
      .filter(col("l_shipdate") >= ts(monthStart) &&
        col("l_shipdate") < ts(monthEnd))
      .join(part.select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type").startsWith("PROMO"), rev)
        .otherwise(money(lit(0)))).cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (lit(100.0) * col("promo_revenue") / col("total_revenue"))
          .as("promo_pct"))
  }

  /** Distinct-count with NOT-IN exclusion (TPC-H Q16 shape): how many
    * distinct suppliers serve each (brand, type, size) bucket, excluding
    * a denylist (here: suppliers in deficit) and one brand. The NOT IN
    * decorrelates to a broadcast anti-join BEFORE aggregation — denied
    * suppliers never enter the distinct machinery. The part⋈lineitem
    * association shuffles on partkey; count(DISTINCT l_suppkey) then
    * plans as Spark's two-phase distinct expand, the standard way to
    * keep partial aggregation despite the distinct. */
  def supplierVariety(lineitem: DataFrame, part: DataFrame,
                      supplier: DataFrame, excludeBrand: String,
                      sizes: Seq[Int]): DataFrame = {
    val denied = supplier.filter(col("s_acctbal") < 0).select("s_suppkey")
    val parts = part
      .filter(col("p_brand") =!= excludeBrand && col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    // NULL l_suppkey: SQL's NOT IN filters it (NULL comparison) while an
    // anti-join would keep it — pin the SQL semantics on both engines
    // (same latent-null rule as soleLateSupplier)
    lineitem.select("l_partkey", "l_suppkey")
      .filter(col("l_suppkey").isNotNull)
      .join(broadcast(denied), col("l_suppkey") === col("s_suppkey"), "leftanti")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
  }

  /** Disjunctive multi-clause join predicate (TPC-H Q19 shape): revenue
    * from three OR'd (brand, size-range, quantity-range) clauses. The
    * whole disjunction references both sides, so it evaluates as the
    * join condition; Catalyst additionally pushes each side's derivable
    * disjunction down to its scan (the brand/size union prunes part, the
    * quantity union prunes lineitem) — the join only sees rows that
    * could satisfy SOME clause. One aggregate row out. */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val qty = col("l_quantity")
    val clause1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
      qty.between(1, 11)
    val clause2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
      qty.between(10, 20)
    val clause3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
      qty.between(20, 30)
    lineitem
      .join(part.select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey") && (clause1 || clause2 || clause3))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Correlated share-of-total threshold (TPC-H Q20 shape): suppliers in
    * one nation who shipped more than `sharePct` of some prefix-named
    * part's total volume. The correlated "this part's total" subquery
    * decorrelates to one (partkey, suppkey) aggregate plus a per-part
    * window total — raw lineitems cross one exchange with map-side
    * combine, and the window's re-exchange on partkey moves only the
    * already-reduced per-(part, supplier) rows. The join-back spelling
    * (the oracle's) would aggregate twice and join; same asymptotics,
    * one more scan of the reduced frame. The threshold compare is exact
    * decimal cross-multiplication (100 * supp_qty > pct * total_qty),
    * never a float division. */
  def excessShareSuppliers(lineitem: DataFrame, part: DataFrame,
                           supplier: DataFrame, nation: DataFrame,
                           nationName: String, namePrefix: String,
                           sharePct: Int): DataFrame = {
    val parts = part.filter(col("p_name").startsWith(namePrefix))
      .select("p_partkey")
    val perSupp = lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(money(col("l_quantity"))).as("__supp_qty"))
    val withTotal = perSupp.withColumn("__total_qty",
      sum(col("__supp_qty")).over(Window.partitionBy("l_partkey")))
    val natSupp = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    withTotal
      .filter(col("__supp_qty") * 100 > col("__total_qty") * sharePct)
      .select("l_suppkey").distinct()
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** Scalar-threshold anti-join report (TPC-H Q22 shape): capital parked
    * with customers who hold an above-average positive balance but have
    * placed no orders since a cutoff, grouped by market segment. Composes
    * the scalar-subquery (exact decimal mean, broadcast as a 1-row side)
    * and NOT-EXISTS (anti-join on custkey) decorrelations in one plan;
    * the anti-join's right side is pre-filtered to post-cutoff orders so
    * it carries the minimum rows through its exchange. */
  def idleCapital(customer: DataFrame, orders: DataFrame,
                  cutoff: String): DataFrame = {
    val meanPositive = customer.filter(col("c_acctbal") > 0)
      .agg((sum(money(col("c_acctbal"))).cast("double") / count(lit(1)))
        .as("__mean_bal"))
    customer.crossJoin(broadcast(meanPositive))
      .filter(col("c_acctbal") > col("__mean_bal"))
      .join(orders.filter(col("o_orderdate") >= ts(cutoff)).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "leftanti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum(money(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  /** Product-line profit by supplier nation and year (TPC-H Q9 shape,
    * adapted: this schema has no partsupp, so unit cost is the part's
    * retail price — the join topology and aggregation are Q9's). Profit =
    * revenue − cost per lineitem, summed by (nation, year). The part
    * dimension prunes on the name predicate FIRST and broadcasts with its
    * cost column; supplier⋈nation broadcasts as one dim chain; the only
    * corpus-proportional exchange is lineitem⋈orders on orderkey. Both
    * profit terms accumulate as DECIMAL in one pass (never
    * sum(rev) − sum(cost) as two scans), cast double once at the edge. */
  def productProfit(lineitem: DataFrame, orders: DataFrame,
                    supplier: DataFrame, part: DataFrame, nation: DataFrame,
                    nameToken: String): DataFrame = {
    val parts = part.filter(col("p_name").contains(nameToken))
      .select(col("p_partkey"), money(col("p_retailprice")).as("__cost"))
    val natSupp = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    lineitem
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
        - col("__cost") * money(col("l_quantity")))
        .cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Market-basket co-occurrence with LIFT — the association-mining
    * report (which parts sell together beyond chance): per-pair support
    * from a within-order self-join, lift = P(a,b) / (P(a)·P(b)) over
    * order frequencies. Pairs below `minSupport` are noise and dropped
    * BEFORE the stats joins, so the output (and the joins feeding it)
    * stay support-bounded.
    *
    * Scale notes (100 TB): the pair explosion is bounded by basket size
    * (≤ max-lines-per-order per side, squared per order — baskets are
    * small by nature), shuffled by orderkey once; per-part totals are a
    * dimension-sized frame (broadcast here; at a truly wide part
    * dimension Spark's planner may shuffle it instead — either plan
    * keeps the fact table to one pass). All counts are exact longs; the
    * single double division happens once, post-aggregation. */
  def basketLift(lineitem: DataFrame, minSupport: Long = 2): DataFrame = {
    // the basket frame feeds FOUR consumers (pair self-join x2, per-part
    // totals, the order count); without materialization each one re-scans
    // the fact table and re-pays the distinct exchange — the plan audit
    // caught 5 lineitem scans. One eager checkpoint = one scan, one
    // exchange, shared by all.
    val b = lineitem
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
      .localCheckpoint(true)
    val totals = b.groupBy("part").agg(count(lit(1)).as("cnt"))
    val n = b.agg(countDistinct("okey").as("n_orders"))
    val pairs = b.as("a")
      .join(b.as("bb"),
        col("a.okey") === col("bb.okey") && col("a.part") < col("bb.part"))
      .groupBy(col("a.part").as("part_a"), col("bb.part").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(broadcast(totals.select(col("part").as("part_a"),
        col("cnt").as("cnt_a"))), Seq("part_a"))
      .join(broadcast(totals.select(col("part").as("part_b"),
        col("cnt").as("cnt_b"))), Seq("part_b"))
      .crossJoin(broadcast(n))
      .select(col("part_a"), col("part_b"), col("support"),
        col("cnt_a"), col("cnt_b"),
        round(col("support").cast("double") * col("n_orders").cast("double") /
          (col("cnt_a").cast("double") * col("cnt_b").cast("double")), 4)
          .as("lift"))
      .orderBy("part_a", "part_b")
  }

  /** 2-D skyline (Pareto frontier, Börzsönyi'01): the parts no other part
    * dominates under minimize-(retailprice, size) — a dominates b when
    * a.price <= b.price AND a.size <= b.size with at least one strict.
    * Equal (price, size) twins dominate neither; both stay.
    *
    * NOT the O(n^2) NOT EXISTS the definition suggests (that is the
    * oracle's job): a row survives iff
    *   (1) no strictly-cheaper row has size <= mine, and
    *   (2) no same-price row has size < mine,
    * so the whole test reduces to prefix-MIN(size) over the price order.
    * The prefix min is computed distributed, never as one global sorted
    * task: rows aggregate to PRICE grain, prices roll up to coarse
    * BUCKETS (floor(price/W)); the running min across buckets is a
    * window over the bucket-count-sized frame, carried into each bucket
    * exactly like concurrencyDaily's midnight carry, and the within-
    * bucket running min partitions by bucket. Prices group as
    * DECIMAL(18,2) so equality is exact in both engines.
    *
    * Scale notes (100 TB): one price-grain aggregate (map-side combined),
    * one bucket-partitioned window, one bucket-grain window over a
    * constant-sized frame, one broadcast join back to price grain, one
    * shuffle join to rows. No self-join anywhere. */
  def skyline2d(part: DataFrame, bucketWidth: Int = 10): DataFrame = {
    val price = col("p_retailprice").cast(DecimalType(18, 2))
    val rows = part.select(col("p_partkey"), price.as("__p"),
      col("p_size").cast("long").as("__s"))
    val byPrice = rows.groupBy("__p")
      .agg(min("__s").as("__pmin"))
      .withColumn("__b", floor(col("__p") / bucketWidth).cast("long"))
    val byBucket = byPrice.groupBy("__b").agg(min("__pmin").as("__bmin"))
    // carry = min size over all strictly-cheaper BUCKETS (constant-sized
    // frame: price-domain / W rows)
    val carried = byBucket.withColumn("__carry",
      min(col("__bmin")).over(Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)))
    val wInBucket = Window.partitionBy("__b").orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val stats = byPrice
      .withColumn("__prev", min(col("__pmin")).over(wInBucket))
      .join(broadcast(carried.select(col("__b"), col("__carry"))), Seq("__b"))
      // min size over all rows with price strictly below this price
      .withColumn("__cheap", least(
        coalesce(col("__prev"), lit(Long.MaxValue)),
        coalesce(col("__carry"), lit(Long.MaxValue))))
      .select(col("__p"), col("__pmin"), col("__cheap"))
    rows.join(stats, Seq("__p"))
      .filter(col("__cheap") > col("__s") && col("__pmin") >= col("__s"))
      .select(col("p_partkey"),
        col("__p").cast("double").as("p_retailprice"),
        col("__s").as("p_size"))
      .orderBy("p_retailprice", "p_size", "p_partkey")
  }

  /** Min-cost supplier per part (the TPC-H Q2 shape on this schema —
    * lineitem stands in for partsupp as the part×supplier offer table):
    * for every part of the given type sold by a supplier in the given
    * region, the supplier(s) whose best unit price equals the REGIONAL
    * minimum for that part. The correlated scalar subquery
    * ("where cost = (select min(cost) ... where partkey = outer key)")
    * is decorrelated by hand into a min-aggregate + equi-join — the plan
    * Catalyst's own decorrelation would produce, spelled directly.
    *
    * Determinism: "cost" is min(l_extendedprice) — a MIN of stored
    * doubles is exact and order-independent, and the min-equality join
    * compares a value against itself propagated, never recomputed
    * arithmetic. Ties (several suppliers at the min) all surface, under
    * the total order (acctbal desc, supplier, part).
    *
    * Scale: offers aggregate lineitem down to (part, supplier) grain
    * map-side BEFORE any join; nation/region and part are broadcast
    * (dimension-sized); the per-part min is a second partial agg over the
    * already-reduced offer rows. The only big exchange is the one
    * (l_partkey, l_suppkey) aggregation — no join ever sees raw lineitem
    * rows. */
  def minCostSupplier(lineitem: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame, part: DataFrame,
                      regionName: String = "EUROPE",
                      partType: String = "STANDARD",
                      k: Int = 100): DataFrame = {
    val offers = lineitem.groupBy("l_partkey", "l_suppkey")
      .agg(min("l_extendedprice").as("cost"))
    val regionalSupp = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val regionalOffers = offers
      .join(broadcast(regionalSupp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(part.filter(col("p_type") === partType)
          .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
    val minPerPart = regionalOffers.groupBy(col("p_partkey").as("mk"))
      .agg(min("cost").as("min_cost"))
    regionalOffers
      .join(minPerPart, col("p_partkey") === col("mk") &&
        col("cost") === col("min_cost"))
      // s_suppkey tiebreak: (s_acctbal, s_name) is not unique, so two
      // colliding suppliers both at a part's min cost would otherwise
      // make the limit-k cut engine-dependent (total-key discipline)
      .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"),
        col("s_suppkey"))
      .limit(k)
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("cost").as("min_cost"))
  }
}
