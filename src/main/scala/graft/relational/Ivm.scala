package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance over a GROUP BY aggregate view — the
  * signed-delta algebra (view deltas as +1/-1 multiplicity changes,
  * folded into the stored aggregates) that materialized-view engines
  * apply instead of recomputing the view from the base table.
  *
  * The maintained view here is
  *   SELECT o_orderpriority, count(*), sum(o_totalprice) FROM orders
  * and the delta batch is fabricated deterministically from the base
  * table's own keys (no RNG, both engines can replay it):
  *   - DELETE  every order with o_orderkey % 11 == 0
  *   - UPDATE  the remaining o_orderkey % 7 == 0 rows: price + 10.00
  *   - INSERT  a copy of every o_orderkey % 13 == 0 row under key
  *             + 1_000_000_000 at price + 5.00
  * Updates net to (dn = 0, dsum = +10.00) per row; all arithmetic is
  * DECIMAL(18,2)-exact, so the incremental result is bit-identical to a
  * full recompute — which is exactly what the oracle checks: the DuckDB
  * side recomputes the post-delta view from scratch, so any drift in the
  * delta algebra (a lost sign, a double-counted group) fails the hash.
  *
  * Scale notes (100 TB): the whole point of IVM — the base table is
  * scanned ONCE to seed the view (in production: never again); each
  * maintenance round aggregates ONLY the delta batch to group grain and
  * merges it into the view with a broadcast full-outer join (group
  * cardinality, not row cardinality). A group whose count reaches zero
  * is dropped, matching the recompute exactly. */
object Ivm {

  private def money(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 2))

  /** The deterministic signed delta batch: one row per changed tuple,
    * (group, dn, dsum) with dn in {-1, 0, +1}. */
  def syntheticDelta(orders: DataFrame): DataFrame = {
    val price = money(col("o_totalprice"))
    val del = orders.filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderpriority"), lit(-1L).as("dn"),
        (-price).as("dsum"))
    val upd = orders
      .filter(col("o_orderkey") % 11 =!= 0 && col("o_orderkey") % 7 === 0)
      .select(col("o_orderpriority"), lit(0L).as("dn"),
        money(lit("10.00")).as("dsum"))
    val ins = orders.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderpriority"), lit(1L).as("dn"),
        (price + money(lit("5.00"))).as("dsum"))
    del.unionByName(upd).unionByName(ins)
  }

  /** Merge a signed delta batch into a stored (group, n, sum) view:
    * delta aggregated to group grain, broadcast, full-outer merged so
    * deltas may create groups the view has never seen; zero-count groups
    * drop out. */
  def ivmMerge(view: DataFrame, delta: DataFrame): DataFrame = {
    val d = delta.groupBy("o_orderpriority")
      .agg(sum("dn").as("__dn"), sum("dsum").as("__ds"))
    view.join(broadcast(d), Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        (coalesce(col("n_orders"), lit(0L)) +
          coalesce(col("__dn"), lit(0L))).as("n_orders"),
        (coalesce(col("__sum"), money(lit("0"))) +
          coalesce(col("__ds"), money(lit("0")))).as("__sum"))
      .filter(col("n_orders") > 0)
  }

  /** The composed query: seed the view from the base table, apply the
    * synthetic delta incrementally, emit the maintained view. The oracle
    * recomputes the same final state from scratch. */
  def ivmGroupBy(orders: DataFrame): DataFrame = {
    val view = orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).as("__sum"))
    ivmMerge(view, syntheticDelta(orders))
      .select(col("o_orderpriority"), col("n_orders"),
        col("__sum").cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }
}
