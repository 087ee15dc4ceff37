package graft

import org.apache.spark.sql.functions._
import graft.relational.Ivm

/** Incremental view maintenance: the signed-delta merge must equal a
  * from-scratch recompute of the post-delta state — including groups
  * deleted down to zero rows (dropped) and groups with every change
  * kind at once. */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def orders = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")

  test("ivmGroupBy equals an independent full recompute on real data") {
    val o = orders
    val dec = col("o_totalprice").cast("decimal(18,2)")
    val survivors = o.filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderpriority"),
        when(col("o_orderkey") % 7 === 0,
          dec + lit("10.00").cast("decimal(18,2)")).otherwise(dec).as("p"))
      .unionByName(o.filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderpriority"),
          (dec + lit("5.00").cast("decimal(18,2)")).as("p")))
    val full = survivors.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum("p").cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
      .as[(String, Long, Double)].collect().toSeq
    val inc = Ivm.ivmGroupBy(o).as[(String, Long, Double)].collect().toSeq
    assert(inc == full)
    // the fixture must actually exercise all three change kinds
    assert(Ivm.syntheticDelta(o).groupBy("dn").count().count() == 3)
  }

  test("a group deleted to zero rows drops out of the maintained view") {
    // both rows of priority 'GONE' have keys % 11 == 0 -> deleted;
    // 'STAYS' keeps one row (77 is deleted: 77 % 11 == 0)
    val o = Seq(
      (11L, "GONE", "100.00"),
      (22L, "GONE", "200.00"),
      (77L, "STAYS", "300.00"),
      (3L, "STAYS", "400.00"),
    ).toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val got = Ivm.ivmGroupBy(o).as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("STAYS", 1L, 400.0)))
  }

  test("update and insert arithmetic is decimal-exact") {
    val o = Seq(
      (7L, "P", "10.01"),   // updated: 20.01
      (13L, "P", "0.99"),   // kept 0.99 AND inserted copy at 5.99
      (1L, "P", "1.00"),    // untouched
    ).toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val got = Ivm.ivmGroupBy(o).as[(String, Long, Double)].collect().toSeq
    // 20.01 + 0.99 + 1.00 + 5.99, summed exactly in DECIMAL before the
    // one double cast (a double-literal sum could differ in the last ulp)
    assert(got == Seq(("P", 4L, 27.99)))
  }
}
