package graft

import graft.functions.MomentsAggregator
import org.apache.spark.sql.functions._

/** MomentsAggregator (Welford reduce + Chan merge): parity with Spark's
  * built-in moments, merge-order invariance across partition layouts, and
  * the numerical-stability case that kills the naive sum/sum-of-squares
  * spelling (stddev << mean). */
class StatsAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def relErr(a: Double, b: Double): Double =
    if (a == b) 0.0 else math.abs(a - b) / math.max(math.abs(a), math.abs(b))

  test("moments match Spark's built-in avg/stddev_samp/min/max per group") {
    val df = (1 to 500).map { i =>
      (i % 7, math.sin(i) * 100.0 + i * 0.25)
    }.toDF("g", "x")
    val ours = df.groupBy("g").agg(MomentsAggregator.moments(col("x")).as("m"))
      .select(col("g"), col("m.n"), col("m.mean"), col("m.stddev"),
        col("m.lo"), col("m.hi"))
      .as[(Int, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val ref = df.groupBy("g").agg(count(lit(1)), avg("x"), stddev_samp("x"),
        min("x"), max("x"))
      .as[(Int, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(ours.keySet == ref.keySet)
    ours.keySet.foreach { g =>
      val (_, n, mean, sd, lo, hi) = ours(g)
      val (_, rn, rmean, rsd, rlo, rhi) = ref(g)
      assert(n == rn)
      assert(relErr(mean, rmean) < 1e-12, s"mean g=$g")
      assert(relErr(sd, rsd) < 1e-9, s"stddev g=$g")
      assert(lo == rlo && hi == rhi)
    }
  }

  test("merge order does not matter: 1 partition == 8 partitions") {
    val base = (1 to 1000).map(i => math.cos(i) * 10 + 5.0).toDF("x")
    def run(parts: Int) =
      base.repartition(parts).agg(MomentsAggregator.moments(col("x")).as("m"))
        .select(col("m.n"), col("m.mean"), col("m.stddev"), col("m.lo"), col("m.hi"))
        .as[(Long, Double, Double, Double, Double)].head()
    val (n1, mean1, sd1, lo1, hi1) = run(1)
    val (n8, mean8, sd8, lo8, hi8) = run(8)
    assert(n1 == 1000L && n8 == 1000L)
    assert(relErr(mean1, mean8) < 1e-12)
    assert(relErr(sd1, sd8) < 1e-10)
    assert(lo1 == lo8 && hi1 == hi8)
  }

  test("numerically stable where naive sum-of-squares loses all digits") {
    // x_i = 1e9 + i, i in 0..999: true stddev_samp = stddev of 0..999.
    // The naive sumSq - sum^2/n spelling subtracts ~1e21-magnitude terms
    // (double has ~1e5 absolute error there) to recover a ~8.3e7 result —
    // garbage. Welford/Chan keep full precision.
    val n = 1000
    val xs = (0 until n).map(i => 1e9 + i)
    val mean = (n - 1) / 2.0
    val trueSd = math.sqrt((0 until n).map(i => (i - mean) * (i - mean)).sum / (n - 1))
    val got = xs.toDF("x").repartition(8)
      .agg(MomentsAggregator.moments(col("x")).as("m"))
      .select(col("m.mean"), col("m.stddev")).as[(Double, Double)].head()
    assert(relErr(got._1, 1e9 + mean) < 1e-12)
    assert(relErr(got._2, trueSd) < 1e-9, s"stddev ${got._2} vs $trueSd")
  }

  test("NULL inputs are skipped like the built-ins, never counted as 0.0") {
    val df = Seq((1, Some(10.0)), (1, None), (1, Some(30.0)),
      (2, None), (2, None)).toDF("g", "x")
    val rows = df.groupBy("g")
      .agg(MomentsAggregator.moments(col("x")).as("m"))
      .select(col("g"), col("m.n"), col("m.mean"), col("m.lo"), col("m.hi"))
      .as[(Int, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(rows(1) == ((1, 2L, Some(20.0), Some(10.0), Some(30.0))))
    assert(rows(2) == ((2, 0L, None, None, None))) // all-NULL: like avg/min/max
  }

  test("single-value groups yield NULL stddev, matching stddev_samp") {
    val one = Seq(42.0).toDF("x")
      .agg(MomentsAggregator.moments(col("x")).as("m"))
      .select(col("m.n"), col("m.mean"), col("m.stddev"), col("m.lo"), col("m.hi"))
      .as[(Long, Double, Option[Double], Double, Double)].head()
    assert(one == ((1L, 42.0, None, 42.0, 42.0)))
  }
}
