package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Streaming-moments buffer: Welford running (n, mean, M2) plus exact
  * min/max. One pass, O(1) state — the UDAF shape for any "profile this
  * column at 100 TB" statistic. */
case class MomentState(n: Long, mean: Double, m2: Double,
                       lo: Double, hi: Double)

/** Finished moments: sample stddev derived from M2 — None (SQL NULL) when
  * n < 2, matching `stddev_samp` so oracle comparisons don't diverge on
  * single-row groups; mean/lo/hi None when every input was NULL, matching
  * avg/min/max. */
case class MomentResult(n: Long, mean: Option[Double], stddev: Option[Double],
                        lo: Option[Double], hi: Option[Double])

/** Typed `Aggregator[IN, BUF, OUT]` (SURVEY §2.3: the UDAF ground the
  * reference never enters) computing numerically stable moments.
  *
  * reduce = Welford's update; merge = Chan's parallel combination — the
  * pair that makes the aggregate partial+final safe: executors fold their
  * partitions independently and the shuffle merges O(partitions) buffers,
  * with none of the catastrophic cancellation of the naive
  * sum/sum-of-squares spelling (whose `sumSq - sum²/n` loses all
  * significant digits when stddev << mean — exactly the o_totalprice
  * regime). Registered as an untyped UDAF via functions.udaf so plain
  * DataFrame plans can call it; StatsAggregatorSpec pins merge-order
  * invariance (1 vs many partitions) and parity with Spark's built-ins.
  */
object MomentsAggregator extends Aggregator[Option[Double], MomentState, MomentResult] {

  override def zero: MomentState =
    MomentState(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)

  // input is Option so SQL NULLs are SKIPPED like every built-in aggregate
  // (a bare Double input encoder silently decodes NULL as 0.0, inflating n
  // and dragging mean/lo toward zero on nullable columns)
  override def reduce(s: MomentState, in: Option[Double]): MomentState = in match {
    case None => s
    case Some(x) =>
      val n = s.n + 1
      val delta = x - s.mean
      val mean = s.mean + delta / n
      MomentState(n, mean, s.m2 + delta * (x - mean),
        math.min(s.lo, x), math.max(s.hi, x))
  }

  override def merge(a: MomentState, b: MomentState): MomentState =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      MomentState(n,
        a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n,
        math.min(a.lo, b.lo), math.max(a.hi, b.hi))
    }

  override def finish(s: MomentState): MomentResult =
    MomentResult(s.n,
      if (s.n > 0) Some(s.mean) else None,
      if (s.n > 1) Some(math.sqrt(s.m2 / (s.n - 1))) else None,
      if (s.n > 0) Some(s.lo) else None,
      if (s.n > 0) Some(s.hi) else None)

  override def bufferEncoder: Encoder[MomentState] = Encoders.product[MomentState]
  override def outputEncoder: Encoder[MomentResult] = Encoders.product[MomentResult]

  /** The aggregator as an untyped column function. */
  def moments(c: Column): Column = udaf(MomentsAggregator).apply(c)
}
