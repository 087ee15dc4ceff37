package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequency summary: at most `capacity` (key, counter)
  * entries whose counters undercount true frequencies by at most
  * N/(capacity+1) — so every key whose true frequency EXCEEDS
  * N/(capacity+1) is guaranteed present in the summary, under any
  * partitioning and any merge order (Misra/Gries '82; the merge bound is
  * Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * This is the sub-linear heavy-hitters shape for 100 TB: exact
  * `groupBy(key)` shuffles the FULL key domain (every distinct URL /
  * n-gram / user id), while the MG summary reduces each partition to
  * ≤ capacity rows before the exchange and merges associatively —
  * partial aggregation the planner applies map-side, shuffle volume
  * O(partitions × capacity) regardless of domain size. The summary alone
  * is approximate; `Sketches.heavyHitterTerms` composes it with an exact
  * second-pass count over only the surviving candidates (bound-then-
  * verify, the WAND standing), making the declared result EXACT.
  */
case class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, "MisraGries capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  // classic MG step: hit increments; a miss with room inserts; a miss at
  // capacity decrements EVERY counter (dropping zeros) — the step that
  // charges the miss against capacity+1 distinct keys at once, which is
  // where the N/(capacity+1) undercount bound comes from
  override def reduce(s: Map[String, Long], key: String): Map[String, Long] =
    if (key == null) s
    else s.get(key) match {
      case Some(n) => s.updated(key, n + 1L)
      case None if s.size < capacity => s.updated(key, 1L)
      case None =>
        s.iterator.collect { case (k, n) if n > 1L => (k, n - 1L) }.toMap
    }

  // mergeable-summaries combine: sum counters per key, then if the union
  // exceeds capacity subtract the (capacity+1)-th largest counter from
  // all and drop the non-positive — each input's undercount bounds add,
  // keeping the TOTAL undercount ≤ N/(capacity+1) for the merged stream
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined =
      if (a.size >= b.size) b.foldLeft(a) { case (m, (k, n)) =>
        m.updated(k, m.getOrElse(k, 0L) + n)
      }
      else merge(b, a)
    if (combined.size <= capacity) combined
    else {
      val cut = combined.valuesIterator.toArray.sortInPlace()(
        Ordering[Long].reverse).apply(capacity)
      combined.iterator.collect { case (k, n) if n > cut => (k, n - cut) }.toMap
    }
  }

  override def finish(s: Map[String, Long]): Map[String, Long] = s

  // a MapType buffer, not kryo bytes: the summary shuffles as a plain
  // Catalyst map, so the exchange payload is inspectable and bounded by
  // capacity rows per partial
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
}

object MisraGries {
  /** The summary as an untyped column aggregate over a string key. */
  def summary(capacity: Int)(c: Column): Column =
    udaf(MisraGries(capacity), Encoders.STRING).apply(c)
}
