package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{JaroWinklerExpr, StringDistanceFunctions}
import graft.relational.EntityResolution

/** The JW kernel is pinned to DuckDB's jaro_winkler_similarity — every
  * constant below was produced by DuckDB itself, so a drift in window,
  * transposition flooring, boost threshold, or prefix cap fails here
  * before it fails the oracle. */
class StringDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerExpr.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches DuckDB on the canonical pairs") {
    val pinned = Seq(
      ("martha", "marhta", 0.9611111111111111),   // 1 transposition + boost
      ("dixon", "dicksonx", 0.8133333333333332),  // prefix 2 boost
      ("CRATE", "TRACE", 0.7333333333333334),     // jaro > 0.7 but prefix 0
      ("abcd", "badc", 0.8333333333333334),       // 2 transpositions
      ("aaaa", "aaaaaaaaaaaa", 0.8666666666666667), // prefix capped at 4
      ("xy", "xyz", 0.9111111111111111),          // window 0, len mismatch
      ("abcvwxyz", "abdefghi", 0.5),              // jaro <= 0.7: NO boost
      // the rapidfuzz floor: 5 out-of-order matched chars -> t = 2, not 2.5
      ("cold od Brand#17 MEDIUM", "cold rod Brand#17 MEDIUM",
        0.9742753623188406))
    for ((a, b, want) <- pinned) {
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b)")
      assert(jw(a, b) == jw(b, a), s"symmetry($a, $b)")
    }
  }

  test("degenerate inputs: empties, equal, disjoint, zero window") {
    assert(jw("", "") == 1.0)
    assert(jw("", "abc") == 0.0 && jw("abc", "") == 0.0)
    assert(jw("a", "a") == 1.0 && jw("a", "b") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: same-position matches only
    assert(jw("same string", "same string") == 1.0)
  }

  test("the registered expression scores columns inside codegen") {
    val df = Seq(("martha", "marhta"), ("ab", "ba"), ("", ""))
      .toDF("a", "b")
    StringDistanceFunctions.ensureRegistered(spark)
    val got = df.select(
        StringDistanceFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
      .as[Double].collect().toSeq
    assert(got == Seq(jw("martha", "marhta"), 0.0, 1.0))
    // null propagates, never throws
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(StringDistanceFunctions.jaroWinkler(col("a"), col("b")))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("fuzzyLink resolves most dirty records to their own partkey") {
    val part = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
    val out = EntityResolution.fuzzyLink(part)
      .select("dirty_id", "matched_partkey", "jw", "exact_self")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(out.nonEmpty)
    // every score survived the declared threshold
    assert(out.forall(_._3 >= 0.85))
    // identical catalog titles make exact_self < 100% legitimate, but a
    // single-char drop must keep the majority resolvable to themselves
    // OR to an identical-title twin with a smaller key
    assert(out.count(_._4) * 2 > out.size)
    // deterministic under re-execution and layout change
    val again = EntityResolution.fuzzyLink(part.repartition(7))
      .select("dirty_id", "matched_partkey", "jw", "exact_self")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(again == out)
  }
}
