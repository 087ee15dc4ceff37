package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.relational.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at-or-before each left time") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2"),
      (1L, ts("2024-01-01 09:59:00"), "t0"), // before any quote
      (2L, ts("2024-01-01 10:00:07"), "t3"),
    ).toDF("k", "ttime", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 101.0), // tie with t2 -> matches (<=)
      (2L, ts("2024-01-01 10:00:06"), 55.0),
    ).toDF("k", "qtime", "price")
    val res = TemporalJoins.asOfJoin(trades, quotes, "k", "ttime", "qtime",
        "price", "asof_price")
      .select("trade", "asof_price")
      .as[(String, Option[Double])].collect().toMap
    assert(res("t0").isEmpty)
    assert(res("t1").contains(100.0))
    assert(res("t2").contains(101.0))
    assert(res("t3").contains(55.0))
  }

  test("bandedRangeJoin equals the naive inequality join") {
    val ev = table(spark, "/root/testdata/sf0.001", "events")
    val a = ev.select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"), col("ts").as("ts_b"))
    val banded = TemporalJoins.bandedRangeJoin(a, b, "user_id", "ts_a", "ts_b", 300)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val naive = a.join(b, Seq("user_id"))
      .filter(col("id_a") < col("id_b") &&
        abs(unix_micros(col("ts_a")) - unix_micros(col("ts_b"))) <= 300L * 1000000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == naive)
    assert(banded.nonEmpty)
  }

  test("bandedRangeJoin produces no duplicate pairs") {
    val ev = table(spark, "/root/testdata/sf0.001", "events")
    val a = ev.select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"), col("ts").as("ts_b"))
    val joined = TemporalJoins.bandedRangeJoin(a, b, "user_id", "ts_a", "ts_b", 300)
      .select("id_a", "id_b")
    assert(joined.count() == joined.distinct().count())
  }
}
