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

  test("asOfJoinForward picks the earliest right row at-or-after each left time") {
    val failures = Seq(
      (1L, ts("2024-01-01 10:00:05"), "f1"), // next repair at :06
      (1L, ts("2024-01-01 10:00:10"), "f2"), // tie: repair at exactly :10
      (1L, ts("2024-01-01 10:00:20"), "f3"), // after every repair
      (2L, ts("2024-01-01 10:00:00"), "f4"),
    ).toDF("k", "ftime", "failure")
    val repairs = Seq(
      (1L, ts("2024-01-01 10:00:06"), 6.0),
      (1L, ts("2024-01-01 10:00:10"), 10.0),
      (1L, ts("2024-01-01 10:00:03"), 3.0), // earlier: never matches forward
      (2L, ts("2024-01-01 10:00:09"), 9.0),
    ).toDF("k", "rtime", "cost")
    val res = TemporalJoins.asOfJoinForward(failures, repairs, "k",
        "ftime", "rtime", "cost", "next_cost")
      .select("failure", "next_cost")
      .as[(String, Option[Double])].collect().toMap
    assert(res("f1").contains(6.0))
    assert(res("f2").contains(10.0)) // >= includes the equal-time row
    assert(res("f3").isEmpty)        // nothing later
    assert(res("f4").contains(9.0))
    // duplicate (key, time) right rows: the smallest value wins (pinned)
    val dupRepairs = repairs.unionByName(
      Seq((1L, ts("2024-01-01 10:00:06"), 5.0)).toDF("k", "rtime", "cost"))
    val dup = TemporalJoins.asOfJoinForward(failures, dupRepairs, "k",
        "ftime", "rtime", "cost", "next_cost")
      .select("failure", "next_cost")
      .as[(String, Option[Double])].collect().toMap
    assert(dup("f1").contains(5.0))
  }

  test("forward exec matches the forward composition, incl. ties and dups") {
    val failures = Seq(
      (1L, ts("2024-01-01 10:00:05"), "f1"),
      (1L, ts("2024-01-01 10:00:10"), "f2"),
      (1L, ts("2024-01-01 10:00:20"), "f3"),
      (2L, ts("2024-01-01 10:00:00"), "f4"),
    ).toDF("k", "ftime", "failure")
    val repairs = Seq(
      (1L, ts("2024-01-01 10:00:06"), 6.0),
      (1L, ts("2024-01-01 10:00:06"), 5.0), // duplicate time: smallest wins
      (1L, ts("2024-01-01 10:00:10"), 10.0),
      (2L, ts("2024-01-01 10:00:09"), 9.0),
    ).toDF("k", "rtime", "cost")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("failure", "next_cost")
        .as[(String, Option[Double])].collect().toMap
    val comp = collect(TemporalJoins.asOfJoinForward(failures, repairs, "k",
      "ftime", "rtime", "cost", "next_cost"))
    val exec = collect(TemporalJoins.asOfJoinExecForward(failures, repairs, "k",
      "ftime", "rtime", "cost", "next_cost"))
    assert(exec == comp)
    assert(exec("f1").contains(5.0) && exec("f2").contains(10.0) &&
      exec("f3").isEmpty && exec("f4").contains(9.0))
  }

  test("forward exec equals the forward composition on the real events corpus") {
    val ev = table(spark, "/root/testdata/sf0.001", "events")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"value")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("event_id", "nxt").as[(Long, Option[Double])].collect().toMap
    val comp = run(TemporalJoins.asOfJoinForward(signups, purchases,
      "user_id", "ts", "pts", "value", "nxt"))
    val exec = run(TemporalJoins.asOfJoinExecForward(signups, purchases,
      "user_id", "ts", "pts", "value", "nxt"))
    assert(comp.nonEmpty && exec == comp)
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

  test("bandedRangeJoin matches naive join at tolerance-straddling boundaries") {
    // Property check (fixed-seed generator): random timestamps plus planted
    // pairs exactly AT, one microsecond INSIDE, and one microsecond OUTSIDE
    // the tolerance — the off-by-one-band / off-by-one-us failure modes a
    // uniform generator almost never hits. UTC session TZ, so no DST folds.
    val tol = 300L // seconds
    val tolUs = tol * 1000000L
    val rnd = new scala.util.Random(42)
    val base = ts("2024-06-01 00:00:00").getTime * 1000L // epoch micros
    val random = (1 to 400).map { i =>
      (rnd.nextInt(5).toLong, i.toLong, base + rnd.nextLong(3 * tolUs))
    }
    val planted = Seq.tabulate(20) { j =>
      // anchor + partner at exactly +/-(tolUs + {-1,0,+1})
      val anchor = base + j * 7 * tolUs
      val delta = (j % 3 - 1) + (if (j % 2 == 0) tolUs else -tolUs)
      Seq((9L, 1000L + 2 * j, anchor), (9L, 1001L + 2 * j, anchor + delta))
    }.flatten
    // build timestamps from epoch MICROS so the +/-1us planted deltas
    // survive (java.sql.Timestamp construction would truncate to millis)
    val df = (random ++ planted).toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val a = df.select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"))
    val b = df.select(col("user_id"), col("event_id").as("id_b"), col("ts").as("ts_b"))
    val banded = TemporalJoins.bandedRangeJoin(a, b, "user_id", "ts_a", "ts_b", tol)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val naive = a.join(b, Seq("user_id"))
      .filter(col("id_a") < col("id_b") &&
        abs(unix_micros(col("ts_a")) - unix_micros(col("ts_b"))) <= tolUs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == naive)
    // the exactly-at-tolerance planted pairs are present (<= is inclusive)
    assert(banded.exists { case (x, y) => x >= 1000L && y >= 1000L })
  }

  test("helper-column collisions fail loudly instead of corrupting data") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "keep"))
      .toDF("k", "t", "__v")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), 1.0))
      .toDF("k", "rt", "price")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(l, r, "k", "t", "rt", "price")
    }
    assert(e.getMessage.contains("__v"))
    val l2 = Seq((1L, ts("2024-01-01 10:00:00"), 5L)).toDF("k", "t", "__band")
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.bandedRangeJoin(l2, r, "k", "t", "rt", 60)
    }
    assert(e2.getMessage.contains("__band"))
  }

  test("bandedRangeJoin produces no duplicate pairs") {
    val ev = table(spark, "/root/testdata/sf0.001", "events")
    val a = ev.select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"), col("ts").as("ts_b"))
    val joined = TemporalJoins.bandedRangeJoin(a, b, "user_id", "ts_a", "ts_b", 300)
      .select("id_a", "id_b")
    assert(joined.count() == joined.distinct().count())
  }

  test("AsOfJoinExec: hand-checked matches incl. ties, no-match, null key/time") {
    val trades = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:05")), "t1"),
      (Some(1L), Some(ts("2024-01-01 10:00:10")), "t2"), // tie with quote -> matches
      (Some(1L), Some(ts("2024-01-01 09:59:00")), "t0"), // before any quote
      (Some(2L), Some(ts("2024-01-01 10:00:07")), "t3"),
      (Some(3L), Some(ts("2024-01-01 10:00:07")), "t4"), // key with no quotes
      (None, Some(ts("2024-01-01 10:00:07")), "t5"),     // null key never matches
      (Some(1L), None, "t6"),                            // null time never matches
    ).toDF("k", "ttime", "trade")
    val quotes = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 100.0),
      (Some(1L), Some(ts("2024-01-01 10:00:10")), 101.0),
      (Some(1L), Some(ts("2024-01-01 10:00:10")), 99.0), // same-instant dup: greatest wins
      (Some(2L), Some(ts("2024-01-01 10:00:06")), 55.0),
      (None, Some(ts("2024-01-01 10:00:01")), 1.0),      // null-key quote matches nothing
      (Some(2L), None, 2.0),                             // null-time quote matches nothing
    ).toDF("k", "qtime", "price")
    val res = TemporalJoins.asOfJoinExec(trades, quotes, "k", "ttime", "qtime",
        "price", "asof_price")
      .select("trade", "asof_price")
      .as[(String, Option[Double])].collect().toMap
    assert(res("t0").isEmpty && res("t4").isEmpty && res("t5").isEmpty && res("t6").isEmpty)
    assert(res("t1").contains(100.0))
    assert(res("t2").contains(101.0)) // <= tie matched; greatest of the dup pair
    assert(res("t3").contains(55.0))
  }

  test("null-time right rows match nothing in BOTH forms (SQL ASOF)") {
    // pre-fix, the composition sorted null __t to the partition head and
    // leaked its value into every frame — pinned here against regression
    val l = Seq((1L, Some(ts("2024-01-01 09:00:00")), "a"),
      (1L, Option.empty[Timestamp], "b")).toDF("k", "lt", "tag")
    val r = Seq((1L, Option.empty[Timestamp], 7.0),
      (1L, Some(ts("2024-01-01 10:00:00")), 55.0)).toDF("k", "rt", "price")
    for (form <- Seq(
        TemporalJoins.asOfJoin(l, r, "k", "lt", "rt", "price"),
        TemporalJoins.asOfJoinExec(l, r, "k", "lt", "rt", "price"))) {
      val res = form.select("tag", "asof_value")
        .as[(String, Option[Double])].collect().toMap
      assert(res("a").isEmpty, "null-time right row must never match")
      assert(res("b").isEmpty, "null-time left row must match nothing")
    }
  }

  test("matched-null-value divergence is exactly as documented") {
    // the one point where the forms differ: exec reports the matched
    // row's null; the composition's ignoreNulls window (needed for left
    // marker transparency) carries the previous non-null value forward
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "lt", "tag")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), Some(100.0)),
      (1L, ts("2024-01-01 09:30:00"), Option.empty[Double])).toDF("k", "rt", "price")
    val exec = TemporalJoins.asOfJoinExec(l, r, "k", "lt", "rt", "price")
      .select("asof_value").as[Option[Double]].head()
    val composed = TemporalJoins.asOfJoin(l, r, "k", "lt", "rt", "price")
      .select("asof_value").as[Option[Double]].head()
    assert(exec.isEmpty)             // exact: the 09:30 row matched, value null
    assert(composed.contains(100.0)) // documented composition limitation
  }

  test("asOfJoinExec validates types and resolves names like Spark") {
    val l = Seq((1, ts("2024-01-01 10:00:00"))).toDF("k", "lt") // Int key
    val r = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "rt", "v") // Long key
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoinExec(l, r, "k", "lt", "rt", "v")
    }
    assert(e.getMessage.contains("key types differ"))
    // case-insensitive resolution under the default conf
    val ok = TemporalJoins.asOfJoinExec(
      Seq((1L, ts("2024-01-01 10:00:00"))).toDF("K", "LT"),
      Seq((1L, ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "rt", "v"),
      "k", "lt", "rt", "v")
    assert(ok.select("asof_value").as[Option[Double]].head().contains(5.0))
  }

  test("AsOfJoinExec equals the composition form on the real events corpus") {
    val ev = table(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts").as("ptime"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("stime"), col("value"))
    val composed = TemporalJoins.asOfJoin(purchases, signups, "user_id",
        "ptime", "stime", "value", "signup_value")
      .select("event_id", "signup_value")
      .as[(Long, Option[Double])].collect().toMap
    val exec = TemporalJoins.asOfJoinExec(purchases, signups, "user_id",
        "ptime", "stime", "value", "signup_value")
      .select("event_id", "signup_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(exec == composed)
    assert(exec.values.exists(_.nonEmpty))
    // layout invariance: same result from a different input partitioning
    val exec13 = TemporalJoins.asOfJoinExec(purchases.repartition(13),
        signups.repartition(7), "user_id", "ptime", "stime", "value", "signup_value")
      .select("event_id", "signup_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(exec13 == composed)
  }

  test("AsOfJoinExec plans as the custom operator: merge, not window/union") {
    val ev = table(spark, "/root/testdata/sf0.001", "events")
    val l = ev.select(col("user_id"), col("ts").as("lt"))
    val r = ev.select(col("user_id"), col("ts").as("rt"), col("value"))
    val df = TemporalJoins.asOfJoinExec(l, r, "user_id", "lt", "rt", "value")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(500)) // nodeName strips "Exec"
    assert(!plan.contains("Window"), "exec form must not fall back to the window composition")
    assert(!plan.contains("Union"))
    // one hash exchange per side, per the SMJ-style distribution contract
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }
}
