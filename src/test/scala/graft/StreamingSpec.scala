package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streaming

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming tumbling window aggregates arriving micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = Streaming.tumblingHourly(
      input.toDF().toDF("ts", "event_type", "value"))
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:55:00"), "click", 2.0),
        (ts("2024-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:30:00"), "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows == Set(
        (ts("2024-01-01 10:00:00"), "click", 3L, 7.0),
        (ts("2024-01-01 11:00:00"), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming session windows merge events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val sessions = Streaming.sessionWindows(
      input.toDF().toDF("ts", "user_id"), gap = "30 minutes")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:10:00"), 1L), // same session
        (ts("2024-01-01 12:00:00"), 1L), // gap > 30min => new session
        (ts("2024-01-01 10:00:00"), 2L))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .as[(Timestamp, Timestamp, Long, Long)].collect()
      assert(rows.count(_._3 == 1L) == 2)
      assert(rows.count(_._3 == 2L) == 1)
      val first = rows.filter(_._3 == 1L).minBy(_._1.getTime)
      assert(first._4 == 2L) // two events merged into the first session
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val counts = Streaming.runningUserCounts(input.toDS())
    val q = counts.writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1L, 100L), (1L, 200L), (2L, 50L))
      q.processAllAvailable()
      input.addData((1L, 300L))
      q.processAllAvailable()
      val latest = spark.table("running").as[Streaming.UserRunning]
        .collect().groupBy(_.userId).view.mapValues(_.maxBy(_.nEvents)).toMap
      assert(latest(1L).nEvents == 3L && latest(1L).lastSeenUs == 300L)
      assert(latest(2L).nEvents == 1L && latest(2L).lastSeenUs == 50L)
    } finally q.stop()
  }

  test("transformWithState rate limiter: lifetime quota per user, " +
    "rejections observable, state carried across batches") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long)]
    val q = Streaming.rateLimitPerUser(input.toDS(), limit = 3)
      .writeStream.format("memory").queryName("ratelimit")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1L, 10L), (1L, 11L), (2L, 20L))
      q.processAllAvailable()
      input.addData((1L, 12L), (1L, 13L), (1L, 14L), (2L, 21L))
      q.processAllAvailable()
      val rows = spark.table("ratelimit").as[Streaming.Admission].collect()
      // every input event got exactly one verdict
      assert(rows.length == 7)
      assert(rows.map(_.eventId).sorted.toSeq ==
        Seq(10L, 11L, 12L, 13L, 14L, 20L, 21L))
      val byUser = rows.groupBy(_.userId)
      // user 1 sent 5, quota 3: exactly 3 admitted, 2 rejected — the
      // quota must span BOTH batches (2 admitted in batch 1, 1 in batch 2)
      assert(byUser(1L).count(_.admitted) == 3)
      assert(byUser(1L).count(!_.admitted) == 2)
      assert(byUser(1L).filter(_.admitted).map(_.nAdmitted).sorted.toSeq ==
        Seq(1L, 2L, 3L))
      // rejected events report the saturated count, unchanged
      assert(byUser(1L).filter(!_.admitted).forall(_.nAdmitted == 3L))
      // user 2 stayed under quota
      assert(byUser(2L).forall(_.admitted) && byUser(2L).length == 2)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming sliding windows double-count each event across overlaps") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = Streaming.slidingHourly(input.toDF().toDF("ts", "value"))
    val q = agg.writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((ts("2024-01-01 10:40:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("sliding")
        .as[(Timestamp, Long)].collect().toSet
      // one event at 10:40 lands in windows starting 10:00 and 10:30
      assert(rows == Set(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:30:00"), 1L)))
    } finally q.stop()
  }

  test("streaming query writes append-mode results to a parquet file sink") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val input = MemoryStream[(Timestamp, String)]
    val dedup = Streaming.streamingExactDedup(
      input.toDF().toDF("ts", "content_hash"))
    val q = dedup.writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "aaa"),
        (ts("2024-01-01 10:01:00"), "aaa"),
        (ts("2024-01-01 10:02:00"), "bbb"))
      q.processAllAvailable()
      val back = spark.read.parquet(s"$out/data")
        .select("content_hash").as[String].collect().sorted.toSeq
      assert(back == Seq("aaa", "bbb"))
    } finally q.stop()
  }

  test("flatMapGroupsWithState flushes sessions only after the gap timeout") {
    implicit val sqlCtx = spark.sqlContext
    def us(s: String): Long = ts(s).getTime * 1000L
    val input = MemoryStream[(Long, Long)]
    val closed = Streaming.sessionCloser(input.toDS(), gapMinutes = 30)
    val q = closed.writeStream.format("memory").queryName("closer")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, us("2024-01-01 10:00:00")),
        (1L, us("2024-01-01 10:05:00")),
        (2L, us("2024-01-01 10:06:00")))
      q.processAllAvailable()
      // nothing closed yet: watermark hasn't passed anyone's gap
      assert(spark.table("closer").count() == 0)
      // user 2 reappears 114 min later: the EVENT-time gap closes their
      // first session immediately (replay semantics), and the advancing
      // watermark fires user 1's 30-minute timeout
      input.addData((2L, us("2024-01-01 12:00:00")))
      q.processAllAvailable()
      input.addData((2L, us("2024-01-01 12:01:00"))) // merges: 1 min gap
      q.processAllAvailable()
      val rows = spark.table("closer").as[Streaming.ClosedSession].collect()
      assert(rows.exists(r => r.userId == 1L && r.nEvents == 2L &&
        r.lastSeenUs == us("2024-01-01 10:05:00")))
      assert(rows.exists(r => r.userId == 2L && r.nEvents == 1L &&
        r.lastSeenUs == us("2024-01-01 10:06:00")))
      // user 2's 12:00-12:01 session is still open
      assert(!rows.exists(r => r.userId == 2L &&
        r.lastSeenUs >= us("2024-01-01 12:00:00")))
    } finally q.stop()
  }

  test("transformWithState session closer matches flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    def us(s: String): Long = ts(s).getTime * 1000L
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Long)]
    val closed = Streaming.sessionCloserTws(input.toDS(), gapMinutes = 30)
    val q = closed.writeStream.format("memory").queryName("closer_tws")
      .outputMode(OutputMode.Append()).start()
    try {
      // the exact script of the flatMapGroupsWithState test: the two
      // implementations must close the same sessions
      input.addData(
        (1L, us("2024-01-01 10:00:00")),
        (1L, us("2024-01-01 10:05:00")),
        (2L, us("2024-01-01 10:06:00")))
      q.processAllAvailable()
      assert(spark.table("closer_tws").count() == 0)
      input.addData((2L, us("2024-01-01 12:00:00")))
      q.processAllAvailable()
      input.addData((2L, us("2024-01-01 12:01:00")))
      q.processAllAvailable()
      val rows = spark.table("closer_tws").as[Streaming.ClosedSession].collect()
      assert(rows.exists(r => r.userId == 1L && r.nEvents == 2L &&
        r.lastSeenUs == us("2024-01-01 10:05:00"))) // timer-fired close
      assert(rows.exists(r => r.userId == 2L && r.nEvents == 1L &&
        r.lastSeenUs == us("2024-01-01 10:06:00"))) // mid-batch gap close
      assert(!rows.exists(r => r.userId == 2L &&
        r.lastSeenUs >= us("2024-01-01 12:00:00"))) // still open
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join pairs events within the time bounds") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val buys = MemoryStream[(Timestamp, Long, String)]
    val joined = Streaming.intervalJoin(
      clicks.toDF().toDF("cts", "user_id", "click_id"),
      buys.toDF().toDF("bts", "user_id", "buy_id"),
      "user_id", "cts", "bts")
    val q = joined.select("click_id", "buy_id")
      .writeStream.format("memory").queryName("interval")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        (ts("2024-01-01 10:00:00"), 1L, "c1"),
        (ts("2024-01-01 10:00:00"), 2L, "c2"))
      buys.addData(
        (ts("2024-01-01 10:05:00"), 1L, "b1"), // within 10 min -> pairs
        (ts("2024-01-01 10:30:00"), 1L, "b2"), // outside window
        (ts("2024-01-01 10:05:00"), 3L, "b3")) // other user
      q.processAllAvailable()
      val rows = spark.table("interval").as[(String, String)].collect().toSet
      assert(rows == Set(("c1", "b1")))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched lefts once the watermark closes the window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val buys = MemoryStream[(Timestamp, Long, String)]
    val joined = Streaming.intervalJoin(
      clicks.toDF().toDF("cts", "user_id", "click_id"),
      buys.toDF().toDF("bts", "user_id", "buy_id"),
      "user_id", "cts", "bts",
      watermarkDelay = "5 minutes", joinType = "leftOuter")
    val q = joined.select("click_id", "buy_id")
      .writeStream.format("memory").queryName("interval_lo")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        (ts("2024-01-01 10:00:00"), 1L, "c1"),
        (ts("2024-01-01 10:00:00"), 2L, "c2")) // no buy for user 2
      buys.addData((ts("2024-01-01 10:05:00"), 1L, "b1"))
      q.processAllAvailable()
      // watermark far past c2's window -> the unmatched left must flush
      clicks.addData((ts("2024-01-01 12:00:00"), 9L, "c9"))
      buys.addData((ts("2024-01-01 12:00:00"), 9L, "b9"))
      q.processAllAvailable()
      clicks.addData((ts("2024-01-01 13:00:00"), 8L, "c8"))
      buys.addData((ts("2024-01-01 13:00:00"), 8L, "b8"))
      q.processAllAvailable()
      val rows = spark.table("interval_lo")
        .as[(String, Option[String])].collect().toSet
      assert(rows.contains(("c1", Some("b1"))))
      assert(rows.contains(("c2", None))) // emitted with null right side
    } finally q.stop()
  }

  test("foreachBatch incremental index equals the batch full recompute") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft-incidx").toString
    val input = MemoryStream[(Long, String)]
    val q = Streaming.incrementalIndexWriter(
      input.toDF().toDF("doc_id", "text"), store)
      .option("checkpointLocation", s"$store/ckpt").start()
    try {
      input.addData((1L, "spark joins data"), (2L, "data flows fast"))
      q.processAllAvailable()
      input.addData((3L, "spark spark spark"))
      q.processAllAvailable()
    } finally q.stop()
    val stored = spark.read.parquet(s"$store/term_frequency_in_doc")
      .as[(Long, String, Long)].collect().toSet
    val full = graft.index.InvertedIndex.termFrequency(
      Seq((1L, "spark joins data"), (2L, "data flows fast"),
        (3L, "spark spark spark")).toDF("doc_id", "text"))
      .as[(Long, String, Long)].collect().toSet
    assert(stored == full && stored.nonEmpty)
  }

  test("streaming exact dedup emits each content hash once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val dedup = Streaming.streamingExactDedup(
      input.toDF().toDF("ts", "content_hash"))
    val q = dedup.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "aaa"),
        (ts("2024-01-01 10:01:00"), "aaa"),
        (ts("2024-01-01 10:02:00"), "bbb"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:30:00"), "aaa"))
      q.processAllAvailable()
      val hashes = spark.table("dedup").select("content_hash")
        .as[String].collect().toSeq
      assert(hashes.sorted == Seq("aaa", "bbb"))
    } finally q.stop()
  }

  test("stream-static as-of picks the latest dimension version per event") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:00:00"), 50.0),
    ).toDF("user_id", "effective_ts", "price")
    val input = MemoryStream[(Long, Timestamp, String)]
    val enriched = Streaming.streamStaticAsOf(
      input.toDF().toDF("user_id", "ts", "tag"),
      dim, "user_id", "ts", "effective_ts", "price")
    val q = enriched.writeStream.format("memory").queryName("ssasof")
      .outputMode(OutputMode.Append()).start()
    try {
      val events = Seq(
        (1L, ts("2024-01-01 10:00:00"), "a"), // v1 only
        (1L, ts("2024-01-01 11:00:00"), "b"), // v2 at exactly its ts (<=)
        (1L, ts("2024-01-01 08:00:00"), "c"), // before any version
        (2L, ts("2024-01-01 12:00:00"), "d"),
        (3L, ts("2024-01-01 12:00:00"), "e")) // key with no dim row
      input.addData(events: _*)
      q.processAllAvailable()
      val got = spark.table("ssasof").select("tag", "asof_value")
        .as[(String, Option[Double])].collect().toMap
      assert(got == Map("a" -> Some(100.0), "b" -> Some(110.0),
        "c" -> None, "d" -> Some(50.0), "e" -> None))
      // batch parity: same rows through the batch as-of join
      val batch = graft.relational.TemporalJoins.asOfJoin(
        events.toDF("user_id", "ts", "tag"), dim,
        "user_id", "ts", "effective_ts", "price")
        .select("tag", "asof_value").as[(String, Option[Double])].collect().toMap
      assert(batch == got)
    } finally q.stop()
  }

  test("store-backed dedup drops dupes across batches and fresh restarts") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-dstore").toString
    val input = MemoryStream[(Long, String)]
    val q = Streaming.dedupAgainstStoreWriter(
      input.toDF().toDF("doc_id", "text"), s"$dir/store", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      // within-batch dup (3 repeats 1's text): min-doc_id representative
      input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      // cross-batch dup (4 repeats 2's text)
      input.addData((4L, "beta"), (5L, "gamma"))
      q.processAllAvailable()
    } finally q.stop()
    def outIds = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().toSet
    assert(outIds == Set(1L, 2L, 5L))
    // an entirely new query (fresh checkpoint — a restart or a second
    // pipeline) still dedups against the persisted store
    val input2 = MemoryStream[(Long, String)]
    val q2 = Streaming.dedupAgainstStoreWriter(
      input2.toDF().toDF("doc_id", "text"), s"$dir/store", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt2").start()
    try {
      input2.addData((6L, "alpha"), (7L, "delta"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(outIds == Set(1L, 2L, 5L, 7L))
    assert(spark.read.parquet(s"$dir/store/content_hashes").count() == 4L)
  }

  test("streaming anomaly monitor converges to the batch operator's view") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-anom").toString
    val input = MemoryStream[(Timestamp, Long)]
    val q = Streaming.hourlyAnomalyWriter(
      input.toDF().toDF("ts", "event_id"), s"$dir/store", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    def ev(h: Int, n: Int): Seq[(Timestamp, Long)] =
      (0 until n).map(i => (Timestamp.valueOf(f"2024-01-01 $h%02d:15:00"),
        h * 100L + i))
    val all = ev(0, 1) ++ ev(1, 3) ++ ev(2, 1) ++ ev(3, 3) ++ ev(4, 9) ++ ev(5, 2)
    try {
      // batches split MID-HOUR: hour 4's count accumulates across batches
      input.addData(ev(0, 1) ++ ev(1, 3) ++ ev(2, 1))
      q.processAllAvailable()
      input.addData(ev(3, 3) ++ ev(4, 4))
      q.processAllAvailable()
      input.addData(ev(4, 5) ++ ev(5, 2))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/out")
      .as[(String, Long, Option[Double])].collect().sortBy(_._1).toSeq
    val batch = graft.events.Events.hourlyAnomaly(
        all.toDF("ts", "event_id"))
      .as[(String, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(streamed == batch)
    assert(streamed.find(_._1.endsWith("04:00:00")).get._2 == 9L)
  }

  test("anomaly monitor killed mid-stream resumes from its checkpoint " +
    "exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-anom-rst").toString
    val input = MemoryStream[(Timestamp, Long)]
    def ev(h: Int, n: Int): Seq[(Timestamp, Long)] =
      (0 until n).map(i => (Timestamp.valueOf(f"2024-01-01 $h%02d:15:00"),
        h * 100L + i))
    def writer = Streaming.hourlyAnomalyWriter(
      input.toDF().toDF("ts", "event_id"), s"$dir/store", s"$dir/out")
    val q1 = writer.option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData(ev(0, 1) ++ ev(1, 3))
      q1.processAllAvailable()
      // data arrives, then the query dies BEFORE processing it
      input.addData(ev(2, 1) ++ ev(3, 3))
    } finally q1.stop()
    // a NEW query object on the SAME checkpoint must pick up the pending
    // batch exactly once and keep going
    val q2 = writer.option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q2.processAllAvailable()
      input.addData(ev(4, 9) ++ ev(5, 2))
      q2.processAllAvailable()
    } finally q2.stop()
    val all = ev(0, 1) ++ ev(1, 3) ++ ev(2, 1) ++ ev(3, 3) ++ ev(4, 9) ++ ev(5, 2)
    val streamed = spark.read.parquet(s"$dir/out")
      .as[(String, Long, Option[Double])].collect().sortBy(_._1).toSeq
    val batch = graft.events.Events.hourlyAnomaly(all.toDF("ts", "event_id"))
      .as[(String, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(streamed == batch) // no loss, no double count across the restart
  }

  test("store-backed dedup killed mid-stream resumes from its checkpoint " +
    "without re-emitting") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-dstore-rst").toString
    val input = MemoryStream[(Long, String)]
    def writer = Streaming.dedupAgainstStoreWriter(
      input.toDF().toDF("doc_id", "text"), s"$dir/store", s"$dir/out")
    val q1 = writer.option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData((1L, "alpha"), (2L, "beta"))
      q1.processAllAvailable()
      input.addData((3L, "alpha"), (4L, "gamma")) // pending at the kill
    } finally q1.stop()
    val q2 = writer.option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q2.processAllAvailable()
      input.addData((5L, "gamma"), (6L, "delta"))
      q2.processAllAvailable()
    } finally q2.stop()
    val outIds = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().toSeq.sorted
    // 3 dups 1, 5 dups 4 — and nothing from the pre-kill batches re-emits
    assert(outIds == Seq(1L, 2L, 4L, 6L))
    assert(spark.read.parquet(s"$dir/store/content_hashes").count() == 4L)
  }

  test("replayed hourly-count merge is idempotent (at-least-once safe)") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    def counts(rows: (String, Long)*) =
      rows.toDF("h", "n").select(col("h").cast("timestamp").as("hour"), col("n"))
    val b0 = Streaming.mergeHourlyCounts(None,
      counts(("2024-01-01 00:00:00", 2L)), 0L)
    // batch 1 lands, then CRASHES after the store promoted; the replay
    // re-merges the same batch into the already-merged store
    val b1 = Streaming.mergeHourlyCounts(Some(b0),
      counts(("2024-01-01 00:00:00", 1L), ("2024-01-01 01:00:00", 4L)), 1L)
    val b1replay = Streaming.mergeHourlyCounts(Some(b1),
      counts(("2024-01-01 00:00:00", 1L), ("2024-01-01 01:00:00", 4L)), 1L)
    def totals(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("hour").agg(fsum("n").as("n"))
        .as[(Timestamp, Long)].collect().toMap
    assert(totals(b1) == totals(b1replay))
    assert(totals(b1replay).values.toSeq.sorted == Seq(3L, 4L))
  }

  test("streaming ANN enrichment matches its own batch evaluation") {
    implicit val sqlCtx = spark.sqlContext
    val index = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q0 = index.filter($"vec_id" === 0L)
      .select($"embedding".as[Array[Float]]).head()
    val queries = Seq((100L, q0))
    val input = MemoryStream[(Long, Array[Float])]
    val enriched = Streaming.streamAnnEnrich(
      input.toDF().toDF("query_id", "embedding"), index, k = 5)
    val q = enriched.writeStream.format("memory").queryName("annstream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(queries: _*)
      q.processAllAvailable()
      // query columns (incl. the embedding payload) are preserved; the
      // neighbor columns append after them
      assert(spark.table("annstream").columns.toSeq ==
        Seq("query_id", "embedding", "rank", "nn_vec_id", "cosine"))
      val got = spark.table("annstream")
        .select("query_id", "rank", "nn_vec_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().toSeq.sortBy(_._2)
      // micro-batch parity: the same function over a batch frame
      val batch = Streaming.streamAnnEnrich(
        queries.toDF("query_id", "embedding"), index, k = 5)
        .select("query_id", "rank", "nn_vec_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().toSeq.sortBy(_._2)
      assert(got == batch && got.nonEmpty)
      // querying WITH an index vector: it is its own nearest neighbor
      assert(got.head == ((100L, 1, 0L, 1.0)))
      assert(got.map(_._4) == got.map(_._4).sorted.reverse) // cos descending
    } finally q.stop()
  }

  test("transformWithState funnel (ListState+MapState): out-of-order " +
    "arrival converges to the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, String, Long)]
    val q = Streaming.funnelProgressTws(input.toDS())
      .writeStream.format("memory").queryName("funnel_tws")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1 arrives OUT OF ORDER: the purchase lands before its
      // qualifying click; the click before the signup
      input.addData((1L, "purchase", 300L), (1L, "signup", 100L))
      q.processAllAvailable()
      // signup reached (t0=100); click absent -> purchase can't count
      val p1 = spark.table("funnel_tws").as[Streaming.FunnelProgress]
        .collect().filter(_.userId == 1L).maxBy(_.stagesReached)
      assert(p1.stagesReached == 1 && p1.lastReachUs == 100L)
      // the LATE click (ts between signup and purchase) unlocks stage 3
      input.addData((1L, "click", 200L))
      q.processAllAvailable()
      val p2 = spark.table("funnel_tws").as[Streaming.FunnelProgress]
        .collect().filter(_.userId == 1L).maxBy(_.stagesReached)
      assert(p2.stagesReached == 3 && p2.lastReachUs == 300L)
      // a click BEFORE the signup must not qualify (strict ordering)
      input.addData((2L, "click", 10L), (2L, "signup", 20L))
      q.processAllAvailable()
      val p3 = spark.table("funnel_tws").as[Streaming.FunnelProgress]
        .collect().filter(_.userId == 2L).maxBy(_.stagesReached)
      assert(p3.stagesReached == 1 && p3.lastReachUs == 20L)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState funnel bufferTtl: events past the lateness " +
    "horizon are evicted and can no longer refine reach times") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, String, Long)]
    val q = Streaming.funnelProgressTws(input.toDS(),
        bufferTtl = org.apache.spark.sql.streaming.TTLConfig(
          java.time.Duration.ofSeconds(2)))
      .writeStream.format("memory").queryName("funnel_ttl")
      .outputMode(OutputMode.Update()).start()
    // a TTL'd query keeps scheduling cleanup batches, so
    // processAllAvailable never observes quiescence — poll the sink for
    // the emission instead of awaiting no-new-data
    def await(pred: => Boolean): Unit = {
      val t0 = System.currentTimeMillis
      while (!pred && System.currentTimeMillis - t0 < 60000)
        Thread.sleep(200)
      assert(pred, "timed out waiting for stream output")
    }
    def rows(): Seq[Streaming.FunnelProgress] =
      spark.table("funnel_ttl").as[Streaming.FunnelProgress]
        .collect().toSeq.filter(_.userId == 1L)
    try {
      // purchase@400 does NOT qualify yet: click reached at 500
      input.addData((1L, "signup", 100L), (1L, "click", 500L),
        (1L, "purchase", 400L))
      await(rows().nonEmpty)
      val p1 = rows().maxBy(_.stagesReached)
      assert(p1.stagesReached == 2 && p1.lastReachUs == 500L)
      // wait past the TTL horizon: the buffered events evict
      Thread.sleep(4000)
      // the late click@200 moves the click reach earlier; the EXACT
      // funnel would then re-qualify purchase@400 (3 stages) — but that
      // purchase is evicted, so the TTL'd funnel reports 2: committed
      // progress is kept (the reach-map floor), evicted events can no
      // longer re-qualify — the documented bounded-lateness trade
      input.addData((1L, "click", 200L))
      await(rows().size >= 2)
      val p2 = rows()
      assert(p2.map(_.stagesReached).max == 2,
        s"evicted purchase still re-qualified: ${p2.mkString(",")}")
      // the refinement the late event CAN still make happened: click's
      // committed reach moved 500 -> 200
      assert(p2.exists(p => p.stagesReached == 2 && p.lastReachUs == 200L),
        s"late click did not refine the committed reach: ${p2.mkString(",")}")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState funnel equals batch funnelCounts on real events") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val events = graft.table(spark, "/root/testdata/sf0.001", "events")
    val stages = Seq("signup", "click", "purchase")
    val rows = events
      .filter(org.apache.spark.sql.functions.col("event_type").isin(stages: _*))
      .select("user_id", "event_type", "ts")
      .as[(Long, String, java.sql.Timestamp)].collect()
      .map(r => (r._1, r._2, r._3.getTime * 1000L)).toSeq
    // split into 3 interleaved chunks so most users' funnels span batches
    val chunks = rows.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
    val input = MemoryStream[(Long, String, Long)]
    val q = Streaming.funnelProgressTws(input.toDS(), stages)
      .writeStream.format("memory").queryName("funnel_eq")
      .outputMode(OutputMode.Update()).start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val fin = spark.table("funnel_eq").as[Streaming.FunnelProgress]
        .collect().groupBy(_.userId).view
        .mapValues(_.maxBy(_.stagesReached).stagesReached).toMap
      val batch = graft.events.Events.funnelCounts(events, stages)
        .collect().head
      val streamCounts = (0 until 3).map(i => fin.values.count(_ > i).toLong)
      val batchCounts = (0 until 3).map(i => batch.getLong(i))
      assert(streamCounts == batchCounts,
        s"stream $streamCounts vs batch $batchCounts")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("tws CDC materializer converges to the batch cdcApply state " +
    "under out-of-order split batches") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val events = graft.table(spark, "/root/testdata/sf0.001", "events")
    // deterministic md5 shuffle: the stream must see a DIFFERENT order
    // than (ts, event_id) or convergence would be untested
    val feed = events.select(col("user_id"), unix_micros(col("ts")),
        col("event_id"), col("event_type"), col("value"))
      .withColumn("__k", md5(concat(col("event_id").cast("string"), lit(":s"))))
      .orderBy("__k").drop("__k")
      .as[(Long, Long, Long, String, Double)].collect()
    val (b1, b2) = feed.splitAt(feed.length / 2)
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val q = Streaming.cdcMaterializerTws(input.toDS())
      .writeStream.format("memory").queryName("cdcmat")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      // n is monotone: the max-n snapshot per user is the final state
      val snaps = spark.table("cdcmat").as[Streaming.CdcSnapshot].collect()
        .groupBy(_.userId).map { case (_, rows) => rows.maxBy(_.nChanges) }
      def r2(v: Double) =
        BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val streamState = snaps.filter(_.live)
        .map(s => (s.userId, s.lastEventId, s.lastType, r2(s.lastValue),
          s.nChanges)).toSet
      val batchState = graft.events.Events.cdcApply(events)
        .select("user_id", "last_event_id", "last_type", "last_value",
          "n_changes")
        .as[(Long, Long, String, Double, Long)].collect().toSet
      assert(streamState == batchState)
      // tombstoned users are emitted as dead snapshots, not silently lost
      val dead = snaps.filterNot(_.live).map(_.userId).toSet
      val allUsers = feed.map(_._1).toSet
      assert(dead == allUsers -- batchState.map(_._1))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  // (user_id, ts, event_id, event_type, value) rows for the SCD-2 writer
  private def scdEv(u: Long, m: Int, id: Long, tpe: String, v: Double) =
    (u, Timestamp.valueOf(f"2024-01-01 00:$m%02d:00"), id, tpe, v)

  private type DimRow = (Long, Int, Long, String, Option[String], Boolean)

  private def readDim(dir: String): Seq[DimRow] =
    spark.read.parquet(s"$dir/out/scd_dim")
      .as[DimRow].collect().sortBy(r => (r._1, r._2)).toSeq

  test("streaming SCD-2 maintenance converges to the batch dimension " +
    "under out-of-order batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = Streaming.scdType2Writer(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"),
      s"$dir/store", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    // user 1: tier 0 -> 1 -> 0; user 2: tier 1 -> 1 (no-op collapse) -> 3;
    // user 3: single open version; plus non-purchase noise (filtered)
    val all = Seq(
      scdEv(1, 1, 10, "purchase", 10), scdEv(1, 5, 11, "purchase", 60),
      scdEv(1, 9, 12, "purchase", 20),
      scdEv(2, 2, 20, "purchase", 70), scdEv(2, 4, 21, "purchase", 80),
      scdEv(2, 8, 22, "purchase", 160),
      scdEv(3, 3, 30, "purchase", 40),
      scdEv(1, 6, 40, "click", 999), scdEv(2, 7, 41, "error", 999))
    try {
      // OUT OF ORDER: user 1's final change lands first, so its open
      // version must RE-CLOSE when the earlier changes arrive; user 2's
      // no-op second change arrives last and must collapse
      input.addData(Seq(all(2), all(3), all(7)))
      q.processAllAvailable()
      input.addData(Seq(all(0), all(5), all(6), all(8)))
      q.processAllAvailable()
      val mid = readDim(dir)
      // user 1 at this point: changes at :01 (t0) and :09 (t0) collapse
      // to ONE open version from :01
      assert(mid.filter(_._1 == 1L) ==
        Seq((1L, 1, 0L, "2024-01-01 00:01:00.000000", None, true)))
      input.addData(Seq(all(1), all(4)))
      q.processAllAvailable()
    } finally q.stop()
    val batch = graft.events.Events.scdType2(
        all.toDF("user_id", "ts", "event_id", "event_type", "value"))
      .as[DimRow].collect().sortBy(r => (r._1, r._2)).toSeq
    val streamed = readDim(dir)
    assert(streamed == batch)
    // the interesting shapes really happened: user 1 has 3 versions with
    // the first two closed; user 2 collapsed to 2
    assert(streamed.count(_._1 == 1L) == 3)
    assert(streamed.count(_._1 == 2L) == 2)
    assert(streamed.filter(_._1 == 1L).map(_._6) == Seq(false, false, true))
  }

  test("SCD-2 writer killed mid-stream resumes exactly-once from its " +
    "checkpoint (replayed-batch idempotence)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2-rst").toString
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    def writer = Streaming.scdType2Writer(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"),
      s"$dir/store", s"$dir/out")
    val all = Seq(
      scdEv(1, 1, 10, "purchase", 10), scdEv(1, 5, 11, "purchase", 60),
      scdEv(2, 2, 20, "purchase", 70), scdEv(2, 6, 21, "purchase", 120))
    val q1 = writer.option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData(Seq(all(0), all(2)))
      q1.processAllAvailable()
      // data arrives, then the query dies BEFORE processing it
      input.addData(Seq(all(1)))
    } finally q1.stop()
    val q2 = writer.option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q2.processAllAvailable() // pending batch replays exactly once
      input.addData(Seq(all(3)))
      q2.processAllAvailable()
    } finally q2.stop()
    val batch = graft.events.Events.scdType2(
        all.toDF("user_id", "ts", "event_id", "event_type", "value"))
      .as[DimRow].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(readDim(dir) == batch)
    // change store carries exactly the 4 changes — no replay duplicates
    assert(spark.read.parquet(s"$dir/store/scd_changes").count() == 4L)
  }
}
