package graft

import graft.sources.Layout

/** Written-layout invariants: file count is exactly what was asked for,
  * and per-file key ranges are disjoint — the property that makes parquet
  * footer min/max stats skip files for selective scans. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def partFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .toSeq

  test("writeSorted: exact file count, disjoint per-file key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val events = table(spark, "/root/testdata/sf0.001", "events")
    Layout.writeSorted(events, s"$dir/t", Seq("user_id"), 8)
    val files = partFiles(s"$dir/t")
    assert(files.size == 8)
    // read each FILE's actual key range back; ranges must not overlap
    // (equal keys co-locate under repartitionByRange)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(org.apache.spark.sql.functions.min("user_id"),
          org.apache.spark.sql.functions.max("user_id"))
        .as[(Long, Long)].head()
      assert(r._1 <= r._2)
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $ranges")
      case _ => ()
    }
    // nothing lost or duplicated by the layout pass
    assert(spark.read.parquet(s"$dir/t").count() == events.count())
  }

  test("z-order: BOTH dimensions skip files; single-key sort only one") {
    import org.apache.spark.sql.functions.{min, max}
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // uniform 100x100 grid: the worst case for single-key layouts (y is
    // uncorrelated with x, so x-sorted files all span the full y range)
    val grid = spark.range(10000)
      .selectExpr("id % 100 AS x", "CAST(id / 100 AS BIGINT) AS y", "id AS payload")
    Layout.writeZOrdered(grid, s"$dir/z", Seq("x", "y"), 16)
    Layout.writeSorted(grid, s"$dir/s", Seq("x"), 16)
    // per-file [min, max] of each dim, straight from the written files
    def ranges(path: String, c: String): Seq[(Long, Long)] =
      partFiles(path).map { f =>
        spark.read.parquet(f.getPath).agg(min(c), max(c))
          .as[(Long, Long)].head()
      }
    def intersecting(rs: Seq[(Long, Long)], lo: Long, hi: Long): Int =
      rs.count { case (l, h) => h >= lo && l <= hi }
    assert(partFiles(s"$dir/z").size == 16)
    // a 13%-selective predicate on either z dimension must skip at least
    // half the files (ideal 4x4 tiling intersects 4 of 16)
    assert(intersecting(ranges(s"$dir/z", "x"), 0, 12) <= 8)
    assert(intersecting(ranges(s"$dir/z", "y"), 0, 12) <= 8)
    // the x-sorted layout skips on x but EVERY file spans all of y
    assert(intersecting(ranges(s"$dir/s", "x"), 0, 12) <= 8)
    assert(intersecting(ranges(s"$dir/s", "y"), 0, 12) == 16)
    // layout passes lose nothing
    assert(spark.read.parquet(s"$dir/z").count() == 10000)
    // the maintenance form: re-lay the x-sorted table on the z-curve and
    // y-skipping appears where there was none
    Layout.compactZOrdered(spark, s"$dir/s", Seq("x", "y"), 16)
    assert(intersecting(ranges(s"$dir/s", "y"), 0, 12) <= 8)
    assert(spark.read.parquet(s"$dir/s").count() == 10000)
  }

  test("compact: fragmented appends collapse to the asked-for layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val events = table(spark, "/root/testdata/sf0.001", "events")
    // simulate streaming-sink fragmentation: many small appends
    (0 until 4).foreach { i =>
      events.filter($"event_id" % 4 === i).repartition(5)
        .write.mode("append").parquet(s"$dir/t")
    }
    assert(partFiles(s"$dir/t").size >= 16)
    Layout.compact(spark, s"$dir/t", Seq("user_id"), 4)
    assert(partFiles(s"$dir/t").size == 4)
    assert(spark.read.parquet(s"$dir/t").count() == events.count())
  }

  test("z-order rejects non-numeric key columns instead of silently degrading") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      Layout.writeZOrdered(df, "/tmp/never_written", Seq("id", "name"), 2)
    }
    assert(e.getMessage.contains("name") && e.getMessage.contains("non-numeric"))
  }

  test("LayoutAnalysis.interleave16 equals the bit-twiddled reference") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 512).select(
      (col("id") * 97 % 65536).as("x"), (col("id") * 211 % 65536).as("y"))
    val got = df.select(col("x"), col("y"),
        graft.relational.LayoutAnalysis.interleave16(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    assert(got.nonEmpty)
    got.foreach { case (x, y, z) => assert(z == ref(x, y), s"($x,$y)") }
  }

  test("zorderSkipping: z layout prunes; natural layout cannot") {
    val li = table(spark, "/root/testdata/sf0.001", "lineitem")
    val rows = graft.relational.LayoutAnalysis.zorderSkipping(li)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.size == 8)
    rows.foreach { case (_, nat, z) =>
      // dims are md5-derived, so insert order carries no signal: the
      // natural layout scans (nearly) everything, the z layout a fraction
      assert(z >= 1 && z < nat, s"nat=$nat z=$z")
    }
    val (natTot, zTot) = (rows.map(_._2).sum, rows.map(_._3).sum)
    assert(zTot * 3 <= natTot, s"expected >=3x skipping, nat=$natTot z=$zTot")
  }

  test("keySkewDeciles equals the naive ntile spelling") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // planted skew: key = floor(sqrt(id)) => multiplicity grows with key
    val df = spark.range(0, 2000)
      .select(floor(sqrt(col("id").cast("double"))).as("k"))
    val kc = df.groupBy("k").agg(count(lit(1)).as("cnt"))
    val nr = kc.agg(sum("cnt")).as[Long].head()
    val naive = kc
      .withColumn("decile",
        ntile(10).over(Window.orderBy(col("cnt").desc, col("k"))).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("keys"), sum("cnt").as("rows_in_decile"),
        max("cnt").as("max_cnt"))
      .select(col("decile"), col("keys"), col("rows_in_decile"),
        round(col("rows_in_decile").cast("double") / nr, 4).as("row_share"),
        col("max_cnt"))
      .orderBy("decile")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    val got = graft.relational.LayoutAnalysis.keySkewDeciles(df, "k")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(got == naive)
  }

  test("compaction plan: contiguous running-sum bins; oversized file degrades to its own bin") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // partition a: day-files of 4,4,4,12,3 rows at target 10
    //   cum-before 0,4,8,12,24 -> bins 0,0,0,1,2
    val ev = (
      (1 to 4).map(i => ("a", s"2024-01-01 0$i:00:00")) ++
      (1 to 4).map(i => ("a", s"2024-01-02 0$i:00:00")) ++
      (1 to 4).map(i => ("a", s"2024-01-03 0$i:00:00")) ++
      (1 to 9).map(i => ("a", s"2024-01-04 0$i:00:00")) ++
      (1 to 3).map(i => ("a", s"2024-01-04 1$i:00:00")) ++
      (1 to 3).map(i => ("a", s"2024-01-05 0$i:00:00")) ++
      (1 to 2).map(i => ("b", s"2024-01-01 0$i:00:00"))
    ).zipWithIndex.map { case ((t, s), i) =>
      (i.toLong, 1L, java.sql.Timestamp.valueOf(s), t, 0.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = graft.relational.LayoutAnalysis.compactionPlan(ev, 10L)
      .as[(String, String, Long, Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      ("a", "2024-01-01", 4L, 0L, 12L, 3L, 1),
      ("a", "2024-01-02", 4L, 0L, 12L, 3L, 1),
      ("a", "2024-01-03", 4L, 0L, 12L, 3L, 1),
      ("a", "2024-01-04", 12L, 1L, 12L, 1L, 0), // oversized: own bin
      ("a", "2024-01-05", 3L, 2L, 3L, 1L, 0),
      ("b", "2024-01-01", 2L, 0L, 2L, 1L, 0)))  // partitions independent
    // bins are contiguous day ranges within each partition (order preserved)
    got.groupBy(_._1).foreach { case (_, fs) =>
      assert(fs.sortBy(_._2).map(_._4) == fs.sortBy(_._2).map(_._4).sorted)
    }
  }
}
