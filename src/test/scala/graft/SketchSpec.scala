package graft

import graft.sketch.Sketches

class SketchSpec extends SparkSpec {

  test("HLL++ distinct counts stay within the configured error bound") {
    val li = table(spark, "/root/testdata/sf0.01", "lineitem")
    Sketches.distinctPartsPerFlag(li).collect().foreach { r =>
      val (exactP, approxP) = (r.getLong(1), r.getLong(2))
      val (exactS, approxS) = (r.getLong(3), r.getLong(4))
      assert(math.abs(approxP - exactP).toDouble / exactP < 0.05,
        s"parts off: $approxP vs $exactP")
      assert(math.abs(approxS - exactS).toDouble / exactS < 0.05,
        s"supps off: $approxS vs $exactS")
    }
  }

  test("approximate quantiles track exact ones") {
    val orders = table(spark, "/root/testdata/sf0.01", "orders")
    Sketches.priceQuantilesPerPriority(orders).collect().foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(1)) / r.getDouble(1) < 0.02)
      assert(math.abs(r.getDouble(4) - r.getDouble(3)) / r.getDouble(3) < 0.02)
    }
  }

  test("count-min sketch never undercounts; more hash rows never hurt") {
    val docs = table(spark, "/root/testdata/sf0.001", "documents")
    val d4 = Sketches.cmsTermCounts(docs, depth = 4, width = 256, k = 30)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    d4.values.foreach { case (truth, est) => assert(est >= truth) }
    // the min-fold is monotone in depth: adding hash rows only tightens
    val d1 = Sketches.cmsTermCounts(docs, depth = 1, width = 256, k = 30)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    d4.foreach { case (term, (_, est4)) => assert(est4 <= d1(term)) }
    // a generous width removes collisions entirely: estimate == truth
    val wide = Sketches.cmsTermCounts(docs, depth = 4, width = 1 << 20, k = 30)
      .collect()
    wide.foreach { r => assert(r.getLong(2) == r.getLong(1) && r.getLong(3) == 0L) }
  }

  test("HLL union of sub-sketches matches the direct sketch within bound") {
    import spark.implicits._
    // planted: flag A has parts 1..40 split across statuses X/Y with
    // overlap; flag B has parts 100..109 — small enough that the
    // datasketches sparse mode is EXACT, so both booleans must hold and
    // n_exact is the planted value
    val li = ((1 to 40).map(p => ("A", if (p % 2 == 0) "X" else "Y", p.toLong)) ++
      (1 to 20).map(p => ("A", "X", p.toLong)) ++ // overlap across statuses
      (100 to 109).map(p => ("B", "X", p.toLong)))
      .toDF("l_returnflag", "l_linestatus", "l_partkey")
    val r = Sketches.hllMergeReport(li)
      .as[(String, Long, Boolean, Boolean)].collect().toSeq
    assert(r == Seq(("A", 40L, true, true), ("B", 10L, true, true)))
  }
}
