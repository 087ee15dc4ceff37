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

  test("KMV: exact below k, bounded error above k, layout-invariant") {
    import spark.implicits._
    // the sketched universe is BIGRAMS. small: 3 docs x 9 distinct
    // bigrams = 27 < k = 256 -> the sketch IS the set and the estimate
    // is exactly the distinct count. big: 10 docs x 199 distinct bigrams
    // = 1990 -> estimator error ~1/sqrt(k-2) ~ 6%
    val docs = (
      (1 to 3).map(i => (i.toLong, "small",
        (1 to 10).map(j => s"s${(i - 1) * 10 + j}").mkString(" "))) ++
      (11 to 20).map(i => (i.toLong, "big",
        (1 to 200).map(j => s"b${(i - 11) * 200 + j}").mkString(" ")))
    ).toDF("doc_id", "source", "text")
    val v = Sketches.kmvVocabulary(docs)
      .as[(String, Long, Double)].collect()
      .map { case (s, e, k) => s -> ((e, k)) }.toMap
    assert(v("small") == ((27L, 27.0)))
    val (bigExact, bigEst) = v("big")
    assert(bigExact == 1990L)
    assert(math.abs(bigEst - 1990.0) / 1990.0 < 0.25, s"est $bigEst")
    // layout invariance: the k smallest hashes don't depend on partitioning
    val re = Sketches.kmvVocabulary(docs.repartition(7))
      .as[(String, Long, Double)].collect().toSet
    assert(re == Sketches.kmvVocabulary(docs).as[(String, Long, Double)].collect().toSet)
  }

  test("KMV overlap: identical sources at jaccard 1, disjoint at 0, half-overlap between") {
    import spark.implicits._
    // one doc per source; the sketched universe is the doc's 399/299
    // consecutive-token bigrams. alpha/gamma share the bigrams inside
    // the w201..w400 overlap run: 199 of them.
    val vocabA = (1 to 400).map(i => s"w$i")
    val half = (201 to 600).map(i => s"w$i")
    val docs = Seq(
      (1L, "alpha", vocabA.mkString(" ")),
      (2L, "beta", vocabA.mkString(" ")), // identical to alpha
      (3L, "gamma", half.mkString(" ")), // overlapping run
      (4L, "delta", (1 to 300).map(i => s"z$i").mkString(" ")), // disjoint
    ).toDF("doc_id", "source", "text")
    val o = Sketches.kmvSourceOverlap(docs)
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // identical sources: rho = 1 exactly; the intersection estimate equals
    // the union estimate (399 distinct > k, so it's an estimate, not exact)
    val ab = o(("alpha", "beta"))
    assert(ab._3 == 399L && ab._5 == 1.0)
    assert(math.abs(ab._4 - 399.0) / 399.0 < 0.25, s"kmv_inter ${ab._4}")
    val ad = o(("alpha", "delta"))
    assert(ad._3 == 0L && ad._5 == 0.0)
    val ag = o(("alpha", "gamma"))
    assert(ag._3 == 199L) // exact arm
    // KMV estimate of the 199-bigram intersection within generous bound
    assert(math.abs(ag._4 - 199.0) / 199.0 < 0.4, s"kmv_inter ${ag._4}")
  }

  // A Zipf-ish stream whose vocabulary (200 keys) far exceeds the MG
  // capacity, so decrements and merge-subtractions actually fire —
  // unlike the declared corpus's 31-term vocabulary.
  private def zipfStream: Seq[String] =
    new scala.util.Random(7).shuffle(
      (1 to 200).flatMap(r => Seq.fill(math.max(1, 4000 / (r * r)))(s"k$r")))

  test("Misra-Gries: size bound, undercount bound, heavy keys survive any partitioning") {
    import spark.implicits._
    val stream = zipfStream
    val n = stream.size.toLong
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cap = 16
    for (parts <- Seq(1, 3, 4)) {
      val mg = stream.toDF("term").repartition(parts)
        .agg(graft.functions.MisraGries.summary(cap)($"term").as("mg"))
        .as[Map[String, Long]].head()
      assert(mg.size <= cap, s"summary ${mg.size} > capacity $cap")
      // every counter undercounts, and by at most N/(cap+1)
      mg.foreach { case (k, est) =>
        assert(est <= truth(k), s"$k overcounted: $est > ${truth(k)}")
        assert(truth(k) - est <= n / (cap + 1) + 1,
          s"$k undercount ${truth(k) - est} beyond bound")
      }
      // THE guarantee: true frequency > N/(cap+1) => present
      truth.filter(_._2 > n.toDouble / (cap + 1)).keys.foreach { k =>
        assert(mg.contains(k), s"heavy key $k missing at $parts partitions")
      }
    }
  }

  test("Misra-Gries bound-then-verify equals the plain HAVING definition") {
    import spark.implicits._
    val stream = zipfStream
    val n = stream.size.toLong
    val cap = 16
    val docs = stream.grouped(97).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val got = Sketches.heavyHitterTerms(docs, cap)
      .as[(String, Long, Long)].collect().toSeq
    val t = n / (cap + 1) + 1
    val want = stream.groupBy(identity).map { case (k, v) => (k, v.size.toLong, t) }
      .filter(_._2 >= t).toSeq.sortBy(r => (-r._2, r._1))
    assert(got == want)
    assert(got.nonEmpty) // the fixture must actually exercise the cut
  }
}
