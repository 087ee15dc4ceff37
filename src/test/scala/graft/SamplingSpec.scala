package graft

import org.apache.spark.sql.functions._
import graft.sources.Sampling

/** S3 (app/prepare_data.py:16-17) — seeded corpus sampling. The
  * deterministic form must be invariant to partition layout (the property
  * the reference's `sample(fraction, seed)` lacks and the reason S3 was
  * excluded from the oracle in round 1). */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("deterministic sample is stable across partition layouts") {
    val base = Sampling.deterministicSample(docs, "doc_id", 50, 42)
      .select("doc_id").as[Long].collect().toSeq
    val re = Sampling.deterministicSample(docs.repartition(13), "doc_id", 50, 42)
      .select("doc_id").as[Long].collect().toSeq
    val one = Sampling.deterministicSample(docs.coalesce(1), "doc_id", 50, 42)
      .select("doc_id").as[Long].collect().toSeq
    assert(base.length == 50)
    assert(re == base && one == base) // same rows, same order
  }

  test("different seeds select different samples; same seed replays") {
    val a = Sampling.deterministicSample(docs, "doc_id", 50, 1)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs, "doc_id", 50, 2)
      .select("doc_id").as[Long].collect().toSet
    val a2 = Sampling.deterministicSample(docs, "doc_id", 50, 1)
      .select("doc_id").as[Long].collect().toSet
    assert(a != b)  // 50-of-500 twice: identical sets are astronomically unlikely
    assert(a == a2)
  }

  test("sample n never exceeds the corpus and keeps whole rows") {
    val all = Sampling.deterministicSample(docs, "doc_id", 1000000, 7)
    assert(all.count() == docs.count())
    assert(all.columns.toSet ==
      docs.columns.toSet + "sample_key")
  }

  test("reference-parity bernoulli sample honors seed for a fixed layout") {
    val d1 = docs.coalesce(1)
    val a = Sampling.bernoulliSample(d1, 0.2, 0L, 1000).select("doc_id").as[Long].collect().toSeq
    val b = Sampling.bernoulliSample(d1, 0.2, 0L, 1000).select("doc_id").as[Long].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.length < 500)
  }

  test("stratified sample takes exactly nPerGroup per group, layout-stable") {
    val s = Sampling.stratifiedSample(docs, "lang", "doc_id", 10, 42)
    val perGroup = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    val present = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    present.foreach { case (lang, n) =>
      assert(perGroup(lang) == math.min(10L, n), s"lang=$lang")
    }
    // layout invariance: the same rows in the same per-group ranks
    val base = s.select("lang", "doc_id", "sample_rank")
      .as[(String, Long, Int)].collect().toSet
    val re = Sampling.stratifiedSample(docs.repartition(13), "lang", "doc_id", 10, 42)
      .select("lang", "doc_id", "sample_rank")
      .as[(String, Long, Int)].collect().toSet
    assert(re == base)
  }

  test("balanced sample: exact class parity at the min-class floor, md5-prefix kept") {
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b"), (7L, "b"),
      (8L, "c"), (9L, "c"),                      // min class: 2
    ).toDF("doc_id", "lang")
    val got = Sampling.balancedSample(df, "lang", "doc_id", 17)
      .select("lang", "doc_id").as[(String, Long)].collect().toSeq.sorted
    val sizes = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes == Map("a" -> 2, "b" -> 2, "c" -> 2))
    // kept = per-class md5-order prefix, replayed in plain Scala
    def key(id: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:17".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expect = Seq(1L to 4L, 5L to 7L, 8L to 9L).flatMap { r =>
      r.sortBy(id => (key(id), id)).take(2)
    }.toSet
    assert(got.map(_._2).toSet == expect)
    // layout invariance
    val re = Sampling.balancedSample(df.repartition(7), "lang", "doc_id", 17)
      .select("lang", "doc_id").as[(String, Long)].collect().toSeq.sorted
    assert(re == got)
  }

  test("top-n-by-hash plans as TakeOrderedAndProject, not a global sort") {
    val plan = Sampling.deterministicSample(docs, "doc_id", 50, 42)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hash split is exhaustive, layout-invariant, and append-stable") {
    val s = Sampling.hashSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s.size == docs.count()) // every doc assigned exactly one split
    assert(s.values.toSet.subsetOf(Set("train", "val", "test")))
    // ~80/10/10 within loose tolerance (500 docs, 1/256 buckets)
    val frac = s.values.groupBy(identity).view.mapValues(_.size.toDouble / s.size)
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac)
    // layout invariance
    val re = Sampling.hashSplit(docs.repartition(13), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(re == s)
    // append stability: splitting HALF the corpus assigns the shared docs
    // identically — new arrivals never move old docs between splits
    val half = Sampling.hashSplit(docs.filter(col("doc_id") % 2 === 0), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    half.foreach { case (id, sp) => assert(s(id) == sp) }
  }

  test("weighted sample favors heavy rows, excludes non-positive weights") {
    val rows = ((1 to 99).map(i => (i.toLong, 1.0)) :+ (100L, 10000.0) :+
      (101L, 0.0) :+ (102L, -5.0)).toDF("id", "w")
    // P(heavy not in top-10) is astronomically small per seed
    (1L to 10L).foreach { seed =>
      val picked = Sampling.weightedSample(rows, "id", "w", 10, seed)
        .select("id").as[Long].collect().toSet
      assert(picked.contains(100L), s"heavy row missed at seed $seed")
      assert(!picked.contains(101L) && !picked.contains(102L))
    }
    // light rows still get in: the sample is not a deterministic top-by-weight
    val union = (1L to 10L).flatMap { seed =>
      Sampling.weightedSample(rows, "id", "w", 10, seed)
        .select("id").as[Long].collect()
    }.toSet
    assert((union - 100L).nonEmpty)
  }

  test("weighted sample is layout-invariant and n=all returns every positive-weight row") {
    val d = docs
    val a = Sampling.weightedSample(d, "doc_id", "n_chars", 50, 42)
      .select("doc_id").as[Long].collect().toSeq
    val b = Sampling.weightedSample(d.repartition(13), "doc_id", "n_chars", 50, 42)
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b && a.length == 50)
    val all = Sampling.weightedSample(d, "doc_id", "n_chars", 100000, 42).count()
    assert(all == d.filter(col("n_chars") > 0).count())
  }

  test("hash split edge fractions: zero val/test collapse correctly") {
    val all = Sampling.hashSplit(docs, "doc_id", val256 = 0, test256 = 0)
      .select("split").distinct().as[String].collect().toSeq
    assert(all == Seq("train")) // threshold 256 = "g" sorts above every hex pair
    val noTest = Sampling.hashSplit(docs, "doc_id", val256 = 128, test256 = 0)
      .select("split").distinct().as[String].collect().toSet
    assert(noTest == Set("train", "val"))
  }

  test("grouped reservoir: per-group caps, layout invariance, group isolation") {
    val d = docs
    val got = Sampling.groupedWeightedSample(d, "lang", "doc_id", "n_chars", 5, 42)
      .select("lang", "doc_id").as[(String, Long)].collect().toSeq
    val re = Sampling.groupedWeightedSample(d.repartition(13), "lang",
        "doc_id", "n_chars", 5, 42)
      .select("lang", "doc_id").as[(String, Long)].collect().toSeq
    assert(got.toSet == re.toSet)
    val perGroup = got.groupBy(_._1).view.mapValues(_.size)
    assert(perGroup.values.forall(_ <= 5) && perGroup.values.exists(_ == 5))
    // group isolation: dropping one group's rows never changes another's pick
    val langs = d.select("lang").distinct().as[String].collect().sorted
    val dropped = Sampling.groupedWeightedSample(
        d.filter(col("lang") =!= langs.head), "lang", "doc_id", "n_chars", 5, 42)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(dropped == got.filter(_._1 != langs.head).toSet)
    // within a group, selection follows the A-Res key exactly
    val keyOrder = d.filter(col("lang") === langs.head)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)].collect()
      .map { case (id, w) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id:42".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967296.0
        (id, math.log(u) / w)
      }
      .sortBy { case (id, k) => (-k, id) }.take(5).map(_._1).toSet
    assert(got.filter(_._1 == langs.head).map(_._2).toSet == keyOrder)
  }

  test("poisson bootstrap: weights replay exactly, mean weight ~ 1 per replica") {
    import org.apache.spark.sql.functions.col
    assume(new java.io.File("/root/testdata/sf0.001/lineitem.parquet").exists())
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val n = li.count()
    val out = Sampling.poissonBootstrap(li)
      .as[(String, Long, Long, Double)].collect().toSeq
    // deterministic: second run is bit-identical
    assert(out == Sampling.poissonBootstrap(li)
      .as[(String, Long, Long, Double)].collect().toSeq)
    // per replica, total resampled rows within 4 sigma of n (Poisson(1)
    // per row => variance n)
    val byRep = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(byRep.keySet == Set(0L, 1L, 2L))
    val tol = 4 * math.sqrt(n.toDouble)
    byRep.values.foreach(v => assert(math.abs(v - n) <= tol, s"$v vs $n"))
    // exact replay of the inverse-CDF draw for one row in plain Scala
    val row = li.select(col("l_orderkey").cast("long"),
        col("l_linenumber").cast("long")).as[(Long, Long)].head()
    val md = java.security.MessageDigest.getInstance("MD5")
    def kOf(r: Int): Long = {
      val hx = md.digest(s"${row._1}_${row._2}#$r".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = java.lang.Long.parseLong(hx, 16).toDouble / 4294967296.0
      Sampling.PoissonCum.indexWhere(u < _) match {
        case -1 => 7L
        case i => i.toLong
      }
    }
    val perRow = Sampling.poissonBootstrap(
        li.filter(col("l_orderkey") === row._1 &&
          col("l_linenumber") === row._2))
      .as[(String, Long, Long, Double)].collect()
    perRow.foreach { case (_, r, k, _) => assert(k == kOf(r.toInt), s"replica $r") }
  }
}
