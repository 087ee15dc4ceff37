package graft

import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f), 0),
    (2L, Array(0.0f, 1.0f), 1),
    (3L, Array(-1.0f, 0.0f), 1),
  ).toDF("vec_id", "embedding", "label")

  test("brute-force cosine top-k ranks by similarity to the query vector") {
    val res = Similarity.cosineTopK(emb, 0L, 3).as[(Long, Int, Double)].collect()
    assert(res.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(res.head._3 > 0.99)
    assert(res.last._3 == -1.0)
  }

  test("LSH ANN results are a subset of brute-force, same-bucket only") {
    val brute = Similarity.cosineTopK(emb, 0L, 4)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._3).toMap
    val ann = Similarity.annCosineLsh(emb, 0L, 4, dims = 2, nPlanes = 4)
      .as[(Long, Int, Double)].collect()
    assert(ann.nonEmpty) // near-identical vector must share the bucket
    ann.foreach { r => assert(brute(r._1) == r._3) }
    assert(ann.map(_._1).contains(1L))
  }

  test("IVF with nProbe == nCells degenerates to exact brute force") {
    // This equality anchors IVF recall semantics to the oracle-checked
    // cosineTopK: probing every cell must reproduce the exact top-k.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.cosineTopK(e, 0L, 10)
      .as[(Long, Int, Double)].collect().toSeq
    val full = Similarity.annCosineIvf(e, 0L, 10, nCells = 8, nProbe = 8)
      .as[(Long, Int, Double)].collect().toSeq
    assert(full == brute)
  }

  test("IVF probe results are exact-cosine subsets with useful recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.cosineTopK(e, 0L, 10)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._3).toMap
    val ivf = Similarity.annCosineIvf(e, 0L, 10, nCells = 16, nProbe = 4)
      .as[(Long, Int, Double)].collect()
    assert(ivf.nonEmpty)
    // every reported cosine is the true cosine (no approximation in scores)
    ivf.filter(r => brute.contains(r._1)).foreach(r => assert(brute(r._1) == r._3))
    // probing 4/16 cells still recovers a useful share of the true top-10
    val recall = ivf.map(_._1).count(brute.contains).toDouble / 10
    assert(recall >= 0.3, s"recall $recall")
  }

  test("IVF output is invariant to partition layout") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.annCosineIvf(e, 0L, 10).as[(Long, Int, Double)].collect().toSeq
    val b = Similarity.annCosineIvf(e.repartition(11), 0L, 10)
      .as[(Long, Int, Double)].collect().toSeq
    assert(a == b)
  }

  test("norm stats per label") {
    val res = Similarity.normStatsByLabel(emb).as[(Int, Long, Double, Double)].collect()
    assert(res.map(_._1).toSeq == Seq(0, 1))
    assert(res.forall(r => r._3 <= r._4 && r._2 == 2L))
  }

  test("int8 quantization error matches a scala-side replay; zero vec safe") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, -0.5f), 0),
      (1L, Array(0.3f, 0.2f, 0.1f), 0),
      (2L, Array(0.0f, 0.0f, 0.0f), 1), // max|x| = 0: scale undefined -> mse 0
    ).toDF("vec_id", "embedding", "label")
    def replayMse(v: Array[Float]): Double = {
      val xs = v.map(_.toDouble)
      val ma = xs.map(math.abs).max
      if (ma == 0) 0.0
      else {
        val s = 127.0 / ma
        xs.map { x =>
          val q = math.min(math.max(math.floor(x * s + 0.5), -127.0), 127.0)
          val e = x - q / s
          e * e
        }.sum / xs.length
      }
    }
    val byLabel = Map(
      0 -> Seq(Array(1.0f, 0.0f, -0.5f), Array(0.3f, 0.2f, 0.1f)),
      1 -> Seq(Array(0.0f, 0.0f, 0.0f)))
    val expected = byLabel.view.mapValues(_.map(replayMse)).toMap
    val got = Similarity.quantizeErrorByLabel(vecs)
      .as[(Int, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(0, 1))
    got.foreach { case (label, n, avg, mx) =>
      val exp = expected(label)
      assert(n == exp.length)
      assert(math.abs(avg - exp.sum / exp.length) < 1e-8, s"avg label=$label")
      assert(math.abs(mx - exp.max) < 1e-8, s"max label=$label")
      assert(mx < 1e-3) // int8 on unit-scale vectors: reconstruction is tight
    }
  }

  test("batch LSH ANN reproduces the single-query LSH result per query") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val single = Similarity.annCosineLsh(e, 0L, 5)
      .as[(Long, Int, Double)].collect().toSeq
    val multi = Similarity.annCosineLshMany(e, Seq(0L, 3L), 5)
      .filter($"query_id" === 0L)
      .select("vec_id", "label", "cosine")
      .as[(Long, Int, Double)].collect().toSeq
    assert(multi == single)
  }

  test("batch IVF ANN reproduces the single-query IVF result per query") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    Seq(0L, 3L).foreach { qid =>
      val single = Similarity.annCosineIvf(e, qid, 5)
        .as[(Long, Int, Double)].collect().toSeq
      val multi = Similarity.annCosineIvfMany(e, Seq(0L, 3L), 5)
        .filter($"query_id" === qid)
        .select("vec_id", "label", "cosine")
        .as[(Long, Int, Double)].collect().toSeq
      assert(multi == single, s"query $qid")
    }
  }

  test("recall eval agrees with directly computed brute/approx sets") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Similarity.annRecallAtK(e, Seq(0L, 1L), 10)
      .as[(Long, Long, Long, Double)].collect()
    assert(r.map(_._1).toSeq == Seq(0L, 1L))
    r.foreach { case (_, kEff, hits, rec) =>
      assert(kEff == 10L && hits >= 0L && hits <= 10L)
      assert(math.abs(rec - hits.toDouble / kEff) < 1e-4)
    }
    val brute = Similarity.cosineTopK(e, 0L, 10)
      .as[(Long, Int, Double)].collect().map(_._1).toSet
    val approx = Similarity.annCosineLsh(e, 0L, 10)
      .as[(Long, Int, Double)].collect().map(_._1).toSet
    assert(r.find(_._1 == 0L).get._3 == (brute intersect approx).size.toLong)
  }

  test("kmeans step with one cell averages all unit vectors") {
    val r = Similarity.kmeansStep(emb, nCells = 1, seed = 7, reportDims = 2)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getInt(0) == 1 && row.getLong(1) == 4L)
    val n = math.sqrt(0.9f.toDouble * 0.9f.toDouble + 0.1f.toDouble * 0.1f.toDouble)
    val us = Seq((1.0, 0.0), (0.9f.toDouble / n, 0.1f.toDouble / n),
      (0.0, 1.0), (-1.0, 0.0))
    assert(math.abs(row.getDouble(2) - us.map(_._1).sum / 4) < 1e-4)
    assert(math.abs(row.getDouble(3) - us.map(_._2).sum / 4) < 1e-4)
  }

  test("kmeans step cell populations partition the collection") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Similarity.kmeansStep(e, nCells = 16).collect()
    assert(r.map(_.getLong(1)).sum == e.count())
    assert(r.map(_.getInt(0)).distinct.length == r.length)
  }

  test("kmeans step with more cells than vectors degenerates to singletons") {
    val r = Similarity.kmeansStep(emb, nCells = 16, reportDims = 2).collect()
    // only 4 vectors exist: 4 cells, each a singleton (every vector is
    // its own sampled centroid and nothing scores higher than itself)
    assert(r.length == 4)
    assert(r.forall(_.getLong(1) == 1L))
  }

  test("batch ANN on an unknown query set is empty with intact schema") {
    val r = Similarity.annCosineLshMany(emb, Seq(999L), 5,
      dims = 2, nPlanes = 4)
    assert(r.columns.toSeq ==
      Seq("query_id", "vec_id", "label", "cosine", "rn"))
    assert(r.count() == 0L)
  }

  test("multi-probe LSH: superset of single-probe, recall never drops") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.cosineTopK(e, 0L, 10)
      .as[(Long, Int, Double)].collect().map(_._1).toSet
    val single = Similarity.annCosineLsh(e, 0L, 10)
      .as[(Long, Int, Double)].collect().map(_._1).toSeq
    val multi = Similarity.annCosineLshMultiProbe(e, 0L, 10, nProbes = 4)
      .as[(Long, Int, Double)].collect().map(_._1).toSeq
    val (rs, rm) = (single.count(brute).toDouble / 10,
      multi.count(brute).toDouble / 10)
    assert(rm >= rs, s"multi-probe recall $rm < single $rs")
    // probing every single-flip neighbor must reach everything a
    // same-or-one-bit-away bucket holds — on this corpus that is the
    // whole true top-10
    val all = Similarity.annCosineLshMultiProbe(e, 0L, 10, nProbes = 9)
      .as[(Long, Int, Double)].collect().map(_._1).toSeq
    assert(all.count(brute).toDouble / 10 >= rm)
  }

  /** 3 planted unit-vector clusters in 4-dim: axis directions perturbed
    * by a small deterministic wobble on another axis. */
  private def plantedClusters: org.apache.spark.sql.DataFrame = {
    val base = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.0f),
      Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f))
    val rows = for {
      c <- 0 until 3
      i <- 0 until 12
    } yield {
      val v = base(c).clone()
      v(3) = 0.05f * ((i % 5) - 2) // wobble in [-0.1, 0.1]
      ((c * 12 + i).toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("kmeansFit converges on planted clusters: centroids land on centers") {
    val fit = Similarity.kmeansFit(plantedClusters, nCells = 3, iters = 10,
      dims = 4, eps = 1e-9)
    val cells = fit.as[(Int, Array[Double], Long)].collect()
    assert(cells.length == 3)
    assert(cells.map(_._3).sum == 36L) // every vector assigned
    // each trained centroid must be dominated by exactly one axis and the
    // three centroids must cover the three planted axes
    val domAxes = cells.map { case (_, cu, _) =>
      cu.zipWithIndex.maxBy(x => math.abs(x._1))._2
    }
    assert(domAxes.toSet == Set(0, 1, 2))
    cells.foreach { case (_, cu, _) =>
      assert(cu.map(math.abs).max > 0.99, cu.mkString(","))
    }
  }

  test("kmeansFit eps-stop: a converged fit stops before the iter cap") {
    // after centroids stop moving, one extra round changes nothing — the
    // fit at a generous cap equals the fit at a tight one
    val a = Similarity.kmeansFit(plantedClusters, nCells = 3, iters = 10,
        dims = 4, eps = 1e-9)
      .orderBy("cell_id").as[(Int, Array[Double], Long)].collect().toSeq
    val b = Similarity.kmeansFit(plantedClusters, nCells = 3, iters = 50,
        dims = 4, eps = 1e-9)
      .orderBy("cell_id").as[(Int, Array[Double], Long)].collect().toSeq
    assert(a.map(r => (r._1, r._2.toSeq, r._3)) ==
      b.map(r => (r._1, r._2.toSeq, r._3)))
  }

  test("trained IVF with nProbe == nCells degenerates to exact brute force") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.cosineTopK(e, 0L, 10)
      .as[(Long, Int, Double)].collect().toSeq
    val full = Similarity.annCosineIvfTrained(e, 0L, 10, nCells = 8,
      nProbe = 8, iters = 2).as[(Long, Int, Double)].collect().toSeq
    assert(full == brute)
  }

  test("training the quantizer does not hurt recall vs sampled centroids") {
    // on planted clusters a trained quantizer's cells align with the true
    // clusters, so probing ONE cell recovers the query's whole cluster
    val e = plantedClusters
    def recallAt(k: Int, res: Seq[Long], brute: Seq[Long]): Double =
      res.count(brute.toSet).toDouble / brute.size
    val brute = Similarity.cosineTopK(e, 0L, 10)
      .as[(Long, Int, Double)].collect().map(_._1).toSeq
    val sampled = Similarity.annCosineIvf(e, 0L, 10, nCells = 3, nProbe = 1)
      .as[(Long, Int, Double)].collect().map(_._1).toSeq
    val trained = Similarity.annCosineIvfTrained(e, 0L, 10, nCells = 3,
      nProbe = 1, iters = 10, dims = 4)
      .as[(Long, Int, Double)].collect().map(_._1).toSeq
    val (rs, rt) = (recallAt(10, sampled, brute), recallAt(10, trained, brute))
    assert(rt >= rs, s"trained recall $rt < sampled $rs")
    assert(rt >= 0.9, s"trained recall $rt") // one probe covers the cluster
  }

  test("PQ error: codewords reconstruct exactly; nCodes=1 is plain distance") {
    // (a) every vector sampled into the codebook -> zero error everywhere
    val all = (1 to 16).map(i =>
      (i.toLong, Array.tabulate(4)(d => (i * 10 + d).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val zero = Similarity.pqErrorByLabel(all, nSub = 2, nCodes = 16, dims = 4)
      .as[(Int, Long, Double, Double)].collect()
    assert(zero.length == 1 && zero(0)._2 == 16L)
    assert(zero(0)._3 == 0.0 && zero(0)._4 == 0.0)
    // (b) one codeword: the sampled vector scores 0, the other scores
    // ||v1 - v2||^2 / dims regardless of which one was sampled
    val two = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f), 0),
      (2L, Array(2.0f, 2.0f, 3.0f, 6.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.pqErrorByLabel(two, nSub = 2, nCodes = 1, dims = 4)
      .as[(Int, Long, Double, Double)].collect()
    val expected = (1.0 + 0.0 + 0.0 + 4.0) / 4.0 // 1.25
    assert(r.length == 1 && r(0)._2 == 2L)
    assert(r(0)._3 == expected / 2 && r(0)._4 == expected) // avg over {0, d}
  }

  test("PQ ANN: exact when every vector is a codeword; high recall on clusters") {
    // nCodes >= corpus: reconstruction is exact, so PQ serving must equal
    // brute-force cosine top-k, scores included
    val e = plantedClusters
    val pq = Similarity.annCosinePq(e, 0L, 10, nSub = 2, nCodes = 36, dims = 4)
      .as[(Long, Int, Double)].collect().toSeq
    val brute = Similarity.cosineTopK(e, 0L, 10)
      .as[(Long, Int, Double)].collect().toSeq
    assert(pq.map(_._1) == brute.map(_._1))
    pq.zip(brute).foreach { case ((_, _, a), (_, _, b)) =>
      assert(math.abs(a - b) <= 1e-4, s"$a vs $b")
    }
    // tiny 3-codeword codebook (coarsest possible): recall degrades but
    // stays far above the 3.3/10 chance floor — measured 7/10
    val small = Similarity.annCosinePq(e, 0L, 10, nSub = 2, nCodes = 3, dims = 4)
      .as[(Long, Int, Double)].collect().toSeq
    val sameCluster = small.map(_._1).count(_ / 12 == 0L)
    assert(sameCluster >= 6, s"only $sameCluster/10 from the query's cluster")
  }

  test("IVF-PQ: near-exact with a rich codebook; recall floor vs brute") {
    val e = plantedClusters
    val brute = Similarity.cosineTopK(e, 0L, 10)
      .as[(Long, Int, Double)].collect().toSeq
    // nCodes >= corpus: every residual is a codeword, reconstruction is
    // exact, and probing every trained cell covers the corpus -> serving
    // must reproduce brute-force ids and scores to the rounding grid
    val rich = Similarity.annCosineIvfPq(e, 0L, 10, nCells = 3, nProbe = 3,
      iters = 10, nSub = 2, nCodes = 36, dims = 4)
      .as[(Long, Int, Double)].collect().toSeq
    assert(rich.map(_._1) == brute.map(_._1))
    rich.zip(brute).foreach { case ((_, _, a), (_, _, b)) =>
      assert(math.abs(a - b) <= 1e-4, s"$a vs $b") }
    // production shape — cell prune (1 of 3 probes) + a coarse codebook:
    // the query's planted cluster must still dominate the top-10
    val pruned = Similarity.annCosineIvfPq(e, 0L, 10, nCells = 3, nProbe = 1,
      iters = 10, nSub = 2, nCodes = 6, dims = 4)
      .as[(Long, Int, Double)].collect().toSeq
    val recall = pruned.map(_._1).count(brute.map(_._1).toSet).toDouble / 10
    assert(recall >= 0.6, s"IVF-PQ recall $recall")
  }

  test("semantic dedup pairs: within-cluster twins found, cross-cluster never") {
    val pairs = Similarity.semanticDedupPairs(plantedClusters,
      threshold = 0.9, nCells = 3, iters = 10, dims = 4)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    // the planted clusters are axis-aligned: any pair crossing clusters
    // has cosine ~= wobble^2 < 0.9, so every surfaced pair must be
    // intra-cluster (vec_id / 12 identifies the planted cluster)
    pairs.foreach { case (a, b, cos) =>
      assert(a / 12 == b / 12, s"cross-cluster pair ($a,$b)")
      assert(cos >= 0.9 && cos <= 1.0)
      assert(a < b)
    }
    // identical wobble -> identical vector -> cosine 1.0 pairs must all
    // surface: ids i and i+5 within a cluster repeat the same wobble
    val exactTwins = for {
      c <- 0 until 3; i <- 0 until 12; j <- (i + 1) until 12
      if i % 5 == j % 5
    } yield ((c * 12 + i).toLong, (c * 12 + j).toLong)
    val got = pairs.map(p => (p._1, p._2)).toSet
    exactTwins.foreach { t =>
      assert(got.contains(t), s"missing exact twin pair $t")
    }
  }

  test("label centroids: exact means and pairwise cosine on a known frame") {
    import spark.implicits._
    // label 0: (1,0)+(0,1) -> centroid (.5,.5); label 1: (1,0); label 2: (-1,0)
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(1.0f, 0.0f), 1),
      (3L, Array(-1.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidSimilarity(e, dims = 2)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out((0, 1)) == ((2L, 1L, 0.7071)))
    assert(out((0, 2)) == ((2L, 1L, -0.7071)))
    assert(out((1, 2)) == ((1L, 1L, -1.0)))
  }

  test("nDCG eval: IVF-equals-exact yields ndcg 1.0 with hand-computed idcg") {
    import spark.implicits._
    // 4 vectors -> 4 sampled cells, nProbe=4 probes them all, so the
    // approximate arm IS the exact arm and ndcg must be exactly 1.0
    val e = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0), (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 0), (3L, Array(-1f, 0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.ndcgEval(e).collect().head
    def r4(v: Double): Double =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // exact ranks: vec 1 (r1), vec 2 (r2), vec 3 (r3); rel = 11-rank
    val idcg = (1 to 3).map(p =>
      (11.0 - p) / (math.log(p + 1.0) / math.log(2.0))).sum
    assert(r.getInt(0) == 10)
    assert(r.getDouble(1) == r4(idcg) && r.getDouble(2) == r4(idcg))
    assert(r.getDouble(3) == 1.0)
  }

  test("MMR rerank diversifies: the near-duplicate drops below the diverse doc") {
    import spark.implicits._
    // vec 1 and vec 2 are exact duplicates (rel ~0.9); vec 3 is slightly
    // less relevant but diverse. Pure relevance: 1, 2, 3. MMR: 1, 3, 2.
    val v1 = Array(0.9f, 0.4359f, 0f, 0f)
    val e = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0), (1L, v1, 0), (2L, v1, 0),
      (3L, Array(0.85f, 0f, 0.5268f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    // k > candidates: early-stop emits exactly the 3 available rows
    val got = Similarity.mmrRerank(e, 0L, candK = 20, k = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._2) == Seq(1L, 3L, 2L))

    // independent plain-Scala replay of the greedy arithmetic
    def unit(v: Array[Float]): Array[Double] = {
      val d = v.map(_.toDouble)
      var ss = 0.0; d.foreach(x => ss += x * x)
      val n = math.sqrt(ss); d.map(_ / n)
    }
    def dotd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def rr(v: Double, s: Int): Double =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = Map(1L -> v1, 2L -> v1,
      3L -> Array(0.85f, 0f, 0.5268f, 0f))
      .view.mapValues(_.map(_.toDouble)).toMap
    val vecs = Map(1L -> v1, 2L -> v1,
      3L -> Array(0.85f, 0f, 0.5268f, 0f)).view.mapValues(unit).toMap
    val qv = Array(1f, 0f, 0f, 0f).map(_.toDouble)
    // rel replays the cosineTopK raw-vector formula exactly
    val rel = raw.map { case (id, v) => id ->
      rr(dotd(v, qv) / (math.sqrt(dotd(v, v)) * math.sqrt(dotd(qv, qv))), 4) }
    var sel = Vector.empty[(Int, Long, Double)]
    var selU = Vector.empty[Array[Double]]
    for (p <- 1 to 3) {
      val best = vecs.keys.filterNot(sel.map(_._2).contains).map { id =>
        val ms = if (selU.isEmpty) 0.0
          else selU.map(s => rr(dotd(vecs(id), s), 4)).max
        (id, rr(0.7 * rel(id) - 0.3 * ms, 6))
      }.toSeq.sortBy { case (id, m) => (-m, id) }.head
      sel :+= ((p, best._1, best._2)); selU :+= vecs(best._1)
    }
    assert(got == sel)
  }

  test("PSI drift: identical slices score zero; a shifted slice matches the replay") {
    import spark.implicits._
    // norms: (3,4) -> 5 and (1,0) -> 1, exactly representable
    val same = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(3f, 4f), 0),
      (2L, Array(1f, 0f), 9), (3L, Array(3f, 4f), 9))
      .toDF("vec_id", "embedding", "label")
    val z = Similarity.psiDrift(same).collect()
    assert(z.forall(_.getDouble(3) == 0.0) && z.forall(_.getDouble(4) == 0.0))

    // current slice piles onto the top bin: bins 0 and 9 diverge
    val drift = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(3f, 4f), 0),
      (2L, Array(3f, 4f), 9), (3L, Array(3f, 4f), 9))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.psiDrift(drift).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def term(nb: Long, nc: Long): Double = {
      val pb = (nb + 1.0) / 12.0; val pc = (nc + 1.0) / 12.0
      r6((pb - pc) * math.log(pb / pc))
    }
    val expTotal = r6(term(1, 0) + term(1, 2) + 8 * term(0, 0))
    assert(got(0) == ((1L, 0L, term(1, 0), expTotal)))
    assert(got(9) == ((1L, 2L, term(1, 2), expTotal)))
    (1 to 8).foreach(b => assert(got(b) == ((0L, 0L, 0.0, expTotal))))
    assert(expTotal > 0.0)
  }

  test("power iteration recovers a planted axis-aligned principal component") {
    import spark.implicits._
    // zero mean, all variance on dim 1: PC = e1 exactly, lambda = 10/4
    val e = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(-1f, 0f, 0f, 0f)),
      (3L, Array(2f, 0f, 0f, 0f)), (4L, Array(-2f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.powerIterationPc(e, dims = 4).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, 1.0, 2.5), (2, 0.0, 2.5),
      (3, 0.0, 2.5), (4, 0.0, 2.5)))
  }

  test("power iteration recovers a planted tilted principal component") {
    import spark.implicits._
    // all mass along (0.6, 0.8): w after one round is exactly
    // (26.25, 35) -> unit (0.6, 0.8); projections (±5, ±10) -> lambda 62.5
    val e = Seq(
      (1L, Array(3f, 4f, 0f, 0f)), (2L, Array(-3f, -4f, 0f, 0f)),
      (3L, Array(6f, 8f, 0f, 0f)), (4L, Array(-6f, -8f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.powerIterationPc(e, dims = 4).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, 0.6, 62.5), (2, 0.8, 62.5),
      (3, 0.0, 62.5), (4, 0.0, 62.5)))
  }

  test("pca top-2: deflation finds the orthogonal second direction") {
    import spark.implicits._
    // variance 62.5 along (0.6, 0.8), variance 8 along (-0.8, 0.6):
    // two exactly-known planted directions
    val base = Seq(
      (1L, Array(3f, 4f, 0f, 0f)), (2L, Array(-3f, -4f, 0f, 0f)),
      (3L, Array(6f, 8f, 0f, 0f)), (4L, Array(-6f, -8f, 0f, 0f)),
      (5L, Array(-3.2f, 2.4f, 0f, 0f)), (6L, Array(3.2f, -2.4f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.pcaTop2(base, dims = 4).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val c1 = rows.filter(_._1 == 1)
    val c2 = rows.filter(_._1 == 2)
    assert(c1.map(_._2).toSeq == (1 to 4) && c2.map(_._2).toSeq == (1 to 4))
    val (v1, v2) = (c1.map(_._3), c2.map(_._3))
    val (l1, l2) = (c1.head._4, c2.head._4)
    assert(l1 > l2 && l2 > 0.0)
    // directions recovered up to sign, orthogonal to round-6 tolerance
    assert(math.abs(math.abs(v1(0)) - 0.6) < 1e-3 &&
      math.abs(math.abs(v1(1)) - 0.8) < 1e-3)
    assert(math.abs(math.abs(v2(0)) - 0.8) < 1e-3 &&
      math.abs(math.abs(v2(1)) - 0.6) < 1e-3)
    assert(math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum) < 1e-3)
  }

  test("hard negatives: differently-labeled, rank-contiguous, layout-stable") {
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val out = Similarity.hardNegatives(e)
      .as[(Long, Int, Long, Int, Double, Int)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall { case (_, al, _, nl, _, _) => al != nl })
    val byAnchor = out.groupBy(_._1)
    byAnchor.foreach { case (a, rows) =>
      assert(rows.map(_._6).sorted == (1 to rows.size), s"ranks for $a")
      val cs = rows.sortBy(_._6).map(_._5)
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y }, s"order for $a")
    }
    val re = Similarity.hardNegatives(e.repartition(9))
      .as[(Long, Int, Long, Int, Double, Int)].collect().toSeq
    assert(re == out)
  }

  test("cell prune: keepK most-central per cell, everything else pruned") {
    val rows = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(64)(d => math.sin(i * 64 + d).toFloat), i % 5)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.cellPrune(emb, keepK = 2, nCells = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getString(3)))
    assert(out.map(_._1).toSeq == (0L until 40L).toSeq)   // covers every vector
    out.groupBy(_._2).foreach { case (cell, members) =>
      val kept = members.filter(_._4 == "kept")
      assert(kept.length == math.min(2, members.length), s"cell $cell")
      // every kept row outranks (or ties at round-4 with) every pruned row
      val minKept = kept.map(_._3).min
      val maxPruned = members.filter(_._4 == "pruned")
        .map(_._3).foldLeft(Double.NegativeInfinity)(math.max)
      assert(minKept >= maxPruned - 1e-4, s"cell $cell")
    }
  }

  test("LSH calibration: identical vectors are always caught, counts are exact") {
    // 3 copies of one direction + 3 of an orthogonal one: 6 within-pairs
    // at cosine 1.0 (identical sign buckets in every band -> observed 1.0),
    // 9 cross-pairs at cosine 0.0
    val a = Array.tabulate(64)(d => math.sin(d + 1).toFloat)
    val b = Array.tabulate(64)(d =>
      (if (d % 2 == 0) a(d + 1) else -a(d - 1)))
    val emb = (0 until 3).map(i => (i.toLong, a)) ++
      (3 until 6).map(i => (i.toLong, b))
    val out = Similarity.lshCalibration(emb.toDF("vec_id", "embedding"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val top = out(10)                      // cos 1.0 -> floor(10.0) = 10
    assert(top._1 == 6L && top._2 == 6L && top._3 == 1.0)
    assert(out(0)._1 == 9L)               // orthogonal pairs land in [0, 0.1)
    // theory is monotone in the bucket center
    assert(out(10)._4 >= out(0)._4)
  }

  test("corr matrix: identical +1, negated -1, constant dim NULL, mixed exact") {
    // d1 = d0, d2 = -d0, d3 constant (zero variance -> undefined)
    val e = Seq(
      (0L, Array(1.0f, 1.0f, -1.0f, 5.0f), 0),
      (1L, Array(2.0f, 2.0f, -2.0f, 5.0f), 0),
      (2L, Array(3.0f, 3.0f, -3.0f, 5.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.dimCorrelationMatrix(e, 4)
      .as[(Int, Int, Long, Option[Double])].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ==
      (for (i <- 0 to 3; j <- i to 3) yield (i, j)).toSeq)
    assert(out.forall(_._3 == 3L))
    val m = out.map(r => (r._1, r._2) -> r._4).toMap
    assert(m((0, 0)) == Some(1.0) && m((1, 1)) == Some(1.0))
    assert(m((0, 1)) == Some(1.0))   // identical dims
    assert(m((0, 2)) == Some(-1.0))  // exact negation
    assert(m((1, 2)) == Some(-1.0))
    // zero-variance dim: every pairing (and its own diagonal) is NULL
    assert(Seq((0, 3), (1, 3), (2, 3), (3, 3)).forall(p => m(p).isEmpty))
  }

  test("corr matrix matches a plain-Scala replay on a non-degenerate pair") {
    val e = Seq(
      (0L, Array(1.0f, 5.0f), 0),
      (1L, Array(2.0f, 1.0f), 0),
      (2L, Array(3.0f, 4.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.dimCorrelationMatrix(e, 2)
      .as[(Int, Int, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    val (x, y) = (Seq(1.0, 2.0, 3.0), Seq(5.0, 1.0, 4.0))
    val n = 3.0
    val (sx, sy) = (x.sum, y.sum)
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (x.map(a => a * a).sum, y.map(a => a * a).sum)
    val expect = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(out((0, 1)) ==
      Some(BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("JL norm report: ratios concentrate near 1 on the real corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val r = Similarity.jlNormReport(e)
      .select("ratio").as[Option[Double]].collect().flatten
    assert(r.nonEmpty)
    // k=16 gives sd ~ 1/sqrt(k) = 0.25 per ratio; 4 sigma is generous
    assert(r.forall(x => x > 0.0 && x < 2.0), s"outlier ratio in ${r.min}..${r.max}")
    val mean = r.sum / r.length
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean")
  }

  test("JL distortion: pair count, zero-distance guard, bounded ratios") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.jlDistortion(e, sampleN = 16)
      .as[(Long, Long, Double, Double, Option[Double])].collect()
    assert(out.length == 16 * 15 / 2)
    assert(out.forall { case (a, b, dO, dP, r) =>
      a < b && dO >= 0 && dP >= 0 && r.forall(x => x > 0.0 && x < 2.5) })
    // identical vectors: d_orig = 0 -> NULL ratio, never a throw (the
    // ANSI x/0 trap) and never Infinity
    val dup = Seq((0L, Array.fill(64)(1.0f), 0), (1L, Array.fill(64)(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val d = Similarity.jlDistortion(dup, sampleN = 2)
      .as[(Long, Long, Double, Double, Option[Double])].collect()
    assert(d.length == 1 && d.head._3 == 0.0 && d.head._5.isEmpty)
  }
}
