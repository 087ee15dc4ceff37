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
}
