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

  test("norm stats per label") {
    val res = Similarity.normStatsByLabel(emb).as[(Int, Long, Double, Double)].collect()
    assert(res.map(_._1).toSeq == Seq(0, 1))
    assert(res.forall(r => r._3 <= r._4 && r._2 == 2L))
  }
}
