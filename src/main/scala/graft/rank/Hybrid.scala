package graft.rank

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Hybrid retrieval — reciprocal-rank fusion (Cormack et al., SIGIR'09)
  * of a lexical BM25 arm and a dense cosine arm, the standard RAG
  * serving composition (reference surface: the search entry point,
  * `app/search.sh`, extended the way production retrieval stacks do):
  *
  *   rrf(doc) = Σ_arms 1 / (k + rank_arm(doc)),   k = 60
  *
  * Rank fusion deliberately ignores score SCALES (BM25 sums vs cosine),
  * which is what makes the two arms commensurable without calibration.
  * Ranks are assigned over each arm's ROUNDED scores with a doc-id
  * tie-break, so the fused ordering is deterministic cross-engine.
  *
  * Scale notes (100 TB): each arm is already a top-`armK` result
  * (TakeOrderedAndProject on the corpus side — the corpus is scanned by
  * the arms, never by the fusion); the rank windows and the full-outer
  * fusion join run on ≤ 2·armK rows, so the single-partition windows
  * are bounded by a constant, not the data. */
object Hybrid {
  def rrfSearch(spark: SparkSession, docs: DataFrame, embeddings: DataFrame,
                query: String, queryVecId: Long, armK: Int = 20,
                topK: Int = 10, rrfK: Double = 60.0): DataFrame = {
    val bm = BM25.search(spark, docs, query, topK = armK)
      .withColumn("bm25_rank", row_number()
        .over(Window.orderBy(desc("doc_rank"), asc("doc_id"))))
      .select(col("doc_id"), col("bm25_rank"))
    val ann = Similarity.cosineTopK(embeddings, queryVecId, armK)
      .withColumn("ann_rank", row_number()
        .over(Window.orderBy(desc("cosine"), asc("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("ann_rank"))
    bm.join(ann, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("ann_rank"),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("bm25_rank").cast("double")),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("ann_rank").cast("double")),
            lit(0.0)), 6).as("rrf_score"))
      .orderBy(desc("rrf_score"), asc("doc_id"))
      .limit(topK)
  }
}
