package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of a testdata directory: union `copies` shifted
  * replicas of every fact table, offsetting each KEY DOMAIN by
  * `copy * (max_key + 1)` consistently across primary and foreign sides,
  * so referential structure (and therefore join selectivity per key) is
  * preserved while row counts grow `copies`-fold. Dimension tables
  * (nation, region) stay single-copy — replicated facts keep referencing
  * the original rows, exactly how a bigger TPC-H SF behaves.
  *
  * Purpose: the sf1-scale bench artifact (round-3 verdict item #10) —
  * the per-query time ratio sf1/sf0.1 against a 10x row ratio is the
  * scaling table in BASELINE.md. Text/embedding content is replicated,
  * not re-synthesized, which RAISES duplicate density for the dedup
  * family (every doc gains `copies-1` exact twins) — fine for a scaling
  * probe, stated in the artifact.
  */
object MakeScaled {

  private def maxOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c).cast("long"))).head().getLong(0)

  private def replicate(df: DataFrame, copies: Int,
                        offsets: Map[String, Long],
                        perturbCopy: (DataFrame, Int) => DataFrame =
                          (d, _) => d): DataFrame =
    (0 until copies).map { i =>
      val shifted = offsets.foldLeft(df) { case (d, (c, stride)) =>
        // cast back: the shifted key keeps its source column type
        d.withColumn(c, (col(c) + lit(i * stride)).cast(d.schema(c).dataType))
      }
      if (i == 0) shifted else perturbCopy(shifted, i)
    }.reduce(_.unionByName(_))

  /** Copy-i text rewrite for `uniq` mode: every token gains a _c<i>
    * suffix, so EVERY shingle/minhash/simhash feature of a replica
    * differs from the original — replicas are not near-duplicates of
    * each other, and the duplicate DENSITY of the corpus (the
    * within-copy pair structure) is preserved at every scale. */
  private def uniqText(d: DataFrame, i: Int): DataFrame =
    d.withColumn("text",
      regexp_replace(col("text"), "[a-z0-9_']+", s"$$0_c$i"))

  /** Copy-i embedding rewrite for `uniq` mode: rotate the dimension
    * order by i. A rotated vector's cosine with the original is the
    * near-zero of two unrelated directions, so replicas stop being
    * embedding near-dups while all norms/quantization stats stay
    * identical. */
  private def uniqVec(d: DataFrame, i: Int): DataFrame = {
    val n = 64
    val r = i % n
    d.withColumn("embedding",
      concat(slice(col("embedding"), r + 1, n - r),
        slice(col("embedding"), 1, r)))
  }

  /** In-memory document scale-up — the same replicate + `uniq` rewrite
    * the artifact path writes to parquet, exposed for
    * ScalingInvariantsSpec so the 10x sub-linearity pins need no disk
    * fixture. */
  def scaledDocuments(docs: DataFrame, copies: Int,
                      uniq: Boolean): DataFrame = {
    val stride = maxOf(docs, "doc_id") + 1
    replicate(docs, copies, Map("doc_id" -> stride),
      if (uniq) uniqText else (d, _) => d)
  }

  /** In-memory embeddings scale-up (same contract as `scaledDocuments`)
    * for the ScalingInvariantsSpec sample-bound pins. */
  def scaledEmbeddings(embeddings: DataFrame, copies: Int,
                       uniq: Boolean): DataFrame = {
    val stride = maxOf(embeddings, "vec_id") + 1
    replicate(embeddings, copies, Map("vec_id" -> stride),
      if (uniq) uniqVec else (d, _) => d)
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    // mode `uniq`: perturb replica text/embeddings so copies are NOT
    // near-duplicates — constant duplicate density, the honest fixture
    // for dedup-family scaling (default `dup` replicates verbatim: every
    // doc gains copies-1 exact twins, a dup-density stress test)
    val uniq = args.length > 3 && args(3) == "uniq"
    // optional 5th arg: comma-separated table filter — the 100x probe
    // only needs documents+embeddings, not 60M lineitem rows
    val tableFilter: Option[Set[String]] =
      if (args.length > 4) Some(args(4).split(",").toSet) else None
    val spark = graft.Cli.session()
    // events stores TIMESTAMP(NANOS): read as raw nanos longs and write
    // them back as plain INT64 — graft.table's `ts div 1000` conversion
    // handles both spellings identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def t(n: String) = spark.read.parquet(s"$src/$n.parquet")

    val orderStride = maxOf(t("orders"), "o_orderkey") + 1
    val custStride = maxOf(t("customer"), "c_custkey") + 1
    val suppStride = maxOf(t("supplier"), "s_suppkey") + 1
    val partStride = maxOf(t("part"), "p_partkey") + 1
    val docStride = maxOf(t("documents"), "doc_id") + 1
    val vecStride = maxOf(t("embeddings"), "vec_id") + 1
    val evStride = maxOf(t("events"), "event_id") + 1
    val userStride = maxOf(t("events"), "user_id") + 1

    val plan: Seq[(String, Map[String, Long])] = Seq(
      "customer" -> Map("c_custkey" -> custStride),
      "supplier" -> Map("s_suppkey" -> suppStride),
      "part" -> Map("p_partkey" -> partStride),
      "orders" -> Map("o_orderkey" -> orderStride, "o_custkey" -> custStride),
      "lineitem" -> Map("l_orderkey" -> orderStride,
        "l_partkey" -> partStride, "l_suppkey" -> suppStride),
      "documents" -> Map("doc_id" -> docStride),
      "embeddings" -> Map("vec_id" -> vecStride),
      "events" -> Map("event_id" -> evStride, "user_id" -> userStride),
    )
    plan.filter(p => tableFilter.forall(_.contains(p._1)))
      .foreach { case (name, offsets) =>
        val perturb: (DataFrame, Int) => DataFrame =
          if (uniq && name == "documents") uniqText
          else if (uniq && name == "embeddings") uniqVec
          else (d, _) => d
        replicate(t(name), copies, offsets, perturb)
          .write.mode("overwrite").parquet(s"$out/$name.parquet")
      }
    Seq("nation", "region")
      .filter(n => tableFilter.forall(_.contains(n)))
      .foreach { name =>
        t(name).write.mode("overwrite").parquet(s"$out/$name.parquet")
      }
    println(s"scaled $src x$copies -> $out")
    spark.stop()
  }
}
