package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Vector similarity search over an ARRAY<FLOAT> embedding column
  * (SURVEY.md §7.3 step 4 + north-star LLM-pipeline ops).
  *
  * All arithmetic is double, accumulated left-to-right by `aggregate` over
  * `zip_with` — the same sequential fold the DuckDB oracle performs — so
  * scores agree bit-for-bit before the round(4) safety net.
  *
  * Scale notes (100 TB): brute-force top-k against ONE query is a single
  * scan + TakeOrderedAndProject — embarrassingly parallel, no shuffle. The
  * scale path for all-pairs / many-queries is `lshBucket`: sign-bit
  * random-hyperplane buckets turn O(n^2) into per-bucket joins; hyperplanes
  * are small-integer-deterministic so bucketing reproduces everywhere.
  */
object Similarity {

  /** Native array cast (codegen'd), not `transform(c, _.cast)` — the HOF
    * spelling evaluates interpreted on every embedding row. Values are
    * identical either way (float→double widening is exact). */
  def toDoubleVec(c: Column): Column = c.cast("array<double>")

  /** Dot product via the native codegen expression (graft.functions).
    * Callers that build plans through the DataFrame entry points below get
    * registration for free; identical left-to-right fold order to dotHof
    * and DuckDB's list_dot_product. */
  def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)

  /** Built-in-only fallback form (interpreted HOF) — kept as the semantic
    * reference; FunctionsSpec asserts bit-equality against the native dot. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Pre-normalized vectors via the native graft_unit expression: one norm
    * pass + one divide pass per vector, codegen'd, immune to the
    * CollapseProject trap that re-inlines a projected norm under a
    * transform() lambda (re-evaluating it per element). */
  def withUnitVec(df: DataFrame, vec: String, out: String = "u"): DataFrame = {
    VectorFunctions.ensureRegistered(df.sparkSession)
    df.withColumn(out, VectorFunctions.unit(col(vec)))
  }

  /** Brute-force cosine top-k against one stored vector (the ANN baseline). */
  def cosineTopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("label"),
      toDoubleVec(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === queryVecId).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosine(col("v"), col("qv")), 4).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane coefficient in [-3, 3] from
    * the first 8 md5 hex chars of "plane:dim" (the hex8Int contract) —
    * integer-exact in both engines, and crucially APERIODIC in dim. The
    * original linear-congruential form ((plane*31 + dim*17) % 7 - 3) was
    * periodic in dim with period 7 (17*7 ≡ 0 mod 7), so any input
    * correlated under a dim-shift — e.g. the scale fixture's ROTATED
    * vector copies, or real embeddings with repeating structure — got
    * near-identical sign patterns and collapsed into mega-buckets: the
    * 100x probe measured the banded pair join filling the disk even
    * after the bucket width went adaptive. Hash coefficients make bucket
    * occupancy follow the uniform model the adaptive sizing assumes.
    * Evaluated at PLAN BUILD time only (the coefficients are literals in
    * the expression tree) — zero runtime cost. */
  private def planeCoef(plane: Int, dim: Int): Int =
    graft.functions.LshPlanes.coef(plane, dim)

  /** Target mean bucket occupancy for corpus-adaptive LSH sizing. */
  val LshTargetOccupancy = 32

  /** Corpus-adaptive plane count: the smallest p >= floor with
    * 2^p * targetOcc >= n. Fixed-width sign-LSH is the classic silent
    * scale-killer — with 2^floor buckets, occupancy grows linearly in the
    * corpus and the per-bucket self-join quadratically (the 100x probe
    * measured dedup_embedding_pairs filling the DISK with candidate
    * spill). Growing p logarithmically pins expected occupancy at
    * targetOcc for any corpus size. Pure INTEGER search (no log2 — an
    * ulp at an exact power of two must not let the engines disagree),
    * replayed verbatim by the oracle's np CTE; at the verify SF the
    * floor wins, so small-corpus results are byte-identical to the
    * pinned constants. */
  def adaptivePlanes(n: Long, floor: Int,
                     targetOcc: Int = LshTargetOccupancy): Int =
    (floor to 30).find(p => (1L << p) * targetOcc >= n).getOrElse(30)

  /** Band count scaled with the plane growth: keeps the total plane-bit
    * budget (bands * planes) proportional to the base geometry, so the
    * recall curve degrades gracefully instead of collapsing as p grows.
    * Integer form (baseBands * planes + basePlanes - 1) / basePlanes,
    * replayed verbatim by the oracle's nb CTE. */
  def adaptiveBands(baseBands: Int, basePlanes: Int, planes: Int): Int =
    (baseBands * planes + basePlanes - 1) / basePlanes

  /** Sign-bit LSH bucket id from `nPlanes` integer hyperplanes.
    * `planeOffset` selects an independent plane set (planes
    * planeOffset..planeOffset+nPlanes-1) — the banding dial: band b of a
    * multi-band scheme passes offset b*nPlanes, giving `bands` independent
    * bucketings whose union lifts recall to 1-(1-p)^bands. */
  def lshBucket(vec: Column, dims: Int, nPlanes: Int = 8,
                planeOffset: Int = 0): Column =
    element_at(
      graft.functions.LshFunctions.buckets(vec, dims, nPlanes, 1, planeOffset),
      1)

  /** All `bands` band buckets in one native pass (ARRAY<BIGINT>, element b
    * = the bucket under planes b*nPlanes..(b+1)*nPlanes-1) — the banded
    * pair/contamination hot path. The composed array-of-lshBucket form
    * re-read the vector bands*nPlanes times and blew the codegen method
    * budget at the 100x adaptive geometry (19 bands x 14 planes = 266
    * literal-array dots); see SignLshBucketsExpr. */
  def lshBandBuckets(vec: Column, dims: Int, nPlanes: Int, bands: Int): Column =
    graft.functions.LshFunctions.buckets(vec, dims, nPlanes, bands, 0)

  /** LSH-bucketed approximate NN: candidates share the query's bucket, then
    * exact cosine top-k within. Recall < 1 by construction; at scale this is
    * the path that avoids scanning all n vectors per query. */
  def annCosineLsh(embeddings: DataFrame, queryVecId: Long, k: Int,
                   dims: Int = 64, nPlanes: Int = 8): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("label"),
      toDoubleVec(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dims, nPlanes))
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("v").as("qv"), col("bucket").as("qbucket"))
    e.join(broadcast(q), col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("label"),
        round(cosine(col("v"), col("qv")), 4).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Multi-probe LSH — the standard serving upgrade over the single-bucket
    * probe: also search the neighboring buckets reached by flipping the
    * LOWEST-MARGIN hyperplanes (the planes whose dot with the query is
    * closest to the sign boundary — exactly the bits most likely to have
    * split true neighbors away). Probe order is deterministic: the base
    * bucket, then single-bit flips in ascending |margin| (plane index
    * breaks ties), so both engines enumerate the same `nProbes` buckets.
    *
    * Recall rises without touching the corpus again: the candidate join
    * reads nProbes buckets (~nProbes/2^nPlanes of the collection) instead
    * of re-scanning everything — the index layout is unchanged, only the
    * (tiny) query side fans out. */
  def annCosineLshMultiProbe(embeddings: DataFrame, queryVecId: Long, k: Int,
                             dims: Int = 64, nPlanes: Int = 8,
                             nProbes: Int = 4): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    require(nProbes >= 1 && nProbes <= nPlanes + 1,
      "single-bit probing covers at most nPlanes+1 buckets")
    val e = embeddings.select(col("vec_id"), col("label"),
      toDoubleVec(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dims, nPlanes))
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("v").as("qv"), col("bucket").as("qbucket"))
    // per-plane signed margins of the query (tiny: nPlanes rows)
    val planes = array((0 until nPlanes).map(j =>
      struct(lit(j).as("j"), array((0 until dims).map(d =>
        lit(planeCoef(j, d).toDouble)): _*).as("p"))): _*)
    val flips = q.select(col("qv"), col("qbucket"), explode(planes).as("pl"))
      .select(col("qv"), col("qbucket"), col("pl.j").as("j"),
        abs(dot(col("qv"), col("pl.p"))).as("__m"))
      .orderBy(asc("__m"), asc("j")).limit(nProbes - 1)
      .select(col("qv"), col("qbucket")
        .bitwiseXOR(expr("shiftleft(CAST(1 AS BIGINT), j)")).as("bucket"))
    val probeSet = q.select(col("qv"), col("qbucket").as("bucket"))
      .unionByName(flips)
    e.join(broadcast(probeSet), Seq("bucket"))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("label"),
        round(cosine(col("v"), col("qv")), 4).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** IVF (inverted-file) ANN — the second scale path next to sign-bit LSH:
    * a coarse quantizer of `nCells` sampled centroids partitions the
    * vectors into cells; a query probes only its `nProbe` nearest cells.
    *
    * Centroid choice is the zero-training-budget IVF variant (sampled
    * vectors as centroids, deterministic by seeded md5 order — the same
    * replayable-order trick as Sampling.deterministicSample), so the whole
    * pipeline is a pure function of the data: no RNG, no k-means
    * iterations, reproducible across engines and partition layouts.
    *
    * Scale notes (100 TB): cell assignment is a per-row argmax FOLD over the
    * broadcast centroid array — one corpus scan, zero shuffle, no window
    * (round-2 review: the previous crossJoin + row_number spelling shuffled
    * n×nCells rows to compute an argmax that is local to each row; at
    * nCells=4096 that exchange dominates everything). The per-query probe
    * then touches ~nProbe/nCells of the corpus instead of all of it.
    * `nProbe == nCells` degenerates to exact brute force — SimilaritySpec
    * pins that equality, which anchors the recall semantics to the
    * oracle-checked cosineTopK. PlanSpec pins the no-Window shape.
    */
  /** (vec_id, label, u): unit vectors for the whole collection. */
  private def unitVecs(embeddings: DataFrame): DataFrame =
    withUnitVec(embeddings.select(col("vec_id"), col("label"),
      toDoubleVec(col("embedding")).as("v")), "v")
      .select(col("vec_id"), col("label"), col("u"))

  /** Deterministic sampled centroids as ONE single-row frame holding an
    * array<struct(cell_id, cu)>: nCells vectors in seeded-hash order
    * (TakeOrdered over n, never a global sort), numbered 1..nCells by that
    * order INSIDE one collected array — array_sort on (key, id, vec)
    * structs + transform-with-index replaces the row_number window. */
  private def ivfCells(e: DataFrame, nCells: Int, seed: Long): DataFrame =
    e.withColumn("__ck", md5(concat(col("vec_id").cast("string"), lit(s":$seed"))))
      .orderBy(col("__ck"), col("vec_id")).limit(nCells)
      .agg(array_sort(collect_list(
        struct(col("__ck").as("ck"), col("vec_id").as("cvid"),
          col("u").as("cu")))).as("arr"))
      .select(transform(col("arr"), (c, i) =>
        struct((i + lit(1)).cast("int").as("cell_id"),
          c.getField("cu").as("cu"))).as("cells"))

  /** Assign every vector to its max-cosine cell (unit vecs: cosine == dot):
    * score each cell ONCE via transform (ArrayAggregate evaluates its merge
    * lambda interpreted with no CSE — folding over raw cells would pay each
    * dot twice, in the comparison and in the kept struct), then fold a
    * left-to-right argmax that keeps the FIRST maximum, i.e. the lowest
    * cell_id on ties — the same (dot DESC, cell_id ASC) rank-1 the oracle
    * computes. Shuffle-free: one corpus scan over the broadcast cell array. */
  private def ivfAssign(e: DataFrame, cells: DataFrame): DataFrame = {
    val scored = transform(col("cells"), c =>
      struct(dot(col("u"), c.getField("cu")).as("d"),
        c.getField("cell_id").as("cell_id")))
    val best = aggregate(scored,
      struct(lit(Double.NegativeInfinity).as("d"), lit(0).cast("int").as("cell_id")),
      (acc, c) => when(c.getField("d") > acc.getField("d"), c).otherwise(acc))
    e.crossJoin(broadcast(cells))
      .withColumn("cell_id", best.getField("cell_id"))
      .select(col("vec_id"), col("label"), col("u"), col("cell_id"))
  }

  def annCosineIvf(embeddings: DataFrame, queryVecId: Long, k: Int,
                   nCells: Int = 16, nProbe: Int = 4,
                   seed: Long = 7L): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    require(nProbe >= 1 && nProbe <= nCells)
    val e = unitVecs(embeddings)
    ivfServe(e, ivfCells(e, nCells, seed), queryVecId, k, nProbe)
  }

  /** IVF probe+serve against an arbitrary centroid set (sampled or
    * trained): shared by annCosineIvf and annCosineIvfTrained. */
  private def ivfServe(e: DataFrame, cells: DataFrame, queryVecId: Long,
                       k: Int, nProbe: Int): DataFrame = {
    val assigned = ivfAssign(e, cells)
    // the query's nProbe nearest cells: explode the (tiny) cell array once
    // and TakeOrdered nProbe of it — again no window, no extra shuffle
    val q = e.filter(col("vec_id") === queryVecId).select(col("u").as("qu"))
    val probed = q.crossJoin(broadcast(cells))
      .select(col("qu"), explode(col("cells")).as("c"))
      .select(col("qu"), col("c.cell_id").as("cell_id"),
        dot(col("qu"), col("c.cu")).as("__d"))
      .orderBy(desc("__d"), asc("cell_id")).limit(nProbe)
      .select("cell_id", "qu")
    // exact cosine over candidates in the probed cells only
    assigned.join(broadcast(probed), Seq("cell_id"))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("label"),
        round(dot(col("u"), col("qu")), 4).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Batch ANN — the many-queries serving path (the vector analog of
    * BM25.searchManyStored): every query's bucket is computed once, the
    * whole workload joins the bucketed collection in ONE bucket-equi-join,
    * and per-query top-k falls out of a window over the (small) candidate
    * set. At 100 TB this amortizes the corpus scan across the workload
    * instead of paying one scan per query; the query side is small by
    * nature and broadcasts. Ranking is on the ROUNDED cosine (+ vec_id) so
    * cross-engine tie order is pinned, same as tfIdfTopTerms. */
  def annCosineLshMany(embeddings: DataFrame, queryVecIds: Seq[Long], k: Int,
                       dims: Int = 64, nPlanes: Int = 8): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("label"),
      toDoubleVec(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dims, nPlanes))
    val q = e.filter(col("vec_id").isin(queryVecIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        round(cosine(col("v"), col("qv")), 4).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }

  /** HARD-NEGATIVE MINING — the contrastive-training workload: for every
    * anchor (a deterministic id-mod sample), the k most-similar vectors
    * with a DIFFERENT label. "Similar but differently labeled" is exactly
    * what a contrastive/retrieval loss needs as negatives; random
    * negatives are too easy and same-label neighbors are positives.
    * Candidates come from the anchor's LSH bucket (the approximate form
    * real pipelines run — mining against the full corpus per anchor is
    * the brute path this engine reserves for recall evaluation), so the
    * whole anchor workload is ONE bucket-equi-join over the corpus scan,
    * the annCosineLshMany shape with a label-mismatch predicate.
    *
    * Scale notes (100 TB): corpus bucketed in the scan projection,
    * anchors (1/anchorMod of the corpus) broadcast; per-task work is
    * bucket-bounded, and the per-anchor argmax window only sees
    * surviving candidate rows. */
  def hardNegatives(embeddings: DataFrame, k: Int = 3, anchorMod: Long = 37,
                    dims: Int = 64, nPlanes: Int = 8): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("label"),
      toDoubleVec(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), dims, nPlanes))
    val anchors = e.filter(col("vec_id") % anchorMod === 0)
      .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"),
        col("v").as("av"), col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor_id").orderBy(desc("cosine"), asc("negative_id"))
    e.join(broadcast(anchors), Seq("bucket"))
      .filter(col("label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("anchor_label"),
        col("vec_id").as("negative_id"), col("label").as("negative_label"),
        round(cosine(col("v"), col("av")), 4).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .orderBy("anchor_id", "rank")
  }

  /** Batch IVF serving — the many-queries form of annCosineIvf, symmetric
    * to annCosineLshMany: the corpus is assigned to cells ONCE (the same
    * shuffle-free broadcast-fold scan), every query's nProbe cells come
    * from a window over the tiny (queries × nCells) probe frame, and the
    * whole workload joins the assigned corpus in ONE cell-equi-join with
    * the broadcast probe set. At 100 TB each query's candidates are its
    * probed cells' population (~nProbe/nCells of the corpus), and the
    * corpus is scanned once for the workload, not once per query. */
  def annCosineIvfMany(embeddings: DataFrame, queryVecIds: Seq[Long], k: Int,
                       nCells: Int = 16, nProbe: Int = 4,
                       seed: Long = 7L): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    require(nProbe >= 1 && nProbe <= nCells)
    val e = unitVecs(embeddings)
    val cells = ivfCells(e, nCells, seed)
    val assigned = ivfAssign(e, cells)
    val q = e.filter(col("vec_id").isin(queryVecIds: _*))
      .select(col("vec_id").as("query_id"), col("u").as("qu"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("__d"), asc("cell_id"))
    val probed = q.crossJoin(broadcast(cells))
      .select(col("query_id"), col("qu"), explode(col("cells")).as("c"))
      .select(col("query_id"), col("qu"), col("c.cell_id").as("cell_id"),
        dot(col("qu"), col("c.cu")).as("__d"))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nProbe)
      .select("query_id", "cell_id", "qu")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    assigned.join(broadcast(probed), Seq("cell_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        round(dot(col("u"), col("qu")), 4).as("cosine"))
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= k)
      .orderBy("query_id", "rn")
  }

  /** ANN quality evaluation: recall@k of the sign-bit LSH index against
    * exact brute-force top-k, per query. This is the operator that decides
    * whether an index's bucket geometry is good enough to ship — recall is
    * measured, not assumed.
    *
    * Scale shape: the brute side is ONE corpus scan with the (small,
    * broadcast) query set — a per-(query, vector) score + per-query top-k
    * window over rounded scores — and the ANN side is the bucketed join
    * above; both avoid any corpus self-join. Ties at the k-th rounded score
    * resolve by vec_id on both sides identically, so recall is exact and
    * engine-portable. */
  def annRecallAtK(embeddings: DataFrame, queryVecIds: Seq[Long], k: Int,
                   dims: Int = 64, nPlanes: Int = 8): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("label"),
      toDoubleVec(col("embedding")).as("v"))
    val q = e.filter(col("vec_id").isin(queryVecIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    val brute = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("v"), col("qv")), 4).as("cosine"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "vec_id")
    val approx = annCosineLshMany(embeddings, queryVecIds, k, dims, nPlanes)
      .select("query_id", "vec_id")
    brute.join(approx.withColumn("__hit", lit(1)),
        Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k_eff"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hits"))
      .select(col("query_id"), col("k_eff"), col("n_hits"),
        round(col("n_hits").cast("double") / col("k_eff"), 4).as("recall"))
      .orderBy("query_id")
  }

  /** One Lloyd's k-means iteration over the IVF assignment — the
    * distributed-ML primitive behind a trained coarse quantizer (the
    * sampled-centroid IVF above is iteration 0; run this step to refine).
    * Returns per-cell population and the new centroid summarized as its
    * first `reportDims` coordinates (the full centroid array stays an
    * internal detail — wide float arrays aren't a result-table shape).
    *
    * Scale shape: assignment is the shuffle-free broadcast-fold scan
    * (ivfAssign); the reported centroid coordinates are ONE partial+final
    * aggregation of `reportDims` scalar columns, so the exchange carries
    * exactly nCells × reportDims partial sums — never the n×dims row blowup
    * a posexplode-then-aggregate spelling would shuffle. */
  def kmeansStep(embeddings: DataFrame, nCells: Int = 16, seed: Long = 7L,
                 reportDims: Int = 4): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val e = unitVecs(embeddings)
    val cells = ivfCells(e, nCells, seed)
    val assigned = ivfAssign(e, cells)
    val dims = (0 until reportDims).map(d =>
      round(avg(element_at(col("u"), d + 1)), 6).as(s"c$d"))
    val aggs = count(lit(1)).as("n_vecs") +: dims
    assigned.groupBy("cell_id")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("cell_id")
  }

  /** Full Lloyd's convergence loop (spherical k-means over unit vectors):
    * sampled centroids (ivfCells = iteration 0), then repeat
    * assign → per-cell mean → re-unitize, up to `iters` rounds or until
    * the worst per-centroid movement (1 - cos(old, new)) drops below
    * `eps`. Returns (cell_id, cu, n_vecs): the trained centroids plus the
    * population of the final assignment.
    *
    * Cross-engine determinism (the oracle replays fixed iterations in
    * SQL): per-dimension sums accumulate as DECIMAL(28,18) — exact and
    * summation-order-independent, so the new centroid is a pure function
    * of the SET of members, not of partition layout — and the re-unitize
    * is the same x/sqrt(dot) expression tree as the oracle's. Empty cells
    * keep their previous centroid.
    *
    * Scale shape: each round is one broadcast-fold corpus scan (ivfAssign,
    * zero shuffle) plus one partial+final aggregate whose exchange carries
    * nCells × dims decimal partials. The tiny per-round centroid frame is
    * eagerly localCheckpoint'ed, truncating lineage the same way
    * Dedup.duplicateClusters does — without it, round t's plan would
    * re-derive rounds 1..t-1 and the optimizer would choke by round ~5.
    * The eps test reads a 1-row aggregate per round (driver-side by
    * nature: it is the loop condition, not a data path). */
  def kmeansFit(embeddings: DataFrame, nCells: Int = 16, iters: Int = 3,
                seed: Long = 7L, dims: Int = 64,
                eps: Double = 0.0): DataFrame =
    // Round-9 (the centeredFrame discipline, guide §1.2/§5): the unit
    // vectors are materialized ONCE — every Lloyd round (plus the seed
    // scan) previously re-read the parquet and re-evaluated the
    // interpreted unitize lambda per row. n·d doubles, one input pass in
    // bytes; decimal per-dim sums keep the trained centroids
    // bit-identical to the lazy spelling.
    kmeansFitFromUnit(unitVecs(embeddings).localCheckpoint(true),
      nCells, iters, seed, dims, eps)

  /** kmeansFit over an ALREADY-MATERIALIZED unit-vector frame — the
    * entry point for the trained-partition consumers (cellPrune,
    * semanticDedupPairs, annCosineIvfPq/Trained), which need the same
    * frame again for their own final assignment/serve scan: sharing one
    * checkpoint removes a whole redundant parquet read + interpreted
    * unitize pass per query (round-9, guide §1.2 step 1). Callers MUST
    * pass unitVecs output (or its checkpoint) — values are identical
    * either way, materialization only changes where the bytes live. */
  private[graft] def kmeansFitFromUnit(e: DataFrame, nCells: Int = 16,
                                       iters: Int = 3, seed: Long = 7L,
                                       dims: Int = 64,
                                       eps: Double = 0.0): DataFrame = {
    VectorFunctions.ensureRegistered(e.sparkSession)
    require(iters >= 1 && nCells >= 1)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 18)
    var cells = ivfCells(e, nCells, seed).localCheckpoint(true)
    var perCell: DataFrame = null
    var it = 0
    var moved = Double.MaxValue
    while (it < iters && moved > eps) {
      val assigned = ivfAssign(e, cells)
      val sumCols = (1 to dims).map(d =>
        sum(element_at(col("u"), d).cast(dec)).as(s"__s$d"))
      val sums = assigned.groupBy("cell_id")
        .agg(count(lit(1)).as("n_vecs"), sumCols: _*)
      val mArr = array((1 to dims).map(d => col(s"__s$d").cast("double")): _*)
      val upd = sums.select(col("cell_id"),
        VectorFunctions.unit(mArr).as("new_cu"), col("n_vecs"))
      val prev = cells.select(explode(col("cells")).as("c"))
        .select(col("c.cell_id").as("cell_id"), col("c.cu").as("prev_cu"))
      val merged = prev.join(upd, Seq("cell_id"), "left")
        .select(col("cell_id"),
          coalesce(col("new_cu"), col("prev_cu")).as("cu"),
          col("prev_cu"),
          coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
        .localCheckpoint(true)
      moved = merged
        .agg(max(lit(1.0) - dot(col("cu"), col("prev_cu"))).as("m"))
        .head().getDouble(0)
      perCell = merged.drop("prev_cu")
      cells = merged
        .agg(array_sort(collect_list(struct(col("cell_id"), col("cu"))))
          .as("cells"))
        .localCheckpoint(true)
      it += 1
    }
    perCell
  }

  /** Oracle-shaped fit report: per-cell population of the final
    * assignment + the first `reportDims` trained-centroid coordinates.
    * Fixed `iters`, no eps stop — the SQL oracle replays the same number
    * of Lloyd rounds CTE-by-CTE. */
  def kmeansFitReport(embeddings: DataFrame, nCells: Int = 16,
                      iters: Int = 3, seed: Long = 7L, dims: Int = 64,
                      reportDims: Int = 4): DataFrame = {
    val fit = kmeansFit(embeddings, nCells, iters, seed, dims)
    val coords = (0 until reportDims).map(d =>
      round(element_at(col("cu"), d + 1), 6).as(s"c$d"))
    fit.select(Seq(col("cell_id"), col("n_vecs")) ++ coords: _*)
      .orderBy("cell_id")
  }

  /** IVF served from TRAINED centroids — the kmeansFit loop feeding the
    * coarse quantizer (the production IVF; sampled-centroid annCosineIvf
    * is iteration 0 of this). Same probe/serve plan, better-placed cells. */
  def annCosineIvfTrained(embeddings: DataFrame, queryVecId: Long, k: Int,
                          nCells: Int = 16, nProbe: Int = 4,
                          iters: Int = 3, seed: Long = 7L,
                          dims: Int = 64): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells)
    // one checkpointed unit-vec frame shared by the fit loop AND the
    // serve scan (round-9 — the lazy `e` re-read parquet + re-unitized)
    val e = unitVecs(embeddings).localCheckpoint(true)
    val cells = kmeansFitFromUnit(e, nCells, iters, seed, dims)
      .agg(array_sort(collect_list(struct(col("cell_id"), col("cu"))))
        .as("cells"))
    ivfServe(e, cells, queryVecId, k, nProbe)
  }

  /** SEMANTIC near-dup pairs (the dedup-family member the trained
    * partition buys): vectors sharing a trained k-means cell whose cosine
    * clears the threshold. Where the sign-LSH pair generator
    * (`Dedup.embeddingNearDupPairs`) buckets by random hyperplanes,
    * this buckets by the LEARNED partition — cells follow the data's
    * actual density, so near-dup pairs co-locate with far fewer
    * band/bucket misses at the same candidate volume. Plan: the
    * shuffle-free broadcast-fold assignment, then ONE equi-join on
    * cell_id with vec_a < vec_b — candidate generation is bounded per
    * cell, never all-pairs. At 100 TB the dials are nCells (grow with
    * corpus as for IVF, keeping cell populations bounded) and AQE skew
    * split for any over-dense cell — the join is a plain equi-join, so
    * the skew machinery applies as-is. Cosine is compared UNROUNDED and
    * surfaced rounded, like every pair generator here. */
  def semanticDedupPairs(embeddings: DataFrame, threshold: Double = 0.4,
                         nCells: Int = 16, iters: Int = 3, seed: Long = 7L,
                         dims: Int = 64): DataFrame = {
    // one checkpointed unit-vec frame shared by the fit loop AND the
    // pair-generation assignment (round-9, the cellPrune rework)
    val e = unitVecs(embeddings).localCheckpoint(true)
    val cells = kmeansFitFromUnit(e, nCells, iters, seed, dims)
      .agg(array_sort(collect_list(struct(col("cell_id"), col("cu"))))
        .as("cells"))
    val assigned = ivfAssign(e, cells).select("vec_id", "u", "cell_id")
    val left = assigned.select(col("cell_id"), col("vec_id").as("vec_a"),
      col("u").as("__ua"))
    val right = assigned.select(col("cell_id"), col("vec_id").as("vec_b"),
      col("u").as("__ub"))
    left.join(right, Seq("cell_id"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("__cos", dot(col("__ua"), col("__ub")))
      .filter(col("__cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("__cos"), 4).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** Prototype selection per trained cell (the SemDeDup-family pruning
    * pass, Abbas'23: semantic redundancy is removed cell-by-cell): every
    * vector is assigned to its trained k-means cell and ranked by cosine
    * to the cell centroid; the `keepK` most prototypical stay, the rest
    * are marked pruned. Ranking DESC keeps prototypes (the dedup-
    * leaning dial); ASC would keep the diverse tail — one sort-order
    * constant apart, same plan.
    *
    * Scale notes (100 TB): assignment is the shuffle-free broadcast-fold
    * argmax; the centroid re-join is an nCells-row broadcast; the only
    * exchange is the per-cell rank window, whose partitions are bounded
    * by nCells sizing (grow nCells with the corpus, the IVF argument) —
    * an over-dense cell is a plain skewed window partition, visible and
    * salvageable, never a pair explosion. */
  def cellPrune(embeddings: DataFrame, keepK: Int = 20, nCells: Int = 16,
                iters: Int = 3, seed: Long = 7L, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    // one checkpointed unit-vec frame shared by the fit loop AND the
    // final assignment scan (round-9: the lazy `e` re-read parquet +
    // re-evaluated the interpreted unitize lambda a second time)
    val e = unitVecs(embeddings).localCheckpoint(true)
    val fit = kmeansFitFromUnit(e, nCells, iters, seed, dims)
      .localCheckpoint(true)
    val cells = fit
      .agg(array_sort(collect_list(struct(col("cell_id"), col("cu"))))
        .as("cells"))
    val win = Window.partitionBy("cell_id")
      .orderBy(desc("__cos"), asc("vec_id"))
    ivfAssign(e, cells)
      .join(broadcast(fit.select(col("cell_id"), col("cu"))), Seq("cell_id"))
      .withColumn("__cos", dot(col("u"), col("cu")))
      .withColumn("__rk", row_number().over(win))
      .select(col("vec_id"), col("cell_id"),
        round(col("__cos"), 4).as("centroid_cos"),
        when(col("__rk") <= keepK, "kept").otherwise("pruned").as("verdict"))
      .orderBy("vec_id")
  }

  /** LSH banding-curve calibration — the tuning report for every banded
    * sign-LSH consumer here (embedding near-dup, the contamination gate):
    * per cosine bucket, the observed fraction of pairs the banded buckets
    * catch vs the theoretical 1-(1-p^r)^b at the bucket center
    * (p = 1 - θ/π per plane). This is an EVALUATION operator: the brute
    * pairs arm is the definition of ground truth, same standing as
    * annRecallAtK's exact arm — the declared near-dup queries never pay
    * it. acos/pow carry 1-ulp engine noise; round(4) absorbs it (the
    * bigramLm ln precedent).
    *
    * The brute arm is bounded by a deterministic seeded sample of
    * `sampleN` vectors (md5 order — the `deterministicSample` contract),
    * so its cost is a CONSTANT ~sampleN²/2 pairs at any corpus size
    * rather than O(n²) (round-5 verdict item #1: at sf1 the full
    * cartesian was 203.7M shuffle rows / 45% of the 10x sweep). The
    * observed-vs-theory curve over a uniform few-thousand-vector sample
    * is statistically the same curve. Whether a pair is caught depends
    * only on the two vectors' own band buckets — not on the rest of the
    * corpus — so banding restricted to the sample gives bit-identical
    * catch verdicts for every sampled pair. */
  def lshCalibration(embeddings: DataFrame, dims: Int = 64,
                     nPlanes: Int = 8, bands: Int = 4,
                     sampleN: Int = 2048, seed: Long = 42L): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val sampled = embeddings
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("__sk", graft.sources.Sampling.sampleKey(col("vec_id"), seed))
      .orderBy(col("__sk"), col("vec_id")).limit(sampleN)
      .select("vec_id", "v")
    val e = withUnitVec(sampled, "v")
      .select(col("vec_id"), col("v"), col("u"))
      .localCheckpoint()
    val banded = e.select(col("vec_id"), posexplode(
      lshBandBuckets(col("v"), dims, nPlanes, bands))
      .as(Seq("band", "bucket")))
    val caught = banded.select(col("vec_id").as("vec_a"), col("band"), col("bucket"))
      .join(banded.select(col("vec_id").as("vec_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
      .withColumn("__hit", lit(1L))
    val pairs = e.select(col("vec_id").as("vec_a"), col("u").as("__ua"))
      .crossJoin(broadcast(e.select(col("vec_id").as("vec_b"), col("u").as("__ub"))))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        dot(col("__ua"), col("__ub")).as("__cos"))
    // clamp the bucket center into acos's domain: bucket 10 (exact dups)
    // has center 1.05, which must read as angle 0, not NaN
    val mid = least(greatest(
      (col("cos_bucket").cast("double") + 0.5) / 10.0, lit(-1.0)), lit(1.0))
    val pBand = pow(lit(1.0) - acos(mid) / lit(math.Pi), nPlanes)
    pairs.join(caught, Seq("vec_a", "vec_b"), "left")
      .withColumn("cos_bucket", floor(col("__cos") * 10).cast("int"))
      .groupBy("cos_bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_caught"))
      .select(col("cos_bucket"), col("n_pairs"), col("n_caught"),
        round(col("n_caught").cast("double") / col("n_pairs"), 4)
          .as("observed"),
        round(lit(1.0) - pow(lit(1.0) - pBand, bands), 4).as("theoretical"))
      .orderBy("cos_bucket")
  }

  /** Int8 scalar quantization fidelity report: each vector is symmetrically
    * quantized to [-127, 127] (per-vector scale = 127 / max |x|, round-half-up
    * via floor(x*s + 0.5) — spelled identically in the oracle so the
    * midpoint rule can't diverge), dequantized, and scored by reconstruction
    * MSE. Per label: vector count, exact-decimal-averaged MSE, max MSE.
    *
    * This is the storage-shrink dial for a 100 TB embedding corpus (4x
    * smaller + SIMD-friendly); the report is how you decide whether int8 is
    * safe for a given collection. Single scan, no shuffle before the tiny
    * per-label aggregate; MSE per row is dot(err, err)/dim — the same
    * bit-exact sequential fold as every other vector op here. The per-row
    * work is packed through a 1-element struct array so `maxAbs` is
    * evaluated once per ROW — a bare column reference would be re-inlined
    * under the transform lambda by CollapseProject and recomputed per
    * ELEMENT (the withUnitVec trap). */
  def quantizeErrorByLabel(embeddings: DataFrame): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val e = toDoubleVec(col("embedding"))
    val maxAbs = array_max(transform(e, x => abs(x)))
    val mseArr = transform(array(struct(maxAbs.as("ma"), e.as("e"))), s => {
      val ma = s.getField("ma")
      val ev = s.getField("e")
      val scale = lit(127.0) / ma
      val err = transform(ev, x =>
        x - least(greatest(floor(x * scale + lit(0.5)), lit(-127.0)), lit(127.0)) / scale)
      // second 1-element fold: `dot(err, err)` would inline (and so
      // re-quantize) the err array once per argument — bind it once
      val mse = element_at(transform(array(err), er => dot(er, er) / size(er)), 1)
      when(ma === 0, lit(0.0)).otherwise(mse)
    })
    embeddings
      .select(col("label"), element_at(mseArr, 1).as("mse"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("mse").cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(18, 12))).cast("double") / count(lit(1)), 8)
          .as("avg_mse"),
        round(max(col("mse")), 8).as("max_mse"))
      .orderBy("label")
  }

  /** Product-quantization fidelity report — the codebook sibling of the
    * int8 report (`quantizeErrorByLabel`): each vector is encoded as
    * nSub codebook indices (nSub·log2(nCodes) bits, here 8×4 = 4 bytes
    * per 256-byte vector, a 64x shrink vs float32) and scored by
    * reconstruction MSE per label. Codebooks are the seeded-hash sample
    * (the ivfCells discipline — deterministic, no training iterations,
    * so the whole report stays oracle-expressible); each subspace's
    * codeword is the sample's slice. The squared reconstruction error
    * IS the sum of per-subspace best distances, so encoding never
    * materializes: per row, a transform over subspaces folds an
    * array_min over the broadcast codebook — one corpus scan, no
    * shuffle before the tiny per-label aggregate, all sequential-fold
    * double arithmetic (dot ≡ list_dot_product parity). */
  def pqErrorByLabel(embeddings: DataFrame, nSub: Int = 8,
                     nCodes: Int = 16, seed: Long = 7L,
                     dims: Int = 64): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    require(dims % nSub == 0)
    val e = embeddings.select(col("vec_id"), col("label"),
      toDoubleVec(col("embedding")).as("v"))
    val book = e
      .withColumn("__ck", md5(concat(col("vec_id").cast("string"), lit(s":$seed"))))
      .orderBy(col("__ck"), col("vec_id")).limit(nCodes)
      .agg(array_sort(collect_list(struct(col("__ck").as("ck"),
        col("vec_id").as("cvid"), col("v").as("cv")))).as("arr"))
      .select(transform(col("arr"), c => c.getField("cv")).as("codes"))
    // native kernel: same ascending-subspace sum of ascending-dim min
    // distances the HOF spelling folded, in one codegen loop (the HOF
    // form allocated nSub*nCodes temporaries per row, interpreted)
    e.crossJoin(broadcast(book))
      .select(col("label"),
        (graft.functions.PqFunctions.minDist(col("v"), col("codes"), nSub)
          / dims).as("mse"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("mse").cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(18, 12))).cast("double") / count(lit(1)), 8)
          .as("avg_mse"),
        round(max(col("mse")), 8).as("max_mse"))
      .orderBy("label")
  }

  /** PQ-served ANN (asymmetric distance): top-k by the dot of the query
    * against each vector's PQ RECONSTRUCTION — the serving path the
    * codebook buys, where the corpus is 4 bytes/vector and only the
    * query side stays full-precision. Codebooks are the same seeded
    * sample as `pqErrorByLabel` but over UNIT vectors (cosine == dot);
    * per row, each subspace folds a keep-first argmin over the broadcast
    * codebook (ties -> lowest code index, same rank-1 the oracle
    * computes) and contributes one q·codeword partial; the score sums
    * the 8 partials in subspace order, matching the oracle's ordered
    * list_sum association exactly. One corpus scan, no shuffle, then
    * TakeOrderedAndProject on the rounded score. */
  def annCosinePq(embeddings: DataFrame, queryVecId: Long, k: Int,
                  nSub: Int = 8, nCodes: Int = 16, seed: Long = 7L,
                  dims: Int = 64): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    require(dims % nSub == 0)
    val e = unitVecs(embeddings)
    val book = e
      .withColumn("__ck", md5(concat(col("vec_id").cast("string"), lit(s":$seed"))))
      .orderBy(col("__ck"), col("vec_id")).limit(nCodes)
      .agg(array_sort(collect_list(struct(col("__ck").as("ck"),
        col("vec_id").as("cvid"), col("u").as("cu")))).as("arr"))
      .select(transform(col("arr"), c => c.getField("cu")).as("codes"))
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("u").as("qu"))
    // native asymmetric-distance kernel: per ascending subspace, strict-<
    // argmin over the codewords (keep-FIRST on ties, the aggregate fold's
    // semantics) then q_sub · codeword — bit-identical to the HOF form
    e.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(book)).crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(graft.functions.PqFunctions.score(
          col("qu"), col("u"), col("codes"), nSub), 4)
          .as("approx_cosine"))
      .orderBy(desc("approx_cosine"), asc("vec_id"))
      .limit(k)
  }

  /** IVF-PQ composed index (round-5 verdict item #4): the trained
    * k-means cells (`kmeansFit`) become the coarse quantizer and PQ
    * encodes the RESIDUAL u - centroid — the composition production ANN
    * systems ship, because residuals are small and centered so the
    * shared codebook spends its codes on fine structure instead of
    * re-describing cell placement. Serving is cell-prune + asymmetric
    * distance: probe the nProbe nearest trained cells, then score only
    * their members by q·centroid + Σ_s q_sub·codeword(argmin ||r_sub -
    * cw_sub||²).
    *
    * Plan shape: the kmeans loop is the bounded kmeansFit iteration;
    * after it, ONE corpus scan assigns cells (broadcast-fold argmax, no
    * shuffle), and serving joins the corpus against three broadcast
    * singletons (probe list, codebook, query) — the only exchange is the
    * final TakeOrderedAndProject. At 100 TB the residual encode is where
    * the corpus would be written once as (cell_id, codes) — 8 bytes a
    * vector — and serving reads ~nProbe/nCells of it.
    *
    * Determinism: trained cells are bit-reproducible (kmeansFit), the
    * residual codebook is the same seeded-md5 sample as annCosinePq, the
    * per-subspace argmin keeps the first (lowest-index) code on ties,
    * and the final rank is on the ROUNDED score + vec_id. The residual
    * is bound ONCE per row through the 1-element-array trick (a bare
    * zip_with referenced inside the code-scoring lambdas would be
    * re-inlined per code by CollapseProject — the withUnitVec trap). */
  def annCosineIvfPq(embeddings: DataFrame, queryVecId: Long, k: Int,
                     nCells: Int = 16, nProbe: Int = 4, iters: Int = 3,
                     seed: Long = 7L, nSub: Int = 8, nCodes: Int = 16,
                     dims: Int = 64): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    require(dims % nSub == 0 && nProbe >= 1 && nProbe <= nCells)
    // one checkpointed unit-vec frame shared by the fit loop, the
    // codebook sample, the query row, and the serve scan (round-9: the
    // lazy `e` re-read parquet + re-unitized for each of them)
    val e = unitVecs(embeddings).localCheckpoint(true)
    val fit = kmeansFitFromUnit(e, nCells, iters, seed, dims)
    val cells = fit
      .agg(array_sort(collect_list(struct(col("cell_id"), col("cu"))))
        .as("cells"))
    val withCu = ivfAssign(e, cells)
      .join(broadcast(fit.select("cell_id", "cu")), Seq("cell_id"))
    val resid = withCu
      .withColumn("r", zip_with(col("u"), col("cu"), (a, b) => a - b))
    val book = resid
      .withColumn("__ck", md5(concat(col("vec_id").cast("string"), lit(s":$seed"))))
      .orderBy(col("__ck"), col("vec_id")).limit(nCodes)
      .agg(array_sort(collect_list(struct(col("__ck").as("ck"),
        col("vec_id").as("cvid"), col("r").as("cr")))).as("arr"))
      .select(transform(col("arr"), c => c.getField("cr")).as("codes"))
    val q = e.filter(col("vec_id") === queryVecId).select(col("u").as("qu"))
    val probed = q.crossJoin(broadcast(cells))
      .select(col("qu"), explode(col("cells")).as("c"))
      .select(col("qu"), col("c.cell_id").as("cell_id"),
        dot(col("qu"), col("c.cu")).as("qc"))
      .orderBy(desc("qc"), asc("cell_id")).limit(nProbe)
      .select(col("cell_id"), col("qu"), col("qc"))
    // native kernel over the residual (computed once per row — the
    // 1-element-array CollapseProject guard is obsolete: the kernel is
    // one scalar expression, so the residual is evaluated exactly once
    // inside it even if inlined)
    val score = col("qc") + graft.functions.PqFunctions.score(
      col("qu"), zip_with(col("u"), col("cu"), (a, b) => a - b),
      col("codes"), nSub)
    withCu.join(broadcast(probed), Seq("cell_id"))
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(book))
      .select(col("vec_id"), col("label"),
        round(score, 4).as("approx_cosine"))
      .orderBy(desc("approx_cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Per-label centroid + pairwise centroid cosine — the embedding-level
    * corpus-mix probe: how close are two sources/clusters in embedding
    * space (merge candidates, drift between snapshots, mixture design).
    *
    * Determinism follows the kmeansFit discipline: per-dimension sums
    * accumulate as DECIMAL(28,18) (exact, order-independent), the
    * centroid coordinate rounds once at 6 decimals, and the pair cosine
    * is the fixed graft_dot fold over those rounded coordinates — so the
    * result is a pure function of the SET of vectors per label.
    *
    * Scale shape: ONE partial+final aggregate whose exchange carries
    * labels × dims decimal partials; the pair join is over the
    * labels-sized centroid frame (broadcast, k^2/2 rows) — corpus size
    * only ever appears in the first scan. */
  def labelCentroidSimilarity(embeddings: DataFrame, dims: Int = 64): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 18)
    val sums = (1 to dims).map(d =>
      sum(element_at(col("embedding"), d).cast(dec)).as(s"s$d"))
    val per = embeddings.groupBy("label")
      .agg(count(lit(1)).as("n"), sums: _*)
    val cArr = array((1 to dims).map(d =>
      round((col(s"s$d") / col("n")).cast("double"), 6)): _*)
    val cents = per.select(col("label"), col("n"), cArr.as("c"))
    val a = cents.select(col("label").as("label_a"), col("n").as("n_a"),
      col("c").as("ca"))
    val b = cents.select(col("label").as("label_b"), col("n").as("n_b"),
      col("c").as("cb"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(VectorFunctions.dot(col("ca"), col("cb")) /
          sqrt(VectorFunctions.dot(col("ca"), col("ca")) *
            VectorFunctions.dot(col("cb"), col("cb"))), 4).as("cosine"))
      .orderBy("label_a", "label_b")
  }

  /** nDCG@k of the IVF approximate ranking against the exact brute-force
    * ranking — the RANK-AWARE index-quality metric (annRecallAtK is the
    * set-overlap one): a miss at position 1 must cost more than a miss at
    * position k. Graded relevance comes from the exact arm itself,
    * rel(doc) = k+1 − exact_rank (0 outside the exact top-k), so the
    * evaluation needs no external labels:
    *
    *   DCG  = Σ_p rel(doc at approx position p) / (ln(p+1)/ln 2)
    *   nDCG = DCG / IDCG   (IDCG = the exact arm scored against itself)
    *
    * The log2 discount is spelled ln(x)/ln(2) on BOTH engines — native
    * log2 differs from the ln quotient by an ulp on exact powers of two,
    * the one avoidable cross-engine divergence here. Ranks order by
    * ROUNDED cosine with vec_id tie-break, the established determinism
    * anchor of both arms.
    *
    * Scale notes (100 TB): both arms are top-k results (the corpus is
    * scanned by the arms, never by the evaluation); ranking windows and
    * the DCG sums run on ≤ k rows. */
  def ndcgEval(embeddings: DataFrame, queryVecId: Long = 0L,
               k: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    VectorFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.expressions.Window
    val exact = cosineTopK(embeddings, queryVecId, k)
      .withColumn("rank_exact", row_number()
        .over(Window.orderBy(desc("cosine"), asc("vec_id"))))
      .select(col("vec_id"), col("rank_exact"))
    val approx = annCosineIvf(embeddings, queryVecId, k)
      .withColumn("pos", row_number()
        .over(Window.orderBy(desc("cosine"), asc("vec_id"))))
      .select(col("vec_id"), col("pos"))
    val ln2 = log(lit(2.0))
    val dcg = approx.join(exact, Seq("vec_id"), "left")
      .agg(sum(coalesce(lit(k + 1) - col("rank_exact"), lit(0))
        .cast("double") / (log(col("pos").cast("double") + lit(1.0)) / ln2))
        .as("dcg"))
    val idcg = exact
      .agg(sum((lit(k + 1) - col("rank_exact")).cast("double") /
        (log(col("rank_exact").cast("double") + lit(1.0)) / ln2))
        .as("idcg"))
    dcg.crossJoin(idcg)
      .select(lit(k).as("k"), round(col("dcg"), 4).as("dcg"),
        round(col("idcg"), 4).as("idcg"),
        round(col("dcg") / col("idcg"), 4).as("ndcg"))
  }

  /** PSI (population stability index) drift report between two embedding
    * slices — THE production ML monitoring metric for "has the embedding
    * distribution moved since the index/model was built":
    *
    *   PSI = Σ_buckets (p_base − p_cur) · ln(p_base / p_cur)
    *
    * over `nBuckets` equal-width bins of the vector NORM, bounds taken
    * from the baseline slice (the deployed reference), out-of-range
    * current vectors clamped to the edge bins, add-one smoothing so
    * empty bins stay finite (PSI > 0.2 is the conventional "retrain"
    * alarm). Norms are rounded to 6 BEFORE bucketing — floor() at a bin
    * boundary must not flip on a 1-ulp sqrt difference between engines.
    *
    * Scale notes (100 TB): one scan computes every norm; bucket counts
    * are a `nBuckets`-row partial+final aggregate per slice; the bin
    * spine, bounds, and totals are broadcast 1-row/`nBuckets`-row sides.
    * Nothing joins at corpus cardinality. */
  def psiDrift(embeddings: DataFrame, baselineMaxLabel: Int = 4,
               nBuckets: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    VectorFunctions.ensureRegistered(spark)
    // one corpus scan computes every norm; the (label, norm) frame is two
    // narrow columns, so it checkpoints once and the four consumers below
    // (bounds, two bucket counts, totals) never re-read the embeddings
    val e = embeddings.select(col("label"),
      round(l2Norm(toDoubleVec(col("embedding"))), 6).as("norm"))
      .localCheckpoint(true)
    val base = e.filter(col("label") <= baselineMaxLabel)
    val cur = e.filter(col("label") > baselineMaxLabel)
    val bounds = base.agg(min("norm").as("bmin"), max("norm").as("bmax"))
    def bucketOf(norm: Column): Column =
      when(col("bmax") === col("bmin"), lit(0)).otherwise(
        least(lit(nBuckets - 1), greatest(lit(0),
          floor((norm - col("bmin")) / (col("bmax") - col("bmin")) *
            lit(nBuckets.toDouble)).cast("int"))))
    def counts(slice: DataFrame): DataFrame =
      slice.crossJoin(broadcast(bounds))
        .select(bucketOf(col("norm")).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
    val spine = spark.range(nBuckets).select(col("id").cast("int").as("bucket"))
    val nb = counts(base).withColumnRenamed("n", "n_base")
    val nc = counts(cur).withColumnRenamed("n", "n_cur")
    val tot = base.agg(count(lit(1)).as("tb"))
      .crossJoin(cur.agg(count(lit(1)).as("tc")))
    val kD = lit(nBuckets.toDouble)
    val perBucket = spine
      .join(nb, Seq("bucket"), "left").join(nc, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        ((coalesce(col("n_base"), lit(0L)).cast("double") + lit(1.0)) /
          (col("tb").cast("double") + kD)).as("pb"),
        ((coalesce(col("n_cur"), lit(0L)).cast("double") + lit(1.0)) /
          (col("tc").cast("double") + kD)).as("pc"))
      .select(col("bucket"), col("n_base"), col("n_cur"),
        round((col("pb") - col("pc")) * log(col("pb") / col("pc")), 6)
          .as("psi_term"))
    val total = perBucket.agg(round(sum("psi_term"), 6).as("psi_total"))
    perBucket.crossJoin(broadcast(total)).orderBy("bucket")
  }

  /** Fixed MMR weights — object constants so the SQL oracle interpolates
    * the same values. Spelled as TWO constants (not 1−λ computed at
    * runtime: double 1.0−0.7 is 0.30000000000000004, not the 0.3 both
    * engines parse from the literal). */
  val MmrLambda: Double = 0.7
  val MmrDiversity: Double = 0.3

  /** MMR diversification rerank (Carbonell & Goldstein, SIGIR'98) of a
    * cosine top-`candK` candidate list: greedily pick k results by
    *
    *   mmr(c) = λ·rel(c) − μ·max_{s∈selected} cos(c, s)
    *
    * — the result-diversity pass a RAG serving stack runs so the k
    * passages are not k near-duplicates of each other. rel is the
    * ROUNDED query cosine and each pairwise cosine is rounded to 4
    * before the max, so every comparison the greedy argmax makes is
    * over hash-stable values; mmr itself re-anchors at round(…,6) with
    * a vec_id tie-break.
    *
    * Scale notes (100 TB): the corpus is scanned once by the candidate
    * arm (TakeOrderedAndProject); the k greedy rounds run on the
    * localCheckpoint'ed candK-row frame (selected vectors ride along as
    * broadcast literals, one 1-row driver read per round — the
    * kmeansFit discipline; nothing per-round touches the corpus). */
  def mmrRerank(embeddings: DataFrame, queryVecId: Long = 0L,
                candK: Int = 20, k: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    VectorFunctions.ensureRegistered(spark)
    import spark.implicits._
    val eu = embeddings.select(col("vec_id"),
      VectorFunctions.unit(toDoubleVec(col("embedding"))).as("u"))
    val cand = cosineTopK(embeddings, queryVecId, candK)
      .select(col("vec_id"), col("cosine").as("rel"))
      .join(eu, Seq("vec_id"))
      .localCheckpoint(true)
    var selected = Vector.empty[(Int, Long, Double)]
    var selU = Vector.empty[Array[Double]]
    var pos = 1
    while (pos <= k) {
      val maxSim =
        if (selU.isEmpty) lit(0.0)
        else {
          val sims = selU.map(s =>
            round(VectorFunctions.dot(col("u"), array(s.map(lit): _*)), 4))
          if (sims.size == 1) sims.head else greatest(sims: _*)
        }
      val remaining =
        if (selected.isEmpty) cand
        else cand.filter(!col("vec_id").isin(selected.map(_._2): _*))
      val picked = remaining
        .select(col("vec_id"), col("u"),
          round(lit(MmrLambda) * col("rel") - lit(MmrDiversity) * maxSim, 6)
            .as("mmr"))
        .orderBy(desc("mmr"), asc("vec_id")).limit(1).collect()
      if (picked.isEmpty) {
        pos = k + 1 // fewer than k candidates: emit what exists
      } else {
        val p = picked.head
        selected :+= ((pos, p.getLong(0), p.getDouble(2)))
        selU :+= p.getSeq[Double](1).toArray
        pos += 1
      }
    }
    // the output is driver literals — nothing references the candidate
    // checkpoint after the loop, so release it instead of waiting for GC
    cand.unpersist()
    selected.toDF("pos", "vec_id", "mmr_score").orderBy("pos")
  }

  /** Top principal component by POWER ITERATION — the PCA/whitening step
    * an embedding pipeline runs before indexing (OPQ rotation, drift
    * monitoring, dimensionality triage). Mean-centered, fixed `iters`
    * rounds of v ← unit(Σᵢ x'ᵢ (x'ᵢ·v)) from the exact v₀ = 1/8 (1/√64 —
    * exactly representable, deterministic), each round's components
    * rounded to 6 so exp-free but ulp-accumulating float noise re-anchors
    * every round (the kmeansFit discipline). Output: one row per
    * dimension with the loading, plus the Rayleigh eigenvalue
    * λ = Σ s²/n of the final vector (the explained variance).
    *
    * Scale notes (100 TB): NEVER materializes the d×d covariance — each
    * round is one scan computing s = x'·v (broadcast literal vector) and
    * d decimal partial+final sums; the driver holds d doubles, and the
    * matvec stays n·d work per round regardless of corpus size. Decimal
    * casts make every sum order-independent across any partitioning. */
  def powerIterationPc(embeddings: DataFrame, dims: Int = 64,
                       iters: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    val (x, centered, n) = centeredFrame(embeddings, dims)
    val v = powerLoop(x, centered, dims, iters, Array.fill(dims)(0.125), None)
    val lambda = rayleigh(x, centered, v, n)
    spark.range(1)
      .select(posexplode(array(v.map(lit): _*)).as(Seq("p", "loading")))
      .select((col("p") + 1).cast("int").as("d"), col("loading"),
        lit(lambda).as("lambda"))
      .orderBy("d")
  }

  private val Dec2818 =
    org.apache.spark.sql.types.DataTypes.createDecimalType(28, 18)

  private def r6or(v: Double, s: Int): Double =
    BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Mean-centering shared by the power-iteration family: per-dim mean
    * from exact decimal sums, one driver row of d values.
    *
    * Round-9 plan rework (guide §1.2 step 1 / §5): the centered vectors
    * are MATERIALIZED once (eager localCheckpoint) instead of being a
    * Column recomputed by every matvec scan — pcaTop2 runs 2·iters+3
    * aggregate passes, and each one previously re-read the parquet,
    * re-cast to double, and re-evaluated the interpreted zip_with
    * lambda per row (HOFs don't codegen). The checkpoint is n·d doubles
    * — the same byte class as one extra input pass, MEMORY_AND_DISK on
    * a cluster — traded against 2·iters+2 decode+center passes. Values
    * are bit-identical (same expression, evaluated once), and the
    * decimal matvec sums stay order-independent, so results cannot
    * move. */
  private def centeredFrame(embeddings: DataFrame,
                            dims: Int): (DataFrame, Column, Double) = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val x = embeddings.select(col("vec_id"),
      toDoubleVec(col("embedding")).as("v"))
    val muRow = x.agg(count(lit(1)).as("n"),
      (1 to dims).map(d =>
        sum(element_at(col("v"), d).cast(Dec2818)).as(s"m$d")): _*).head()
    val n = muRow.getLong(0).toDouble
    val mu = Array.tabulate(dims)(i => muRow.getDecimal(i + 1).doubleValue / n)
    val muLit = array(mu.map(lit): _*)
    val xc = x.select(zip_with(col("v"), muLit, (a, b) => a - b).as("xc"))
      .localCheckpoint(true)
    (xc, col("xc"), n)
  }

  /** One power-iteration chain: `iters` rounds of v ← unit(Σᵢ x'ᵢ(x'ᵢ·v)),
    * components re-anchored at round(6) per round. With `deflateAgainst`
    * set, each round's matvec result is first projected off that (unit)
    * vector — Hotelling deflation, which turns the same loop into the
    * SECOND principal component without ever forming the covariance. All
    * driver arithmetic (projection, self-dot, normalize) is sequential
    * left-to-right — the graft_dot/list_dot_product fold order — so both
    * engines see identical doubles. */
  private def powerLoop(x: DataFrame, centered: Column, dims: Int, iters: Int,
                        v0: Array[Double],
                        deflateAgainst: Option[Array[Double]]): Array[Double] = {
    var v = v0
    var it = 0
    while (it < iters) {
      val sC = VectorFunctions.dot(centered, array(v.map(lit): _*))
      val frame = x.select(centered.as("xc"), sC.as("s"))
      val row = frame.agg(
        sum((col("s") * element_at(col("xc"), 1)).cast(Dec2818)).as("w1"),
        (2 to dims).map(d =>
          sum((col("s") * element_at(col("xc"), d)).cast(Dec2818)).as(s"w$d"))
          : _*).head()
      val w = Array.tabulate(dims)(i => row.getDecimal(i).doubleValue)
      deflateAgainst.foreach { v1 =>
        var dp = 0.0
        var i = 0
        while (i < dims) { dp += w(i) * v1(i); i += 1 }
        i = 0
        while (i < dims) { w(i) = w(i) - dp * v1(i); i += 1 }
      }
      var ss = 0.0
      var i = 0
      while (i < dims) { ss += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(ss)
      v = w.map(c => r6or(c / nrm, 6))
      it += 1
    }
    v
  }

  /** Rayleigh quotient λ = Σ (x'·v)² / n of a trained direction. */
  private def rayleigh(x: DataFrame, centered: Column, v: Array[Double],
                       n: Double): Double = {
    val sF = VectorFunctions.dot(centered, array(v.map(lit): _*))
    val lamRow = x.select(sF.as("s"))
      .agg(sum((col("s") * col("s")).cast(Dec2818)).as("l2")).head()
    r6or(lamRow.getDecimal(0).doubleValue / n, 4)
  }

  /** Top TWO principal components by power iteration + Hotelling
    * deflation — the next step after powerIterationPc toward the PCA/OPQ
    * rotation an embedding pipeline fits: component 1 is the identical
    * chain, component 2 re-runs it while projecting each round's matvec
    * off the FINAL rounded v1 (so the oracle can replay both chains with
    * v1 as a literal list). The second chain starts from the exactly-
    * representable alternating ±1/8 vector — a start near-parallel to v1
    * would leave the deflated residual at noise scale, which round(6)
    * could not re-anchor identically across engines.
    *
    * Scale notes (100 TB): identical to powerIterationPc — 2·iters+3
    * corpus scans, each one broadcast-literal matvec with d decimal
    * sums; the d×d covariance is never materialized and the driver holds
    * 2d doubles. */
  def pcaTop2(embeddings: DataFrame, dims: Int = 64,
              iters: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    val (x, centered, n) = centeredFrame(embeddings, dims)
    val v1 = powerLoop(x, centered, dims, iters, Array.fill(dims)(0.125), None)
    val lam1 = rayleigh(x, centered, v1, n)
    val u0 = Array.tabulate(dims)(i => if (i % 2 == 0) 0.125 else -0.125)
    val v2 = powerLoop(x, centered, dims, iters, u0, Some(v1))
    val lam2 = rayleigh(x, centered, v2, n)
    val one = spark.range(1)
    def comp(c: Int, v: Array[Double], lam: Double) = one
      .select(posexplode(array(v.map(lit): _*)).as(Seq("p", "loading")))
      .select(lit(c).as("component"), (col("p") + 1).cast("int").as("d"),
        col("loading"), lit(lam).as("lambda"))
    comp(1, v1, lam1).unionAll(comp(2, v2, lam2))
      .orderBy("component", "d")
  }

  /** Pearson correlation matrix over the first `nDims` embedding
    * dimensions — the feature-redundancy diagnostic run before dimension
    * pruning / whitening (a |corr| ~ 1 pair means one dim is free to
    * drop; PQ subspace splits want DEcorrelated groups).
    *
    * Scale shape: pair generation is IN-ROW (one flatten/transform
    * expression over the embedding array — no self-join, no second scan;
    * the corpus crosses one exchange of nDims(nDims+1)/2 rows per
    * vector into a nDims^2-group aggregate). All five moment sums
    * accumulate as DECIMAL(28,18) — exact and order-independent (the
    * kmeansFit discipline) — and the correlation is computed from them
    * in one fixed post-aggregation double tree both engines evaluate
    * identically. Products are double-multiplied BEFORE the decimal cast
    * (IEEE product of the same parquet floats, deterministic), then
    * accumulate exactly. */
  def dimCorrelationMatrix(embeddings: DataFrame, nDims: Int = 8): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 18)
    val pairGen = expr(
      s"""flatten(transform(sequence(0, ${nDims - 1}), i ->
         |  transform(sequence(i, ${nDims - 1}), j -> struct(
         |    i AS i, j AS j,
         |    CAST(embedding[i] AS DOUBLE) AS xi,
         |    CAST(embedding[j] AS DOUBLE) AS xj))))""".stripMargin)
    val agg = embeddings
      .select(explode(pairGen).as("p")).select(col("p.*"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum(col("xi").cast(dec)).as("sx"),
        sum(col("xj").cast(dec)).as("sy"),
        sum((col("xi") * col("xj")).cast(dec)).as("sxy"),
        sum((col("xi") * col("xi")).cast(dec)).as("sxx"),
        sum((col("xj") * col("xj")).cast(dec)).as("syy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = nD * d("sxy") - d("sx") * d("sy")
    val den = sqrt(nD * d("sxx") - d("sx") * d("sx")) *
      sqrt(nD * d("syy") - d("sy") * d("sy"))
    agg.select(col("i").cast("int").as("dim_i"),
        col("j").cast("int").as("dim_j"), col("n"),
        when(den > 0, round(num / den, 6)).as("corr"))
      .orderBy("dim_i", "dim_j")
  }

  /** Deterministic sparse Johnson-Lindenstrauss coefficient in {-1,0,+1}
    * (Achlioptas 2003, density 1/3): md5("jl:j:d") hex8 % 6 -> 0=+1, 1=-1,
    * else 0. Same cross-engine hex8 contract as LshPlanes.coef; the
    * oracle replays the derivation verbatim. */
  private def jlCoef(j: Int, d: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"jl:$j:$d".getBytes("UTF-8"))
    val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (v % 6) match { case 0 => 1; case 1 => -1; case _ => 0 }
  }

  /** Unscaled k-dim sparse JL projection of `vec` (component j = the
    * ascending-dim dot with plane j); callers apply the sqrt(3/k)
    * Achlioptas scale where a distance needs it. */
  def jlProject(vec: Column, dims: Int = 64, k: Int = 16): Column =
    array((0 until k).map { j =>
      dot(vec, array((0 until dims).map(d =>
        lit(jlCoef(j, d).toDouble)): _*))
    }: _*)

  /** Corpus-wide JL norm-preservation report: per vector, the original
    * L2 norm, the norm of its sqrt(3/k)-scaled k-dim sparse projection,
    * and their ratio (JL says ratio ~ 1 +- O(1/sqrt(k))) — the cheap
    * whole-corpus fidelity gate run before committing to a projected
    * index layout.
    *
    * Scale notes (100 TB): scan-shaped — the projection and both norms
    * are per-row expressions over one embedding scan, zero shuffle, zero
    * joins; the coefficient planes are plan-time literals. */
  def jlNormReport(embeddings: DataFrame, dims: Int = 64,
                   k: Int = 16): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"),
      toDoubleVec(col("embedding")).as("v"))
    // sum_j dj^2 with each plane's dot evaluated once, j ascending — the
    // exact fold the oracle's list_dot_product(p, p) replays
    val projSq = (0 until k).map { j =>
      val dj = dot(col("v"), array((0 until dims).map(d =>
        lit(jlCoef(j, d).toDouble)): _*))
      dj * dj
    }.reduce(_ + _)
    val scale = lit(math.sqrt(3.0 / k))
    e.select(col("vec_id"),
        sqrt(dot(col("v"), col("v"))).as("__no"),
        (scale * sqrt(projSq)).as("__np"))
      .select(col("vec_id"),
        round(col("__no"), 4).as("norm_orig"),
        round(col("__np"), 4).as("norm_proj"),
        when(col("__no") > 0, round(col("__np") / col("__no"), 4))
          .as("ratio"))
      .orderBy("vec_id")
  }

  /** Pairwise JL distance-distortion eval on a deterministic seeded
    * sample: for every pair of `sampleN` md5-ordered vectors, the
    * original distance, the scaled projected distance, and the
    * distortion ratio — the measured epsilon behind the jlNormReport
    * gate. Constant cost at ANY corpus size (sampleN^2/2 pairs of
    * k/dims-length arrays), the same bounded-eval-arm discipline as
    * sim_recall_eval / the sampled lsh calibration. */
  def jlDistortion(embeddings: DataFrame, dims: Int = 64, k: Int = 16,
                   sampleN: Int = 64, seed: Long = 7L): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    val smp = graft.sources.Sampling.deterministicSample(
        embeddings.select(col("vec_id"),
          toDoubleVec(col("embedding")).as("v")), "vec_id", sampleN, seed)
      .withColumn("p", jlProject(col("v"), dims, k))
      .select("vec_id", "v", "p")
    def distSq(a: Column, b: Column): Column =
      dot(zip_with(a, b, (x, y) => x - y), zip_with(a, b, (x, y) => x - y))
    val scale = lit(math.sqrt(3.0 / k))
    val a = smp.select(col("vec_id").as("vec_a"), col("v").as("__va"),
      col("p").as("__pa"))
    val b = smp.select(col("vec_id").as("vec_b"), col("v").as("__vb"),
      col("p").as("__pb"))
    a.crossJoin(broadcast(b)).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        sqrt(distSq(col("__va"), col("__vb"))).as("__do"),
        (scale * sqrt(distSq(col("__pa"), col("__pb")))).as("__dp"))
      .select(col("vec_a"), col("vec_b"),
        round(col("__do"), 4).as("d_orig"),
        round(col("__dp"), 4).as("d_proj"),
        when(col("__do") > 0, round(col("__dp") / col("__do"), 4))
          .as("ratio"))
      .orderBy("vec_a", "vec_b")
  }

  /** Per-label embedding stats (norm is exact-order sequential). */
  def normStatsByLabel(embeddings: DataFrame): DataFrame = {
    VectorFunctions.ensureRegistered(embeddings.sparkSession)
    embeddings
      .select(col("label"), l2Norm(toDoubleVec(col("embedding"))).as("norm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(min("norm"), 4).as("min_norm"),
        round(max("norm"), 4).as("max_norm"))
      .orderBy("label")
  }
}
