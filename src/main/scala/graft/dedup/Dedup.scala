package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.Tokenize
import graft.similarity.Similarity

/** Deduplication for training-data pipelines: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale notes (100 TB): exact dedup is one hash-groupBy (partial+final).
  * Jaccard/MinHash/SimHash all avoid the O(n^2) pair scan — candidates come
  * from an inverted shingle index or LSH band buckets, so the join fan-out
  * is bounded by bucket size, and only candidates pay the exact-similarity
  * verification. Skewed buckets (stopword shingles) are the known hazard:
  * capShingleDf removes shingles above a document-frequency cap before any
  * self-join (they carry no near-dup signal and cost df^2 pairs each);
  * distinct-shingle explode keeps per-doc fan-out ≤ shingle count and AQE
  * skew-join splitting handles residual skew below the cap.
  */
object Dedup {

  /** Exact duplicate groups by content hash (md5 — reproducible in the
    * oracle, unlike xxhash64). One shuffle. */
  def exactDuplicates(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("rep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("content_hash")

  /** Distinct word n-gram shingles per doc: (doc_id, shingle). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = Tokenize.tokens(col("text"))
    val sh = transform(
      sequence(lit(1), size(col("t")) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(col("t"), i + o)): _*))
    // guard: Spark sequence(1, x) for x<1 counts DOWN ([1,0,...]), so gate
    // short docs to an empty shingle set instead.
    val guarded = when(size(col("t")) >= n, sh)
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), explode(array_distinct(guarded)).as("shingle"))
  }

  /** Drop shingles whose document frequency exceeds `maxDf` — boilerplate
    * n-grams shared by huge numbers of docs carry no near-dup signal, and
    * each one costs df^2 candidate pairs in the self-join: at web scale a
    * stopword 3-gram in 10^6 docs is 10^12 pairs. The hot-shingle set is
    * tiny by construction (few distinct shingles can exceed the cap), so
    * Catalyst plans the anti-join as a broadcast. `maxDf <= 0` disables. */
  def capShingleDf(sh: DataFrame, maxDf: Int): DataFrame =
    if (maxDf <= 0) sh
    else {
      val hot = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select("shingle")
      sh.join(broadcast(hot), Seq("shingle"), "left_anti")
    }

  /** Near-dup pairs by exact n-gram Jaccard >= threshold. Candidates come
    * from the inverted shingle index self-join (docs sharing >=1 shingle),
    * never a cross join. Shingles with df > maxShingleDf are dropped from
    * the universe FIRST (capShingleDf) — Jaccard is then over the capped
    * shingle sets, consistently in intersection and sizes (and in the SQL
    * oracle). No .cache(): the shared shingle subplan is deduplicated by
    * Spark's exchange reuse within the single job, and an operator-internal
    * cache would pin executor memory for the session lifetime with no way
    * to unpersist after the caller's action. */
  def jaccardPairs(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.05,
                   maxShingleDf: Int = 10000): DataFrame = {
    val sh = capShingleDf(shingles(docs, n), maxShingleDf)
    scoreJaccard(sh, sharedShingleCounts(sh), minJaccard)
  }

  /** Self-join the shingle index on identical (un-projected) sides so both
    * shuffle exchanges canonicalize equal and ReuseExchange computes the
    * tokenize+explode lineage once — projecting doc_a/doc_b BEFORE the join
    * made the sides differ and doubled the dominant scan. */
  private def sharedShingleCounts(sh: DataFrame): DataFrame = {
    val a = sh.alias("a")
    val b = sh.alias("b")
    a.join(b, col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
  }

  /** Attach set sizes to intersection counts and threshold on Jaccard. */
  private def scoreJaccard(sh: DataFrame, inter: DataFrame,
                           minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), Seq("doc_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signature per doc: sig[i] = min over shingles of
    * xxhash64(i, shingle). Deterministic but engine-specific (xxhash64), so
    * checked by property tests rather than the SQL oracle. */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 32, n: Int = 3): DataFrame =
    minhashFromShingles(shingles(docs, n), numHashes)

  private def minhashFromShingles(sh: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** MinHash+LSH near-dup pairs: band the signature, bucket-join on
    * (band, bandHash), verify candidates with exact Jaccard. The LSH
    * candidate step is what survives 100 TB; the exact verify only touches
    * candidate pairs. Hot shingles are df-capped out of the universe first
    * (capShingleDf) — both the signatures and the verify see the same
    * capped sets, so the output Jaccard is self-consistent.
    *
    * Band geometry vs threshold: detection prob for true Jaccard s is
    * 1-(1-s^r)^bands with r = numHashes/bands. The default (32 hashes,
    * 16 bands, r=2) catches s=0.9 pairs with p ≈ 1-2e-12 — band width is
    * the recall/candidate-volume dial, verify removes false positives. */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 32, bands: Int = 16,
                      n: Int = 3, minJaccard: Double = 0.5,
                      maxShingleDf: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // one shingle lineage feeds both the signatures and the exact verify
    val sh = capShingleDf(shingles(docs, n), maxShingleDf)
    val sig = minhashFromShingles(sh, numHashes)
    val banded = sig.select(col("doc_id"), posexplode(
      array((0 until bands).map { b =>
        xxhash64((b * rows until (b + 1) * rows)
          .map(i => element_at(col("signature"), i + 1)): _*)
      }: _*)).as(Seq("band", "band_hash")))
    val candidates = banded.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
      .join(banded.select(col("doc_id").as("doc_b"), col("band"), col("band_hash")),
        Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // Exact-verify candidates only.
    val inter = candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    scoreJaccard(sh, inter, minJaccard)
  }

  /** 64-bit SimHash per doc: tf-weighted sign votes on each bit of
    * xxhash64(term). Engine-specific hash => property-tested, not oracled. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val tf = Tokenize.termOccurrences(docs)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("h", xxhash64(col("term")))
    val votes = tf.select(col("doc_id"), col("tf"), col("h"),
        explode(sequence(lit(0), lit(63))).as("bit"))
      .withColumn("vote",
        when(expr("shiftright(h, bit) & 1") === 1, col("tf"))
          .otherwise(-col("tf")))
      .groupBy("doc_id", "bit").agg(sum("vote").as("v"))
    votes.groupBy("doc_id")
      .agg(sum(when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .otherwise(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, candidate
    * generation via 16-bit band buckets (a pair within distance 3 shares at
    * least one of 4 bands). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhashSignatures(docs)
    val banded = sig.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*))
      .as(Seq("band", "band_bits")))
    val cand = banded.select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"),
        col("band"), col("band_bits"))
      .join(banded.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"),
        col("band"), col("band_bits")), Seq("band", "band_bits"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b").distinct()
    cand.withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup pairs. Brute all-pairs here (n is small at
    * test SFs); the 100 TB path replaces the pair generator with
    * Similarity.lshBucket bucketing — same verify step. */
  /** LSH-bucketed embedding near-dup — the 100 TB path: candidates are
    * pairs sharing a sign-bit bucket, so the quadratic term is bounded per
    * bucket. Recall < 1 by construction (same tradeoff as minhashLshPairs),
    * exact cosine verifies candidates. */
  def embeddingNearDupPairsLsh(embeddings: DataFrame, minCosine: Double = 0.4,
                               dims: Int = 64, nPlanes: Int = 8): DataFrame = {
    val e = Similarity.withUnitVec(
      embeddings.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v")), "v")
      .withColumn("bucket", Similarity.lshBucket(col("v"), dims, nPlanes))
      .select(col("vec_id"), col("u"), col("bucket"))
    val a = e.select(col("vec_id").as("vec_a"), col("u").as("ua"), col("bucket"))
    val b = e.select(col("vec_id").as("vec_b"), col("u").as("ub"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", Similarity.dot(col("ua"), col("ub")))
      .filter(col("cos") >= minCosine)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  def embeddingNearDupPairs(embeddings: DataFrame, minCosine: Double = 0.4): DataFrame = {
    // Normalize ONCE per vector (n folds), so each of the O(n^2) candidate
    // pairs pays a single dot product instead of dot + two norm folds —
    // higher-order-function evaluation is interpreted, not codegen'd, so
    // per-pair work is the whole cost here.
    val e = Similarity.withUnitVec(
      embeddings.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v")), "v")
      .select(col("vec_id"), col("u"))
    val a = e.select(col("vec_id").as("vec_a"), col("u").as("ua"))
    val b = e.select(col("vec_id").as("vec_b"), col("u").as("ub"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", Similarity.dot(col("ua"), col("ub")))
      .filter(col("cos") >= minCosine)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }
}
