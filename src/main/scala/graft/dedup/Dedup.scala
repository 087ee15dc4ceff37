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

  /** Default shingle document-frequency cap. Sizing: the capped jaccardPairs
    * path explodes up to df^2 candidate pairs from ONE collect_list bucket
    * inside ONE task, so the cap bounds per-task memory: at 1000 that is at
    * most 10^6 (doc_a, doc_b) rows (~16 MB of longs) per hot shingle —
    * safely inside any executor. The previous default (10000) allowed 10^8
    * pairs (~1.6 GB) from a single bucket, an OOM hazard the declared
    * queries only dodged by passing an explicit cap of 100. Shingles above
    * any sane cap are boilerplate with no near-dup signal anyway (see
    * capShingleDf), so tightening the default costs no recall in practice. */
  val DefaultMaxShingleDf = 1000

  // editDistancePairs defaults, named so the declared oracle SQL can be
  // generated from the SAME constants (SparkEntry.editDistOracleSql) and
  // a retune here can never silently desynchronize the two sides
  val DefaultEditPrefixLen = 64
  val DefaultEditMaxDist = 8
  val DefaultEditBlockChars = 8
  val DefaultEditLengthBand = 100

  /** Exact duplicate groups by content hash (md5 — reproducible in the
    * oracle, unlike xxhash64). One shuffle. */
  def exactDuplicates(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("rep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("content_hash")

  /** Incremental exact dedup of a new batch against a STORED corpus — the
    * daily-ingestion pattern: the store carries only content hashes (never
    * text), the batch is tagged per doc with its first failing source of
    * duplication. `dup_store` = hash already indexed; `dup_batch` = an
    * earlier doc (lower doc_id) in the SAME batch has the hash; `novel`
    * otherwise. Novel hashes are exactly what a caller appends to the
    * store, so repeated ingestion is idempotent.
    *
    * Scale notes (100 TB store): both joins hash-partition by
    * content_hash; the store side is a single narrow hash column, and the
    * batch side is typically small — AQE will broadcast whichever side is
    * under threshold. No text ever crosses the exchange. */
  def incrementalExactDedup(newDocs: DataFrame, storedHashes: DataFrame): DataFrame = {
    val hashed = newDocs.select(col("doc_id"), md5(col("text")).as("content_hash"))
    val first = hashed.groupBy("content_hash").agg(min("doc_id").as("__first"))
    val store = storedHashes.select(col("content_hash")).distinct()
      .withColumn("__in_store", lit(true))
    hashed.join(first, Seq("content_hash"))
      .join(store, Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"),
        when(coalesce(col("__in_store"), lit(false)), "dup_store")
          .when(col("doc_id") =!= col("__first"), "dup_batch")
          .otherwise("novel").as("status"))
      .orderBy("doc_id")
  }

  // Bloom triage defaults, named so the declared oracle SQL interpolates
  // the SAME constants (SparkEntry) and a retune cannot desynchronize the
  // sides. m = 2^20 bits, k = 5 md5-derived positions: at a 10% fill the
  // false-positive odds are ~1e-5 — the triage passes almost nothing
  // spurious to the exact verifier.
  val DefaultBloomBits = 1 << 20
  val DefaultBloomHashes = 5

  /** k Bloom bit positions from a 32-hex md5: position i = the i-th
    * 6-hex-digit window as an integer, mod m. Pure string/int arithmetic
    * (conv/substring), replayable bit-for-bit in the SQL oracle — unlike
    * xxhash64, which is why the minhash family is rows-only but this is
    * not. Duplicate positions within one hash are kept distinct-able by
    * the caller (array_distinct) so "all k present" is well-defined. */
  def bloomPositions(hash: Column, m: Int = DefaultBloomBits,
                     k: Int = DefaultBloomHashes): Column =
    array_distinct(array((0 until k).map(i =>
      conv(substring(hash, i * 6 + 1, 6), 16, 10).cast("long") % m): _*))

  /** Probabilistic membership triage for incremental dedup: the store is
    * summarized as a Bloom BIT SET (distinct positions over stored
    * content hashes) whose size is bounded by m REGARDLESS of store
    * cardinality — the structure that lets a 100 TB-corpus membership
    * check ride a broadcast join (<= m narrow rows, a few MB) instead of
    * shuffling the full store's hash column against every batch. Each
    * batch doc is "maybe dup" iff all its k positions are set; the exact
    * hash join (the expensive path bloom exists to short-circuit) runs
    * alongside to label false positives. Bloom admits no false
    * negatives: an exact dup's positions are all set by construction —
    * DedupSpec pins this and forces real false positives at a tiny m. */
  def bloomIncrementalDedup(newDocs: DataFrame, storedHashes: DataFrame,
                            m: Int = DefaultBloomBits,
                            k: Int = DefaultBloomHashes): DataFrame = {
    val bits = storedHashes
      .select(explode(bloomPositions(col("content_hash"), m, k)).as("pos"))
      .distinct()
    val probes = newDocs
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("ps", bloomPositions(col("content_hash"), m, k))
    val hits = probes
      .select(col("doc_id"), size(col("ps")).as("np"), explode(col("ps")).as("pos"))
      .join(broadcast(bits), Seq("pos"))
      .groupBy("doc_id", "np").agg(count(lit(1)).as("nhit"))
      .select(col("doc_id"), (col("nhit") === col("np")).as("maybe"))
    val store = storedHashes.select(col("content_hash")).distinct()
      .withColumn("__in_store", lit(true))
    probes
      .join(hits, Seq("doc_id"), "left")
      .join(store, Seq("content_hash"), "left")
      .select(col("doc_id"),
        coalesce(col("maybe"), lit(false)).cast("int").as("bloom_maybe"),
        coalesce(col("__in_store"), lit(false)).cast("int").as("exact_dup"),
        (coalesce(col("maybe"), lit(false)) &&
          !coalesce(col("__in_store"), lit(false))).cast("int").as("false_positive"))
      .orderBy("doc_id")
  }

  /** Distinct word n-gram shingles per doc: (doc_id, shingle). The shingle
    * build is the native codegen graft_shingles expression — the
    * interpreted HOF spelling (transform + n element_at probes per
    * position) dominated every shingle-based dedup query; the expression
    * also yields [] for short docs natively (no sequence(1, x<1)
    * counts-down guard needed). FunctionsSpec pins parity with the HOF. */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    graft.functions.TextFunctions.ensureRegistered(docs.sparkSession)
    docs.select(col("doc_id"), Tokenize.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.TextFunctions.shingles(col("t"), n))).as("shingle"))
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

  /** Near-dup pairs by exact n-gram Jaccard >= threshold.
    *
    * Capped path (maxShingleDf > 0, the default): ONE aggregation by
    * shingle builds posting buckets (`collect_list(doc_id)`), the df-cap
    * drops oversized buckets (it is what makes collect_list safe — bucket
    * memory is bounded by the cap), and candidate pairs explode locally
    * per bucket — no self-join, no second shuffle of the shingle index.
    * Set sizes for the Jaccard denominator re-derive from the SAME
    * exchange (ReuseExchange), so the whole query scans + tokenizes the
    * corpus once. Jaccard is over the capped shingle universe,
    * consistently in intersection and sizes (and in the SQL oracle).
    *
    * Uncapped path (maxShingleDf <= 0): the round-1 inverted-index
    * self-join — with no bound on bucket size, exploding a bucket's df^2
    * pairs through collect_list would risk executor memory on a hot
    * shingle, so the join form (which streams the fan-out) is kept.
    *
    * No .cache(): shared subplans are deduplicated by exchange reuse
    * within the single job, and an operator-internal cache would pin
    * executor memory for the session lifetime with no way to unpersist
    * after the caller's action. */
  def jaccardPairs(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.05,
                   maxShingleDf: Int = DefaultMaxShingleDf): DataFrame =
    jaccardPairsFromShingles(shingles(docs, n), minJaccard, maxShingleDf)

  /** jaccardPairs over an ALREADY-BUILT (doc_id, shingle) frame — the
    * entry point for incremental curation, where survivors' shingles come
    * from a persisted store instead of re-tokenizing text. Semantics are
    * identical to jaccardPairs by construction (the text form delegates
    * here). */
  def jaccardPairsFromShingles(sh0: DataFrame, minJaccard: Double = 0.05,
                               maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    if (maxShingleDf <= 0) {
      return scoreJaccard(sh0, sharedShingleCounts(sh0), minJaccard)
    }
    cappedPairStats(sh0, maxShingleDf)
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Shared df-capped pair engine: (doc_a, doc_b, inter, sza, szb) over
    * the capped shingle universe, doc_a < doc_b.
    *
    * Round-9 plan rework (optimization guide §2.3/§2.4, measured with the
    * 10x PlanProbe): the previous shape aggregated pair counts and then
    * JOINED per-doc set sizes on doc_a and again on doc_b — three
    * pair-grain exchanges (12.5M + 11.3M + 11.3M rows at the 10x gate for
    * jaccard; AQE even flipped the sizes joins into a broadcast of the
    * 11.6M-row PAIR side, 805 MB, for containment — exactly the estimate
    * failure §3.1 warns about, and a hard 8 GiB-cap hazard at scale).
    * Here the capped sizes are computed once at (doc, shingle) grain and
    * carried INTO the posting buckets, so each exploded pair already
    * holds (sza, szb) and the scorer needs NO post-aggregation join: the
    * only pair-grain exchange left is the inter aggregate itself. Costs
    * one extra narrow exchange of the capped (shingle, doc_id) frame by
    * doc_id (to attach sz) and a rebuild of the buckets — both linear in
    * corpus shingles and ~20x smaller than the two exchanges removed.
    * (sza, szb) are functions of (doc_a, doc_b), so adding them to the
    * aggregate key changes no group. Nothing is broadcast or collected:
    * every frame stays corpus-linear, the 100 TB doctrine unchanged. */
  private def cappedPairStats(sh0: DataFrame, maxShingleDf: Int): DataFrame = {
    // Round-9 (guide §2.3 "narrower types"): only shingle IDENTITY is
    // ever used past this point (bucket grouping, the df cap, the
    // regroup after the sizes attach), so the key is xxhash64'd before
    // its FIRST exchange — three exchanges carry 8-byte longs instead
    // of n-gram strings. Collision odds: the documented 2^-64 argument
    // (the paragraph_frac / splitContamination standing); the SQL
    // oracles keep string shingles.
    val sh = sh0.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    val buckets = sh
      .groupBy("shingle").agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) <= maxShingleDf)
    val cappedSh = buckets
      .select(col("shingle"), explode(col("ds")).as("doc_id"))
    val sizes = cappedSh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val sized = cappedSh.join(sizes, Seq("doc_id"))
      .groupBy("shingle")
      .agg(collect_list(struct(col("doc_id"), col("sz"))).as("ds"))
    sized
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .agg(count(lit(1)).as("inter"))
  }

  /** Asymmetric containment near-dup: containment = |A∩B| / min(|A|,|B|)
    * over the capped shingle universe. Catches SUBSET duplication — a doc
    * quoted or embedded verbatim inside a larger one scores 1.0 here,
    * while the size mismatch dilutes symmetric Jaccard to
    * |small|/|large| (below any useful threshold once the host doc is
    * ~2x the excerpt). Identical df-capped pair engine as
    * jaccardPairsFromShingles (cappedPairStats — sizes carried inside
    * the buckets, no pair-grain sizes join); only the scorer differs.
    * The emitted jaccard column makes the asymmetry visible per pair. */
  def containmentPairs(docs: DataFrame, n: Int = 3,
                       minContainment: Double = 0.9,
                       maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    cappedPairStats(shingles(docs, n), maxShingleDf)
      .withColumn("containment",
        col("inter").cast("double") / least(col("sza"), col("szb")))
      .filter(col("containment") >= minContainment)
      .select(col("doc_a"), col("doc_b"),
        round(col("containment"), 4).as("containment"),
        round(col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Excerpt-key base: planted excerpt ids live at ExcerptKeyBase +
    * source doc_id, disjoint from real corpus ids at any tested scale. */
  val ExcerptKeyBase = 900000000L

  /** Every `every`-th doc's id (the oracle interpolates this constant). */
  val DefaultExcerptEvery = 40

  /** Plant excerpt docs: every `every`-th doc contributes a copy holding
    * its FIRST HALF (space-word slice, so no word is cut) under
    * ExcerptKeyBase + doc_id. Same deterministic fixture-assembly
    * pattern as withSyntheticParagraphs: the synthetic corpus has
    * verbatim twins but no strict-subset docs, and subset duplication
    * (quotes, embedded excerpts, boilerplate wrappers) is exactly the
    * case containment detects and Jaccard dilutes. */
  def withSyntheticExcerpts(docs: DataFrame,
                            every: Int = DefaultExcerptEvery): DataFrame = {
    val tk = split(col("text"), " ")
    val excerpts = docs.filter(col("doc_id") % every === 0)
      .select((col("doc_id") + ExcerptKeyBase).as("doc_id"),
        array_join(slice(tk, lit(1),
          greatest((size(tk) / lit(2)).cast("int"), lit(1))), " ").as("text"))
    docs.select("doc_id", "text").unionByName(excerpts)
  }

  /** Prefix-filter threshold (Jaccard). Named so the declared oracle SQL
    * interpolates the SAME constant and a retune cannot desynchronize the
    * sides. 0.5 is the excerpt-fixture sweet spot: a first-half excerpt
    * sits right at J ~ (h-2)/(w-2) ~ 0.5 against its host, so some planted
    * pairs clear the bar and some miss it — both engines must agree on the
    * exact integer counts either way. */
  val DefaultPrefixMinJaccard = 0.5

  /** Candidate-pair bound under which the prefix-jaccard verify
    * broadcasts its (candidate-doc-bounded) array table instead of
    * shuffle-hash-joining it — the PHashBroadcastMaxMedia pattern: a
    * corpus big enough to matter blows past the bound and never
    * broadcasts. Empirical: 2M pairs ≈ tens of MB of arrays on this
    * corpus family, far under the 8 GiB broadcast cap. */
  val PrefixBroadcastMaxPairs = 2000000L

  /** EXACT Jaccard >= t pairs via prefix filtering (SSJoin, Chaudhuri et
    * al. ICDE'06; PPJoin, Xiao et al. WWW'08) — same answer as an exact
    * threshold join, but only a fraction of the shingle index is ever
    * bucketed.
    *
    * Two lossless reductions before any pairing:
    *
    * 1. REPRESENTATIVE COLLAPSE: docs with byte-identical shingle SETS
    *    (md5 of the sorted set) collapse to their min-doc_id
    *    representative. Pairs are reported at rep grain — members of one
    *    rep are exact set-duplicates of each other (J = 1, the
    *    dedup_exact family's territory), and every member inherits its
    *    rep's pairs. This is what makes the operator safe on an
    *    adversarial all-identical corpus: the quadratic clique collapses
    *    to ONE rep and zero pairs, where a pair-emitting formulation is
    *    forced into n^2 output before it can even start.
    * 2. PREFIX FILTER: order each rep's shingles by ascending global df
    *    (rarest first; the xxhash64 shingle key breaks ties, so the
    *    order is total and consistent across both join sides — and the
    *    filter is lossless under ANY consistent total order, so the
    *    hash-order tie-break changes candidates, never output) and index
    *    only the first sz - ceil(t*sz) + 1 of them. Theorem: if
    *    J(x, y) >= t, the globally-smallest element of x INTERSECT y
    *    lies in BOTH prefixes — everything before it in either doc is
    *    outside the intersection, and the intersection has >= ceil(t*sz)
    *    elements — so the prefix self-join loses no pair. At t = 0.5
    *    half the index never shuffles; the skipped half is exactly the
    *    df-HOT half, because rarest-first ordering pushes boilerplate
    *    shingles out of every prefix — the same hazard capShingleDf
    *    handles, here removed by construction instead of by a cap
    *    (which is why this operator needs no cap to stay exact).
    * 3. POSITIONAL FILTER (PPJoin, round 10): every prefix match carries
    *    its 1-based rank in each doc's total order. Because both docs
    *    sort by the SAME global order, shared elements appear in the
    *    same relative order on both sides, so per candidate pair the
    *    aggregate (pmatch, pa, pb) = (#prefix matches, max rank in a,
    *    max rank in b) bounds the whole intersection: an intersection
    *    element not counted by pmatch is outside one prefix, hence
    *    ORDER-ABOVE the largest shared prefix element, hence at rank
    *    > pa in a AND > pb in b — so inter <= pmatch +
    *    min(sza - pa, szb - pb). Pairs whose bound misses
    *    ceil(t/(1+t) * (sza+szb)) (the J >= t overlap requirement) are
    *    pruned BEFORE the exact-verify stage ever sees their postings;
    *    a true pair's bound >= its true inter, so the prune is lossless
    *    (the 1e-9 slack keeps float ceil from ever exceeding the exact
    *    rational threshold — over-keeping, never over-pruning).
    *
    * A PPJoin length filter rides the prefix join (J >= t forces
    * min(sz) >= t*max(sz)); the candidate DOC SET surviving the
    * positional filter then pays one aggregated postings self-join for
    * exact intersection counts — skinny pair rows with map-side partial
    * counting, never a candidate-pairs x doc-length explode and never
    * the unrestricted index self-join. */
  def prefixJaccardPairs(docs: DataFrame, n: Int = 3,
                         minJaccard: Double = DefaultPrefixMinJaccard): DataFrame =
    prefixJaccardPairs(docs, n, minJaccard, PrefixBroadcastMaxPairs)

  /** Gate-forcing form (spec surface): `broadcastMaxPairs` 0 forces the
    * shuffle_hash attach path a corpus-scale run takes; DedupSpec pins
    * both paths to identical output. */
  private[graft] def prefixJaccardPairs(docs: DataFrame, n: Int,
                                        minJaccard: Double,
                                        broadcastMaxPairs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shingles(docs, n)
    val sig = sh.groupBy("doc_id")
      .agg(md5(concat_ws("|", sort_array(collect_list(col("shingle"))))).as("sig"))
    val reps = sig.groupBy("sig").agg(min(col("doc_id")).as("rep"))
    // Round-9 (guide §2.3 "narrower types"): past the signature (which
    // stays string-exact — it defines the identical-set collapse), the
    // shingle is only ever an equality/ordering key: df count, the
    // rarest-first rank tie-break, the prefix bucket join, the postings
    // self-join. xxhash64 it ONCE here so every downstream exchange
    // carries 8-byte longs instead of n-gram strings. The prefix filter
    // is lossless under ANY consistent total order of the shingle
    // universe (rarest-first is a heuristic for candidate VOLUME, not
    // correctness), so the hash-order tie-break changes candidates, not
    // output. Collision odds: the documented 2^-64 argument; the oracle
    // keeps string shingles.
    val rsh = sh.join(reps.select(col("rep").as("doc_id")), Seq("doc_id"))
      .select(col("doc_id").as("rep"), xxhash64(col("shingle")).as("shingle"))
    val dfs = rsh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val rk = Window.partitionBy("rep").orderBy(col("df"), col("shingle"))
    // Round-10 (guide §1.2/§5; the WAND docInfo pattern): the RANKED
    // postings frame — every rep's shingles with their global-order rank
    // rk and the rep's set size sz — is what every downstream stage
    // consumes (prefix filter, pair generation, verify arrays). Left
    // lazy, each consumer re-ran the tokenize + rep semi-join + df join
    // + two windows (the round-9 plan carried FOUR parquet scans of the
    // corpus and a statically planned 335 MB broadcast of the postings
    // frame — the §3.1 estimate failure again). One eager checkpoint of
    // the fixed-width postings rows pays that lineage exactly once;
    // blocks are postings-linear (4 longs + an int per row) and freed by
    // the ContextCleaner when the frame is GC'd.
    val ranked = rsh.join(dfs, Seq("shingle"))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("rep")))
      .withColumn("rk", row_number().over(rk))
      .select("rep", "shingle", "sz", "rk")
      .localCheckpoint(true)
    val pref = ranked
      .filter(col("rk") <= col("sz") - ceil(col("sz") * minJaccard) + 1)
    // join form (not collect_list buckets): prefix buckets are small by
    // the rarest-first argument above, but the join streams the fan-out
    // of any residual hot bucket instead of materializing it in one task.
    // PPJoin LENGTH filter on the join condition: J >= t forces
    // min(sz) >= t * max(sz), so size-mismatched pairs never even leave
    // the bucket join (lossless). sz rides the checkpointed postings —
    // the round-9 sizes aggregate + join are gone.
    // Round-10 (verdict item 1; guide §2.3/§3.3): candidate PAIRS with
    // the PPJoin POSITIONAL bound (scaladoc point 3). The pair-grain
    // aggregate costs what the old explode+distinct over the same match
    // rows cost, and the bound prunes pairs 2.6x at the 10x gate
    // (3.14M -> 1.21M) before the verify ever sees them.
    val tt = minJaccard / (1.0 + minJaccard)
    val candPairs = pref.alias("a")
      // shuffle_hash: the prefix self-join otherwise sort-merges — two
      // ~1M-row sorts just to bucket on the shingle key; the hash build
      // per partition is prefix-bucket-bounded (rarest-first keeps
      // buckets small)
      .join(pref.alias("b").hint("shuffle_hash"),
        col("a.shingle") === col("b.shingle") &&
        col("a.rep") < col("b.rep") &&
        least(col("a.sz"), col("b.sz")).cast("double") >=
          greatest(col("a.sz"), col("b.sz")) * minJaccard)
      .groupBy(col("a.rep").as("ra"), col("b.rep").as("rb"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .agg(count(lit(1)).as("__pm"),
        max(col("a.rk")).as("__pa"), max(col("b.rk")).as("__pb"))
      .filter(col("__pm") +
        least(col("sza") - col("__pa"), col("szb") - col("__pb")) >=
        ceil((col("sza") + col("szb")) * lit(tt) - lit(1e-9)))
    // pair-cardinality frame with three consumers (the candidate-doc
    // set, the broadcast gate's count, and the verify join) — eagerly
    // checkpointed so the prefix self-join + pair aggregate run once
    // (the minhash `candidates` checkpoint discipline)
    val cp = candPairs.localCheckpoint(true)
    val candReps = cp
      .select(explode(array(col("ra"), col("rb"))).as("rep"))
      .distinct()
      // shuffle_hash: candReps is doc-cardinality (unbounded at corpus
      // scale — not broadcast by hint), and the build side is the
      // distinct rep set, bounded per partition after its aggregate
      .hint("shuffle_hash")
    // Round-10 verify (verdict item 1): PER-PAIR intersection over the
    // candidate reps' rank-ordered shingle arrays — the verify PPJoin
    // actually prescribes — replacing round 9's aggregated postings
    // self-join. The self-join cost Σ_shingle df_candidates² pair rows:
    // the df-HOT shingles the prefix filter pushed out of every prefix
    // RE-ENTERED through the candidates' full postings (12.6M-row /
    // 604 MB pair exchange into a 3.2 GB-peak aggregate at the 10x
    // gate), with the quadratic df² term waiting at corpus scale. The
    // array verify is linear in CANDIDATE PAIRS × doc length, with the
    // POSITIONAL DECOMPOSITION keeping the per-pair payload to tails:
    // inter = pmatch + |tailA ∩ tailB|, where tailX = X's elements of
    // rank > the pair's last shared prefix rank. (Proof: a shared
    // element is either in both prefixes — counted by pmatch, rank <=
    // pa by pa's maximality — or order-above the last shared prefix
    // element m, and every element below m in either doc sits below m's
    // rank in BOTH docs, i.e. inside both prefixes; so the rest ranks
    // > pa in A and > pb in B.) array_intersect over distinct-element
    // tails is exact — same inter, same output as the self-join.
    //
    // Attach strategy is COUNT-GATED like the phash broadcast
    // (PHashBroadcastMaxMedia): below the pair bound the doc-bounded
    // array table broadcasts and the pair stream never exchanges; above
    // it (any real corpus at scale) both attaches are SHUFFLE_HASH —
    // the array table is doc-cardinality and must never be broadcast
    // blind, and the pair stream must not be sorted just to pick up an
    // array. The gate reads one count off the already-checkpointed pair
    // frame. DedupSpec pins both paths to identical output.
    val arrays0 = ranked.join(candReps, Seq("rep"), "left_semi")
      .groupBy("rep")
      .agg(sort_array(collect_list(struct(col("rk"), col("shingle"))))
        .as("__o"))
      .select(col("rep"),
        expr("transform(__o, x -> x.shingle)").as("hs"))
      .localCheckpoint(true)
    val arrays =
      if (cp.count() <= broadcastMaxPairs) broadcast(arrays0)
      else arrays0.hint("shuffle_hash")
    val inter = cp
      .join(arrays.select(col("rep").as("ra"), col("hs").as("__hsa")),
        Seq("ra"))
      .select(col("ra"), col("rb"), col("sza"), col("szb"), col("__pm"),
        col("__pb"),
        slice(col("__hsa"), (col("__pa") + 1).cast("int"),
          col("sza").cast("int")).as("__ta"))
      .join(arrays.select(col("rep").as("rb"), col("hs").as("__hsb")),
        Seq("rb"))
      .select(col("ra").as("rep_a"), col("rb").as("rep_b"),
        col("sza"), col("szb"),
        (col("__pm") + size(array_intersect(col("__ta"),
          slice(col("__hsb"), (col("__pb") + 1).cast("int"),
            col("szb").cast("int")))).cast("long")).as("inter"))
    inter
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("rep_a"), col("rep_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("rep_a", "rep_b")
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

  /** Attach set sizes to intersection counts and threshold on Jaccard.
    *
    * The sizes side carries a SHUFFLE_HASH hint: Catalyst's size
    * estimate for the aggregated PAIR frame runs ~80x under its real
    * bytes (the round-9 PlanProbe caught a statically planned 805 MB /
    * 10.6M-row broadcast of `inter` at the 10x gate — two orders over
    * the 10 MB threshold, and the build+storage pressure was most of
    * dedup_paragraph_frac's in-bench spill), so the strategy must not
    * hang on that estimate. Building on sizes is the 100 TB-safe shape
    * either way: sizes is doc-cardinality (bounded per partition after
    * its exchange), pairs stream through unsorted — no pair-side
    * broadcast, no pair-side sort at any corpus size. */
  private def scoreJaccard(sh: DataFrame, inter: DataFrame,
                           minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      .hint("shuffle_hash")
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
                      maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // one shingle lineage feeds the signatures AND the exact verify; the
    // capped form re-derives from a single exchange-by-shingle (same
    // one-corpus-scan shape as jaccardPairs)
    val sh =
      if (maxShingleDf <= 0) shingles(docs, n)
      else shingles(docs, n)
        .groupBy("shingle").agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) <= maxShingleDf)
        .select(col("shingle"), explode(col("ds")).as("doc_id"))
    val sig = minhashFromShingles(sh, numHashes)
    val banded = bandHashes(sig, numHashes, bands)
    // NOT checkpointed (round-10: the round-9 advice to checkpoint this
    // two-consumer frame was tried and REVERTED on measurement — 11.6 ->
    // 20.3 s at the 10x gate): the candidates lineage shares the capped
    // shingle exchange with the verify path below, and an eager
    // checkpoint severs that reuse, so the shingle scan + cap aggregate
    // run twice. ReuseExchange dedups both the shingle exchange AND the
    // banding self-join across the two candidate consumers inside the
    // one final job; the AQE-identity risk the advice named has not
    // materialized in any committed plan (the *_after evidence carries
    // the ReusedExchange nodes).
    val candidates = banded.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
      .join(banded.select(col("doc_id").as("doc_b"), col("band"), col("band_hash")),
        Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // Exact-verify candidates only. Round-9 (guide §2.3/§3.3, the
    // cappedPairStats discipline): the old verify joined each candidate
    // PAIR against both full posting lists — the wide fan-out exchange
    // (pairs x set size rows, carrying shingle strings) the batch-A
    // jaccard rework removed — and then attached sizes with two more
    // pair-grain joins (scoreJaccard). Now the postings of CANDIDATE
    // DOCS only (semi-join by doc_id) rebuild sized buckets, pair
    // intersections explode locally per bucket carrying (sza, szb)
    // — bucket width still bounded by the df cap — and the LSH
    // candidate restriction applies as ONE pair-grain semi-join of two
    // aggregated pair frames. Pairs sharing a bucket but not
    // LSH-candidates are computed then dropped by the semi-join, so the
    // output is IDENTICAL to the old spelling at any input; identical
    // subtrees keep ReuseExchange sharing one shingle lineage. The
    // bucket rebuild is only safe because the df cap bounds bucket
    // width — the uncapped form keeps the streaming join verify.
    if (maxShingleDf <= 0) {
      val inter = candidates
        .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("shingle")),
          Seq("doc_b", "shingle"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      return scoreJaccard(sh, inter, minJaccard)
    }
    val candDocs = candidates
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val shc = sh.join(candDocs, Seq("doc_id"), "left_semi")
    val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val sized = shc.join(sizes, Seq("doc_id"))
      .groupBy("shingle")
      .agg(collect_list(struct(col("doc_id"), col("sz"))).as("ds"))
    val stats = sized
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .agg(count(lit(1)).as("inter"))
    stats.join(candidates, Seq("doc_a", "doc_b"), "left_semi")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** (doc_id, band, band_hash) rows from a signature table — the LSH
    * bucketing shared by the self-join (minhashLshPairs) and the
    * against-store form (lshCandidatesAgainstStore). */
  private def bandHashes(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    sig.select(col("doc_id"), posexplode(
      array((0 until bands).map { b =>
        xxhash64((b * rows until (b + 1) * rows)
          .map(i => element_at(col("signature"), i + 1)): _*)
      }: _*)).as(Seq("band", "band_hash")))
  }

  /** Incremental near-dup candidates: LSH-band join of a new batch against
    * a STORED MinHash signature table (`minhashSignatures` output persisted
    * at indexing time) — near-dup ingestion triage without re-touching, or
    * even retaining, the indexed corpus text. The store MUST have been
    * built with the same (numHashes, n) and df-cap policy; the batch's
    * df-cap is batch-local (a batch is too small to see corpus-level
    * boilerplate df, which the store's build already removed).
    *
    * Since stored text is unavailable, candidates carry the SIGNATURE
    * Jaccard estimate (matching positions / numHashes; unbiased, stderr
    * ~ 1/sqrt(numHashes)) rather than an exact verify — callers route
    * est >= threshold to quarantine or to a text-fetching verify stage.
    * The position-compare HOF is interpreted, but it runs only on
    * candidate pairs (band-join survivors), never the corpus.
    *
    * Scale notes (100 TB store): ONE equi-join keyed (band, band_hash);
    * the batch side is small, so AQE broadcasts it against the banded
    * store; per-bucket fan-out is batch-docs-in-bucket x store-docs-in-
    * bucket, bounded by band selectivity exactly as in the self-join. */
  def lshCandidatesAgainstStore(newDocs: DataFrame, storedSigs: DataFrame,
                                numHashes: Int = 32, bands: Int = 16,
                                n: Int = 3, minEstJaccard: Double = 0.5,
                                maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sh = capShingleDf(shingles(newDocs, n), maxShingleDf)
    val bsig = minhashFromShingles(sh, numHashes)
    val cand = bandHashes(bsig, numHashes, bands)
      .join(bandHashes(storedSigs, numHashes, bands)
        .withColumnRenamed("doc_id", "store_doc_id"),
        Seq("band", "band_hash"))
      .select("doc_id", "store_doc_id").distinct()
    cand
      .join(bsig.withColumnRenamed("signature", "__sa"), Seq("doc_id"))
      .join(storedSigs.select(col("doc_id").as("store_doc_id"),
        col("signature").as("__sb")), Seq("store_doc_id"))
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("__sa"), col("__sb"),
          (a, b) => a === b), x => x)).cast("double") / numHashes, 4))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("doc_id", "store_doc_id", "est_jaccard")
      .orderBy("doc_id", "store_doc_id")
  }

  /** 64-bit SimHash per doc: tf-weighted sign votes on each bit of
    * xxhash64(term). Engine-specific hash => property-tested, not oracled. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    // 64 vote lanes as aggregate COLUMNS over term occurrences — the
    // multi-lane shape minhashFromShingles already uses. The previous
    // explode(sequence(0, 63)) spelling multiplied every occurrence row
    // by 64 before its shuffle (the 100x probe measured 551M shuffle rows
    // and 49 GB of sort spill for ~8.6M occurrences); lanes keep the
    // exchange at one row per doc and let partial aggregation reduce
    // map-side. Vote arithmetic is unchanged: sum over occurrences of
    // +/-1 per bit == the old sum over distinct terms of +/-tf.
    val occ = Tokenize.termOccurrences(docs)
      .withColumn("h", xxhash64(col("term")))
    val lanes = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L)).as(s"v$b"))
    occ.groupBy("doc_id")
      .agg(lanes.head, lanes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
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

  /** LSH-bucketed embedding near-dup: candidates are pairs sharing a
    * single sign-bit bucket, so the quadratic term is bounded per bucket.
    * Recall < 1 by construction (same tradeoff as minhashLshPairs), exact
    * cosine verifies candidates. One band only — the banded form below is
    * the declared/primary query; this stays as the minimal one-bucket
    * building block. */
  def embeddingNearDupPairsLsh(embeddings: DataFrame, minCosine: Double = 0.4,
                               dims: Int = 64, nPlanes: Int = 8): DataFrame = {
    // corpus-adaptive bucket width (one scalar count to the driver): the
    // pinned nPlanes is the FLOOR; see adaptivePlanes for why fixed-width
    // sign-LSH cannot survive corpus growth
    val planes = Similarity.adaptivePlanes(embeddings.count(), nPlanes)
    val e = Similarity.withUnitVec(
      embeddings.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v")), "v")
      .withColumn("bucket", Similarity.lshBucket(col("v"), dims, planes))
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

  /** Banded sign-bit LSH embedding near-dup — THE primary pair query (the
    * 100 TB path). One band of r hyperplanes catches a pair at angle theta
    * with p = (1 - theta/pi)^r; `bands` independent plane sets (disjoint
    * coefficient ranges of Similarity.lshBucket's deterministic integer
    * hyperplanes) lift recall to 1-(1-p)^bands while every candidate join
    * stays bounded per (band, bucket) — never all-pairs. Candidates are
    * distinct'd across bands, then exact cosine verifies each once.
    *
    * The brute all-pairs form (embeddingNearDupPairs, below) is the
    * spec-only recall baseline: it is a BroadcastNestedLoopJoin over n^2/2
    * pairs and must never be the declared query at scale (round-2 review).
    */
  def embeddingNearDupPairsBanded(embeddings: DataFrame,
                                  minCosine: Double = 0.4, dims: Int = 64,
                                  nPlanes: Int = 8, bands: Int = 4): DataFrame = {
    // corpus-adaptive geometry (one scalar count to the driver): the
    // pinned (nPlanes, bands) are the FLOOR geometry; above the floor the
    // plane count grows log(n) to hold bucket occupancy at the target
    // and the band count grows with it to keep the recall curve graceful.
    // The oracle replays BOTH integer formulas, so adaptivity can never
    // desynchronize the engines (see adaptivePlanes).
    val planes = Similarity.adaptivePlanes(embeddings.count(), nPlanes)
    val nBands = Similarity.adaptiveBands(bands, nPlanes, planes)
    val e = Similarity.withUnitVec(
      embeddings.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v")), "v")
      .select(col("vec_id"), col("v"), col("u"))
    // one row per (vector, band) with that band's bucket id — sign bits are
    // computed from the raw vector (scale-invariant, same as the 1-band
    // form), all bands in one native pass over the vector
    val banded = e.select(col("vec_id"), posexplode(
      Similarity.lshBandBuckets(col("v"), dims, planes, nBands))
      .as(Seq("band", "bucket")))
    val cand = banded.select(col("vec_id").as("vec_a"), col("band"), col("bucket"))
      .join(banded.select(col("vec_id").as("vec_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("u").as("ua")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("u").as("ub")), Seq("vec_b"))
      .withColumn("cos", Similarity.dot(col("ua"), col("ub")))
      .filter(col("cos") >= minCosine)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** Benchmark decontamination — the training-pipeline op that near-dup
    * machinery exists to serve: flag corpus docs sharing at least
    * `minShared` distinct word n-gram shingles with ANY doc of an eval/
    * benchmark set. Scale shape: the eval set is small by nature, so its
    * distinct shingle universe broadcasts; the corpus pays one shingle
    * scan + a map-side-combined per-doc count — no corpus self-join, no
    * shuffle beyond the final aggregation. */
  def contaminationReport(docs: DataFrame, evalDocs: DataFrame, n: Int = 3,
                          minShared: Int = 2): DataFrame = {
    val evalShingles = shingles(evalDocs, n).select("shingle").distinct()
    shingles(docs, n)
      .join(broadcast(evalShingles), Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared")) // shingles() is distinct-per-doc
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_id")
  }

  /** Embedding-grain benchmark decontamination — the semantic complement
    * to contaminationReport: corpus vectors whose cosine against ANY
    * eval-set vector clears `minCosine` (paraphrased eval leakage that
    * n-gram overlap misses). The eval set here is a deterministic held-out
    * slice (vec_id % evalMod == 0) standing in for the benchmark
    * embeddings a real run would load. Candidates come from the SAME
    * banded sign-LSH buckets as embeddingNearDupPairsBanded — eval and
    * corpus rows meet only inside a (band, bucket) cell, never all-pairs —
    * then exact cosine verifies, and one max_by per corpus vector reports
    * its worst (closest) eval neighbor.
    *
    * Scale notes (100 TB): the eval side is benchmark-sized by nature, so
    * its banded frame is the small side of the bucket join (broadcast in
    * practice, hash-correct regardless); the corpus pays one scan + one
    * exchange by (band, bucket). Recall follows the banded-LSH curve —
    * the same declared tradeoff as the near-dup query, with the brute
    * eval×corpus form spec-only (it is the recall baseline, not the scale
    * path). */
  def embeddingContamination(embeddings: DataFrame, evalMod: Int = 17,
                             minCosine: Double = 0.35, dims: Int = 64,
                             nPlanes: Int = 6, bands: Int = 8): DataFrame = {
    // same corpus-adaptive geometry as embeddingNearDupPairsBanded (the
    // 100x probe measured THIS query at 261x for 100x rows on the fixed
    // 64-bucket width); floors unchanged, oracle replays the formulas
    val planes = Similarity.adaptivePlanes(embeddings.count(), nPlanes)
    val nBands = Similarity.adaptiveBands(bands, nPlanes, planes)
    val e = Similarity.withUnitVec(
      embeddings.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v")), "v")
      .select(col("vec_id"), col("v"), col("u"))
    val banded = e.select(col("vec_id"), posexplode(
      Similarity.lshBandBuckets(col("v"), dims, planes, nBands))
      .as(Seq("band", "bucket")))
    val isEval = col("vec_id") % evalMod === 0
    val cand = banded.filter(isEval)
      .select(col("vec_id").as("eval_id"), col("band"), col("bucket"))
      .join(banded.filter(!isEval)
        .select(col("vec_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select("vec_id", "eval_id").distinct()
    cand
      .join(e.select(col("vec_id"), col("u").as("uc")), Seq("vec_id"))
      .join(e.select(col("vec_id").as("eval_id"), col("u").as("ue")),
        Seq("eval_id"))
      .withColumn("cos", Similarity.dot(col("uc"), col("ue")))
      .filter(col("cos") >= minCosine)
      .groupBy("vec_id")
      // ties broken toward the LOWest eval id: max over (cos, -eval_id)
      .agg(max(struct(col("cos"), (-col("eval_id")).as("neg_eval"))).as("m"))
      .select(col("vec_id"), (-col("m.neg_eval")).as("eval_id"),
        round(col("m.cos"), 4).as("cosine"))
      .orderBy("vec_id")
  }

  /** Exact duplicated-substring report at n-token-window granularity (the
    * "how much of each doc is copied text" metric behind substring-level
    * training-data dedup): per doc, the share of its DISTINCT n-token
    * windows that also occur in at least one other doc. Large windows
    * (default 8) make cross-doc collisions of original text essentially
    * impossible, so shared_frac ≈ the copied fraction.
    *
    * Scale notes (100 TB): per-window document frequency and the per-doc
    * share both hash-partition by window — the groupBy and the join share
    * one exchange of the shingle lineage (ReuseExchange), and a hot window
    * (boilerplate header in millions of docs) costs df LINEAR join rows,
    * not the df^2 a pair-generator pays, so no df-cap is needed here. */
  def sharedNgramStats(docs: DataFrame, n: Int = 8): DataFrame = {
    // Round-10 skew fix (guide §2.5; round-9 verdict item 2): the
    // round-9 shape computed the cross-doc test as min/max over
    // Window.partitionBy(h) — ONE exchange, but a window has NO partial
    // aggregation, so every occurrence of a hot key (a boilerplate
    // window present in millions of docs) lands on one task and must be
    // BUFFERED there (WindowExec holds each key group in memory/spill):
    // a guaranteed straggler at corpus scale. The report only needs,
    // per doc, HOW MANY of its windows are shared — so invert:
    // aggregate (h) -> (count, min, max), and observe that every
    // UNSHARED h (min == max: all its rows in one doc) belongs entirely
    // to doc min(doc_id). Re-keying those singleton groups by that doc
    // gives per-doc unshared counts, and n_shared = n_windows -
    // n_unshared — bit-identical to the per-row min!=max flag on ANY
    // input (collisions included: the singleton sums count exactly the
    // rows the flag marked 0). Both grains — (h) for the shared test,
    // (doc_id) for n_windows — come out of ONE GROUPING SETS aggregate,
    // so the corpus is tokenized once and exchanged once (two separately
    // grouped aggregates would re-run the tokenize+shingle scan: each
    // consumer's column pruning breaks exchange-subtree identity, so
    // ReuseExchange cannot deduplicate them — measured +70% wall at the
    // 10x gate). Expand doubles rows BEFORE the partial aggregate, which
    // collapses a hot h map-side — full skew collapse with no sort and
    // no window buffering anywhere. The second grouping re-keys the
    // grain-mixed rows by doc in one more tiny aggregate. Keys stay
    // xxhash64 longs (round-9, guide §2.3); the DuckDB oracle keeps
    // string windows and stays hash-exact.
    val sh = shingles(docs, n)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    // __gid: 1 = grouped by h (doc_id aggregated), 2 = grouped by doc_id
    val g = sh.groupingSets(Seq(Seq(col("h")), Seq(col("doc_id"))),
        col("h"), col("doc_id"))
      .agg(grouping_id().as("__gid"), count(lit(1)).as("__cnt"),
        min("doc_id").as("__mn"), max("doc_id").as("__mx"))
    val per = g
      .filter(col("__gid") === 2 ||
        (col("__gid") === 1 && col("__mn") === col("__mx")))
      .groupBy(when(col("__gid") === 2, col("doc_id"))
        .otherwise(col("__mn")).as("doc_id"))
      .agg(sum(when(col("__gid") === 2, col("__cnt")).otherwise(0L))
          .as("n_windows"),
        sum(when(col("__gid") === 1, col("__cnt")).otherwise(0L))
          .as("__n_unshared"))
      .select(col("doc_id"), col("n_windows"),
        (col("n_windows") - col("__n_unshared")).as("n_shared_windows"))
    // short docs (< n tokens) have zero windows but must appear in the report
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_shared_windows"), lit(0L)).as("n_shared_windows"),
        round(when(coalesce(col("n_windows"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_shared_windows").cast("double") / col("n_windows")),
          4).as("shared_frac"))
      .orderBy("doc_id")
  }

  /** Paragraph-key base: pkey = doc_id * ParaKeyBase + para_id keeps the
    * composite key a plain LONG so the whole df-capped Jaccard path runs
    * unchanged at paragraph grain. 10^6 paragraphs per doc is far above
    * any real document; doc_ids stay safe below ~9.2e12. */
  val ParaKeyBase = 1000000L

  /** Re-materialize paragraph structure on the flat synthetic corpus
    * (which carries no newlines): insert a blank line after every
    * `every` whitespace tokens, with pure column ops — the same
    * fixture-assembly pattern as Multimodal.syntheticImageCorpus. The
    * paragraph split downstream then exercises the REAL `\n{2,}` regex
    * path a production corpus needs. */
  def withSyntheticParagraphs(docs: DataFrame, every: Int = 25): DataFrame = {
    val tk = split(col("text"), " ")
    val nChunks = ceil(size(tk) / lit(every.toDouble)).cast("int")
    docs.withColumn("text",
      array_join(transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
        i => array_join(slice(tk, i * every + 1, lit(every)), " ")), "\n\n"))
  }

  /** Split documents into (doc_id, para_id, para) on blank lines — the
    * granularity real pipelines dedup at alongside whole docs (boilerplate
    * headers/footers duplicate at paragraph level while their documents
    * stay unique). Empty/whitespace paragraphs drop out. */
  def paragraphs(docs: DataFrame, sep: String = "\n{2,}"): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), sep)).as(Seq("para_id", "para")))
      .filter(length(trim(col("para"))) > 0)

  /** Paragraph-grain near-dup report (round-5 verdict item #6): per doc,
    * how many of its paragraphs near-duplicate (n-gram Jaccard >=
    * `minJaccard`) a paragraph of a DIFFERENT doc, and the duplicated
    * fraction. The pair generation is literally `jaccardPairsFromShingles`
    * — the same ONE-exchange-by-shingle, df-capped, bucket-bounded path as
    * doc-level dedup — run over paragraph keys, so every scale property
    * (cap^2 per-task bound, no all-pairs, AQE skew split) carries over
    * verbatim. Cross-doc filtering happens on the pair frame (pkey DIV
    * base recovers the doc), and the report is two tiny per-doc
    * aggregates joined back to the doc spine. */
  def paragraphDupFraction(docs: DataFrame, n: Int = 3,
                           minJaccard: Double = 0.5,
                           maxShingleDf: Int = DefaultMaxShingleDf): DataFrame = {
    val pars = paragraphs(docs)
    val asDocs = pars.select(
      (col("doc_id") * ParaKeyBase + col("para_id")).as("doc_id"),
      col("para").as("text"))
    // Shingle hashing (the round-8 spill fix: paragraph grain multiplies
    // shingle ROWS ~5x over doc grain, and the bucket aggregate's sort
    // buffers crossed the per-task budget holding full shingle STRINGS —
    // spill 759 MB -> 0 once keys became fixed-width longs) now lives in
    // cappedPairStats itself (round-9: every capped-jaccard caller gets
    // it), so this caller passes plain string shingles again instead of
    // hashing twice.
    val pairs = jaccardPairsFromShingles(shingles(asDocs, n),
      minJaccard, maxShingleDf)
      .filter(expr(s"doc_a DIV $ParaKeyBase") =!= expr(s"doc_b DIV $ParaKeyBase"))
    val dup = pairs.select(col("doc_a").as("pkey"))
      .union(pairs.select(col("doc_b").as("pkey"))).distinct()
    val np = pars.groupBy("doc_id").agg(count(lit(1)).as("n_paras"))
    val nd = dup.select(expr(s"pkey DIV $ParaKeyBase").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    docs.select("doc_id")
      .join(np, Seq("doc_id"), "left").join(nd, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_paras"),
        round(when(coalesce(col("n_paras"), lit(0L)) === 0, lit(0.0))
          .otherwise(coalesce(col("n_dup"), lit(0L)).cast("double") /
            col("n_paras")), 4).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** Exact duplicated-SPAN extraction (round-5 verdict item #3) — the
    * remove-duplicated-substrings step real training pipelines run:
    * instead of `sharedNgramStats`' per-doc share, emit the actual
    * maximal token spans (doc_id, span_start, span_end) covered by
    * k-token windows that occur verbatim in at least one OTHER document.
    * Downstream curation cuts these spans out of the training text.
    *
    * Shape: positional k-windows (one posexplode of the codegen shingle
    * array), window-frequency by DISTINCT doc (>= 2 docs = cross-doc
    * repeat), join back to positions, then a per-doc gaps-and-islands
    * merge of the [pos, pos+k) intervals (adjacent-or-overlapping
    * windows coalesce into one span).
    *
    * Scale notes (100 TB): the distinct + count + join all hash by
    * window text — one exchange family over the shingle lineage, linear
    * in corpus windows (df-linear join rows, never df^2 pairs: this
    * operator reports positions, it never generates doc pairs). The
    * island merge exchanges (doc_id, pos) pairs only — positions of
    * SHARED windows, a small fraction of the corpus — and the window
    * spec is per-doc, so no global sort anywhere. Hot boilerplate
    * windows cost df join rows each, exactly like sharedNgramStats. */
  def duplicatedSpans(docs: DataFrame, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.TextFunctions.ensureRegistered(docs.sparkSession)
    // Round-10 skew fix (guide §2.5; round-9 verdict item 2): round 9
    // computed the cross-doc test as min/max over Window.partitionBy(h)
    // — one exchange of hashed longs, but a window has NO partial
    // aggregation: every occurrence of a hot window (boilerplate in
    // millions of docs) lands on one task and is BUFFERED there
    // (WindowExec holds each key group in memory/spill): a guaranteed
    // straggler at corpus scale. Two-level instead: the shared-h set
    // comes from a groupBy(h) min/max — a hash aggregate that STREAMS a
    // hot key in constant memory — and positions attach back via a
    // left-semi SHUFFLE_HASH join whose probe side also streams. The
    // window frame has two consumers (that aggregate and the join
    // probe); left lazy, each re-runs the tokenize+posexplode scan —
    // per-consumer column pruning makes the two exchange subtrees
    // canonically different, so ReuseExchange cannot deduplicate them
    // (measured +30% wall at the 10x gate). One eager localCheckpoint
    // materializes the frame once for both: one tokenize total, then
    // the aggregate exchanges PARTIAL-COLLAPSED rows (a hot h folds to
    // one row per map task before the shuffle — the skew collapse the
    // window never had) and the probe exchanges the raw positions it
    // must move anyway. (A repartition(h) before the checkpoint would
    // make both consumers exchange-free in principle, but AQE-executed
    // checkpoints surface UnknownPartitioning, so the exchange returns
    // — verified in the executed plan; the plain checkpoint is the
    // shape that actually wins.) The frame is 3 fixed-width columns per
    // window (the compact lineage-cut the centeredFrame checkpoint
    // precedent established); blocks are freed by the ContextCleaner
    // when the frame is GC’d. Same test as round 9 (a window occurs in
    // >= 2 distinct docs iff min(doc_id) != max(doc_id) over its rows —
    // within-doc repeats can’t separate min from max), same xxhash64
    // keys (round-9, guide §2.3); the DuckDB oracle keeps string
    // windows and stays hash-exact.
    val wins = docs.select(col("doc_id"), Tokenize.tokens(col("text")).as("t"))
      .select(col("doc_id"), posexplode(
        graft.functions.TextFunctions.shingles(col("t"), k)).as(Seq("pos", "win")))
      .select(col("doc_id"), col("pos"), xxhash64(col("win")).as("h"))
      .localCheckpoint(true)
    val sharedH = wins.groupBy("h")
      .agg(min("doc_id").as("__mn"), max("doc_id").as("__mx"))
      .filter(col("__mn") =!= col("__mx"))
      .select("h")
      // shuffle_hash, not broadcast: the shared-window set is
      // corpus-scale (unbounded), and it arrives pre-partitioned by h
      // from its aggregate
      .hint("shuffle_hash")
    val hits = wins.join(sharedH, Seq("h"), "left_semi")
      .select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val run = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits
      .withColumn("prev", lag("pos", 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + k, 1L)
          .otherwise(0L))
      .withColumn("island", sum("brk").over(run))
      .groupBy("doc_id", "island")
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + k).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_tokens"))
      .orderBy("doc_id", "span_start")
  }

  // Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) defaults: k-token
  // rolling-hash windows, winnow window w. Guarantee: any shared token
  // run of >= w + k - 1 tokens contributes at least one SHARED selected
  // fingerprint, while expected density is only 2/(w+1) of windows — the
  // sketch real pipelines store instead of full shingle sets. Named so
  // SparkEntry's oracle SQL interpolates the SAME constants.
  val DefaultWinnowK = 5
  val DefaultWinnowW = 4
  val DefaultWinnowMinJaccard = 0.25

  /** Encodes (hash, rightmost-position) into one long for the frame min:
    * val = h * base + (base-1 - pos), so min() orders by hash first and
    * then by LARGEST position (the robust-winnowing rightmost-min
    * tie-break). Bounds: h < 2^31 (RollingHashExpr.HashM), so the
    * product stays under 2^53; pos must stay under base = 2^22 (4M
    * windows per document — raise the base before ingesting longer
    * docs; h * 2^22 leaves 2^62 headroom). */
  val WinnowPosBase = 1L << 22

  private def winnowSelect(docs: DataFrame, k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.TextFunctions.ensureRegistered(docs.sparkSession)
    val hashed = docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.rollingHashes(
          Tokenize.tokens(col("text")), k).as("hs"))
      .select(col("doc_id"), posexplode(col("hs")).as(Seq("pos", "h")))
    val byDoc = Window.partitionBy("doc_id")
    val frame = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    // Every window start p with a full w-frame contributes its frame min;
    // docs with fewer than w windows keep only p = 0, whose truncated
    // frame is the whole doc — the global min, still >= 1 fingerprint.
    hashed
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("sel", min(col("h") * WinnowPosBase +
        lit(WinnowPosBase - 1) - col("pos")).over(frame))
      .filter(col("pos") <= greatest(col("n") - w, lit(0)))
      .select(col("doc_id"),
        (lit(WinnowPosBase - 1) - (col("sel") % WinnowPosBase)).as("fp_pos"),
        expr(s"sel DIV $WinnowPosBase").as("fp"))
      .distinct()
  }

  /** Winnowed document fingerprints: (doc_id, fp_pos, fp) — the selected
    * k-gram rolling-hash values and the positions they cover. One
    * exchange by doc_id (the per-doc window pair); the rolling-hash pass
    * itself is a codegen scan, O(tokens) per doc regardless of k.
    *
    * Scale notes (100 TB): output is ~2/(w+1) of corpus windows — this
    * IS the compression: downstream consumers (the pair join, a
    * fingerprint store) handle a 3x-smaller frame than the shingle
    * index, with the collision-resistance of a 31-bit hash per entry.
    * Reference surface: `app/prepare_data.py`'s doc identity column,
    * generalized to the positional sketch real dedup pipelines store. */
  def winnowFingerprints(docs: DataFrame, k: Int = DefaultWinnowK,
                         w: Int = DefaultWinnowW): DataFrame =
    winnowSelect(docs, k, w).orderBy("doc_id", "fp_pos")

  /** Near-dup pairs by Jaccard over winnowed fingerprint SETS — the
    * sketch-level twin of jaccardPairs: same df-capped one-exchange
    * bucket path (cap^2-per-task bound, no all-pairs, AQE skew split all
    * carry over verbatim via jaccardPairsFromShingles), but each doc is
    * represented by its ~2/(w+1)-density fingerprint sketch instead of
    * every shingle, so the exchanged bytes drop by the same factor and
    * the bucket key is an 8-byte long instead of a k-token string. */
  def winnowPairs(docs: DataFrame, k: Int = DefaultWinnowK,
                  w: Int = DefaultWinnowW,
                  minJaccard: Double = DefaultWinnowMinJaccard,
                  maxFpDf: Int = DefaultMaxShingleDf): DataFrame = {
    val fps = winnowSelect(docs, k, w)
      .select(col("doc_id"), col("fp").as("shingle")).distinct()
    jaccardPairsFromShingles(fps, minJaccard, maxFpDf)
  }

  // Content-defined chunking (Muthitacharoen et al. LBFS, SOSP'01; the
  // rsync/restic/casync chunking family) defaults, named so the oracle
  // SQL interpolates the SAME constants. k-token rolling-hash window;
  // a chunk boundary falls after any window whose hash % mask == 0, so
  // expected chunk length is ~mask tokens and boundaries depend only on
  // LOCAL content — an insertion re-chunks one chunk, not the rest of
  // the document (the shift-robustness fixed-size blocks lack).
  val DefaultCdcK = 5
  val DefaultCdcMask = 16

  /** Content-defined chunks per doc: (doc_id, chunk_idx, start_tok,
    * n_tokens, chunk_md5). Boundaries from the O(tokens) codegen
    * rolling-hash pass; chunk ranges derive from the boundary list with
    * array arithmetic (no token explode, no window function — the whole
    * operator is one codegen projection per doc). Docs shorter than k
    * tokens yield one whole-doc chunk; empty docs yield none.
    *
    * Scale notes (100 TB): scan-shaped — per-doc work is linear in
    * tokens, no exchange except the output sort. The chunk table this
    * emits is the storage/transfer dedup primitive: downstream, equal
    * chunk_md5 = equal content regardless of where it sits in a doc. */
  def cdcChunks(docs: DataFrame, k: Int = DefaultCdcK,
                mask: Int = DefaultCdcMask): DataFrame = {
    graft.functions.TextFunctions.ensureRegistered(docs.sparkSession)
    val withBounds = docs
      .select(col("doc_id"), Tokenize.tokens(col("text")).as("t"))
      .withColumn("hs", graft.functions.TextFunctions.rollingHashes(col("t"), k))
      .withColumn("bs", expr(
        s"filter(transform(hs, (h, i) -> IF(h % $mask = 0, i + ${k - 1}, -1)), b -> b >= 0)"))
      .withColumn("starts", expr("concat(array(0), transform(bs, b -> b + 1))"))
      .withColumn("ends", expr("concat(bs, array(size(t) - 1))"))
    withBounds
      .select(col("doc_id"), col("t"),
        posexplode(arrays_zip(col("starts"), col("ends")))
          .as(Seq("chunk_idx", "se")))
      .filter(col("se.starts") <= col("se.ends"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("se.starts").cast("long").as("start_tok"),
        (col("se.ends") - col("se.starts") + 1).cast("long").as("n_tokens"),
        md5(array_join(expr("slice(t, se.starts + 1, se.ends - se.starts + 1)"),
          " ")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Cross-doc shared CDC chunks: chunk hashes held by >= 2 distinct
    * docs, with document frequency and length. THE content-defined
    * property on display: because boundaries are local, a doc embedded
    * in another (the excerpt fixture) re-derives the SAME chunk
    * boundaries for the shared region, so shared chunks align and match
    * by hash even though the copy sits at a different offset — fixed
    * blocks would miss every pair. One chunking scan + one md5-keyed
    * aggregate; the exchange carries (hash, doc) pairs, never text. */
  def cdcSharedChunks(docs: DataFrame, k: Int = DefaultCdcK,
                      mask: Int = DefaultCdcMask): DataFrame =
    cdcChunks(docs, k, mask)
      .groupBy(col("chunk_md5"), col("n_tokens"))
      .agg(countDistinct(col("doc_id")).as("df"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("df") >= 2)
      .orderBy("chunk_md5")

  // Planted boilerplate lines for the line-dedup query (the synthetic
  // corpus has no repeated lines of its own, the same reason the
  // excerpt/paragraph fixtures exist). Named so the oracle interpolates
  // identical strings.
  val BoilerplateHeader = "subscribe to our newsletter for updates"
  val BoilerplateFooter = "all rights reserved contact us for details"
  val DefaultLineMinDf = 3

  /** Prepend the header line to every `headEvery`-th doc and append the
    * footer to every `footEvery`-th — the scraped-page shape (nav chrome
    * and legal footers repeated across a site) line dedup exists to cut. */
  def withSyntheticBoilerplate(docs: DataFrame, headEvery: Int = 2,
                               footEvery: Int = 3): DataFrame =
    docs.withColumn("text", concat(
      when(col("doc_id") % headEvery === 0, lit(BoilerplateHeader + "\n"))
        .otherwise(lit("")),
      col("text"),
      when(col("doc_id") % footEvery === 0, lit("\n" + BoilerplateFooter))
        .otherwise(lit(""))))

  /** Exact line-level boilerplate removal (the C4/CCNet line-dedup pass):
    * a line whose EXACT content appears in >= `minDf` distinct documents
    * is chrome, not content — drop it everywhere. Emits per doc the line
    * counts and the md5 of the CLEANED text (kept lines re-joined in
    * line order), which is what downstream stages would train on.
    *
    * Scale notes (100 TB): the df count exchanges md5 hashes, never line
    * text; the hot set is tiny by construction (only lines repeated
    * across >= minDf docs) so the tag join broadcasts; reconstruction
    * groups by doc_id with an in-group array_sort on (line_id) — per-doc
    * work, no global sort. */
  def lineDedup(docs: DataFrame, minDf: Int = DefaultLineMinDf): DataFrame = {
    val lines = docs.select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("line_id", "line")))
      .filter(length(trim(col("line"))) > 0)
    val hot = lines.select(col("doc_id"), md5(col("line")).as("h")).distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("h"), lit(true).as("dup"))
    lines.withColumn("h", md5(col("line")))
      .join(broadcast(hot), Seq("h"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_removed"),
        md5(array_join(transform(
          array_sort(collect_list(when(!coalesce(col("dup"), lit(false)),
            struct(col("line_id"), col("line"))))),
          x => x.getField("line")), "\n")).as("cleaned_hash"))
      .orderBy("doc_id")
  }

  /** Connected components over near-dup pairs: every doc in a duplicate
    * cluster gets the cluster's minimum doc_id as its cluster_id — the
    * step that turns pairwise similarity into an actionable keep/drop
    * decision for a training corpus.
    *
    * Iterative min-label propagation ACCELERATED by pointer jumping (the
    * Pregel/GraphX formulation plus the classic path-doubling step): each
    * round every node takes the min of its own and its neighbors' labels,
    * then re-labels through its own label's label (valid because labels
    * are monotone: cluster_id <= doc_id from initialization on, so the
    * lookup only ever lowers a label). Plain propagation needs O(cluster
    * diameter) rounds — fine for shallow near-dup clusters but fatal for
    * path-shaped graphs (a grid DBSCAN eps-graph has hop diameter in the
    * hundreds); the two chained jumps per round (round 10) QUARTER
    * every label-chain, so convergence is O(log diameter) regardless of
    * shape with about half the eager rounds a single jump needed. The fixed point
    * is unchanged: stability under neighbor-min forces equal labels
    * across every edge, i.e. the component minimum.
    *
    * Each round's labels are EAGERLY localCheckpoint-ed, which truncates
    * lineage: the round plan references the previous labels twice (once
    * under the neighbor aggregate, once in the update join), so without
    * truncation the logical plan DOUBLES per round — a >20-round run
    * OOMed the driver on plan bookkeeping alone, long before any data
    * pressure (round-6 DBSCAN incident). With truncation every round
    * re-optimizes the same constant-size plan. Per-round checkpoint
    * blocks (tiny: two longs per node) are freed by the ContextCleaner
    * as each round's reference is dropped. The per-round convergence
    * check is a count of changed labels, not a data collect. The
    * RETURNED frame
    * is an EAGER localCheckpoint of the final labels: materialized and
    * lineage-free, with every loop cache released before return — nothing
    * stays pinned in the session cache manager, and the checkpoint blocks
    * themselves are freed by the ContextCleaner when the frame is GC'd (no
    * unpersist contract for the caller; round-2 review found no caller ever
    * honored one). Cluster caveat: localCheckpoint truncates lineage, so on
    * a real cluster a lost executor cannot recompute its blocks — swap in a
    * reliable `checkpoint()` (HDFS-backed) there; the algorithm is
    * unchanged. Deterministic: min over an undirected edge set, independent
    * of partition layout. Throws (releasing all caches) if maxIter rounds
    * don't converge. */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // materialize the (possibly expensive) pair pipeline ONCE before the
    // two-direction union reads it twice — the eager count is a cache
    // warm-up over the small pair set, not a data collect
    val p = pairs.select(col("doc_a"), col("doc_b")).persist()
    p.count()
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().persist()
    try {
      // round 0 fused into initialization: label = min(self, direct
      // neighbors) from one aggregation over the edge list
      var labels = edges.groupBy("src")
        .agg(least(col("src"), min(col("dst"))).as("cluster_id"))
        .withColumnRenamed("src", "doc_id").localCheckpoint(true)
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        // neighbor minima + label update + changed flag in ONE pass,
        // then the pointer jump: re-label every node through the label
        // of its own just-updated label. `stepped` is keyed by doc_id
        // and every cluster_id IS a node id present in the table, so the
        // self-lookup always hits; the left join + coalesce covers the
        // root nodes defensively.
        val neighborMin = edges
          .join(labels.withColumnRenamed("doc_id", "dst"), Seq("dst"))
          .groupBy(col("src").as("doc_id")).agg(min("cluster_id").as("__nmin"))
        val stepped = labels.withColumnRenamed("cluster_id", "__prev")
          .join(neighborMin, Seq("doc_id"), "left")
          .select(col("doc_id"), col("__prev"),
            least(col("__prev"), coalesce(col("__nmin"), col("__prev")))
              .as("__mid"))
          // materialized once: the jumps below read it on FOUR sides of
          // self-joins, and checkpointing beats recomputing the
          // edge-join aggregate that many times per round
          .localCheckpoint(true)
        // Round-10 (verdict item 6; guide §5): TWO pointer jumps per
        // checkpointed round instead of one. Each jump is a node-grain
        // self-lookup — far cheaper than the edge-join pass — and both
        // read only the checkpointed `stepped` leaf, so the lazy plan
        // stays constant-size. Label chains quarter instead of halve
        // per round: convergence needs ~half the rounds, i.e. ~half the
        // eager-checkpoint jobs and driver round-trips the loop pays —
        // which the 10x PlanProbe showed dominating every caller of
        // this loop. Monotonicity keeps any jump count valid (labels
        // only decrease; the fixed point — stability under neighbor
        // min — is unchanged, and convergence still means no label
        // moved across the whole doubled round).
        val lut = stepped.select(col("doc_id").as("__k"),
          col("__mid").as("__v"))
        val once = stepped
          .join(lut.withColumnRenamed("__k", "__mid")
            .withColumnRenamed("__v", "__jump"), Seq("__mid"), "left")
          .select(col("doc_id"), col("__prev"),
            least(col("__mid"), coalesce(col("__jump"), col("__mid")))
              .as("__j1"))
        val next = once
          .join(lut.withColumnRenamed("__k", "__j1")
            .withColumnRenamed("__v", "__jump2"), Seq("__j1"), "left")
          .select(col("doc_id"),
            least(col("__j1"), coalesce(col("__jump2"), col("__j1")))
              .as("cluster_id"),
            (least(col("__j1"), coalesce(col("__jump2"), col("__j1")))
              < col("__prev")).as("__changed"))
          .localCheckpoint(true)
        converged = next.filter(col("__changed")).count() == 0
        labels.unpersist()
        labels = next
        i += 1
      }
      if (!converged) {
        labels.unpersist()
        throw new IllegalArgumentException(
          s"duplicateClusters: not converged after $maxIter rounds")
      }
      val out = labels.select("doc_id", "cluster_id").orderBy("doc_id")
        .localCheckpoint(true)
      labels.unpersist()
      out
    } finally {
      edges.unpersist()
      p.unpersist()
    }
  }

  /** The docs to KEEP after near-dup clustering: everything except
    * non-representative cluster members (cluster_id != doc_id). Docs in no
    * cluster are kept by the anti-join untouched. */
  def keepList(docs: DataFrame, clusters: DataFrame): DataFrame =
    docs.select("doc_id")
      .join(clusters.filter(col("cluster_id") =!= col("doc_id"))
        .select("doc_id"), Seq("doc_id"), "left_anti")
      .orderBy("doc_id")

  /** Blocked edit-distance near-dup pairs: Levenshtein over a normalized
    * text prefix, with candidate pairs generated by a BLOCKING key (first
    * `blockChars` chars + a length band) — the classic record-linkage
    * shape for catching small in-place edits that shingle Jaccard also
    * sees but SimHash/MinHash band geometry can miss at low edit counts.
    *
    * Scale notes (100 TB): all-pairs Levenshtein is O(n^2 · L^2) and dead
    * on arrival; blocking bounds the self-join fan-out by block size the
    * same way shingle buckets bound jaccardPairs (block key skew is the
    * analogous hazard — a boilerplate prefix shared by millions of docs —
    * and gets the same df-cap treatment via `maxBlockSize`). Distance is
    * computed on a fixed `prefixLen` prefix so per-pair cost is O(64^2)
    * regardless of document length. Recall is bounded by construction
    * (edits inside the block key or length-band stragglers are missed) —
    * mirrored exactly in the oracle, which computes the same blocking.
    *
    * Text is ASCII-normalized (non-ASCII stripped) before anything else:
    * Spark's `levenshtein` counts CODEPOINT edits while DuckDB's counts
    * BYTE edits, so a single multi-byte character would make the two
    * engines disagree on distance; restricting to ASCII makes the metric
    * identical by construction (and near-dup blocking on ASCII-folded
    * text is standard curation practice anyway). */
  def editDistancePairs(docs: DataFrame, prefixLen: Int = DefaultEditPrefixLen,
                        maxDist: Int = DefaultEditMaxDist,
                        blockChars: Int = DefaultEditBlockChars,
                        lengthBand: Int = DefaultEditLengthBand,
                        maxBlockSize: Int = DefaultMaxShingleDf): DataFrame = {
    val norm = regexp_replace(lower(col("text")), "[^\\x00-\\x7F]", "")
    val keyed = docs.select(col("doc_id"),
      substring(norm, 1, prefixLen).as("prefix"),
      concat_ws("|", substring(norm, 1, blockChars),
        floor(length(norm) / lit(lengthBand)).cast("long")).as("block"))
    val bounded =
      if (maxBlockSize <= 0) keyed
      else {
        val hot = keyed.groupBy("block").agg(count(lit(1)).as("n"))
          .filter(col("n") > maxBlockSize).select("block")
        keyed.join(broadcast(hot), Seq("block"), "left_anti")
      }
    val a = bounded.select(col("doc_id").as("id_a"), col("prefix").as("pref_a"),
      col("block"))
    val b = bounded.select(col("doc_id").as("id_b"), col("prefix").as("pref_b"),
      col("block"))
    // threshold-banded early-exit kernel: exact for dist <= maxDist,
    // maxDist+1 beyond — output-identical to full levenshtein under the
    // <= maxDist filter (the oracle keeps DuckDB's plain levenshtein)
    graft.functions.StringDistanceFunctions.ensureRegistered(docs.sparkSession)
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.StringDistanceFunctions
          .bandedLevenshtein(col("pref_a"), col("pref_b"), maxDist)
          .cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
      .orderBy("id_a", "id_b")
  }

  /** Brute all-pairs embedding near-dup — SPEC-ONLY recall baseline, not a
    * declared query: the pair generator is an O(n^2) nested-loop join that
    * cannot survive scale. DedupSpec uses it to pin the banded/1-band LSH
    * forms' output (identical cosines, subset/equality relations); anything
    * production-shaped goes through embeddingNearDupPairsBanded. */
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

  /** PageRank over the near-dup similarity graph: which documents sit at
    * the CENTER of duplication neighborhoods — the centrality a curation
    * pipeline uses to pick cluster representatives or spot template hubs
    * that connected components (one flat cluster id) can't rank.
    *
    * Same iterative discipline as duplicateClusters/kmeansFit: the
    * (expensive) pair generation and the degree table are checkpointed
    * ONCE, each round is one edges⋈rank join + keyed aggregate re-using
    * the same dst partitioning, and rounds are cut loose with eager
    * localCheckpoint so no lineage or cache pin outlives the call. The
    * node count is a 1-row scalar fetch (the writeZOrdered exception),
    * never a data collect. Every node of the undirected graph has
    * degree >= 1, so there is no dangling-mass term. Ranks are doubles;
    * the per-node neighbor sums are few terms wide, so round(6) output
    * absorbs the sub-ulp association noise (the avg_logp rule). */
  def similarityPageRank(docs: DataFrame, minJaccard: Double = 0.05,
                         maxShingleDf: Int = DefaultMaxShingleDf,
                         iters: Int = 3, damping: Double = 0.85): DataFrame =
    pageRankFromPairs(jaccardPairs(docs, 3, minJaccard, maxShingleDf)
      .select("doc_a", "doc_b"), iters, damping)

  /** PageRank over an already-built pair frame — the entry point shared
    * with clusterRepresentatives, which reuses one pair generation for
    * both the component labels and the centrality. */
  def pageRankFromPairs(pairs: DataFrame, iters: Int = 3,
                        damping: Double = 0.85): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"),
        col("doc_a").as("dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val nNodes = deg.count().toDouble
    // zero-pair graph (e.g. an all-empty corpus): empty result with the
    // schema intact, not a 1/0 ANSI throw inside the rank seed
    if (nNodes == 0)
      return deg.select(col("src").as("doc_id"),
        round(lit(0.0), 6).as("pagerank"))
    var pr = deg.select(col("src").as("node"), (lit(1.0) / nNodes).as("pr"))
    var i = 0
    while (i < iters) {
      pr = edges
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("deg")).as("__m"))
        .select(col("dst").as("node"),
          ((lit(1.0) - lit(damping)) / nNodes +
            lit(damping) * col("__m")).as("pr"))
        .localCheckpoint(true)
      i += 1
    }
    pr.select(col("node").as("doc_id"), round(col("pr"), 6).as("pagerank"))
      .orderBy("doc_id")
  }

  /** Fixed-k core of the near-dup graph by iterative peeling: repeatedly
    * drop nodes with fewer than `k` surviving neighbors; what remains is
    * the dense interior — template farms and mass-duplication hubs that
    * pairwise thresholds and PageRank both smear (a node with 100
    * weak-tie neighbors outranks a 5-clique member on PageRank, but only
    * the clique survives a 2-core peel). Output: surviving docs with
    * their within-core degree.
    *
    * Peeling is monotone (the active set only shrinks), so the fixed
    * point is idempotent: the loop early-stops when a round removes
    * nothing, while the oracle unrolls all `rounds` — extra unrolled
    * rounds are identity, so the two agree whenever the loop converges,
    * and when it does NOT converge in `rounds` both sides have executed
    * exactly the same `rounds` peels. (A path graph peels one node per
    * round from each end — real near-dup components are clique-like and
    * converge in 1-2 rounds, which `rounds = 8` covers with margin.)
    *
    * Scale notes (100 TB): each round is one (active-filtered) degree
    * aggregate — two hash semi-joins of an ids-only frame against the
    * once-materialized edge list, exchange keyed by node id; per-round
    * localCheckpoint keeps lineage flat (the kmeansFit discipline). No
    * driver-side data beyond the per-round convergence count. */
  def kCoreFromPairs(pairs: DataFrame, k: Int = 2, rounds: Int = 8): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"),
        col("doc_a").as("dst")))
      .localCheckpoint(true)
    def degrees(active: DataFrame): DataFrame = edges
      .join(active.select(col("node").as("src")), Seq("src"))
      .join(active.select(col("node").as("dst")), Seq("dst"))
      .groupBy("src").agg(count(lit(1)).as("deg"))
    var active = edges.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    var nActive = active.count()
    var i = 0
    var stable = false
    while (i < rounds && !stable) {
      val next = degrees(active).filter(col("deg") >= k)
        .select(col("src").as("node"))
        .localCheckpoint(true)
      val n = next.count()
      stable = n == nActive
      active = next
      nActive = n
      i += 1
    }
    degrees(active)
      .select(col("src").as("doc_id"), col("deg").as("core_deg"))
      .orderBy("doc_id")
  }

  /** 2-core of the trigram-Jaccard near-dup graph (the declared-query
    * composition: same pair generation as duplicateClusters). */
  def kCore(docs: DataFrame, k: Int = 2, minJaccard: Double = 0.5,
            maxShingleDf: Int = DefaultMaxShingleDf): DataFrame =
    kCoreFromPairs(jaccardPairs(docs, 3, minJaccard, maxShingleDf), k)

  /** Label-propagation COMMUNITIES over the near-dup graph — the
    * density-aware complement to duplicateClusters' connected
    * components: CC merges everything reachable (one weak bridge fuses
    * two template farms), LPA lets each node adopt its neighborhood's
    * MODAL label, so bridges lose the vote and dense regions keep
    * distinct communities. Fixed `rounds` synchronous updates from
    * label=id with a fully deterministic tie-break (highest count, then
    * lowest label) — no RNG, no partition-order dependence, so the
    * oracle unrolls the rounds CTE-by-CTE like pageRankFromPairs.
    *
    * Scale notes (100 TB): each round — edges join the label frame on
    * dst, a (node, label) count-aggregate, then a per-node argmax as a
    * lexicographic struct MAX instead of a row_number window: both
    * aggregates partial-aggregate map-side and never sort, where the
    * window sorted every (node, label) partition per round; work is
    * O(|E|) per round with no all-pairs step anywhere (edges come from
    * the df-capped pair lineage). At the default depth the whole
    * propagation stays ONE lazy plan over the checkpointed edge frame:
    * no per-round eager checkpoint jobs (the flat-lineage discipline
    * duplicateClusters needs for its unbounded convergence loop buys
    * nothing for a depth-3 chain, and at 10x the per-round driver
    * round-trips were most of the wall). `rounds` is a public parameter,
    * though, so deep callers are guarded: every [[LpaCheckpointEvery]]
    * rounds the label frame is eagerly localCheckpoint'ed, truncating
    * lineage so analysis/optimization cost stays bounded per block of
    * rounds instead of growing with the whole chain. The label frame is
    * NOT broadcast by hint — one row per node, unbounded at corpus
    * scale; AQE may still choose to at small n. */
  /** Rounds per lazy-plan block in [[lpaCommunities]]: within a block the
    * propagation is one Catalyst plan (3 nodes/round); at each block
    * boundary the label frame is localCheckpoint'ed. 8 keeps the default
    * depth-3 call checkpoint-free while capping plan depth at ~24 nodes
    * for arbitrarily deep callers. */
  val LpaCheckpointEvery = 8

  def lpaCommunities(pairs: DataFrame, rounds: Int = 3): DataFrame = {
    val p = pairs.select(col("doc_a"), col("doc_b"))
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
    var t = 0
    while (t < rounds) {
      // modal neighbor label; deterministic tie-break = highest count,
      // then LOWEST label, as one lexicographic struct max (-label makes
      // "lowest label" the max; labels are nonnegative doc ids)
      labels = edges
        .join(labels.select(col("doc_id").as("dst"), col("label").as("__nl")),
          Seq("dst"))
        .groupBy(col("src"), col("__nl"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("src").as("doc_id"))
        .agg(max(struct(col("__c"), (-col("__nl")).as("__neg"))).as("__m"))
        .select(col("doc_id"), (-col("__m.__neg")).as("label"))
      t += 1
      // lineage guard for deep callers: the default depth-3 chain stays
      // one lazy plan (no job here), but past each block boundary the
      // label frame is materialized so plan depth — and with it
      // analysis/optimization cost — is bounded per block, not per call
      if (t % LpaCheckpointEvery == 0 && t < rounds)
        labels = labels.localCheckpoint(true)
    }
    labels.select(col("doc_id"), col("label").as("community"))
      .orderBy("doc_id")
  }

  /** LPA communities from the trigram-Jaccard pair lineage (the
    * declared-query composition, mirroring kCore). */
  def communities(docs: DataFrame, minJaccard: Double = 0.5,
                  maxShingleDf: Int = DefaultMaxShingleDf,
                  rounds: Int = 3): DataFrame =
    lpaCommunities(jaccardPairs(docs, 3, minJaccard, maxShingleDf), rounds)

  /** Cross-SOURCE n-gram overlap matrix: distinct-trigram Jaccard and
    * containment between every pair of corpus sources — the
    * provenance-level contamination report ("which feeds syndicate which")
    * that doc-pair dedup cannot see because the shared mass is spread
    * across thousands of individually-below-threshold pairs.
    *
    * Scale shape: the corpus reduces to DISTINCT (source, shingle) rows
    * in one exchange; per-shingle source buckets are bounded by the
    * SOURCE COUNT S (tiny — feeds, not docs), so the pair explode is at
    * most S(S-1)/2 per shingle and needs no df-cap; output is S^2-bounded
    * however large the corpus. Pairs with zero overlap are absent (inner
    * join) on both engines. */
  def sourceOverlapMatrix(docs: DataFrame, n: Int = 3): DataFrame = {
    // Round-9 plan rework (guide §2.3): shingles are xxhash64-hashed
    // before their exchange (fixed-width longs instead of n-gram
    // strings), and the (source, shingle) DISTINCT + regroup-by-shingle
    // two-exchange chain collapses into ONE collect_set aggregate —
    // collect_set dedups (source, h) in-agg, with per-bucket memory
    // bounded by the source-label count. The per-source sizes re-derive
    // from the same buckets. Collision odds: the documented 2^-64
    // argument; the oracle keeps string shingles.
    val buckets = shingles(docs.select("doc_id", "text"), n)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .select(col("source"), xxhash64(col("shingle")).as("h"))
      .groupBy("h").agg(collect_set(col("source")).as("ss"))
    val sizes = buckets.select(explode(col("ss")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = buckets
      .select(explode(col("ss")).as("source_a"), col("ss"))
      .select(col("source_a"), explode(col("ss")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("source").as("source_a"), col("sz").as("sza")),
        Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("sz").as("szb")),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("inter"),
        round(col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")), 6).as("jaccard"),
        round(col("inter").cast("double") /
          least(col("sza"), col("szb")), 6).as("containment"))
      .orderBy("source_a", "source_b")
  }

  /** Triangle count + local clustering coefficient per document over the
    * near-dup graph — the graph-SHAPE diagnostic that separates template
    * neighborhoods (high clustering: everyone resembles everyone, one
    * representative suffices) from chain-shaped drift (low clustering:
    * A~B~C but A!~C — transitive dedup would over-delete), which degree
    * and PageRank alone cannot distinguish.
    *
    * Scale shape (the node-iterator++ algorithm): each undirected edge is
    * ORIENTED from its lower-(degree, id) endpoint to the higher, so
    * every out-degree is O(sqrt(2m)) and the wedge join generates
    * sum(d_out^2) = O(m^1.5) candidates worst-case — never a hub's
    * deg^2 explosion (a boilerplate hub with 10^5 neighbors stays a
    * wedge SOURCE of bounded width because its edges orient INTO it).
    * Each triangle materializes exactly once (at its lowest-rank vertex,
    * which holds out-edges to both others); closure is one equi-join of
    * wedges against the canonical pair set. Pair generation is
    * checkpointed once and feeds degrees, orientation, and closure (the
    * clusterRepresentatives discipline). The coefficient is one double
    * division of exact integers, so both engines evaluate the identical
    * IEEE tree; degree-<2 nodes report NULL (undefined), never 0. */
  def triangleStats(docs: DataFrame, minJaccard: Double = 0.05,
                    maxShingleDf: Int = DefaultMaxShingleDf): DataFrame =
    triangleStatsFromPairs(jaccardPairs(docs, 3, minJaccard, maxShingleDf)
      .select("doc_a", "doc_b"))

  /** triangleStats over an already-built canonical (doc_a < doc_b) pair
    * frame — the spec entry point, and the shape shared with
    * pageRankFromPairs for callers that reuse one pair generation. */
  def triangleStatsFromPairs(pairs0: DataFrame): DataFrame = {
    val pairs = pairs0.localCheckpoint(true)
    val deg = pairs.select(col("doc_a").as("node"))
      .unionByName(pairs.select(col("doc_b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val lower = col("da") < col("db") ||
      (col("da") === col("db") && col("doc_a") < col("doc_b"))
    val oriented = pairs
      .join(deg.select(col("node").as("doc_a"), col("deg").as("da")), Seq("doc_a"))
      .join(deg.select(col("node").as("doc_b"), col("deg").as("db")), Seq("doc_b"))
      .select(when(lower, col("doc_a")).otherwise(col("doc_b")).as("src"),
        when(lower, col("doc_b")).otherwise(col("doc_a")).as("dst"))
      .localCheckpoint(true)
    val wedges = oriented.alias("e1")
      .join(oriented.alias("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("center"), col("e1.dst").as("wa"),
        col("e2.dst").as("wb"))
    val tri = wedges.join(pairs,
        least(col("wa"), col("wb")) === col("doc_a") &&
          greatest(col("wa"), col("wb")) === col("doc_b"))
      .select("center", "wa", "wb")
    val perNode = tri
      .select(explode(array(col("center"), col("wa"), col("wb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node").as("doc_id"),
        col("deg").cast("long").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("deg") * (col("deg") - lit(1L))), 4)).as("clustering"))
      .orderBy("doc_id")
  }

  /** Canonical representative per duplicate cluster: the member with the
    * highest duplication centrality — the "which copy do we keep"
    * decision a curation pipeline makes once per near-dup group, made
    * with PageRank instead of the arbitrary min-id. ONE pair generation
    * feeds both the component labels and the centrality (the pair frame
    * is checkpointed before the two consumers); the argmax is a single
    * lexicographic max over (rounded rank, -doc_id) structs — rank ties
    * break to the LOWEST doc_id, pinned on both engines by ranking the
    * ROUNDED score (the tie rule every top-k here follows). */
  def clusterRepresentatives(docs: DataFrame, minJaccard: Double = 0.5,
                             maxShingleDf: Int = DefaultMaxShingleDf):
      DataFrame = {
    val pairs = jaccardPairs(docs, 3, minJaccard, maxShingleDf)
      .select("doc_a", "doc_b").localCheckpoint(true)
    val clusters = duplicateClusters(pairs)
    val pr = pageRankFromPairs(pairs)
    clusters.join(pr, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("pagerank"), (-col("doc_id")).as("__nid"))).as("__m"))
      .select(col("cluster_id"), col("n_members"),
        (-col("__m.__nid")).as("rep_doc_id"),
        col("__m.pagerank").as("rep_pagerank"))
      .orderBy("cluster_id")
  }

  /** Shard-boundary stitch candidates: ordered pairs (a, b) where a's
    * LAST `w` tokens equal b's FIRST `w` tokens — the signature of one
    * document split across ingest shards (a crawler page cut at a byte
    * budget, a log rotated mid-record). Near-dup ops can't see these:
    * the two halves share almost no content except the seam, and
    * span-level dedup reports the seam as a duplicate without the
    * ORDER information ("a continues into b") that reconstruction
    * needs.
    *
    * Determinism: the seam key is the exact w-token sequence (space-
    * rejoined under the pinned tokenizer); docs shorter than `w` tokens
    * have no seam by definition.
    *
    * Scale: each doc contributes ONE head row and ONE tail row (md5 of
    * the seam — fixed-width keys shuffle, never text); the join is
    * seam-keyed, and a df cap on BOTH sides drops boilerplate seams
    * (an all-identical corpus would otherwise put every doc in one
    * bucket and emit n² pairs — with the cap it emits zero, the
    * capShingleDf argument). */
  def boundaryStitchPairs(docs: DataFrame, w: Int = 8,
                          maxSeamDf: Int = 8): DataFrame = {
    // ONE pass over the text computes both seams; the four consumers
    // (tails, heads, and each side's hot set) then read the tiny
    // (id, 2 md5s) frame instead of re-tokenizing the corpus per branch
    val seams = docs.select(col("doc_id"),
        Tokenize.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= w)
      .select(col("doc_id"),
        md5(array_join(slice(col("t"), -w, w), " ")).as("tseam"),
        md5(array_join(slice(col("t"), 1, w), " ")).as("hseam"))
      .localCheckpoint(true)
    val tails = seams.select(col("doc_id").as("left_doc"),
      col("tseam").as("seam"))
    val heads = seams.select(col("doc_id").as("right_doc"),
      col("hseam").as("seam"))
    def capped(side: DataFrame): DataFrame =
      if (maxSeamDf <= 0) side
      else {
        val hot = side.groupBy("seam").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxSeamDf).select("seam")
        side.join(broadcast(hot), Seq("seam"), "left_anti")
      }
    capped(tails).join(capped(heads), Seq("seam"))
      .filter(col("left_doc") =!= col("right_doc"))
      .select(col("left_doc"), col("right_doc"), col("seam"))
      .orderBy("left_doc", "right_doc")
  }
}
