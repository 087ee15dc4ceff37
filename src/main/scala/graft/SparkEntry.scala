package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.{IndexStore, InvertedIndex}
import graft.sources.Sampling
import graft.rank.BM25
import graft.relational.{Relational, TemporalJoins}
import graft.events.Events
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.textstats.TextAnalysis
import graft.multimodal.Multimodal
import graft.sketch.Sketches

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry pairs a DataFrame plan with DuckDB oracle SQL over the same
  * parquet tables. Determinism rules (SURVEY.md §7.4): identical column
  * names+order, explicit total ORDER BY on both sides, floats rounded or
  * decimal-exact, computed ints cast to BIGINT on the DuckDB side (its
  * sum() yields INT128), money sums accumulate as DECIMAL(18,2) then cast
  * DOUBLE, timestamps emitted as strings, regex char class pinned to
  * [a-z0-9_'].
  */
object SparkEntry {

  /** Flagship: BM25 top-10 (the reference's `search.sh "football game"`
    * against our synthetic corpus vocabulary). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    BM25.search(spark, table(spark, "/root/testdata/sf0.001", "documents"),
      FlagshipQuery)

  val FlagshipQuery = "spark join window"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference parity: inverted index (SURVEY §2.4 A1-A5) ----
    "idx_term_frequency" -> ((s, dir) =>
      InvertedIndex.termFrequency(table(s, dir, "documents"))
        .orderBy("doc_id", "term")),
    "idx_doc_frequency" -> ((s, dir) =>
      InvertedIndex.docFrequency(table(s, dir, "documents"))
        .orderBy("term")),
    // what the index STORES at 100 TB: block-local delta + varint
    // postings size per term (absolute block heads keep blocks skippable,
    // and bound the lag() window partitions on stopword lists)
    "idx_postings_compressed" -> ((s, dir) =>
      InvertedIndex.postingsCompression(table(s, dir, "documents"))),
    // phrase search over positional postings: consecutive-position
    // adjacency joins, one (doc_id, start-pos) partitioning for the chain
    "idx_phrase_match" -> ((s, dir) =>
      InvertedIndex.phraseMatch(table(s, dir, "documents"), "row column sort")),
    // result snippets: context window around the first phrase occurrence;
    // only matching docs are re-tokenized for rendering
    "idx_phrase_snippets" -> ((s, dir) =>
      InvertedIndex.phraseSnippets(table(s, dir, "documents"),
        "row column sort", 3)),
    // proximity search: banded-position candidate join (dup-free 3-band),
    // never a per-doc position cross product
    "idx_proximity_match" -> ((s, dir) =>
      InvertedIndex.proximityMatch(table(s, dir, "documents"),
        "spark", "join", 8)),
    // phrase search SERVED from the stored positional table — each term
    // reads only its hash bucket; stored ≡ recompute is the claim
    "idx_phrase_stored" -> ((s, dir) => {
      val idx = indexPath(s, dir)
      IndexStore.write(table(s, dir, "documents"), idx)
      IndexStore.phraseMatchStored(s, idx, "row column sort")
    }),
    // proximity, same stored serving path (reuses the already-written
    // store when it runs after idx_phrase_stored in the same session)
    "idx_proximity_stored" -> ((s, dir) => {
      val idx = indexPath(s, dir)
      IndexStore.write(table(s, dir, "documents"), idx)
      IndexStore.proximityMatchStored(s, idx, "spark", "join", 8)
    }),
    "idx_doc_info" -> ((s, dir) =>
      InvertedIndex.docInfo(table(s, dir, "documents"))
        .orderBy("doc_id")),
    "idx_corpus_info" -> ((s, dir) =>
      InvertedIndex.corpusInfo(table(s, dir, "documents"))
        .select(col("doc_n"), col("total_doc_length"),
          round(col("avg_doc_length"), 4).as("avg_doc_length"))),
    // ---- reference parity: BM25 ranking (SURVEY §2.5, §2.7, A6-A7, O1) ----
    "bm25_search" -> ((s, dir) =>
      BM25.search(s, table(s, dir, "documents"), FlagshipQuery)),
    // bounded wildcard: each token expands against the VOCABULARY
    // (df-capped, highest-df first), then the plain exact scoring chain
    "bm25_prefix_search" -> ((s, dir) =>
      BM25.searchPrefix(s, table(s, dir, "documents"), "s qu")),
    // serving-side highlights for the flagship page: per top-10 doc, the
    // 15-token window with the most distinct query terms (hit-anchored —
    // lossless; extraction touches only the k ranked docs)
    "bm25_snippets" -> ((s, dir) =>
      BM25.searchSnippets(s, table(s, dir, "documents"), FlagshipQuery)),
    // did-you-mean: per misspelled query term, top-3 vocabulary terms
    // within edit distance 2 ranked by (dist, df DESC) — vocabulary-sized
    // compare behind a lossless length-band prefilter
    "bm25_spell_suggest" -> ((s, dir) =>
      BM25.spellSuggest(s, table(s, dir, "documents"), "spak joinn windoe")),
    // S9: all-OOV query must yield empty result with intact schema, not fail.
    "bm25_oov" -> ((s, dir) =>
      BM25.search(s, table(s, dir, "documents"), "zzzznotaword qqqqnotaword")),
    // impact-ordered champion lists: per-term top-5 postings by tf — the
    // static pruning that bounds per-term serve cost regardless of df
    "idx_champion_lists" -> ((s, dir) =>
      InvertedIndex.championLists(table(s, dir, "documents"), 5)
        .orderBy("term", "impact_rank")),
    // BM25 served from champion lists (m=10): candidates bounded at
    // |terms|*m, scores exact for every surviving doc
    "bm25_champion" -> ((s, dir) =>
      BM25.searchChampions(s, table(s, dir, "documents"), FlagshipQuery, 10)),
    // WAND/MaxScore-style bound-then-verify: EXACT top-10 (oracle = the
    // plain exact chain) with the scoring tail run on pruned candidates
    "bm25_wand" -> ((s, dir) =>
      BM25.searchWand(s, table(s, dir, "documents"), "hash merge stream")),
    // Block-max WAND: per-(term, block) max-tf caps skip WHOLE postings
    // blocks below θ; EXACT top-10 (oracle = the plain exact chain)
    "bm25_block_max" -> ((s, dir) =>
      BM25.searchBlockMax(s, table(s, dir, "documents"), "hash merge stream")),
    // Batch multi-query form: many queries, one tf build, windowed top-k.
    "bm25_multi" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((1L, "spark join window"), (2L, "batch stream"))
        .toDF("query_id", "query")
      BM25.searchMany(s, table(s, dir, "documents"), qs)
    }),
    // A8 incremental indexing: merge(tf(old), newDocs) must equal the full
    // recompute — the oracle is simply the full-corpus tf.
    "idx_incremental_merge" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      InvertedIndex.mergeTermFrequency(
        InvertedIndex.termFrequency(docs.filter(col("doc_id") < 250)),
        docs.filter(col("doc_id") >= 250))
        .orderBy("doc_id", "term")
    }),

    // ---- relational surface (SURVEY §7.3 step 2) ----
    "rel_pricing_summary" -> ((s, dir) =>
      Relational.pricingSummary(table(s, dir, "lineitem"), "1998-09-01")),
    "rel_filter_project" -> ((s, dir) =>
      Relational.filterProject(table(s, dir, "lineitem"))),
    "rel_revenue_by_segment" -> ((s, dir) =>
      Relational.revenueBySegment(table(s, dir, "orders"), table(s, dir, "customer"))),
    "rel_local_supplier_revenue" -> ((s, dir) =>
      Relational.localSupplierRevenue(table(s, dir, "customer"),
        table(s, dir, "orders"), table(s, dir, "lineitem"),
        table(s, dir, "supplier"), table(s, dir, "nation"),
        table(s, dir, "region"), "ASIA", "1996-01-01", "1998-01-01")),
    "rel_volume_by_brand" -> ((s, dir) =>
      Relational.volumeByBrand(table(s, dir, "lineitem"), table(s, dir, "part"))),
    "rel_semi_join" -> ((s, dir) =>
      Relational.bigSpenders(table(s, dir, "customer"), table(s, dir, "orders"), 450000.0)),
    "rel_anti_join" -> ((s, dir) =>
      Relational.dormantCustomers(table(s, dir, "customer"), table(s, dir, "orders"), "2001-01-01")),
    "rel_outer_join_agg" -> ((s, dir) =>
      Relational.orderCountsIncludingIdle(table(s, dir, "customer"),
        table(s, dir, "orders"), "2001-01-01")),
    "rel_distinct" -> ((s, dir) =>
      Relational.distinctFlagStatus(table(s, dir, "lineitem"))),
    "rel_union_all" -> ((s, dir) =>
      Relational.urgentOrHighUnion(table(s, dir, "orders"))),
    "rel_intersect" -> ((s, dir) =>
      Relational.buildingBigSpenders(table(s, dir, "customer"), table(s, dir, "orders"), 300000.0)),
    "rel_except" -> ((s, dir) =>
      Relational.neverUrgent(table(s, dir, "customer"), table(s, dir, "orders"))),
    "rel_full_outer_join" -> ((s, dir) =>
      Relational.urgentVsHighSpendFullOuter(table(s, dir, "orders"))),
    "rel_intersect_all" -> ((s, dir) =>
      Relational.urgentVsHighIntersectAll(table(s, dir, "orders"))),
    "rel_except_all" -> ((s, dir) =>
      Relational.urgentVsHighExceptAll(table(s, dir, "orders"))),
    // TPC-H Q17 shape: correlated per-part average decorrelated to
    // aggregate + join-back; threshold compared in exact decimal space
    "rel_small_qty_revenue" -> ((s, dir) =>
      Relational.smallQuantityRevenue(table(s, dir, "lineitem"),
        table(s, dir, "part"), "Brand#1")),
    // TPC-H Q18 shape: HAVING-IN subquery decorrelated into one
    // restrict-and-carry per-order aggregate before any dim join
    "rel_big_orders" -> ((s, dir) =>
      Relational.largeOrders(table(s, dir, "lineitem"),
        table(s, dir, "orders"), table(s, dir, "customer"))),
    "rel_topk" -> ((s, dir) =>
      Relational.topOrders(table(s, dir, "orders"), 10)),
    "rel_window_rank" -> ((s, dir) =>
      Relational.topOrdersPerCustomer(table(s, dir, "orders"), 3)),
    "rel_window_running_sum" -> ((s, dir) =>
      Relational.runningSpend(table(s, dir, "orders"))),
    "rel_window_lag" -> ((s, dir) =>
      Relational.daysBetweenOrders(table(s, dir, "orders"))),
    "rel_rollup" -> ((s, dir) =>
      Relational.rollupFlagStatus(table(s, dir, "lineitem"))),
    "rel_count_distinct" -> ((s, dir) =>
      Relational.customersPerPriority(table(s, dir, "orders"))),
    "rel_case_agg" -> ((s, dir) =>
      Relational.discountedRevenueByFlag(table(s, dir, "lineitem"))),
    "rel_scalar_subquery" -> ((s, dir) =>
      Relational.aboveAveragePerPriority(table(s, dir, "orders"))),
    // correlated EXISTS (TPC-H Q4 shape): decorrelates to one semi-join
    "rel_exists_subquery" -> ((s, dir) =>
      Relational.latePriorityCounts(table(s, dir, "orders"),
        table(s, dir, "lineitem"))),
    // grouped HAVING / IN-subquery (Q18 shape): aggregate-then-join-back
    "rel_having" -> ((s, dir) =>
      Relational.bigQuantityOrders(table(s, dir, "orders"),
        table(s, dir, "lineitem"))),
    // global total-order sort: RangePartitioning exchange (PlanSpec pins
    // that the sort is distributed, not a single-partition collapse)
    "rel_global_sort" -> ((s, dir) =>
      Relational.ordersByPriceDesc(table(s, dir, "orders"))),
    // correlated scalar subquery (Q2 min-per-group), collapsed to a
    // single-pass struct-min aggregation — no join-back
    "rel_argmin_order" -> ((s, dir) =>
      Relational.cheapestOrderPerCustomer(table(s, dir, "orders"))),
    // typed Aggregator UDAF (Welford/Chan moments): monthly price profile —
    // see Relational.monthlyPriceProfile for the cross-engine comparison
    // rationale (exact decimal mean/stddev, UDAF n/min/max)
    "rel_welford_stats" -> ((s, dir) =>
      Relational.monthlyPriceProfile(table(s, dir, "orders"))),
    // TPC-H Q10 shape: star join, fact aggregated before the dim join,
    // top-k on exact decimal revenue
    "rel_returned_items" -> ((s, dir) =>
      Relational.returnedItemReport(table(s, dir, "customer"),
        table(s, dir, "orders"), table(s, dir, "lineitem"),
        table(s, dir, "nation"), "1995-03-01", "1995-06-01")),
    // TPC-H Q15 shape: max over an aggregated view, exact-decimal compare
    "rel_top_supplier" -> ((s, dir) =>
      Relational.topSupplierRevenue(table(s, dir, "supplier"),
        table(s, dir, "lineitem"), "1996-01-01", "1996-04-01")),
    // TPC-H Q6 shape: pure scan-filter into one global aggregate
    "rel_revenue_delta" -> ((s, dir) =>
      Relational.discountRevenueDelta(table(s, dir, "lineitem"),
        "1996-01-01", "1997-01-01")),
    // deterministic MODE (argmax-of-count with pinned tie-break)
    "rel_mode_priority" -> ((s, dir) =>
      Relational.modalPriorityPerSegment(table(s, dir, "customer"),
        table(s, dir, "orders"))),
    // 2-D skyline (Pareto frontier) as distributed prefix-min over the
    // price order — never the definitional O(n^2) dominance self-join
    "rel_skyline" -> ((s, dir) =>
      Relational.skyline2d(table(s, dir, "part"))),
    // TPC-H Q2 shape: correlated min-cost scalar subquery decorrelated
    // into a min-agg + equi-join; lineitem pre-aggregated to offer grain
    // before any join, dimensions broadcast
    "rel_min_cost_supplier" -> ((s, dir) =>
      Relational.minCostSupplier(table(s, dir, "lineitem"),
        table(s, dir, "supplier"), table(s, dir, "nation"),
        table(s, dir, "region"), table(s, dir, "part"))),
    // incremental view maintenance: signed-delta algebra folds a
    // deterministic delete/update/insert batch into the stored GROUP BY
    // view (delta aggregated to group grain, broadcast merge); the
    // oracle recomputes the post-delta view from scratch
    "rel_ivm_groupby" -> ((s, dir) =>
      graft.relational.Ivm.ivmGroupBy(table(s, dir, "orders"))),
    // TPC-H Q21 shape: double-correlated EXISTS/NOT EXISTS decorrelated
    // to one keyed aggregate + same-key window sums
    "rel_sole_late_supplier" -> ((s, dir) =>
      Relational.soleLateSupplier(table(s, dir, "supplier"),
        table(s, dir, "orders"), table(s, dir, "lineitem"))),
    // TPC-H Q7 shape: bilateral nation trade volume by ship year
    "rel_nation_trade" -> ((s, dir) =>
      Relational.nationTradeVolume(table(s, dir, "lineitem"),
        table(s, dir, "orders"), table(s, dir, "customer"),
        table(s, dir, "supplier"), table(s, dir, "nation"),
        "NATION_1", "NATION_2")),
    // TPC-H Q8 shape: one nation's share of a region's part-type revenue
    "rel_market_share" -> ((s, dir) =>
      Relational.marketShare(table(s, dir, "lineitem"), table(s, dir, "orders"),
        table(s, dir, "customer"), table(s, dir, "supplier"),
        table(s, dir, "part"), table(s, dir, "nation"),
        table(s, dir, "region"), "STANDARD", "ASIA", "NATION_1")),
    // TPC-H Q13 shape: aggregate-of-aggregate order-count histogram
    "rel_order_count_dist" -> ((s, dir) =>
      Relational.orderCountDistribution(table(s, dir, "customer"),
        table(s, dir, "orders"), "1-URGENT")),
    // TPC-H Q14 shape: conditional-aggregate promo revenue ratio
    "rel_promo_revenue" -> ((s, dir) =>
      Relational.promoRevenue(table(s, dir, "lineitem"), table(s, dir, "part"),
        "1997-03-01", "1997-04-01")),
    // TPC-H Q16 shape: distinct-supplier counts with NOT-IN denylist
    "rel_supplier_variety" -> ((s, dir) =>
      Relational.supplierVariety(table(s, dir, "lineitem"),
        table(s, dir, "part"), table(s, dir, "supplier"), "Brand#9",
        Seq(1, 5, 10, 15, 20, 25, 30, 35))),
    // TPC-H Q19 shape: OR-of-ANDs join predicate with per-side pushdown
    "rel_disjunctive_join" -> ((s, dir) =>
      Relational.disjunctiveRevenue(table(s, dir, "lineitem"),
        table(s, dir, "part"))),
    // TPC-H Q20 shape: share-of-part-total threshold via reused window
    "rel_excess_share" -> ((s, dir) =>
      Relational.excessShareSuppliers(table(s, dir, "lineitem"),
        table(s, dir, "part"), table(s, dir, "supplier"),
        table(s, dir, "nation"), "NATION_11", "small", 10)),
    // TPC-H Q22 shape: scalar mean threshold + anti-join, by segment
    "rel_idle_capital" -> ((s, dir) =>
      Relational.idleCapital(table(s, dir, "customer"),
        table(s, dir, "orders"), "2001-01-01")),
    // TPC-H Q9 shape (partsupp-free adaptation): profit by nation x year,
    // one decimal pass for revenue - cost, dims pruned-then-broadcast
    "rel_product_profit" -> ((s, dir) =>
      Relational.productProfit(table(s, dir, "lineitem"),
        table(s, dir, "orders"), table(s, dir, "supplier"),
        table(s, dir, "part"), table(s, dir, "nation"), "widget")),
    "rel_cube" -> ((s, dir) =>
      Relational.cubeFlagStatus(table(s, dir, "lineitem"))),
    "rel_date_parts" -> ((s, dir) =>
      Relational.ordersByYearMonth(table(s, dir, "orders"))),
    "rel_string_funcs" -> ((s, dir) =>
      Relational.customerNameFacts(table(s, dir, "customer"))),
    "rel_median" -> ((s, dir) =>
      Relational.medianPricePerPriority(table(s, dir, "orders"))),
    "rel_grouping_sets" -> ((s, dir) =>
      Relational.groupingSetsFlagStatus(table(s, dir, "lineitem"))),
    "rel_window_ntile" -> ((s, dir) =>
      Relational.priceQuartilesPerPriority(table(s, dir, "orders"))),
    "rel_shipping_priority" -> ((s, dir) =>
      Relational.shippingPriority(table(s, dir, "customer"),
        table(s, dir, "orders"), table(s, dir, "lineitem"),
        "BUILDING", "2000-03-15")),
    "rel_window_first_last" -> ((s, dir) =>
      Relational.firstLastPerCustomer(table(s, dir, "orders"))),
    "rel_price_histogram" -> ((s, dir) =>
      Relational.priceHistogram(table(s, dir, "orders"))),
    // the pre-flight report BEHIND the salting decision: key-multiplicity
    // deciles from the count-of-counts histogram — never an ntile over
    // the key domain (single-partition-window hazard at scale)
    "rel_skew_deciles" -> ((s, dir) =>
      graft.relational.LayoutAnalysis.keySkewDeciles(table(s, dir, "orders"),
        "o_custkey")),
    // Z-order vs natural layout: files a min/max-pruned scan touches per
    // range box under each layout — the Delta/Iceberg Z-clustering
    // arithmetic, exact (file assignment by address RANGE, no global sort)
    "rel_zorder_skipping" -> ((s, dir) =>
      graft.relational.LayoutAnalysis.zorderSkipping(table(s, dir, "lineitem"))),
    // small-file compaction plan: running-sum contiguous binning of the
    // day-grain file inventory — order-preserving, metadata-sized
    "rel_compaction_plan" -> ((s, dir) =>
      graft.relational.LayoutAnalysis.compactionPlan(table(s, dir, "events"))),
    // skew-safe two-phase aggregation: content-derived salts bound the
    // per-reducer key cardinality; decimal values make the two-phase sum
    // exact, so the oracle is the plain GROUP BY.
    "rel_salted_agg" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
        .withColumn("q", col("l_quantity").cast("decimal(18,2)"))
      graft.relational.Skew.saltedCountSum(li, "l_returnflag", "q", 8)
        .select(col("l_returnflag"), col("n"),
          col("total").cast("double").as("total"))
        .orderBy("l_returnflag")
    }),
    // pre-planned salted join (the AQE-independent skew weapon): hot keys
    // spread over `salts` reducers, small side replicated salts times. No
    // false/lost matches by construction, so the oracle is the plain join.
    "rel_salted_join" -> ((s, dir) => {
      val small = table(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.relational.Skew.saltedJoin(table(s, dir, "orders"), small,
          "o_custkey", 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("c_mktsegment")
    }),
    // bucketed co-location: one-time bucket write, then a shuffle-free
    // join (BucketingSpec pins zero Exchange); results equal the plain
    // join, which is the oracle.
    "rel_bucketed_join" -> ((s, dir) => {
      // applicationId in the path: two concurrent harness processes on the
      // same sfDir must not overwrite each other's bucket files mid-read
      val base = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft_buckets_" + s.sparkContext.applicationId +
          "_" + Integer.toHexString(dir.hashCode))
      graft.relational.Bucketing.writeBucketed(table(s, dir, "orders"),
        "graft_b_orders", "o_custkey", 16, Some(s"$base/orders"))
      graft.relational.Bucketing.writeBucketed(
        table(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        "graft_b_customer", "c_custkey", 16, Some(s"$base/customer"))
      graft.relational.Bucketing.coLocatedJoin(s,
          "graft_b_orders", "graft_b_customer", "o_custkey", "c_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("c_mktsegment")
    }),
    // bloom runtime filter: big side pre-filtered by a literal-embedded
    // bloom of the dim keys BEFORE its shuffle; no false negatives, so the
    // result — and the oracle — is exactly the plain join.
    "rel_bloom_join" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      graft.relational.RuntimeFilters
        .bloomPrefilteredJoin(table(s, dir, "orders"), "o_custkey", cust, "c_custkey")
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spent"))
        .orderBy("c_custkey")
    }),
    // blocked fuzzy record linkage: md5-perturbed listing feed matched
    // back to the catalog by the Jaro-Winkler codegen kernel — block,
    // score, argmax; candidates bounded by (first token, brand), the
    // feed side broadcast so the catalog never shuffles to be scored
    "rel_fuzzy_link" -> ((s, dir) =>
      graft.relational.EntityResolution.fuzzyLink(table(s, dir, "part"))),
    // sorted-neighborhood catalog self-dedup: rank by title within
    // brand, compare only rank-adjacent records (O(n*window) candidates
    // at ANY skew — the structural guarantee blocking lacks), score
    // with the same JW kernel
    "rel_sorted_neighborhood" -> ((s, dir) =>
      graft.relational.EntityResolution.sortedNeighborhoodPairs(
        table(s, dir, "part"))),
    // association mining: within-order part pairs (basket-size-bounded),
    // support filter BEFORE the stats joins, lift from exact counts
    "rel_basket_lift" -> ((s, dir) =>
      Relational.basketLift(table(s, dir, "lineitem"))),

    // ---- event-time surface (SURVEY §7.3 step 3, batch form) ----
    // aggregate-then-window: trailing-24h z-score over one row per hour
    "ev_hourly_anomaly" -> ((s, dir) =>
      Events.hourlyAnomaly(table(s, dir, "events"))),
    "ev_tumbling_hourly" -> ((s, dir) =>
      Events.tumblingHourly(table(s, dir, "events"))),
    "ev_sliding_hourly" -> ((s, dir) =>
      Events.slidingHourly(table(s, dir, "events"))),
    "ev_sessionize" -> ((s, dir) =>
      Events.sessionize(table(s, dir, "events"))),
    // peak concurrent sessions per day, sweep-line form: +1/-1 session
    // boundaries, per-DAY running sum + one broadcast midnight carry row
    // per day — no interval self-join, no global single-task sort
    "ev_concurrency" -> ((s, dir) =>
      Events.concurrencyDaily(table(s, dir, "events"))),
    // telemetry burst dedup (keep-first within 300 s per user+type):
    // gaps-and-islands, windows keyed (user_id, event_type); reports the
    // collapsed bursts (the drop-list)
    "ev_dedup_bursts" -> ((s, dir) =>
      Events.burstDedup(table(s, dir, "events"))),
    "ev_user_stats" -> ((s, dir) =>
      Events.userStats(table(s, dir, "events"))),
    "ev_daily_top_type" -> ((s, dir) =>
      Events.dailyTopType(table(s, dir, "events"))),
    // EWMA trend per type at alpha=0.5: every step an exact dyadic
    // average, so both engines fold to bit-identical doubles
    "ev_ewma_daily" -> ((s, dir) =>
      Events.ewmaDaily(table(s, dir, "events"))),
    "ev_props_json" -> ((s, dir) =>
      Events.propsKSumByType(table(s, dir, "events"))),
    "ev_funnel" -> ((s, dir) =>
      Events.funnelCounts(table(s, dir, "events"))),
    // sequence census: each user's first-3-event-type path, counted —
    // one user-keyed exchange serves the rank window AND the rollup
    "ev_funnel_paths" -> ((s, dir) =>
      Events.topEventPaths(table(s, dir, "events"))),
    // RFM quartile census: percentile_disc boundaries spelled as integer
    // ceil over value HISTOGRAMS (support-bounded), users join three
    // broadcast 1-row bound frames, <= 64 segment rows out
    "ev_rfm_segments" -> ((s, dir) =>
      Events.rfmSegments(table(s, dir, "events"))),
    "ev_pivot_type_day" -> ((s, dir) =>
      Events.typeByDayPivot(table(s, dir, "events"))),
    "ev_transitions" -> ((s, dir) =>
      Events.typeTransitions(table(s, dir, "events"))),
    // stationary distribution of the type-transition chain: 3 unrolled
    // power-iteration rounds over a TYPE-cardinality state (self-loops
    // close terminal types so mass is conserved)
    "ev_markov_stationary" -> ((s, dir) =>
      Events.markovStationary(table(s, dir, "events"))),
    // SCD Type-2 dimension build from the CDC feed: no-op collapse ->
    // version numbers -> [valid_from, valid_to) intervals, one exchange
    // by user_id shared by all three window passes
    "ev_scd2" -> ((s, dir) =>
      Events.scdType2(table(s, dir, "events"))),
    "ev_cohort_retention" -> ((s, dir) =>
      Events.cohortRetention(table(s, dir, "events"))),
    // pooled retention curve + exponential-decay OLS (lambda, half-life):
    // offset-cardinality fit frame, decimal-exact sums
    "ev_retention_fit" -> ((s, dir) =>
      Events.retentionDecayFit(table(s, dir, "events"))),
    // A/B readout: md5-contract arm assignment, purchase conversion,
    // two-proportion z on exact counts; one user-keyed agg
    "ev_ab_test" -> ((s, dir) =>
      Events.abTestReport(table(s, dir, "events"))),
    // CDC changelog apply: latest-wins per user with 'error' tombstones —
    // the compacted-topic materialization; one user-keyed window pass
    "ev_cdc_apply" -> ((s, dir) =>
      Events.cdcApply(table(s, dir, "events"))),
    // calendar densification + LOCF: per-user daily purchase series over
    // the full day spine, carry-group fill (no IGNORE NULLS dependence)
    "ev_gap_fill" -> ((s, dir) =>
      Events.gapFillDaily(table(s, dir, "events"))),
    // growth accounting: DAU / new / returning / cumulative per day —
    // the final cumulative window runs over calendar-bounded rows
    "ev_growth_accounting" -> ((s, dir) =>
      Events.growthAccounting(table(s, dir, "events"))),
    // grid-bucketed spatial radius self-join over the md5-derived integer
    // point cloud: ONE exchange by cell, 9x neighborhood on one side only,
    // each unordered pair produced exactly once — never all-pairs
    "ev_geo_pairs" -> ((s, dir) =>
      graft.spatial.Spatial.radiusPairs(
        graft.spatial.Spatial.hashPoints(table(s, dir, "events"), "user_id"),
        "user_id", radius = 48, cell = 64)),
    // radius-bounded kNN from the same grid join: 3 nearest per point
    "ev_geo_knn" -> ((s, dir) =>
      graft.spatial.Spatial.gridKnn(
        graft.spatial.Spatial.hashPoints(table(s, dir, "events"), "user_id"),
        "user_id", k = 3, radius = 48, cell = 64)),
    // exact grid DBSCAN over the same points: core/border/noise roles +
    // min-id cluster labels, border ties pinned to the smallest cluster
    "ev_geo_dbscan" -> ((s, dir) =>
      graft.spatial.Spatial.gridDbscan(
        graft.spatial.Spatial.hashPoints(table(s, dir, "events"), "user_id"),
        "user_id", eps = 48, minPts = 3, cell = 64)),
    // watermark dry-run: replay arrival order (event_id) per shard and
    // count what a 10-min watermark would drop — the audit behind every
    // streaming watermark choice; parallelism = shard count, state = one
    // running max per shard (exactly the streaming engine's own state)
    "ev_watermark_late" -> ((s, dir) =>
      Events.watermarkLateAudit(table(s, dir, "events"))),
    // multi-touch attribution: last-touch + linear credit per channel in
    // one report — ONE user-keyed window pass for last-touch, one
    // lookback-bounded user join for linear; per-(conversion, channel)
    // credit rounds a single double expression then sums as DECIMAL so
    // partition order can never move the totals
    "ev_attribution" -> ((s, dir) =>
      Events.attribution(table(s, dir, "events"))),
    // time-RANGE window frame: trailing-hour per-user activity
    "ev_rolling_value" -> ((s, dir) =>
      Events.rollingUserValue(table(s, dir, "events"))),
    // UNPIVOT: the pivot matrix melted back to long form, zeros included
    "ev_unpivot" -> ((s, dir) =>
      Events.unpivotTypeByDay(table(s, dir, "events"))),
    // FORWARD as-of: each signup gets the user's first purchase value
    // at-or-after it (the "next event" lookup, mirror of ev_asof_signup),
    // served by the custom plan node in its forward direction — the
    // composition form is pinned equal in TemporalJoinsSpec
    "ev_asof_next" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purchase_ts"), col("value"))
      Relational.fmtTsCols(
        TemporalJoins.asOfJoinExecForward(signups, purchases, "user_id", "ts",
          "purchase_ts", "value", "next_purchase_value"),
        Seq("ts"))
        .orderBy("event_id")
    }),
    // as-of join: each purchase gets the user's latest signup at-or-before it
    "ev_asof_signup" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"))
      Relational.fmtTsCols(
        TemporalJoins.asOfJoin(purchases, signups, "user_id", "ts",
          "signup_ts", "signup_ts", "last_signup"),
        Seq("ts", "last_signup"))
        .orderBy("event_id")
    }),
    // the SAME as-of semantics through the custom plan node
    // (AsOfJoinNode -> AsOfJoinExec sort-merge): the DuckDB ASOF JOIN
    // oracle proves the physical operator end-to-end, and equality with
    // ev_asof_signup's composition form follows from the shared oracle
    "ev_asof_exec" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"))
      Relational.fmtTsCols(
        TemporalJoins.asOfJoinExec(purchases, signups, "user_id", "ts",
          "signup_ts", "signup_ts", "last_signup"),
        Seq("ts", "last_signup"))
        .orderBy("event_id")
    }),
    // banded range join: same-user event pairs within 5 minutes
    "ev_range_pairs" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val a = ev.select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"))
      val b = ev.select(col("user_id"), col("event_id").as("id_b"), col("ts").as("ts_b"))
      TemporalJoins.bandedRangeJoin(a, b, "user_id", "ts_a", "ts_b", 300)
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),

    // ---- dedup surface (north star: training-data pipeline) ----
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactDuplicates(table(s, dir, "documents"))),
    // incremental ingestion: even-id docs play the stored corpus (hash
    // store only — no text), odd-id docs the new batch
    "dedup_incremental_exact" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Dedup.incrementalExactDedup(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0)
          .select(md5(col("text")).as("content_hash")))
    }),
    // Bloom membership triage: the store compresses to a fixed-size bit
    // set (distinct md5-derived positions — broadcastable at ANY store
    // cardinality, the point of the structure), each batch doc probes its
    // k positions, and the exact hash join runs alongside to label false
    // positives. Same even/odd split as dedup_incremental_exact.
    // The corpus has no verbatim twins (near-dups only), so the batch =
    // odd-id docs PLUS every 50th doc replanted verbatim under a fresh id
    // (%50==0 implies even, i.e. stored) — those replants are the true
    // positives the triage must flag. Oracle replays the same replant.
    "dedup_bloom_incremental" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val replants = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 800000000L).as("doc_id"), col("text"))
      Dedup.bloomIncrementalDedup(
        docs.filter(col("doc_id") % 2 === 1)
          .select("doc_id", "text").unionByName(replants),
        docs.filter(col("doc_id") % 2 === 0)
          .select(md5(col("text")).as("content_hash")))
    }),
    "dedup_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(table(s, dir, "documents"), 3, 0.05, maxShingleDf = 100)),
    // duplication-centrality: PageRank over the same near-dup graph —
    // ranks template hubs that a flat cluster id can't
    "dedup_pagerank" -> ((s, dir) =>
      Dedup.similarityPageRank(table(s, dir, "documents"), 0.05,
        maxShingleDf = 100)),
    // dense interior of the near-dup graph: iterative k-core peel (drop
    // nodes with < 2 surviving neighbors until stable) — separates
    // clique-like template farms from weak-tie stars that pairwise
    // thresholds and PageRank both smear; per-round localCheckpoint,
    // early-stop at the idempotent fixed point
    "dedup_kcore" -> ((s, dir) =>
      Dedup.kCore(table(s, dir, "documents"), 2, 0.5, maxShingleDf = 100)),
    // graph-shape diagnostic over the same near-dup graph: per-doc
    // triangle count + local clustering coefficient via degree-ordered
    // wedges (each triangle materialized once at its lowest-rank vertex;
    // out-degrees bounded O(sqrt(2m)), so hubs never explode deg^2)
    "dedup_triangles" -> ((s, dir) =>
      Dedup.triangleStats(table(s, dir, "documents"), 0.05,
        maxShingleDf = 100)),
    // Flagship 100 TB dedup: LSH band buckets generate candidates, exact
    // Jaccard verifies. The bands are xxhash64 (not oracle-able) but the
    // verified OUTPUT is plain Jaccard >= 0.5, which the oracle computes
    // exactly. Band geometry (32 hashes / 16 bands): detection p = 0.99 at
    // s = 0.5, ~1 from s >= 0.65 — the oracle equality holds on THIS
    // corpus because its pair distribution is bimodal (planted dups at
    // s >= 0.9, noise below 0.07; no pair sits in the p < 1 band), which
    // DedupSpec pins. A corpus with borderline-s pairs would need wider
    // banding or a rows-only declaration.
    "dedup_minhash_lsh_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(table(s, dir, "documents"), 32, 16, 3, 0.5,
        maxShingleDf = 100)),
    // density-aware communities over the same near-dup graph: 3 rounds
    // of synchronous label propagation with a deterministic modal-label
    // tie-break — weak bridges lose the vote that CC would follow
    "dedup_communities" -> ((s, dir) =>
      Dedup.communities(table(s, dir, "documents"), 0.5, maxShingleDf = 100)),
    // pairwise near-dups -> connected components -> keep/drop decision:
    // the step that makes dedup actionable for a training corpus.
    "dedup_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(
        Dedup.jaccardPairs(table(s, dir, "documents"), 3, 0.5, maxShingleDf = 100))),
    // the keep decision per near-dup group: highest-centrality member
    "dedup_cluster_reps" -> ((s, dir) =>
      Dedup.clusterRepresentatives(table(s, dir, "documents"), 0.5,
        maxShingleDf = 100)),
    "dedup_keep_list" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Dedup.keepList(docs, Dedup.duplicateClusters(
        Dedup.jaccardPairs(docs, 3, 0.5, maxShingleDf = 100)))
    }),
    // xxhash64-based => deterministic in-engine but not SQL-oracle-able;
    // driver records rows-only, correctness is property-tested (DedupSpec).
    // Signature serialized to one sortable STRING cell — the driver's
    // pandas hash-compare cannot sort ARRAY cells (round-1 checker crash).
    "dedup_minhash_sigs" -> ((s, dir) =>
      Dedup.minhashSignatures(table(s, dir, "documents"))
        .select(col("doc_id"),
          array_join(transform(col("signature"), _.cast("string")), "_")
            .as("signature"))
        .orderBy("doc_id")),
    "dedup_simhash_sigs" -> ((s, dir) =>
      Dedup.simhashSignatures(table(s, dir, "documents")).orderBy("doc_id")),
    // banded-Hamming SimHash pair search (rows-only like the sigs:
    // xxhash64 bit votes aren't DuckDB-expressible; DedupSpec pins the
    // planted-dup semantics).
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(table(s, dir, "documents"), 3)),
    // Primary embedding near-dup: banded sign-bit LSH (4 bands x 8 planes)
    // + exact-cosine verify. The brute all-pairs generator is spec-only
    // (round-2 review: a BroadcastNestedLoopJoin over n^2/2 pairs was the
    // one declared query that dies at 100x scale). The oracle mirrors the
    // banding exactly, so recall < 1 cannot cause a mismatch.
    "dedup_embedding_pairs" -> ((s, dir) =>
      Dedup.embeddingNearDupPairsBanded(table(s, dir, "embeddings"), 0.4)),
    "dedup_embedding_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDupPairsLsh(table(s, dir, "embeddings"), 0.4)),
    // blocked Levenshtein near-dup: record-linkage blocking bounds the
    // self-join; distance on a fixed 64-char prefix bounds per-pair cost
    "dedup_edit_pairs" -> ((s, dir) =>
      Dedup.editDistancePairs(table(s, dir, "documents"))),
    // the curation capstone: langid -> quality/repetition -> exact dedup ->
    // near-dup keep, reported as docs dropped per stage
    "curate_funnel" -> ((s, dir) =>
      graft.curate.Curation.curationFunnel(table(s, dir, "documents"))),
    // docs/tokens surviving each candidate TTR quality bar — pick the bar
    // by its token cost; integer-exact decile bucketing, 10-row curve
    "curate_quality_curve" -> ((s, dir) =>
      graft.curate.Curation.qualityRetentionCurve(table(s, dir, "documents"))),
    // per-source dedup accounting: docs/tokens kept vs removed by the
    // near-dup keep-list (the provenance impact report published with
    // every dedup run); one tokenize scan + one ids-only join
    "curate_dedup_impact" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      graft.curate.Curation.dedupImpact(docs,
        Dedup.keepList(docs, Dedup.duplicateClusters(
          Dedup.jaccardPairs(docs, 3, 0.5, maxShingleDf = 100))))
    }),
    // snapshot diff: old = ids not divisible by 3, new = ids not divisible
    // by 7 with %5==0 texts amended — all four statuses appear (added:
    // %3==0 ∧ %7≠0; removed: %7==0 ∧ %3≠0; changed: %5==0 in both)
    "curate_corpus_diff" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      graft.curate.Curation.corpusDiff(
        docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 7 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 5 === 0, concat(col("text"), lit(" amended")))
              .otherwise(col("text"))))
    }),
    // benchmark decontamination: src0 plays the eval set, the rest of the
    // corpus is scanned for shared trigrams
    "dedup_contamination" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      Dedup.contaminationReport(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"))
    }),
    // the semantic complement: corpus vectors cosine-close to the held-out
    // eval slice (vec_id % 17 == 0) via the banded-LSH candidate path
    "dedup_embedding_contamination" -> ((s, dir) =>
      Dedup.embeddingContamination(table(s, dir, "embeddings"))),
    // substring-level dedup report: per doc, the fraction of its 8-token
    // windows that occur in any other doc ("how much of this doc is copy")
    "dedup_shared_ngrams" -> ((s, dir) =>
      Dedup.sharedNgramStats(table(s, dir, "documents"), 8)),
    // provenance-grain contamination: distinct-trigram Jaccard +
    // containment between every SOURCE pair (per-shingle buckets bounded
    // by the source count, output S^2-bounded at any corpus size)
    "dedup_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlapMatrix(table(s, dir, "documents"))),
    // the actual cut-list: maximal token spans covered by 8-token windows
    // repeated verbatim in >= 2 distinct docs (round-5 verdict item #3)
    "dedup_span_pairs" -> ((s, dir) =>
      Dedup.duplicatedSpans(table(s, dir, "documents"), 8)),
    // shard-boundary stitch: a's last-8 tokens == b's first-8 (ORDERED
    // reconstruction signal near-dup/span ops don't carry); seam-keyed
    // md5 join, df-capped on both sides
    "dedup_boundary_stitch" -> ((s, dir) =>
      Dedup.boundaryStitchPairs(table(s, dir, "documents"))),
    // paragraph-grain near-dup (round-5): blank-line paragraphs (the
    // synthetic corpus gets breaks re-materialized every 25 tokens first,
    // like the image corpus gets real headers), then the SAME df-capped
    // Jaccard path at paragraph keys, reported as per-doc dup fraction
    "dedup_paragraph_frac" -> ((s, dir) =>
      Dedup.paragraphDupFraction(
        Dedup.withSyntheticParagraphs(table(s, dir, "documents"), 25),
        3, 0.5, 100)),
    // asymmetric containment dedup: |A∩B|/min(|A|,|B|) — the metric that
    // catches a doc EMBEDDED in another (quotes, excerpts, boilerplate
    // wrappers) where the size mismatch dilutes Jaccard to ~0.5. The
    // corpus gets deterministic first-half excerpt docs planted first
    // (same fixture-assembly pattern as the paragraph/image queries)
    // because verbatim twins alone cannot distinguish the two metrics;
    // the emitted jaccard column shows the asymmetry per pair.
    "dedup_containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(
        Dedup.withSyntheticExcerpts(table(s, dir, "documents")),
        3, 0.9, 100)),
    // exact line-level boilerplate removal (C4/CCNet line dedup): lines
    // repeated verbatim in >= 3 docs drop; per-doc counts + cleaned-text
    // hash. Header/footer chrome planted first (same fixture pattern as
    // the excerpt/paragraph queries — the corpus has no repeated lines)
    "dedup_line_boilerplate" -> ((s, dir) =>
      Dedup.lineDedup(
        Dedup.withSyntheticBoilerplate(table(s, dir, "documents")))),
    // winnowed fingerprints (rolling-hash sketch, SIGMOD'03): the
    // selected (pos, hash) per doc — the positional sketch a dedup
    // pipeline stores instead of full shingle sets
    "text_winnow_fingerprints" -> ((s, dir) =>
      Dedup.winnowFingerprints(table(s, dir, "documents"))),
    // near-dup pairs over the winnowed sketches — same df-capped bucket
    // path as dedup_jaccard_pairs but on ~1/3 the rows with long keys
    "dedup_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowPairs(table(s, dir, "documents"))),
    // EXACT threshold-Jaccard pairs via prefix filtering (SSJoin/PPJoin):
    // identical shingle sets collapse to a representative, then only the
    // rarest-first sz-ceil(t*sz)+1 prefix of each set is ever bucketed —
    // the lossless alternative to the df-cap, over the same excerpt
    // fixture as containment (host-excerpt pairs straddle J = 0.5)
    "dedup_prefix_jaccard" -> ((s, dir) =>
      Dedup.prefixJaccardPairs(
        Dedup.withSyntheticExcerpts(table(s, dir, "documents")))),
    // content-defined chunking (LBFS/rsync family): rolling-hash
    // boundary mask => shift-robust chunk table, scan-shaped
    "text_cdc_chunks" -> ((s, dir) =>
      Dedup.cdcChunks(table(s, dir, "documents"))),
    // shared CDC chunks across docs over the excerpt fixture: the
    // embedded copy re-derives the SAME boundaries for shared content at
    // a different offset, so chunks align and match by md5 — the
    // storage-dedup primitive fixed-size blocks cannot deliver
    "dedup_cdc_shared" -> ((s, dir) =>
      Dedup.cdcSharedChunks(
        Dedup.withSyntheticExcerpts(table(s, dir, "documents")))),
    // perceptual dHash near-dup over payload BYTES (8-band blocking +
    // XOR verify): the planted one-byte-perturbed copies land at tiny
    // Hamming distance while md5 content hashes flip completely; the
    // oracle rebuilds every hash from hex bytes WITHOUT the banding, so
    // the pruning is proven invisible
    "mm_phash_pairs" -> ((s, dir) =>
      Multimodal.phashPairs(Multimodal.fromDocuments(
        Multimodal.withPerturbedCopies(table(s, dir, "documents"))))),
    // perceptual-dup CLUSTERS: the phash pair graph through the shared
    // pointer-jumped connected components — the keep/drop unit for
    // image-style payload dedup (each perturbed copy joins its original)
    "mm_phash_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(
        Multimodal.phashPairs(Multimodal.fromDocuments(
          Multimodal.withPerturbedCopies(table(s, dir, "documents"))))
          .select(col("media_a").as("doc_a"), col("media_b").as("doc_b")))
        .select(col("doc_id").as("media_id"), col("cluster_id"))
        .orderBy("media_id")),
    // the one-row dataset card: volume + provenance breadth + integrity
    "curate_dataset_card" -> ((s, dir) =>
      graft.curate.Curation.datasetCard(table(s, dir, "documents"))),
    // Deequ-style contract check over the relational feed: completeness,
    // ranges, accepted domains, key uniqueness, referential integrity —
    // two conditional-aggregate scans + one anti join, unpivoted
    "curate_expectations" -> ((s, dir) =>
      graft.curate.Curation.expectationsReport(
        table(s, dir, "lineitem"), table(s, dir, "orders"))),
    // temperature-scaled domain mixing: per-source token share ->
    // alpha-flattened sampling weight + resample factor
    "curate_source_mix" -> ((s, dir) =>
      graft.curate.Curation.sourceMixWeights(table(s, dir, "documents"), 0.5)),
    // epoch-annealed mix schedule: natural share -> high-quality share
    // across 4 epochs, integer-exact interpolation (weights sum to 1
    // before the final double cast)
    "curate_annealing_schedule" -> ((s, dir) =>
      graft.curate.Curation.annealingSchedule(table(s, dir, "documents"))),
    // the mixing EXECUTOR: fill each source's alpha-weighted share of a
    // 20k-token budget in seeded-hash order
    "curate_budget_sample" -> ((s, dir) =>
      graft.curate.Curation.budgetSample(table(s, dir, "documents"), 20000L)),
    // Hamilton largest-remainder apportionment: exact-integer quotas,
    // shares sum to EXACTLY the budget by construction
    "curate_apportion_budget" -> ((s, dir) =>
      graft.curate.Curation.apportionBudget(table(s, dir, "documents"))),
    // DSIR importance weights (Xie'23): hashed-bigram log-likelihood
    // ratio of target-slice vs raw-corpus feature distributions
    "curate_dsir_weights" -> ((s, dir) =>
      graft.curate.Curation.dsirWeights(table(s, dir, "documents"), "src0")),
    // the upsampling executor: per-doc repeat counts materializing the
    // alpha-mix recipe at a 200k-token budget (> corpus => whole epochs
    // + a seeded-hash partial epoch)
    "curate_epoch_plan" -> ((s, dir) =>
      graft.curate.Curation.epochPlan(table(s, dir, "documents"), 200000L)),
    // DoReMi-style Group-DRO reweighting: 3 mirror-ascent rounds on
    // per-source excess loss, starting from the token-share reference
    "curate_doremi_weights" -> ((s, dir) =>
      graft.curate.Curation.doremiWeights(table(s, dir, "documents"))),
    // leakage-safe split: assignment at near-dup-CLUSTER granularity over
    // the same 0.5-Jaccard graph as dedup_clusters, so no near-dup pair
    // can straddle train/test (the failure mode of the plain per-doc
    // samp_hash_split on an undeduplicated corpus)
    "curate_split_safe" -> ((s, dir) =>
      graft.curate.Curation.leakageSafeSplit(table(s, dir, "documents"),
        Dedup.jaccardPairs(table(s, dir, "documents"), 3, 0.5,
          maxShingleDf = 100))),
    // post-split audit: verbatim 8-token windows that cross the
    // train/eval boundary BELOW the cluster threshold (what the
    // cluster-grain split cannot prevent, reported per eval doc)
    "curate_split_contamination" -> ((s, dir) =>
      graft.curate.Curation.splitContamination(table(s, dir, "documents"),
        Dedup.jaccardPairs(table(s, dir, "documents"), 3, 0.5,
          maxShingleDf = 100))),

    // ---- similarity search (north star) ----
    "sim_cosine_topk" -> ((s, dir) =>
      Similarity.cosineTopK(table(s, dir, "embeddings"), 0L, 10)),
    "sim_ann_lsh" -> ((s, dir) =>
      Similarity.annCosineLsh(table(s, dir, "embeddings"), 0L, 10)),
    // multi-probe serving upgrade: base bucket + 3 lowest-|margin|
    // single-bit flips, deterministic probe order on both engines
    "sim_ann_multiprobe" -> ((s, dir) =>
      Similarity.annCosineLshMultiProbe(table(s, dir, "embeddings"), 0L, 10)),
    "sim_ann_ivf" -> ((s, dir) =>
      Similarity.annCosineIvf(table(s, dir, "embeddings"), 0L, 10)),
    "sim_norms_by_label" -> ((s, dir) =>
      Similarity.normStatsByLabel(table(s, dir, "embeddings"))),
    // sparse JL projection (Achlioptas density-1/3 {-1,0,+1} planes,
    // md5-derived): corpus-wide norm-preservation gate (scan-shaped,
    // zero shuffle) + pairwise distance distortion on a 64-vector
    // deterministic sample (constant cost at any corpus size)
    "sim_jl_norms" -> ((s, dir) =>
      Similarity.jlNormReport(table(s, dir, "embeddings"))),
    "sim_jl_distortion" -> ((s, dir) =>
      Similarity.jlDistortion(table(s, dir, "embeddings"))),
    // feature-redundancy diagnostic: Pearson corr over the first 8 dims —
    // pair generation is in-row (no self-join), moment sums are
    // DECIMAL(28,18)-exact, one fixed double tree after aggregation
    "sim_corr_matrix" -> ((s, dir) =>
      Similarity.dimCorrelationMatrix(table(s, dir, "embeddings"))),
    // int8 quantization fidelity: the 4x-storage-shrink safety report
    // PQ sibling of the int8 report: 4-bit-per-subspace codebook encoding
    "sim_pq_error" -> ((s, dir) =>
      Similarity.pqErrorByLabel(table(s, dir, "embeddings"))),
    // PQ serving: top-k by query x reconstruction (asymmetric distance)
    "sim_ann_pq" -> ((s, dir) =>
      Similarity.annCosinePq(table(s, dir, "embeddings"), 0L, 10)),
    "sim_quantize_error" -> ((s, dir) =>
      Similarity.quantizeErrorByLabel(table(s, dir, "embeddings"))),
    // batch serving path: the whole query workload amortizes ONE
    // bucket-equi-join (the vector analog of bm25_multi_stored)
    "sim_ann_multi" -> ((s, dir) =>
      Similarity.annCosineLshMany(table(s, dir, "embeddings"),
        Seq(0L, 1L, 2L, 3L), 5)),
    // batch IVF serving: corpus assigned once, one cell-equi-join for the
    // whole workload (the IVF sibling of sim_ann_multi)
    "sim_ann_ivf_multi" -> ((s, dir) =>
      Similarity.annCosineIvfMany(table(s, dir, "embeddings"),
        Seq(0L, 1L, 2L, 3L), 5)),
    // index-quality evaluation: measured recall@10 of the LSH index vs
    // exact brute force, per query — recall is measured, never assumed
    "sim_recall_eval" -> ((s, dir) =>
      Similarity.annRecallAtK(table(s, dir, "embeddings"),
        Seq(0L, 1L, 2L, 3L), 10)),
    // per-label centroid + pairwise centroid cosine: the embedding-level
    // corpus-mix probe (decimal-exact sums, kmeansFit discipline)
    "sim_label_centroids" -> ((s, dir) =>
      Similarity.labelCentroidSimilarity(table(s, dir, "embeddings"))),
    // sparse-vector similarity through the postings index: top-k
    // neighbors per doc by cosine over top-m TF-IDF keyword signatures
    // (the embedding-free routing/triage form; bucket-bounded like dedup)
    "sim_sparse_topk" -> ((s, dir) =>
      graft.textstats.TextAnalysis.sparseCosineNeighbors(
        table(s, dir, "documents"))),
    // one Lloyd's iteration over the IVF assignment: per-cell population +
    // refined centroid head coordinates (the trained-quantizer primitive)
    "sim_kmeans_step" -> ((s, dir) =>
      Similarity.kmeansStep(table(s, dir, "embeddings"))),
    // full Lloyd loop, 3 fixed rounds (the eps early-stop is spec
    // territory — a fixed round count is what the SQL oracle can replay).
    // Per-dim sums are DECIMAL(28,18)-exact on both sides, so the trained
    // centroids are partition-layout-independent and bit-reproducible.
    "sim_kmeans_fit" -> ((s, dir) =>
      Similarity.kmeansFitReport(table(s, dir, "embeddings"))),
    // dedup-family member of the trained partition: within-cell cosine
    // pairs — learned buckets instead of random hyperplanes
    // SemDeDup-family prototype pruning: per trained cell, the keepK
    // most-central vectors stay; assignment is the broadcast-fold argmax
    "sim_cell_prune" -> ((s, dir) =>
      Similarity.cellPrune(table(s, dir, "embeddings"))),
    // banding-curve calibration: observed banded-LSH catch rate per
    // cosine bucket vs the 1-(1-p^r)^b theory (evaluation op: the brute
    // arm is ground truth, the annRecallAtK standing)
    "sim_lsh_calibration" -> ((s, dir) =>
      Similarity.lshCalibration(table(s, dir, "embeddings"))),
    "dedup_semantic_pairs" -> ((s, dir) =>
      Similarity.semanticDedupPairs(table(s, dir, "embeddings"))),
    // IVF-PQ composition (round-5): trained coarse cells + residual PQ,
    // served by cell prune + asymmetric distance
    "sim_ann_ivfpq" -> ((s, dir) =>
      Similarity.annCosineIvfPq(table(s, dir, "embeddings"), 0L, 10)),
    // top principal component by power iteration: mean-centered matvec
    // rounds with decimal-exact sums; never materializes the covariance
    "sim_power_iteration" -> ((s, dir) =>
      Similarity.powerIterationPc(table(s, dir, "embeddings"))),
    // top-2 PCA: the same chain plus a Hotelling-deflated second chain —
    // covariance never materialized, 2*iters+3 scans total
    "sim_pca_top2" -> ((s, dir) =>
      Similarity.pcaTop2(table(s, dir, "embeddings"))),
    // contrastive-training negatives: per anchor, the 3 most-similar
    // DIFFERENTLY-labeled vectors from its LSH bucket — one bucket join
    // for the whole anchor workload
    "sim_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(table(s, dir, "embeddings"))),
    // rank-aware index-quality eval: nDCG@10 of the IVF ranking vs the
    // exact ranking, graded relevance from the exact arm itself
    "sim_ndcg_eval" -> ((s, dir) =>
      Similarity.ndcgEval(table(s, dir, "embeddings"))),
    // MMR diversification: greedy λ·rel − μ·max-sim rerank of the top-20
    // candidates (the RAG anti-near-duplicate serving pass)
    "sim_mmr_rerank" -> ((s, dir) =>
      Similarity.mmrRerank(table(s, dir, "embeddings"))),
    // PSI drift monitor: norm-bucket population stability index between
    // the baseline and current label slices (add-one smoothed)
    "sim_psi_drift" -> ((s, dir) =>
      Similarity.psiDrift(table(s, dir, "embeddings"))),
    // hybrid retrieval: reciprocal-rank fusion of the BM25 arm and the
    // dense cosine arm (the RAG serving composition; fusion cost is
    // bounded by 2*armK rows however large the corpus)
    "bm25_rrf_hybrid" -> ((s, dir) =>
      graft.rank.Hybrid.rrfSearch(s, table(s, dir, "documents"),
        table(s, dir, "embeddings"), FlagshipQuery, 0L)),
    // RM3-style pseudo-relevance feedback: expansion vocabulary mined
    // from the feedback top-10, re-ranked with weighted union query
    "bm25_expansion_terms" -> ((s, dir) =>
      BM25.expansionTerms(s, table(s, dir, "documents"), FlagshipQuery)),
    "bm25_rm3_expanded" -> ((s, dir) =>
      BM25.searchExpanded(s, table(s, dir, "documents"), FlagshipQuery)),

    // ---- text analysis (north star) ----
    "text_token_counts" -> ((s, dir) =>
      TextAnalysis.tokenCounts(table(s, dir, "documents"))),
    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityScores(table(s, dir, "documents"))),
    // C4/Gopher sentence rules: [.!?]+ segments, blank-dropped — count,
    // tokens per sentence, terminal-punctuation ending
    "text_sentence_stats" -> ((s, dir) =>
      TextAnalysis.sentenceStats(table(s, dir, "documents"))),
    // Fightin' Words keyness: per-source log-odds vs rest-of-corpus with
    // an informative Dirichlet prior, z-scored, top-5 per source
    "text_keyness" -> ((s, dir) =>
      TextAnalysis.sourceKeyness(table(s, dir, "documents"))),
    // TextRank keywords: weighted PageRank over the adjacent-token
    // co-occurrence graph — graph-centrality keywordness, decimal-exact
    // power rounds over the vocabulary-sized edge list
    "text_textrank" -> ((s, dir) =>
      TextAnalysis.textRankKeywords(table(s, dir, "documents"))),
    // code-switching detector: per-doc marker mass per language, dominant
    // share, mixture entropy — one scan, fixed 4-language tree
    "text_lang_mixture" -> ((s, dir) =>
      TextAnalysis.langMixture(table(s, dir, "documents"))),
    // closed-form least-squares probe: stopword count ~ a + b*tokens over
    // the corpus, per-source deviation from the line (outlier-source
    // detector). All floating math post-aggregation over exact long sums.
    "text_quality_regression" -> ((s, dir) =>
      TextAnalysis.qualityRegression(table(s, dir, "documents"))),
    // CCNet-style perplexity filter: LM trained on the reference source
    // only, every doc scored with add-1 smoothing
    "text_cross_lm" -> ((s, dir) =>
      TextAnalysis.crossLmScores(table(s, dir, "documents"), "src0")),
    // trigram stupid-backoff scoring (Brants'07): the distributed-corpus
    // LM — plain count ratios, alpha-damped backoff, add-one unigram floor
    "text_stupid_backoff" -> ((s, dir) =>
      TextAnalysis.stupidBackoffScores(table(s, dir, "documents"), "src0")),
    // CCNet head/middle/tail (Wenzek'20): per-source perplexity-proxy
    // terciles over the same LM scores; histogram-derived value cuts, no
    // corpus-grain ranking window
    "text_perplexity_buckets" -> ((s, dir) =>
      TextAnalysis.perplexityBuckets(table(s, dir, "documents"), "src0")),
    // trained quality classifier: 4 full-batch GD rounds of logistic
    // regression (decimal-exact gradient sums, one driver row per round)
    "text_quality_classifier" -> ((s, dir) =>
      TextAnalysis.logisticQualityScores(table(s, dir, "documents"))),
    // multinomial NB domain classifier: micro-nat integer weights make
    // every score a BIGINT sum — argmax exact in both engines
    "text_nb_classifier" -> ((s, dir) =>
      TextAnalysis.nbSourceClassifier(table(s, dir, "documents"))),
    // ROC AUC by exact integer rank sums over the score histogram
    "text_classifier_auc" -> ((s, dir) =>
      TextAnalysis.classifierAuc(table(s, dir, "documents"))),
    // per-class error report over the same eval split
    "text_nb_confusion" -> ((s, dir) =>
      TextAnalysis.nbConfusionMatrix(table(s, dir, "documents"))),
    // concat-and-chunk pretraining sample layout: docs split across
    // fixed-length chunks, exact integer spans
    "text_chunk_seqs" -> ((s, dir) =>
      TextAnalysis.chunkSequences(table(s, dir, "documents"))),
    // per-source KS drift vs the rest of the corpus (pre-mixing check)
    "text_ks_drift" -> ((s, dir) =>
      TextAnalysis.ksLengthDrift(table(s, dir, "documents"))),
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(table(s, dir, "documents"))),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.languageGuess(table(s, dir, "documents"))),
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(table(s, dir, "documents"))),
    "text_top_terms" -> ((s, dir) =>
      TextAnalysis.topTerms(table(s, dir, "documents"), 20)),
    "text_bigrams" -> ((s, dir) =>
      TextAnalysis.topBigrams(table(s, dir, "documents"), 20)),
    "text_langid_confusion" -> ((s, dir) =>
      TextAnalysis.langGuessConfusion(table(s, dir, "documents"))),
    // corpus mix report: the per-(source, lang) table that sets domain
    // mixing weights before training
    // robust length outliers: median/MAD per source (means would be
    // dragged by the outliers themselves); MAD=0 degrades to any-dev
    "text_mad_outliers" -> ((s, dir) =>
      TextAnalysis.madOutlierStats(table(s, dir, "documents"))),
    // per-doc source-vs-global percentile gap, ranks from the aggregated
    // length histogram (support-bounded windows, never a per-doc sort)
    "text_percentile_calib" -> ((s, dir) =>
      TextAnalysis.percentileCalibration(table(s, dir, "documents"))),
    // ingest-stage normalization: control chars -> space, whitespace
    // collapse, trim; emitted as the cleaned hash + length delta
    "text_normalize" -> ((s, dir) =>
      TextAnalysis.normalizeText(table(s, dir, "documents"))),
    // embedding-training data prep: skip-gram pairs + hashSplit-style
    // deterministic negatives (slot table in seeded-md5 vocab order)
    "text_skipgram_pairs" -> ((s, dir) =>
      TextAnalysis.skipgramPairs(table(s, dir, "documents"))),
    // tokenizer budgeting: bytes-per-char + non-ASCII share per language
    "text_utf8_stats" -> ((s, dir) =>
      TextAnalysis.utf8Stats(table(s, dir, "documents"))),
    "text_source_stats" -> ((s, dir) =>
      TextAnalysis.sourceStats(table(s, dir, "documents"))),
    // vocabulary richness: hapax share / type-token ratio per source
    "text_vocab_stats" -> ((s, dir) =>
      TextAnalysis.vocabularyStats(table(s, dir, "documents"))),
    // Flesch/FK readability per source: regexp-count scan, exact-long
    // sums, two formula evaluations per source row
    "text_readability" -> ((s, dir) =>
      TextAnalysis.readability(table(s, dir, "documents"))),
    // Gopher structural rules (Rae'21): per-source fail counts per rule
    // + survivors — one codegen scan, (source, 7 longs) exchange
    "text_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(table(s, dir, "documents"))),
    // Zipf rank-frequency OLS fit per source over the top-200 terms —
    // decimal-exact sums over a sources x 200 frame (WindowGroupLimit
    // bounds the rank sort)
    "text_zipf_fit" -> ((s, dir) =>
      TextAnalysis.zipfFit(table(s, dir, "documents"))),
    // Heaps'-law vocabulary-growth curve + beta fit at 10 arithmetic
    // doc-id checkpoints — no global sort/window; bounds broadcast
    "text_heaps_law" -> ((s, dir) =>
      TextAnalysis.heapsLaw(table(s, dir, "documents"))),
    "text_bpe_tokens" -> ((s, dir) =>
      TextAnalysis.bpeTokenCounts(table(s, dir, "documents"))),
    // BPE merge TRAINING (round-5 verdict item #2): 8 rounds of
    // highest-frequency-pair merging over the vocabulary, kmeansFit-style
    // (one aggregate + one argmax row to the driver per round); the
    // oracle unrolls the same 8 rounds CTE-by-CTE on the identical
    // wrapped-symbol representation, so the whole training trajectory —
    // counts, tie-breaks, greedy merge application — is replayed in SQL.
    "text_bpe_merges" -> ((s, dir) =>
      TextAnalysis.bpeTrainMerges(table(s, dir, "documents"), 8)),
    // the APPLY side of the trained tokenizer: encode the vocab with the
    // 8 ranked merges (one chained-replace projection), roll up per-doc
    // word/BPE-token counts + compression — the token-budget accounting
    // tokenizer sizing: tokens-per-word under every merge-prefix k
    "text_bpe_curve" -> ((s, dir) =>
      TextAnalysis.bpeCompressionCurve(table(s, dir, "documents"))),
    "text_bpe_encode" -> ((s, dir) =>
      TextAnalysis.bpeEncode(table(s, dir, "documents"), 8)),
    "text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfIdfTopTerms(table(s, dir, "documents"), 3)),
    // corpus-trained bigram-LM fluency proxy: mean ln p(w2|w1) per doc
    "text_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLmScores(table(s, dir, "documents"))),
    "text_len_quantiles" -> ((s, dir) =>
      TextAnalysis.lengthQuantilesByLang(table(s, dir, "documents"))),
    "text_redact_pii" -> ((s, dir) =>
      TextAnalysis.redactPii(table(s, dir, "documents"))),
    // C4-style bad-words gate: per-doc blocked-term hits + drop verdict,
    // blocklist as an array literal (codegen membership, zero joins)
    "text_blocklist_filter" -> ((s, dir) =>
      TextAnalysis.blocklistFilter(table(s, dir, "documents"))),
    // length-bucketed batch layout with per-batch padding waste; windows
    // bounded per (bucket, shard), deterministic md5 shuffle
    "text_batch_plan" -> ((s, dir) =>
      TextAnalysis.batchPlan(table(s, dir, "documents"))),
    // windowed PMI collocations (Church-Hanks'90): top-30 pairs within
    // 3 positions above a count floor
    "text_pmi_pairs" -> ((s, dir) =>
      TextAnalysis.pmiPairs(table(s, dir, "documents"))),
    // reliability diagram for the trained logistic classifier: per score
    // bin, mean predicted probability vs observed positive rate
    "text_classifier_calibration" -> ((s, dir) =>
      TextAnalysis.classifierCalibration(table(s, dir, "documents"))),
    // novelty vs the src0 reference slice: fraction of each doc's distinct
    // trigrams unseen in the reference n-gram universe
    "text_ngram_novelty" -> ((s, dir) =>
      TextAnalysis.ngramNovelty(table(s, dir, "documents"), "src0", 3)),
    // deterministic T5-style denoising plan: maximal masked-token spans
    // from an md5 coin per (doc, pos) at 15%
    "text_span_corruption" -> ((s, dir) =>
      TextAnalysis.spanCorruptionPlan(table(s, dir, "documents"), 15, 17L)),
    // checksum-gated PII: 16-digit runs validated by Luhn (planted
    // valid/invalid fixture — the corpus has no digit runs)
    "text_luhn_pii" -> ((s, dir) =>
      TextAnalysis.luhnCardScan(table(s, dir, "documents"))),
    "text_chunks" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(table(s, dir, "documents"), 64, 16)),
    "text_pack_bins" -> ((s, dir) =>
      TextAnalysis.packIntoBins(table(s, dir, "documents"), 2048)),
    // sketch values are Spark-deterministic but engine-specific => rows-only;
    // SketchSpec bounds approx-vs-exact error.
    "sketch_distinct_parts" -> ((s, dir) =>
      Sketches.distinctPartsPerFlag(table(s, dir, "lineitem"))),
    "sketch_price_quantiles" -> ((s, dir) =>
      Sketches.priceQuantilesPerPriority(table(s, dir, "orders"))),
    // count-min sketch with md5-derived hashes: the ONE sketch the oracle
    // can verify bit-for-bit (pure integer arithmetic in both engines)
    "sketch_cms_topk" -> ((s, dir) =>
      Sketches.cmsTermCounts(table(s, dir, "documents"))),
    // sketch mergeability: union of per-shard HLL sketches answers the
    // global distinct within bound — asserted as oracled booleans
    "sketch_hll_merge" -> ((s, dir) =>
      Sketches.hllMergeReport(table(s, dir, "lineitem"))),
    // KMV bottom-k sketch: like CMS, md5-derived and therefore fully
    // oracle-checkable — the one cardinality sketch DuckDB replays
    // bit-for-bit (k smallest distinct hashes + one double division)
    "sketch_kmv_vocab" -> ((s, dir) =>
      Sketches.kmvVocabulary(table(s, dir, "documents"))),
    // sketch SET ALGEBRA: pairwise source-vocabulary overlap estimated
    // from the k-row sketches alone (union re-take + rho), with the
    // exact intersection as the judged evaluation arm
    "sketch_kmv_overlap" -> ((s, dir) =>
      Sketches.kmvSourceOverlap(table(s, dir, "documents"))),
    // Misra-Gries bound-then-verify: the sub-linear heavy-hitters path
    // whose exact-recount second pass makes the result EXACT, so the
    // oracle is the plain HAVING definition with no MG logic (pruning
    // invisible — the bm25_wand standing)
    "sketch_heavy_hitters" -> ((s, dir) =>
      Sketches.heavyHitterTerms(table(s, dir, "documents"))),

    // ---- multimodal binary-column plumbing (north star) ----
    "mm_meta" -> ((s, dir) =>
      Multimodal.metaExtract(Multimodal.fromDocuments(table(s, dir, "documents")))),
    "mm_resize" -> ((s, dir) =>
      Multimodal.resizeStub(Multimodal.fromDocuments(table(s, dir, "documents")), 32)),
    // frame emitted as hex STRING (like mm_meta's magic_prefix): the
    // driver's pandas compare cannot sort raw BINARY cells.
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.fromDocuments(table(s, dir, "documents")), 16, 4)
        .select(col("media_id"), col("frame_idx"),
          hex(col("frame")).as("frame"), col("frame_bytes"))
        .orderBy("media_id", "frame_idx")),
    // REAL features (the round-4 stub graduation): one codegen pass over
    // the synthetic image corpus's actual bytes computes the 256-bucket
    // byte histogram -> Shannon entropy + high-nibble counts h0..h15,
    // while graft_image_dims parses width/height from the container
    // header. The oracle re-assembles the identical hex, explodes it to
    // bytes, and recomputes every count and the entropy sum in SQL — both
    // engines derive the numbers from the same real payload bytes.
    "mm_features" -> ((s, dir) =>
      Multimodal.imageFeatures(
        Multimodal.syntheticImageCorpus(table(s, dir, "documents")))),
    // REAL decode (no stub): header-valid PNG/JPEG binaries are assembled
    // from doc fields with column ops, then the codegen graft_image_dims
    // expression parses dimensions back out of the BYTES (PNG IHDR read;
    // JPEG marker-segment walk past a per-row variable-length COM). The
    // oracle re-assembles the same hex and parses it independently in SQL
    // (recursive-CTE segment walk) — both engines decode actual bytes.
    "mm_image_meta" -> ((s, dir) =>
      Multimodal.imageMeta(
        Multimodal.syntheticImageCorpus(table(s, dir, "documents")))),
    // REAL audio decode: header-valid WAV binaries (RIFF envelope, a
    // variable-length LIST chunk with the odd-size pad rule, PCM fmt,
    // data) assembled from doc fields, then the codegen graft_audio_meta
    // expression walks the chunk list and recovers the PCM params +
    // duration from the BYTES. The oracle re-assembles the same hex and
    // walks it independently (recursive-CTE chunk walk, LE reads).
    "mm_audio_meta" -> ((s, dir) =>
      Multimodal.audioMeta(
        Multimodal.syntheticAudioCorpus(table(s, dir, "documents")))),
    // REAL video decode: structure-valid MP4 binaries (ftyp, a free box
    // that uses a 64-bit largesize on every 5th row, moov with mvhd v0/v1
    // + 1..3 trak stubs), parsed back by the codegen graft_video_meta box
    // walk. The oracle walks the same bytes with recursive CTEs.
    "mm_video_meta" -> ((s, dir) =>
      Multimodal.videoMeta(
        Multimodal.syntheticVideoCorpus(table(s, dir, "documents")))),

    // ---- corpus sampling + stored-index serving (round-2 additions) ----
    // S3 replacement: seeded deterministic sample — stable under partition
    // layout (unlike df.sample) and engine-portable (md5 order).
    "samp_seeded" -> ((s, dir) =>
      Sampling.deterministicSample(table(s, dir, "documents"), "doc_id", 100, 42)
        .select("doc_id", "sample_key")),
    // corpus balancing: 10 docs per language in seeded-hash order
    "samp_stratified" -> ((s, dir) =>
      Sampling.stratifiedSample(table(s, dir, "documents"), "lang", "doc_id", 10, 42)
        .select(col("lang"), col("doc_id"), col("sample_rank"))
        .orderBy("lang", "sample_rank")),
    // class-parity rebalance: every language downsampled to the smallest
    // language's count, seeded md5 order, floor = one broadcast row
    "samp_balanced" -> ((s, dir) =>
      Sampling.balancedSample(table(s, dir, "documents"), "lang", "doc_id", 17)
        .select(col("lang"), col("doc_id"))
        .orderBy("lang", "doc_id")),
    // leakage-safe deterministic train/val/test split: membership is a
    // pure function of (doc_id, seed) — appends never reshuffle old docs
    "samp_hash_split" -> ((s, dir) =>
      Sampling.hashSplit(table(s, dir, "documents"), "doc_id")
        .select("doc_id", "split").orderBy("doc_id")),
    // importance sampling (A-ES): selection odds proportional to doc
    // length; output is the selected SET (ordered by id), so key VALUES
    // never enter the compare — only rank-boundary order does, where
    // adjacent-key gaps (~1/n) dwarf ln()'s 1-ulp cross-engine noise
    // (see the weightedSample scaladoc for the full argument)
    "samp_weighted" -> ((s, dir) =>
      Sampling.weightedSample(table(s, dir, "documents"), "doc_id", "n_chars", 50, 42)
        .select("doc_id", "n_chars").orderBy("doc_id")),
    // per-group weighted reservoir (A-Res): 5 length-weighted docs per
    // language — the set-compare discipline of samp_weighted, per group
    "samp_reservoir" -> ((s, dir) =>
      Sampling.groupedWeightedSample(table(s, dir, "documents"), "lang",
          "doc_id", "n_chars", 5, 42)
        .select("lang", "doc_id", "n_chars").orderBy("lang", "doc_id")),
    // Poisson bootstrap (the scalable bootstrap): md5-deterministic
    // Poisson(1) replicate weights -> exactly replayable resampled
    // aggregates; one scan, 3x fan-out, decimal-exact weighted sums
    "samp_poisson_bootstrap" -> ((s, dir) =>
      Sampling.poissonBootstrap(table(s, dir, "lineitem"))),
    // The serving path: build the bucketed parquet index, then search it
    // with partition pruning to the query terms' buckets. The oracle
    // recomputes the same statistics from raw text — stored-vs-recompute
    // equality IS the correctness claim.
    "bm25_stored" -> ((s, dir) => {
      val idx = indexPath(s, dir)
      IndexStore.write(table(s, dir, "documents"), idx)
      BM25.searchStored(s, idx, FlagshipQuery)
    }),
    // The batch serving path: one pruned postings scan amortized over the
    // whole query workload. Same oracle as bm25_multi — stored ≡ recompute
    // is again the correctness claim.
    "bm25_multi_stored" -> ((s, dir) => {
      val idx = indexPath(s, dir)
      IndexStore.write(table(s, dir, "documents"), idx)
      BM25.searchManyStored(s, idx,
        Seq((1L, "spark join window"), (2L, "batch stream")))
    }),
    // phrase-aware ranking: BM25 over the phrase's terms + exact-phrase
    // boost from the positional table, both served from the same store
    "bm25_phrase_boost" -> ((s, dir) => {
      val idx = indexPath(s, dir)
      IndexStore.write(table(s, dir, "documents"), idx)
      BM25.searchStoredPhraseBoosted(s, idx, "row column sort")
    }),
  )

  /** One shared index build for Bench: the four stored queries above each
    * include a full `IndexStore.write` so the correctness gate proves
    * stored ≡ recompute, but benchmarking that way rebuilds the same index
    * four times and hides the serving latency the stored path exists to
    * demonstrate. Bench times this once (reported as `idx_store_build`)
    * and then times `servedQueries` serve-only. Verify keeps using
    * `queries` — the inline build IS the correctness claim there. */
  def buildIndexStore(s: SparkSession, dir: String): Unit =
    IndexStore.write(table(s, dir, "documents"), indexPath(s, dir))

  /** Serve-only twins of the stored queries: byte-identical serving plans
    * (same functions, same store path), minus the inline build. */
  def servedQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm25_stored" -> ((s, dir) =>
      BM25.searchStored(s, indexPath(s, dir), FlagshipQuery)),
    "bm25_multi_stored" -> ((s, dir) =>
      BM25.searchManyStored(s, indexPath(s, dir),
        Seq((1L, "spark join window"), (2L, "batch stream")))),
    "idx_phrase_stored" -> ((s, dir) =>
      IndexStore.phraseMatchStored(s, indexPath(s, dir), "row column sort")),
    "idx_proximity_stored" -> ((s, dir) =>
      IndexStore.proximityMatchStored(s, indexPath(s, dir), "spark", "join", 8)),
    "bm25_phrase_boost" -> ((s, dir) =>
      BM25.searchStoredPhraseBoosted(s, indexPath(s, dir), "row column sort")),
  )

  /** Per-(app, sfDir) temp index path — applicationId keeps concurrent
    * harness runs on the same sfDir from clobbering each other's files. */
  private def indexPath(s: SparkSession, dir: String): String =
    java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_index_" + s.sparkContext.applicationId +
        "_" + Integer.toHexString(dir.hashCode)).toString

  /** DuckDB-runnable oracle SQL, one per queries key, same column names. */
  def oracleSql: Map[String, String] = Map(
    "idx_term_frequency" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents)
        |SELECT doc_id, term, count(*) AS term_frequency
        |FROM tok GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,
    // zipped parallel unnests give (pos, term) pairs; 1-based pos vs the
    // Spark side's 0-based is invisible — only position DIFFERENCES matter
    "idx_phrase_match" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |p AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, unnest(tk) AS term FROM t)
        |SELECT p0.doc_id AS doc_id, count(*) AS n_occurrences
        |FROM p p0
        |JOIN p p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1 AND p1.term = 'column'
        |JOIN p p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2 AND p2.term = 'sort'
        |WHERE p0.term = 'row'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // DuckDB list slicing is 1-based inclusive [a:b]; Spark's slice takes
    // (start, LENGTH) — the spellings below pick the same window
    "idx_phrase_snippets" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |p AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, unnest(tk) AS term FROM t),
        |starts AS (
        |  SELECT p0.doc_id AS doc_id, p0.pos AS pos
        |  FROM p p0
        |  JOIN p p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1 AND p1.term = 'column'
        |  JOIN p p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2 AND p2.term = 'sort'
        |  WHERE p0.term = 'row'),
        |f AS (SELECT doc_id, CAST(min(pos) - 1 AS BIGINT) AS first_pos FROM starts GROUP BY 1)
        |SELECT t.doc_id, f.first_pos,
        |  array_to_string(tk[greatest(first_pos + 1 - 3, 1) : greatest(first_pos + 1 - 3, 1) + 8], ' ') AS snippet
        |FROM t JOIN f ON t.doc_id = f.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // stored ≡ recompute, same oracle derivation as idx_proximity_match
    "idx_proximity_stored" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |p AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, unnest(tk) AS term FROM t),
        |a AS (SELECT doc_id, pos FROM p WHERE term = 'spark'),
        |b AS (SELECT doc_id, pos FROM p WHERE term = 'join')
        |SELECT a.doc_id AS doc_id, count(*) AS n_pairs,
        |  CAST(min(abs(a.pos - b.pos)) AS BIGINT) AS min_distance
        |FROM a JOIN b ON b.doc_id = a.doc_id AND abs(a.pos - b.pos) <= 8
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle joins raw positions directly — no banding — so the
    // band-bucketed candidate generation is what is being checked
    "idx_proximity_match" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |p AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, unnest(tk) AS term FROM t),
        |a AS (SELECT doc_id, pos FROM p WHERE term = 'spark'),
        |b AS (SELECT doc_id, pos FROM p WHERE term = 'join')
        |SELECT a.doc_id AS doc_id, count(*) AS n_pairs,
        |  CAST(min(abs(a.pos - b.pos)) AS BIGINT) AS min_distance
        |FROM a JOIN b ON b.doc_id = a.doc_id AND abs(a.pos - b.pos) <= 8
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // stored ≡ recompute: the oracle recomputes from raw text, the query
    // serves from the bucketed positional table
    "idx_phrase_stored" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |p AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, unnest(tk) AS term FROM t)
        |SELECT p0.doc_id AS doc_id, count(*) AS n_occurrences
        |FROM p p0
        |JOIN p p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1 AND p1.term = 'column'
        |JOIN p p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2 AND p2.term = 'sort'
        |WHERE p0.term = 'row'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "idx_doc_frequency" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
        |d AS (SELECT DISTINCT doc_id, term FROM tok)
        |SELECT term, count(*) AS doc_frequency FROM d GROUP BY term ORDER BY term""".stripMargin,
    "idx_postings_compressed" -> postingsCompressionOracleSql,
    "idx_doc_info" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS doc_length
        |FROM documents ORDER BY doc_id""".stripMargin,
    "idx_corpus_info" ->
      """WITH dl AS (SELECT CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS doc_length FROM documents)
        |SELECT count(*) AS doc_n, CAST(sum(doc_length) AS BIGINT) AS total_doc_length,
        |       round(avg(doc_length), 4) AS avg_doc_length FROM dl""".stripMargin,
    "bm25_search" -> bm25OracleSql("('spark','join','window')"),
    // DuckDB levenshtein counts bytes vs Spark codepoints — identical on
    // the ASCII-only vocabulary/query (the dedup_edit_pairs argument);
    // the banded kernel is exact under the <= 2 filter
    "bm25_spell_suggest" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
        |v AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_frequency
        |      FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
        |q AS (SELECT unnest(['spak','joinn','windoe']) AS query_term),
        |cand AS (SELECT q.query_term, v.term,
        |    CAST(levenshtein(v.term, q.query_term) AS BIGINT) AS edit_dist,
        |    v.doc_frequency
        |  FROM v JOIN q ON abs(length(v.term) - length(q.query_term)) <= 2
        |  WHERE levenshtein(v.term, q.query_term) <= 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_term
        |    ORDER BY edit_dist, doc_frequency DESC, term) AS rnk FROM cand)
        |SELECT query_term, term AS suggestion, edit_dist, doc_frequency,
        |  CAST(rnk AS INT) AS "rank"
        |FROM r WHERE rnk <= 3 ORDER BY query_term, rnk""".stripMargin,
    // the same top CTE + hit-anchored distinct-term window scoring; the
    // 1-based list_slice end is inclusive, so start..start+14 = 15 tokens
    "bm25_snippets" ->
      s"""WITH ${bm25TopCtes("('spark','join','window')")},
         |t AS (SELECT d.doc_id, regexp_extract_all(translate(d.text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk
         |      FROM documents d JOIN top USING (doc_id)),
         |hit AS (SELECT doc_id, s.i AS pos, tk[s.i] AS term
         |        FROM t, unnest(generate_series(1, len(tk))) AS s(i)
         |        WHERE tk[s.i] IN ('spark','join','window')),
         |win AS (SELECT a.doc_id, a.pos AS wstart, CAST(count(DISTINCT b.term) AS BIGINT) AS n_terms
         |        FROM hit a JOIN hit b ON a.doc_id = b.doc_id
         |          AND b.pos >= a.pos AND b.pos < a.pos + 15
         |        GROUP BY a.doc_id, a.pos),
         |best AS (SELECT doc_id, wstart, n_terms,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY n_terms DESC, wstart) AS rk
         |  FROM win)
         |SELECT t.doc_id, top.doc_rank, CAST(best.wstart AS BIGINT) AS start,
         |  best.n_terms,
         |  array_to_string(list_slice(t.tk, best.wstart, best.wstart + 14), ' ') AS snippet
         |FROM best JOIN t USING (doc_id) JOIN top USING (doc_id)
         |WHERE best.rk = 1
         |ORDER BY top.doc_rank DESC, t.doc_id""".stripMargin,
    // the WAND form is exact by construction: its oracle is the SAME
    // unpruned BM25 chain — the pruning must be invisible in the result
    "bm25_wand" -> bm25OracleSql("('hash','merge','stream')"),
    "bm25_block_max" -> bm25OracleSql("('hash','merge','stream')"),
    "bm25_oov" -> bm25OracleSql("('zzzznotaword','qqqqnotaword')"),
    // prefix expansion replayed as an IN-subquery term source: vocab df
    // ranked per prefix (df desc, term), capped at 50, then the SAME
    // unmodified scoring CTEs — expansion changes the term set only
    "bm25_prefix_search" -> bm25OracleSql(
      """(SELECT term FROM (
        |  SELECT v.term, row_number() OVER (PARTITION BY p.pfx
        |    ORDER BY v.df DESC, v.term) AS rn
        |  FROM (SELECT term, count(DISTINCT doc_id) AS df
        |        FROM (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents)
        |        GROUP BY term) v
        |  JOIN (VALUES ('s'), ('qu')) p(pfx) ON v.term LIKE p.pfx || '%')
        | WHERE rn <= 50)""".stripMargin),
    "idx_champion_lists" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |r AS (SELECT term, doc_id, tf,
        |        row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS impact_rank
        |      FROM tf)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS term_frequency, CAST(impact_rank AS INT) AS impact_rank
        |FROM r WHERE impact_rank <= 5 ORDER BY term, impact_rank""".stripMargin,
    "bm25_champion" -> bm25ChampionOracleSql("('spark','join','window')", 10),
    // PRF oracles: the bm25 chain ranks the feedback set; expansion terms
    // by rounded tf-idf mass with term tie-break; the expanded ranking is
    // the same bm25 tree times the broadcast weight (qw * (...) — the
    // commuted product is bit-equal to Spark's (...) * qw).
    "bm25_expansion_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
        |tf0 AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfall AS (SELECT term, count(*) AS df FROM tf0 GROUP BY term),
        |dl AS (SELECT doc_id, CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |scored AS (
        |  SELECT t.doc_id,
        |         sum( ln(CAST(n AS DOUBLE)/df) * (2.0*tf) / (1.0*(0.25 + 0.75*dl/avgdl) + tf) ) AS score
        |  FROM tf0 t JOIN dfall USING(term) JOIN dl USING(doc_id) CROSS JOIN stats
        |  WHERE t.term IN ('spark','join','window')
        |  GROUP BY t.doc_id),
        |fb AS (SELECT doc_id FROM (SELECT doc_id, round(score, 4) AS doc_rank FROM scored
        |       ORDER BY doc_rank DESC, doc_id LIMIT 10)),
        |expw AS (SELECT t.term,
        |    round(sum(CAST(tf AS DOUBLE) * ln(CAST(n AS DOUBLE)/df)), 6) AS expansion_weight
        |  FROM tf0 t JOIN fb USING (doc_id) JOIN dfall USING (term) CROSS JOIN stats
        |  WHERE t.term NOT IN ('spark','join','window')
        |  GROUP BY t.term ORDER BY expansion_weight DESC, term LIMIT 5)
        |SELECT term, expansion_weight FROM expw
        |ORDER BY expansion_weight DESC, term""".stripMargin,
    "bm25_rm3_expanded" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
        |tf0 AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfall AS (SELECT term, count(*) AS df FROM tf0 GROUP BY term),
        |dl AS (SELECT doc_id, CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |scored AS (
        |  SELECT t.doc_id,
        |         sum( ln(CAST(n AS DOUBLE)/df) * (2.0*tf) / (1.0*(0.25 + 0.75*dl/avgdl) + tf) ) AS score
        |  FROM tf0 t JOIN dfall USING(term) JOIN dl USING(doc_id) CROSS JOIN stats
        |  WHERE t.term IN ('spark','join','window')
        |  GROUP BY t.doc_id),
        |fb AS (SELECT doc_id FROM (SELECT doc_id, round(score, 4) AS doc_rank FROM scored
        |       ORDER BY doc_rank DESC, doc_id LIMIT 10)),
        |expw AS (SELECT t.term,
        |    round(sum(CAST(tf AS DOUBLE) * ln(CAST(n AS DOUBLE)/df)), 6) AS w
        |  FROM tf0 t JOIN fb USING (doc_id) JOIN dfall USING (term) CROSS JOIN stats
        |  WHERE t.term NOT IN ('spark','join','window')
        |  GROUP BY t.term ORDER BY w DESC, term LIMIT 5),
        |wq AS (SELECT term, CAST(1 AS DOUBLE) AS qw
        |       FROM (VALUES ('spark'),('join'),('window')) v(term)
        |       UNION ALL SELECT term, CAST(0.5 AS DOUBLE) AS qw FROM expw),
        |fs AS (SELECT t.doc_id,
        |         sum( qw * (ln(CAST(n AS DOUBLE)/df) * (2.0*tf) / (1.0*(0.25 + 0.75*dl/avgdl) + tf)) ) AS score
        |  FROM tf0 t JOIN wq USING(term) JOIN dfall USING(term) JOIN dl USING(doc_id) CROSS JOIN stats
        |  GROUP BY t.doc_id)
        |SELECT doc_id, round(score, 4) AS doc_rank FROM fs
        |ORDER BY doc_rank DESC, doc_id LIMIT 10""".stripMargin,
    // nDCG oracle: exact and IVF arms replayed, ranks over rounded
    // cosines, the ln(x)/ln(2) discount spelled identically (native log2
    // differs from the ln quotient by an ulp on powers of two).
    "sim_ndcg_eval" ->
      """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |e1 AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
        |e AS (SELECT vec_id, label, list_transform(v, x -> x/nrm) AS u FROM e1),
        |ex0 AS (SELECT e.vec_id,
        |    round(list_dot_product(v, qv)/(sqrt(list_dot_product(v, v))*sqrt(list_dot_product(qv, qv))), 4) AS cosine
        |  FROM e0 e, (SELECT v AS qv FROM e0 WHERE vec_id = 0) q WHERE e.vec_id != 0
        |  ORDER BY cosine DESC, vec_id LIMIT 10),
        |xr AS (SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank_exact FROM ex0),
        |c0 AS (SELECT vec_id, u, md5(CAST(vec_id AS VARCHAR) || ':7') AS ck FROM e ORDER BY ck, vec_id LIMIT 16),
        |c AS (SELECT row_number() OVER (ORDER BY ck, vec_id) AS cell_id, u AS cu FROM c0),
        |asg AS (SELECT vec_id, u, cell_id FROM (
        |  SELECT e.vec_id, e.u, c.cell_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.u, c.cu) DESC, c.cell_id) AS rn
        |  FROM e CROSS JOIN c) WHERE rn = 1),
        |q AS (SELECT u AS qu FROM asg WHERE vec_id = 0),
        |probe AS (SELECT cell_id FROM (
        |  SELECT c.cell_id, row_number() OVER (ORDER BY list_dot_product(q.qu, c.cu) DESC, c.cell_id) AS rn
        |  FROM q CROSS JOIN c) WHERE rn <= 4),
        |ap AS (SELECT a.vec_id, round(list_dot_product(a.u, q.qu), 4) AS cosine
        |  FROM asg a JOIN probe USING (cell_id) CROSS JOIN q
        |  WHERE a.vec_id != 0
        |  ORDER BY cosine DESC, vec_id LIMIT 10),
        |ar AS (SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS pos FROM ap),
        |dc AS (SELECT sum(CAST(coalesce(11 - rank_exact, 0) AS DOUBLE) /
        |    (ln(CAST(pos AS DOUBLE) + 1.0) / ln(CAST(2 AS DOUBLE)))) AS dcg
        |  FROM ar LEFT JOIN xr USING (vec_id)),
        |ic AS (SELECT sum(CAST(11 - rank_exact AS DOUBLE) /
        |    (ln(CAST(rank_exact AS DOUBLE) + 1.0) / ln(CAST(2 AS DOUBLE)))) AS idcg FROM xr)
        |SELECT 10 AS k, round(dcg, 4) AS dcg, round(idcg, 4) AS idcg,
        |  round(dcg / idcg, 4) AS ndcg
        |FROM dc CROSS JOIN ic""".stripMargin,
    // PSI oracle: same rounded-norm bucketing (round-6 BEFORE floor so a
    // 1-ulp sqrt cannot flip a bin), same add-one probability tree.
    "sim_psi_drift" ->
      """WITH e AS (SELECT label, round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm FROM embeddings),
        |b AS (SELECT norm FROM e WHERE label <= 4),
        |c AS (SELECT norm FROM e WHERE label > 4),
        |bounds AS (SELECT min(norm) AS bmin, max(norm) AS bmax FROM b),
        |nb AS (SELECT CASE WHEN bmax = bmin THEN 0
        |    ELSE least(9, greatest(0, CAST(floor((norm - bmin) / (bmax - bmin) * CAST(10 AS DOUBLE)) AS INT))) END AS bucket,
        |    count(*) AS n_base FROM b CROSS JOIN bounds GROUP BY 1),
        |nc AS (SELECT CASE WHEN bmax = bmin THEN 0
        |    ELSE least(9, greatest(0, CAST(floor((norm - bmin) / (bmax - bmin) * CAST(10 AS DOUBLE)) AS INT))) END AS bucket,
        |    count(*) AS n_cur FROM c CROSS JOIN bounds GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM b) AS tb,
        |               (SELECT CAST(count(*) AS BIGINT) FROM c) AS tc),
        |spine AS (SELECT unnest(generate_series(0, 9)) AS bucket),
        |per AS (SELECT s.bucket,
        |    CAST(coalesce(n_base, 0) AS BIGINT) AS n_base,
        |    CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur,
        |    (CAST(coalesce(n_base, 0) AS DOUBLE) + 1.0) / (CAST(tb AS DOUBLE) + CAST(10 AS DOUBLE)) AS pb,
        |    (CAST(coalesce(n_cur, 0) AS DOUBLE) + 1.0) / (CAST(tc AS DOUBLE) + CAST(10 AS DOUBLE)) AS pc
        |  FROM spine s LEFT JOIN nb USING (bucket) LEFT JOIN nc USING (bucket) CROSS JOIN tot),
        |pt AS (SELECT bucket, n_base, n_cur, round((pb - pc) * ln(pb / pc), 6) AS psi_term FROM per),
        |tt AS (SELECT round(sum(psi_term), 6) AS psi_total FROM pt)
        |SELECT CAST(bucket AS INT) AS bucket, n_base, n_cur, psi_term, psi_total
        |FROM pt CROSS JOIN tt ORDER BY bucket""".stripMargin,
    // MMR oracle: candidate arm replayed, then each greedy round
    // unrolled — NOT-IN of prior picks, correlated max over the selected
    // set's rounded pairwise cosines, same round(…,6) + vec_id argmax.
    "sim_mmr_rerank" -> {
      val lam = "CAST(0.7 AS DOUBLE)"
      val div = "CAST(0.3 AS DOUBLE)"
      val rounds = (2 to 5).map { t =>
        val selList = (1 until t).map(i => s"SELECT vec_id FROM s$i")
          .mkString(" UNION ALL ")
        val selU = (1 until t)
          .map(i => s"SELECT u FROM cand JOIN s$i USING (vec_id)")
          .mkString(" UNION ALL ")
        s"""p$t AS (SELECT c.vec_id, round($lam * c.rel - $div *
           |    (SELECT max(round(list_dot_product(c.u, s.u), 4)) FROM ($selU) s), 6) AS mmr
           |  FROM cand c WHERE c.vec_id NOT IN ($selList)),
           |s$t AS (SELECT vec_id, mmr, $t AS pos FROM p$t ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val all = (1 to 5).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
      s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
         |e AS (SELECT vec_id, list_transform(v, x -> x/nrm) AS u FROM e1),
         |ex AS (SELECT e0.vec_id,
         |    round(list_dot_product(v, qv)/(sqrt(list_dot_product(v, v))*sqrt(list_dot_product(qv, qv))), 4) AS rel
         |  FROM e0, (SELECT v AS qv FROM e0 WHERE vec_id = 0) q WHERE e0.vec_id != 0
         |  ORDER BY rel DESC, vec_id LIMIT 20),
         |cand AS (SELECT ex.vec_id, ex.rel, e.u FROM ex JOIN e USING (vec_id)),
         |p1 AS (SELECT vec_id, round($lam * rel - $div * CAST(0 AS DOUBLE), 6) AS mmr FROM cand),
         |s1 AS (SELECT vec_id, mmr, 1 AS pos FROM p1 ORDER BY mmr DESC, vec_id LIMIT 1),
         |$rounds
         |SELECT CAST(pos AS INT) AS pos, vec_id, mmr AS mmr_score
         |FROM ($all) ORDER BY pos""".stripMargin
    },
    // RRF hybrid oracle: the bm25_search chain at armK=20 + the
    // sim_cosine_topk chain at armK=20, each re-ranked over rounded
    // scores, fused by 1/(60+rank) with NULL-absorbing coalesce.
    "bm25_rrf_hybrid" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term IN ('spark','join','window') GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok WHERE term IN ('spark','join','window') GROUP BY term),
        |dl AS (SELECT doc_id, CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |scored AS (
        |  SELECT tf.doc_id,
        |         sum( ln(CAST(n AS DOUBLE)/df) * (2.0*tf) / (1.0*(0.25 + 0.75*dl/avgdl) + tf) ) AS score
        |  FROM tf JOIN dfq USING(term) JOIN dl USING(doc_id) CROSS JOIN stats
        |  GROUP BY tf.doc_id),
        |bm AS (SELECT doc_id, round(score, 4) AS doc_rank FROM scored
        |       ORDER BY doc_rank DESC, doc_id LIMIT 20),
        |bmr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_rank DESC, doc_id) AS INT) AS bm25_rank FROM bm),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |co AS (SELECT e.vec_id,
        |         round(list_dot_product(v, qv)/(sqrt(list_dot_product(v, v))*sqrt(list_dot_product(qv, qv))), 4) AS cosine
        |       FROM e, q WHERE e.vec_id != 0
        |       ORDER BY cosine DESC, vec_id LIMIT 20),
        |cor AS (SELECT vec_id AS doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS INT) AS ann_rank FROM co),
        |fu AS (SELECT coalesce(bmr.doc_id, cor.doc_id) AS doc_id, bm25_rank, ann_rank,
        |         round(coalesce(1.0/(60.0 + CAST(bm25_rank AS DOUBLE)), 0.0) +
        |               coalesce(1.0/(60.0 + CAST(ann_rank AS DOUBLE)), 0.0), 6) AS rrf_score
        |       FROM bmr FULL OUTER JOIN cor ON bmr.doc_id = cor.doc_id)
        |SELECT doc_id, bm25_rank, ann_rank, rrf_score FROM fu
        |ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin,
    "idx_incremental_merge" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents)
        |SELECT doc_id, term, count(*) AS term_frequency
        |FROM tok GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,
    "bm25_multi" -> bm25MultiOracleSql,

    "rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  -- via VARCHAR: DuckDB's wide-decimal->DOUBLE cast is 1 ulp off
        |  -- at some magnitudes (seen at the 10x scale sweep on this
        |  -- scale-6 sum); its string->double path is correctly rounded,
        |  -- matching Spark's BigDecimal conversion
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "rel_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-04-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,
    "rel_revenue_by_segment" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "rel_local_supplier_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "rel_volume_by_brand" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "rel_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "rel_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "rel_outer_join_agg" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS spent
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01') o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "rel_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",
    "rel_union_all" ->
      """SELECT o_orderkey, o_custkey, 'urgent' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, o_custkey, 'high' AS bucket FROM orders WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_orderkey, bucket""".stripMargin,
    "rel_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY c_custkey""".stripMargin,
    "rel_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin,
    "rel_full_outer_join" ->
      """WITH u AS (SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS urgent_spend
        |           FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
        |h AS (SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS high_spend
        |      FROM orders WHERE o_orderpriority = '2-HIGH' GROUP BY o_custkey)
        |SELECT o_custkey, coalesce(urgent_spend, 0.0) AS urgent_spend,
        |       coalesce(high_spend, 0.0) AS high_spend
        |FROM u FULL JOIN h USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,
    "rel_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_custkey""".stripMargin,
    "rel_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_custkey""".stripMargin,
    "rel_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // quantities are integral (verified) so the double products/compares
    // below are exact; the Spark side spells the same compare in DECIMAL
    "rel_small_qty_revenue" ->
      """WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_brand = 'Brand#1'),
        |st AS (SELECT l_partkey AS pk, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
        |       count(*) AS cnt FROM li GROUP BY 1)
        |SELECT count(*) AS n_small,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/7.0, 4) AS avg_yearly
        |FROM li JOIN st ON l_partkey = pk WHERE l_quantity * 5 * cnt < sq""".stripMargin,
    "rel_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    // Q18: the textbook HAVING-IN spelling — the engine's decorrelated
    // aggregate must coincide with it exactly
    "rel_big_orders" ->
      """WITH big AS (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice, total_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "rel_window_rank" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM r WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "rel_window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "rel_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day', CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
        |       CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "rel_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "rel_count_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "rel_case_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_discount > 0.05
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS discounted_revenue,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "rel_scalar_subquery" ->
      """WITH m AS (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_price FROM orders)
        |SELECT o_orderpriority, count(*) AS n_above FROM orders, m
        |WHERE o_totalprice > mean_price
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "rel_exists_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_late_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
        |              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "rel_having" ->
      """WITH big AS (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |             FROM lineitem GROUP BY l_orderkey
        |             HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150.0)
        |SELECT o_orderkey, o_custkey, total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "rel_global_sort" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    // independent derivation: the textbook aggregate-then-join-back
    // decorrelation, deliberately NOT the Spark side's struct-min
    "rel_argmin_order" ->
      """WITH m AS (SELECT o_custkey AS ck, min(o_totalprice) AS min_price
        |           FROM orders GROUP BY 1)
        |SELECT o_custkey, min(o_orderkey) AS o_orderkey, min_price
        |FROM orders JOIN m ON o_custkey = ck AND o_totalprice = min_price
        |GROUP BY o_custkey, min_price ORDER BY o_custkey""".stripMargin,
    // mean/stddev from EXACT decimal sums, spelled as the identical double
    // expression tree as the Spark side (see the query declaration)
    "rel_welford_stats" ->
      """WITH g AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
        |    CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |  FROM orders GROUP BY 1, 2)
        |SELECT y, m, n_orders,
        |  sx / n_orders AS mean_price,
        |  CASE WHEN n_orders > 1
        |       THEN round(sqrt((sxx - sx * sx / n_orders) / (n_orders - 1)), 3) END AS stddev_price,
        |  min_price, max_price
        |FROM g ORDER BY y, m""".stripMargin,
    // top-k cut ordered on the EXACT decimal revenue (cast at output only)
    "rel_returned_items" ->
      """WITH rev AS (
        |  SELECT o_custkey AS ck,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1995-03-01' AND o_orderdate < TIMESTAMP '1995-06-01'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, n_name AS nation, CAST(r AS DOUBLE) AS revenue
        |FROM customer JOIN rev ON c_custkey = ck
        |  JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY r DESC, c_custkey LIMIT 20""".stripMargin,
    // winner selected by EXACT decimal equality against the view max
    "rel_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |    AND l_suppkey IS NOT NULL
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE r = (SELECT max(r) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    // raw-double filter compares are identical in both engines (same
    // parquet values, same literals); the product accumulates in decimal
    "rel_revenue_delta" ->
      """SELECT count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue_delta
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0""".stripMargin,
    // independent derivation: the textbook correlated EXISTS/NOT EXISTS
    // spelling, deliberately NOT the Spark side's window decorrelation
    "rel_sole_late_supplier" ->
      """WITH ps AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_suppkey IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, count(*) AS n_orders
        |FROM ps p JOIN supplier ON p.l_suppkey = s_suppkey
        |WHERE p.late = 1
        |  AND EXISTS (SELECT 1 FROM ps q WHERE q.l_orderkey = p.l_orderkey
        |              AND q.l_suppkey <> p.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM ps q WHERE q.l_orderkey = p.l_orderkey
        |                  AND q.l_suppkey <> p.l_suppkey AND q.late = 1)
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, s_suppkey LIMIT 10""".stripMargin,
    "rel_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "rel_market_share" ->
      """WITH base AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |    n1.n_name AS supp_nation,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
        |  FROM lineitem
        |    JOIN part ON l_partkey = p_partkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |    JOIN region ON n2.n_regionkey = r_regionkey
        |  WHERE p_type = 'STANDARD' AND r_name = 'ASIA')
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |  / CAST(sum(rev) AS DOUBLE) AS mkt_share
        |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_order_count_dist" ->
      """WITH pc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "rel_promo_revenue" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
        |  100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,
    "rel_supplier_variety" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#9' AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey IS NOT NULL
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // Q9-adapted profit: one decimal pass of rev - cost per line, the
    // same EXTRACT(year) + DECIMAL(18,2) conventions as rel_nation_trade
    "rel_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
        |FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "rel_disjunctive_join" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "rel_excess_share" ->
      """WITH sp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
        |  ps AS (
        |    SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |    FROM lineitem JOIN sp ON l_partkey = p_partkey
        |    GROUP BY 1, 2),
        |  tot AS (SELECT l_partkey, sum(sq) AS tq FROM ps GROUP BY 1)
        |SELECT DISTINCT s_suppkey, s_name
        |FROM ps JOIN tot USING (l_partkey)
        |  JOIN supplier ON ps.l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_11' AND ps.sq * 100 > tot.tq * 10
        |ORDER BY s_suppkey""".stripMargin,
    "rel_idle_capital" ->
      """WITH m AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer, m
        |WHERE c_acctbal > mean_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = customer.c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_mode_priority" ->
      """WITH c AS (
        |  SELECT c_mktsegment, o_orderpriority, count(*) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment ORDER BY n DESC, o_orderpriority) AS rn FROM c)
        |SELECT c_mktsegment, o_orderpriority AS modal_priority, n
        |FROM r WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,
    // Q2-shape ground truth: the same decorrelated min-join spelling —
    // cost is a MIN of stored doubles, so the equality join is exact
    "rel_min_cost_supplier" ->
      """WITH offers AS (SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
        |ro AS (SELECT o.cost, rs.s_suppkey, rs.s_name, rs.s_acctbal, rs.n_name,
        |    p.p_partkey, p.p_brand
        |  FROM offers o JOIN rs ON o.l_suppkey = rs.s_suppkey
        |  JOIN part p ON o.l_partkey = p.p_partkey
        |  WHERE p.p_type = 'STANDARD'),
        |m AS (SELECT p_partkey AS mk, min(cost) AS mc FROM ro GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  cost AS min_cost
        |FROM ro JOIN m ON p_partkey = mk AND cost = mc
        |ORDER BY s_acctbal DESC, s_name, p_partkey, ro.s_suppkey LIMIT 100""".stripMargin,
    "rel_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "rel_median" ->
      """SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS median_price, count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // skyline ground truth: the definitional NOT EXISTS dominance test —
    // the engine's prefix-min decomposition must reproduce it exactly,
    // including equal-(price,size) twins staying
    "rel_skyline" ->
      """WITH p AS (SELECT p_partkey, CAST(p_retailprice AS DECIMAL(18,2)) AS pr,
        |    CAST(p_size AS BIGINT) AS sz FROM part)
        |SELECT a.p_partkey, CAST(a.pr AS DOUBLE) AS p_retailprice, a.sz AS p_size
        |FROM p a
        |WHERE NOT EXISTS (SELECT 1 FROM p b
        |  WHERE b.pr <= a.pr AND b.sz <= a.sz AND (b.pr < a.pr OR b.sz < a.sz))
        |ORDER BY p_retailprice, p_size, p_partkey""".stripMargin,
    // IVM ground truth: recompute the post-delta view from scratch —
    // survivors (non-deleted, +10.00 when updated) plus the %13 insert
    // copies at +5.00 — so any drift in the incremental algebra fails
    "rel_ivm_groupby" ->
      """WITH survivors AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN o_orderkey % 7 = 0
        |         THEN CAST(o_totalprice AS DECIMAL(18,2)) + CAST('10.00' AS DECIMAL(18,2))
        |         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
        |  FROM orders WHERE o_orderkey % 11 <> 0
        |  UNION ALL
        |  SELECT o_orderpriority,
        |    CAST(o_totalprice AS DECIMAL(18,2)) + CAST('5.00' AS DECIMAL(18,2))
        |  FROM orders WHERE o_orderkey % 13 = 0)
        |SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(price) AS DOUBLE) AS sum_price
        |FROM survivors GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "rel_window_ntile" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 4) AS pct_rank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin,
    "rel_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '2000-03-15' AND l_shipdate > TIMESTAMP '2000-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "rel_window_first_last" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  first_value(o_orderkey) OVER w AS cheapest_order,
        |  last_value(o_orderkey) OVER w AS priciest_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "rel_price_histogram" ->
      """SELECT CAST(floor(o_totalprice/50000.0) AS BIGINT) AS bucket,
        |  CAST(floor(o_totalprice/50000.0) AS BIGINT)*50000.0 AS lo,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "rel_compaction_plan" ->
      """WITH inv AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS rows_ FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, day, rows_,
        |        COALESCE(sum(rows_) OVER (PARTITION BY event_type ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4000 AS bin
        |      FROM inv)
        |SELECT event_type, day, CAST(rows_ AS BIGINT) AS "rows",
        |  CAST(bin AS BIGINT) AS bin,
        |  CAST(sum(rows_) OVER (PARTITION BY event_type, bin) AS BIGINT) AS bin_rows,
        |  CAST(count(*) OVER (PARTITION BY event_type, bin) AS BIGINT) AS bin_files,
        |  CASE WHEN count(*) OVER (PARTITION BY event_type, bin) > 1 THEN 1 ELSE 0 END AS merged
        |FROM b ORDER BY event_type, day""".stripMargin,
    // the oracle uses the NAIVE ntile-over-all-keys spelling the engine
    // deliberately avoids; key interchangeability within a multiplicity
    // makes the decile aggregates identical
    "rel_skew_deciles" ->
      """WITH kc AS (SELECT o_custkey AS k, count(*) AS cnt FROM orders GROUP BY 1),
        |rk AS (SELECT k, cnt, ntile(10) OVER (ORDER BY cnt DESC, k) AS decile FROM kc)
        |SELECT decile, count(*) AS keys, CAST(sum(cnt) AS BIGINT) AS rows_in_decile,
        |  round(CAST(sum(cnt) AS DOUBLE) / (SELECT sum(cnt) FROM kc), 4) AS row_share,
        |  CAST(max(cnt) AS BIGINT) AS max_cnt
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_zorder_skipping" -> zorderOracleSql,
    "rel_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "rel_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "rel_bloom_join" ->
      """SELECT c_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    // full ER replay: same md5 char-drop perturbation, same (first token,
    // brand, type) blocking with the same hot-block drop, DuckDB's own
    // jaro_winkler_similarity (the expression is pinned to its
    // semantics), same round(6)+argmax resolution
    "rel_fuzzy_link" ->
      """WITH c AS (SELECT p_partkey, p_brand, p_type,
        |    p_name || ' ' || p_brand || ' ' || p_type AS t FROM part),
        |cl0 AS (SELECT p_partkey, p_brand, p_type, t AS clean_title,
        |    split_part(t, ' ', 1) AS block_tok FROM c),
        |hot AS (SELECT block_tok, p_brand, p_type FROM cl0
        |  GROUP BY 1, 2, 3 HAVING count(*) > 500),
        |cl AS (SELECT * FROM cl0 ANTI JOIN hot USING (block_tok, p_brand, p_type)),
        |d0 AS (SELECT p_partkey AS dirty_id, p_brand, p_type, t,
        |    CAST(('0x' || substring(md5(CAST(p_partkey AS VARCHAR) || ':fz'), 1, 8))::BIGINT % length(t) + 1 AS INT) AS pos
        |  FROM c WHERE p_partkey % 29 = 0),
        |d AS (SELECT dirty_id, p_brand, p_type,
        |    substr(t, 1, pos - 1) || substr(t, pos + 1, length(t)) AS dirty_title
        |  FROM d0),
        |cand AS (SELECT d.dirty_id, cl.p_partkey, d.dirty_title, cl.clean_title,
        |    round(jaro_winkler_similarity(d.dirty_title, cl.clean_title), 6) AS jw
        |  FROM d JOIN cl ON split_part(d.dirty_title, ' ', 1) = cl.block_tok
        |               AND d.p_brand = cl.p_brand AND d.p_type = cl.p_type
        |  WHERE round(jaro_winkler_similarity(d.dirty_title, cl.clean_title), 6) >= 0.85),
        |r AS (SELECT dirty_id, p_partkey, jw,
        |    row_number() OVER (PARTITION BY dirty_id ORDER BY jw DESC, p_partkey) AS rk
        |  FROM cand)
        |SELECT dirty_id, p_partkey AS matched_partkey, jw,
        |  p_partkey = dirty_id AS exact_self
        |FROM r WHERE rk = 1 ORDER BY dirty_id""".stripMargin,
    // sorted-neighborhood oracle: the band join is an implementation
    // detail — the oracle spells the DEFINITION (all pairs with rank gap
    // in [1, window)), so the banding must lose nothing
    "rel_sorted_neighborhood" -> {
      import graft.relational.EntityResolution.{DefaultSnmMinJw, DefaultSnmWindow}
      s"""WITH c AS (SELECT p_partkey, p_brand,
         |    p_name || ' ' || p_brand || ' ' || p_type AS t FROM part),
         |r AS (SELECT p_partkey, p_brand, t,
         |    row_number() OVER (PARTITION BY p_brand ORDER BY t, p_partkey) AS rk
         |  FROM c)
         |SELECT a.p_brand, a.p_partkey AS id_a, b.p_partkey AS id_b,
         |  b.rk - a.rk AS rank_gap,
         |  round(jaro_winkler_similarity(a.t, b.t), 6) AS jw
         |FROM r a JOIN r b ON a.p_brand = b.p_brand
         |  AND b.rk - a.rk BETWEEN 1 AND ${DefaultSnmWindow - 1}
         |WHERE round(jaro_winkler_similarity(a.t, b.t), 6) >= $DefaultSnmMinJw
         |ORDER BY a.p_brand, id_a, id_b""".stripMargin
    },
    // TextRank oracle: 3 unrolled weighted-PageRank rounds (the
    // dedup_pagerank pattern) with DECIMAL(28,18) neighbor sums — the
    // order-independence recipe that makes the rank doubles bit-equal
    // across engines, so the top-k cut cannot straddle an ulp
    "text_textrank" -> {
      import graft.textstats.TextAnalysis.{DefaultTextRankDamping, DefaultTextRankTopK}
      val d = DefaultTextRankDamping
      val rounds = (1 to graft.textstats.TextAnalysis.DefaultTextRankIters).map { t =>
        s"""p$t AS (SELECT e.dst AS node,
           |    (CAST(1 AS DOUBLE) - CAST($d AS DOUBLE)) / nn.n
           |      + CAST($d AS DOUBLE) *
           |        CAST(sum(CAST((p.pr * e.w) / dg.wd AS DECIMAL(28,18))) AS DOUBLE) AS pr
           |  FROM edges e JOIN p${t - 1} p ON p.node = e.src
           |    JOIN wdeg dg ON dg.src = e.src, nn
           |  GROUP BY e.dst, nn.n)""".stripMargin
      }.mkString(",\n")
      s"""WITH tk0 AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
         |e0 AS (SELECT tk[i] AS t, tk[i+1] AS u
         |  FROM (SELECT tk, unnest(generate_series(1, len(tk)-1)) AS i FROM tk0 WHERE len(tk) >= 2)
         |  WHERE tk[i] <> tk[i+1]),
         |eu AS (SELECT t AS src, u AS dst FROM e0 UNION ALL SELECT u, t FROM e0),
         |edges AS (SELECT src, dst, count(*) AS w FROM eu GROUP BY 1, 2),
         |wdeg AS (SELECT src, sum(w) AS wd FROM edges GROUP BY src),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM wdeg),
         |p0 AS (SELECT src AS node, CAST(1 AS DOUBLE) / nn.n AS pr FROM wdeg, nn),
         |$rounds,
         |rk AS (SELECT node, pr, row_number() OVER (ORDER BY pr DESC, node) AS rk
         |  FROM p${graft.textstats.TextAnalysis.DefaultTextRankIters})
         |SELECT node AS term, round(pr, 6) AS textrank, CAST(rk AS BIGINT) AS rk
         |FROM rk WHERE rk <= $DefaultTextRankTopK ORDER BY rk""".stripMargin
    },
    "rel_date_parts" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,
    "rel_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS name_upper,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  substr(c_name, 1, 9) AS name_prefix,
        |  c_name LIKE '%1%' AS has_one
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // exact-integer window sums -> identical double expression tree (the
    // monthlyPriceProfile recipe); current hour excluded from its baseline
    "ev_hourly_anomaly" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n FROM events GROUP BY 1),
        |s AS (SELECT hour, n,
        |        count(*) OVER w AS c,
        |        CAST(sum(n) OVER w AS BIGINT) AS sx,
        |        CAST(sum(n*n) OVER w AS BIGINT) AS sxx
        |      FROM h WINDOW w AS (ORDER BY epoch(hour) RANGE BETWEEN 86400 PRECEDING AND 3600 PRECEDING))
        |SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, n,
        |  CASE WHEN c > 1 AND (sxx - CAST(sx AS DOUBLE)*sx/c) > 0
        |       THEN round((n - CAST(sx AS DOUBLE)/c) / sqrt((sxx - CAST(sx AS DOUBLE)*sx/c)/(c-1)), 4) END AS z_score
        |FROM s ORDER BY hour""".stripMargin,
    "ev_tumbling_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "ev_sliding_hourly" ->
      """WITH b AS (SELECT value, ts, time_bucket(INTERVAL '30 minutes', ts) AS b30 FROM events),
        |w AS (SELECT unnest([b30, b30 - INTERVAL '30 minutes']) AS window_start, value, ts FROM b)
        |SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w WHERE ts >= window_start AND ts < window_start + INTERVAL '60 minutes'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM events),
        |s AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM e),
        |n AS (SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM s)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
        |FROM n GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    // same session CTE as ev_sessionize, then the sweep: +1/-1 session
    // boundaries, per-day running sum in (t, start-before-end) order,
    // plus a midnight carry count per day (sessions open across the
    // boundary). Closed intervals: an end at the same instant as a start
    // still overlaps it, hence d DESC in the sweep order.
    "ev_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM events),
        |s AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM e),
        |n AS (SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM s),
        |sess AS (SELECT min(ts) AS st, max(ts) AS en FROM n GROUP BY user_id, session_id),
        |b AS (SELECT st AS t, 1 AS d FROM sess UNION ALL SELECT en AS t, -1 AS d FROM sess),
        |bd AS (SELECT t, d, CAST(t AS DATE) AS day FROM b),
        |days AS (SELECT DISTINCT day FROM bd),
        |carry AS (SELECT day, count(*) AS cin FROM sess JOIN days
        |    ON st < CAST(day AS TIMESTAMP) AND en >= CAST(day AS TIMESTAMP) GROUP BY day),
        |run AS (SELECT bd.day, t,
        |    CAST(sum(d) OVER (PARTITION BY bd.day ORDER BY t, d DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      + COALESCE(cin, 0)
        |      + CASE WHEN d = -1 THEN 1 ELSE 0 END AS conc
        |  FROM bd LEFT JOIN carry ON bd.day = carry.day),
        |mx AS (SELECT day, max(conc) AS max_concurrent FROM run GROUP BY day)
        |SELECT strftime(m.day, '%Y-%m-%d') AS day, m.max_concurrent,
        |  strftime(min(r.t), '%Y-%m-%d %H:%M:%S.%f') AS peak_at
        |FROM mx m JOIN run r ON r.day = m.day AND r.conc = m.max_concurrent
        |GROUP BY m.day, m.max_concurrent ORDER BY 1""".stripMargin,
    // same gaps-and-islands chain keyed (user_id, event_type); the kept
    // event is the burst head row, unique per burst by construction
    "ev_dedup_bursts" ->
      """WITH e AS (SELECT user_id, event_type, event_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_us FROM events),
        |h AS (SELECT *, (prev_us IS NULL OR epoch_us(ts) - prev_us > 300000000) AS head FROM e),
        |g AS (SELECT *, CAST(sum(CASE WHEN head THEN 1 ELSE 0 END) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS burst FROM h)
        |SELECT user_id, event_type,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS burst_start,
        |  count(*) AS burst_len,
        |  min(CASE WHEN head THEN event_id END) AS kept_event
        |FROM g GROUP BY user_id, event_type, burst
        |HAVING count(*) > 1
        |ORDER BY user_id, event_type, burst_start""".stripMargin,
    "ev_user_stats" ->
      """SELECT user_id, count(*) AS n_events, count(DISTINCT event_type) AS n_types,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_seen,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_seen,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ev_daily_top_type" ->
      """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT day, event_type, n, row_number() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rn FROM d)
        |SELECT day, event_type, n FROM r WHERE rn = 1 ORDER BY day""".stripMargin,
    "ev_props_json" ->
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // same init-with-first fold: list_reduce's first element seeds the
    // accumulator, exactly Spark's aggregate(slice(xs,2,..), xs[1], ..)
    "ev_ewma_daily" ->
      """WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, day, n,
        |        list(CAST(n AS DOUBLE)) OVER (PARTITION BY event_type ORDER BY day) AS xs
        |      FROM d)
        |SELECT event_type, day, CAST(n AS BIGINT) AS n,
        |  round(list_reduce(xs, (a, b) -> 0.5 * b + 0.5 * a), 6) AS ewma
        |FROM l ORDER BY event_type, day""".stripMargin,
    "ev_pivot_type_day" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "ev_cohort_retention" ->
      """WITH c AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events
        |           WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
        |       CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS day_offset,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN c ON a.user_id = c.user_id
        |WHERE date_diff('day', c.cohort_day, a.day) >= 0
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    // A/B readout: same md5 arm rule, z from the identical double tree
    // (every operand explicitly CAST AS DOUBLE — a bare 1.0 is DECIMAL
    // in DuckDB and decimal division would round differently)
    "ev_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |a AS (SELECT conv, CASE WHEN substring(md5(CAST(user_id AS VARCHAR) || ':0'), 1, 1) < '8'
        |    THEN 'A' ELSE 'B' END AS arm FROM u),
        |c AS (SELECT arm, count(*) AS n_users, CAST(sum(conv) AS BIGINT) AS n_converted
        |  FROM a GROUP BY arm),
        |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS nt, CAST(sum(n_converted) AS BIGINT) AS ct FROM c),
        |g AS (SELECT arm, n_users, n_converted,
        |    CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS rate,
        |    CAST(ct AS DOUBLE) / CAST(nt AS DOUBLE) AS p_pool,
        |    CAST(nt - n_users AS DOUBLE) AS n_other,
        |    CAST(ct - n_converted AS DOUBLE) AS co,
        |    CAST(n_users AS DOUBLE) AS nu
        |  FROM c, t),
        |h AS (SELECT *,
        |    p_pool * (CAST(1 AS DOUBLE) - p_pool) *
        |      (CAST(1 AS DOUBLE) / nu + CAST(1 AS DOUBLE) / n_other) AS se2
        |  FROM g)
        |SELECT arm, n_users, n_converted, round(rate, 6) AS rate,
        |  round(CASE WHEN n_other > 0 AND se2 > 0
        |    THEN (rate - co / n_other) / sqrt(se2) ELSE 0.0 END, 6) AS z_score
        |FROM h ORDER BY arm""".stripMargin,
    // decay fit: same pooled curve, ln on exact-division rates, decimal
    // OLS sums, half-life from the UNROUNDED slope
    "ev_retention_fit" ->
      """WITH c AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events
        |           WHERE event_type = 'signup' GROUP BY user_id),
        |n0 AS (SELECT count(*) AS n_total FROM c),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |curve AS (SELECT CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS day_offset,
        |    count(DISTINCT a.user_id) AS n_users
        |  FROM a JOIN c ON a.user_id = c.user_id
        |  WHERE date_diff('day', c.cohort_day, a.day) >= 0 GROUP BY 1),
        |cr AS (SELECT day_offset, n_users,
        |    CAST(n_users AS DOUBLE) / CAST(n_total AS DOUBLE) AS rate FROM curve, n0),
        |xy AS (SELECT CAST(day_offset AS DOUBLE) AS x, ln(rate) AS y
        |  FROM cr WHERE day_offset >= 1 AND rate > 0),
        |s AS (SELECT count(*) AS n,
        |    sum(CAST(x AS DECIMAL(28,18))) AS sx, sum(CAST(y AS DECIMAL(28,18))) AS sy,
        |    sum(CAST(x*x AS DECIMAL(28,18))) AS sxx, sum(CAST(x*y AS DECIMAL(28,18))) AS sxy FROM xy),
        |f AS (SELECT CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
        |    CAST(sxy AS DOUBLE) AS sxyd FROM s),
        |g AS (SELECT CASE WHEN nd*sxxd - sxd*sxd = 0 THEN 0.0
        |    ELSE (nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd) END AS sl FROM f)
        |SELECT day_offset, n_users, round(rate, 6) AS rate,
        |  round(-sl, 6) AS decay_lambda,
        |  round(CASE WHEN sl < 0.0 THEN -ln(2.0) / sl ELSE 0.0 END, 6) AS half_life_days
        |FROM cr, g ORDER BY day_offset""".stripMargin,
    // independent derivation: DuckDB's native forward ASOF (<=); safe here
    // because (user_id, ts) purchase rows are unique in this corpus, so
    // the duplicate-tie rule never engages
    "ev_asof_next" ->
      """WITH s AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup'),
        |p AS (SELECT user_id, ts AS pts, value FROM events WHERE event_type = 'purchase')
        |SELECT s.user_id, s.event_id, strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |       p.value AS next_purchase_value
        |FROM s ASOF LEFT JOIN p ON s.user_id = p.user_id AND s.ts <= p.pts
        |ORDER BY s.event_id""".stripMargin,
    "ev_asof_signup" ->
      """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, ts AS sts FROM events WHERE event_type = 'signup')
        |SELECT p.user_id, p.event_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |       strftime(s.sts, '%Y-%m-%d %H:%M:%S.%f') AS last_signup
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.sts
        |ORDER BY p.event_id""".stripMargin,
    // identical oracle to ev_asof_signup: same semantics, different engine path
    "ev_asof_exec" ->
      """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, ts AS sts FROM events WHERE event_type = 'signup')
        |SELECT p.user_id, p.event_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |       strftime(s.sts, '%Y-%m-%d %H:%M:%S.%f') AS last_signup
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.sts
        |ORDER BY p.event_id""".stripMargin,
    "ev_range_pairs" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
        |ORDER BY id_a, id_b""".stripMargin,
    // SCD-2 replay: same change feed, same lag-collapse of no-op updates,
    // same row_number/lead interval build; floor(value/50.0) is one
    // double division both engines evaluate on identical parquet doubles
    "ev_scd2" ->
      """WITH c AS (SELECT user_id, ts, event_id,
        |    CAST(floor(value / 50.0) AS BIGINT) AS tier
        |  FROM events WHERE event_type = 'purchase'),
        |d AS (SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM c),
        |k AS (SELECT user_id, ts, event_id, tier FROM d WHERE prev IS NULL OR tier <> prev),
        |v AS (SELECT user_id, tier, ts,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM k)
        |SELECT user_id, version, tier,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(nxt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
        |  nxt IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,
    // basket pairs from the within-order self-join, support >= 2, lift
    // from exact counts in one fixed double tree
    "rel_basket_lift" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
        |totals AS (SELECT part, count(*) AS cnt FROM b GROUP BY part),
        |n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM b),
        |pairs AS (SELECT a.part AS part_a, bb.part AS part_b, count(*) AS support
        |  FROM b a JOIN b bb ON a.okey = bb.okey AND a.part < bb.part
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
        |  CAST(ta.cnt AS BIGINT) AS cnt_a, CAST(tb.cnt AS BIGINT) AS cnt_b,
        |  round(CAST(support AS DOUBLE) * CAST(n_orders AS DOUBLE) /
        |    (CAST(ta.cnt AS DOUBLE) * CAST(tb.cnt AS DOUBLE)), 4) AS lift
        |FROM pairs JOIN totals ta ON ta.part = part_a
        |JOIN totals tb ON tb.part = part_b CROSS JOIN n
        |ORDER BY part_a, part_b""".stripMargin,
    // spine + carry-group LOCF replay: count-of-observed as group key,
    // max within (user, group), decimal daily sums cast once at the edge
    "ev_gap_fill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    sum(CAST(value AS DECIMAL(18,2))) AS obs
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        |spine AS (SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM span),
        |j AS (SELECT s.user_id, s.day, d.obs FROM spine s LEFT JOIN daily d USING (user_id, day)),
        |g AS (SELECT *, count(obs) OVER (PARTITION BY user_id ORDER BY day) AS grp FROM j)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        |  CAST(max(obs) OVER (PARTITION BY user_id, grp) AS DOUBLE) AS value,
        |  obs IS NOT NULL AS observed
        |FROM g ORDER BY user_id, day""".stripMargin,
    // distinct (user, day) reduction, first-seen by min, calendar-bounded
    // cumulative window
    "ev_growth_accounting" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS fd FROM d GROUP BY user_id),
        |p AS (SELECT day, count(*) AS dau,
        |    CAST(sum(CASE WHEN day = fd THEN 1 ELSE 0 END) AS BIGINT) AS new_users
        |  FROM d JOIN f USING (user_id) GROUP BY day)
        |SELECT strftime(day, '%Y-%m-%d') AS day, CAST(dau AS BIGINT) AS dau,
        |  new_users, CAST(dau - new_users AS BIGINT) AS returning_users,
        |  CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM p ORDER BY day""".stripMargin,
    // latest-wins CDC apply with 'error' tombstones: one windowed replay
    "ev_cdc_apply" ->
      """WITH r AS (SELECT user_id, event_id, event_type, value, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events)
        |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS updated_at,
        |  CAST(n AS BIGINT) AS n_changes
        |FROM r WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    // grid spatial join replay: same md5-integer points, same 3x3 cell
    // candidates, exact integer distances (no FP anywhere)
    "ev_geo_pairs" ->
      s"""WITH $geoGridCtes
        |SELECT a.user_id AS id_a, b.user_id AS id_b,
        |  CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT) AS dist2
        |FROM n a JOIN c b ON a.ncx = b.cx AND a.ncy = b.cy AND a.user_id < b.user_id
        |WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 2304
        |ORDER BY id_a, id_b""".stripMargin,
    "ev_geo_knn" ->
      s"""WITH $geoGridCtes,
        |cand AS (SELECT a.user_id AS id, b.user_id AS neighbor_id,
        |    (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist2
        |  FROM n a JOIN c b ON a.ncx = b.cx AND a.ncy = b.cy AND a.user_id <> b.user_id
        |  WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 2304),
        |r AS (SELECT id, neighbor_id, dist2,
        |    row_number() OVER (PARTITION BY id ORDER BY dist2, neighbor_id) AS rnk
        |  FROM cand)
        |SELECT id, neighbor_id, CAST(dist2 AS BIGINT) AS dist2, CAST(rnk AS INT) AS "rank"
        |FROM r WHERE rnk <= 3 ORDER BY id, rnk""".stripMargin,
    // same grid pairs (2304 = 48^2), neighbor counts, core test at
    // minPts=3, recursive CC over core-core edges (min-id labels), then
    // the pinned min-cluster border attachment
    "ev_geo_dbscan" ->
      s"""WITH RECURSIVE $geoGridCtes,
        |pr AS (SELECT a.user_id AS id_a, b.user_id AS id_b
        |  FROM n a JOIN c b ON a.ncx = b.cx AND a.ncy = b.cy AND a.user_id < b.user_id
        |  WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 2304),
        |und AS (SELECT id_a AS id, id_b AS nb FROM pr
        |        UNION ALL SELECT id_b, id_a FROM pr),
        |nc AS (SELECT id, count(*) AS nn FROM und GROUP BY id),
        |core AS (SELECT u.user_id AS id FROM u LEFT JOIN nc ON nc.id = u.user_id
        |         WHERE COALESCE(nn, 0) + 1 >= 3),
        |ce AS (SELECT id_a, id_b FROM pr
        |       WHERE id_a IN (SELECT id FROM core) AND id_b IN (SELECT id FROM core)),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM ce
        |          UNION SELECT id_b, id_a FROM ce),
        |reach(src, dst) AS (SELECT src, dst FROM edges
        |  UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |cl AS (SELECT src AS id, least(src, min(dst)) AS cluster_id
        |       FROM reach GROUP BY src),
        |corelab AS (SELECT core.id, CAST(COALESCE(cl.cluster_id, core.id) AS BIGINT) AS ccl
        |            FROM core LEFT JOIN cl ON cl.id = core.id),
        |ba AS (SELECT und.id, min(corelab.ccl) AS bcl
        |       FROM und JOIN corelab ON corelab.id = und.nb GROUP BY und.id)
        |SELECT u.user_id,
        |  CASE WHEN corelab.id IS NOT NULL THEN 'core'
        |       WHEN ba.bcl IS NOT NULL THEN 'border' ELSE 'noise' END AS role,
        |  CASE WHEN corelab.id IS NOT NULL THEN corelab.ccl ELSE ba.bcl END AS cluster_id
        |FROM u LEFT JOIN corelab ON corelab.id = u.user_id
        |       LEFT JOIN ba ON ba.id = u.user_id
        |ORDER BY u.user_id""".stripMargin,
    "ev_transitions" ->
      """WITH e AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type FROM events)
        |SELECT from_type, to_type, count(*) AS n FROM e WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin,
    // same chain: row-normalized P + terminal self-loops, uniform start,
    // 3 unrolled rounds, round(6) anchor; drained types coalesce to 0
    "ev_markov_stationary" ->
      """WITH e AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type FROM events),
        |tr AS (SELECT from_type, to_type, count(*) AS n FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |oc AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS o FROM tr GROUP BY 1),
        |ty AS (SELECT DISTINCT t FROM (SELECT from_type AS t FROM tr UNION SELECT to_type FROM tr)),
        |p AS (SELECT from_type, to_type, CAST(n AS DOUBLE) / o AS p FROM tr JOIN oc USING (from_type)
        |      UNION ALL SELECT t, t, 1.0 FROM ty WHERE t NOT IN (SELECT from_type FROM tr)),
        |n0 AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM ty),
        |pi0 AS (SELECT t, 1.0 / nn AS pi FROM ty CROSS JOIN n0),
        |pi1 AS (SELECT to_type AS t, sum(pi * p) AS pi FROM p JOIN pi0 ON p.from_type = pi0.t GROUP BY 1),
        |pi2 AS (SELECT to_type AS t, sum(pi * p) AS pi FROM p JOIN pi1 ON p.from_type = pi1.t GROUP BY 1),
        |pi3 AS (SELECT to_type AS t, sum(pi * p) AS pi FROM p JOIN pi2 ON p.from_type = pi2.t GROUP BY 1)
        |SELECT ty.t AS event_type, round(coalesce(pi3.pi, 0.0), 6) AS stationary
        |FROM ty LEFT JOIN pi3 ON ty.t = pi3.t ORDER BY event_type""".stripMargin,
    "ev_funnel" ->
      """WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM s0) AS n_stage0,
        |       (SELECT count(*) FROM s1) AS n_stage1,
        |       (SELECT count(*) FROM s2) AS n_stage2""".stripMargin,
    // RFM: the same spelled-out percentile_disc (smallest v with cum >=
    // ceil(q*n), integer arithmetic), exact cents, one double division
    "ev_rfm_segments" ->
      """WITH u AS (SELECT user_id, max(ts) AS last_ts, count(*) AS freq,
        |    sum(CAST(value AS DECIMAL(18,2))) AS money FROM events GROUP BY user_id),
        |r0 AS (SELECT max(CAST(ts AS DATE)) AS ref_date FROM events),
        |m AS (SELECT user_id,
        |    CAST(date_diff('day', CAST(last_ts AS DATE), ref_date) AS BIGINT) AS rec,
        |    freq, CAST(money * 100 AS BIGINT) AS cents FROM u, r0),
        |n0 AS (SELECT count(*) AS n FROM m),
        |rb AS (SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS b1,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS b2,
        |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS b3
        |  FROM (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM
        |    (SELECT rec AS v, count(*) AS c FROM m GROUP BY 1)), n0),
        |fb AS (SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS b1,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS b2,
        |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS b3
        |  FROM (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM
        |    (SELECT freq AS v, count(*) AS c FROM m GROUP BY 1)), n0),
        |mb AS (SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS b1,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS b2,
        |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS b3
        |  FROM (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM
        |    (SELECT cents AS v, count(*) AS c FROM m GROUP BY 1)), n0),
        |q AS (SELECT user_id, cents,
        |    1 + CAST(rec > rb.b1 AS INT) + CAST(rec > rb.b2 AS INT) + CAST(rec > rb.b3 AS INT) AS r_q,
        |    1 + CAST(freq > fb.b1 AS INT) + CAST(freq > fb.b2 AS INT) + CAST(freq > fb.b3 AS INT) AS f_q,
        |    1 + CAST(cents > mb.b1 AS INT) + CAST(cents > mb.b2 AS INT) + CAST(cents > mb.b3 AS INT) AS m_q
        |  FROM m, rb, fb, mb)
        |SELECT r_q, f_q, m_q, count(*) AS n_users,
        |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0 AS total_value
        |FROM q GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin,
    // path census: rank under the same total (ts, type, id) key, path
    // assembled by rank order — never aggregation encounter order
    "ev_funnel_paths" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_type, event_id) AS rn FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    // identical per-shard running-max replay in arrival (event_id) order
    "ev_watermark_late" ->
      """WITH b AS (SELECT event_id, user_id % 16 AS shard, epoch_us(ts) AS us FROM events),
        |m AS (SELECT shard, us,
        |    max(us) OVER (PARTITION BY shard ORDER BY event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
        |  FROM b),
        |f AS (SELECT shard,
        |    CASE WHEN wm IS NOT NULL AND us < wm - 600000000 THEN 1 ELSE 0 END AS late,
        |    CASE WHEN wm IS NOT NULL AND us < wm - 600000000 THEN wm - 600000000 - us
        |         ELSE 0 END AS late_us
        |  FROM m)
        |SELECT shard, count(*) AS n_events, CAST(sum(late) AS BIGINT) AS n_late,
        |  round(CAST(sum(late) AS DOUBLE) / count(*), 4) AS late_frac,
        |  CAST(max(late_us) AS BIGINT) AS max_late_us
        |FROM f GROUP BY shard ORDER BY shard""".stripMargin,
    // same (ts, event_id)-lexicographic "preceding" + lookback on both
    // models; linear credit replays the identical round-then-DECIMAL-sum
    "ev_attribution" ->
      """WITH base AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE event_type IN ('click','view','purchase')),
        |lt AS (SELECT *,
        |    last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
        |      OVER w AS lt_type,
        |    last_value(CASE WHEN event_type IN ('click','view') THEN us END IGNORE NULLS)
        |      OVER w AS lt_us
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |lastagg AS (SELECT
        |    CASE WHEN lt_us IS NOT NULL AND lt_us >= us - 7200000000 THEN lt_type
        |         ELSE 'direct' END AS channel,
        |    count(*) AS n_conv, CAST(sum(v) AS DOUBLE) AS value_last
        |  FROM lt WHERE event_type = 'purchase' GROUP BY 1),
        |conv AS (SELECT event_id AS cid, user_id, us AS cus, v FROM base
        |         WHERE event_type = 'purchase'),
        |touch AS (SELECT event_id AS tid, user_id, event_type AS channel, us AS tus
        |          FROM base WHERE event_type IN ('click','view')),
        |hits AS (SELECT cid, v, channel, tid FROM conv JOIN touch USING (user_id)
        |  WHERE tus >= cus - 7200000000
        |    AND (tus < cus OR (tus = cus AND tid < cid))),
        |pc AS (SELECT cid, v, channel, count(*) AS n_c FROM hits GROUP BY 1, 2, 3),
        |pck AS (SELECT *, sum(n_c) OVER (PARTITION BY cid) AS k FROM pc),
        |lin AS (SELECT channel,
        |    CAST(round(CAST(v AS DOUBLE) * n_c / k, 6) AS DECIMAL(18,6)) AS credit
        |  FROM pck
        |  UNION ALL
        |  SELECT 'direct', CAST(v AS DECIMAL(18,6)) FROM conv
        |  WHERE cid NOT IN (SELECT cid FROM hits)),
        |linagg AS (SELECT channel, CAST(sum(credit) AS DOUBLE) AS value_linear
        |           FROM lin GROUP BY 1)
        |SELECT coalesce(l.channel, n.channel) AS channel,
        |  CAST(coalesce(l.n_conv, 0) AS BIGINT) AS n_conv_last,
        |  coalesce(l.value_last, 0.0) AS value_last,
        |  coalesce(n.value_linear, 0.0) AS value_linear
        |FROM lastagg l FULL OUTER JOIN linagg n ON l.channel = n.channel
        |ORDER BY channel""".stripMargin,
    "ev_rolling_value" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_trailing,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // independent long-form derivation (day x type grid, zero-filled) —
    // deliberately NOT a pivot-then-unpivot mirror of the Spark plan
    "ev_unpivot" ->
      """WITH days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events),
        |t AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
        |c AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n
        |      FROM events GROUP BY 1, 2)
        |SELECT d.day, t.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |FROM days d CROSS JOIN t
        |LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
        |ORDER BY d.day, t.event_type""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS rep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin,
    "dedup_incremental_exact" ->
      """WITH store AS (SELECT DISTINCT md5(text) AS content_hash FROM documents WHERE doc_id % 2 = 0),
        |b AS (SELECT doc_id, md5(text) AS content_hash FROM documents WHERE doc_id % 2 = 1),
        |f AS (SELECT content_hash, min(doc_id) AS first_id FROM b GROUP BY 1)
        |SELECT b.doc_id, b.content_hash,
        |  CASE WHEN s.content_hash IS NOT NULL THEN 'dup_store'
        |       WHEN b.doc_id <> f.first_id THEN 'dup_batch'
        |       ELSE 'novel' END AS status
        |FROM b JOIN f USING (content_hash) LEFT JOIN store s USING (content_hash)
        |ORDER BY doc_id""".stripMargin,
    "dedup_edit_pairs" -> editDistOracleSql,
    "dedup_jaccard_pairs" -> jaccardOracleSql(0.05),
    // 3 unrolled PageRank rounds over the 0.05-Jaccard graph; constants
    // cast to DOUBLE so DuckDB's decimal literals can't diverge from
    // Spark's double arithmetic ((1 - 0.85) is exact in decimal, not in
    // binary — the trees must match bit-for-bit before the final round)
    "dedup_pagerank" -> {
      val rounds = (1 to 3).map { t =>
        val prev = s"p${t - 1}"
        s"""p$t AS (SELECT e.dst AS node,
           |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
           |      + CAST(0.85 AS DOUBLE) * sum($prev.pr / d.deg) AS pr
           |  FROM edges e JOIN $prev ON $prev.node = e.src
           |    JOIN deg d ON d.src = e.src, nn
           |  GROUP BY e.dst, nn.n)""".stripMargin
      }.mkString(",\n")
      s"""WITH $shingleCtes,
         |pairs AS (SELECT doc_a, doc_b
         |  FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.05),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
         |p0 AS (SELECT src AS node, CAST(1 AS DOUBLE) / nn.n AS pr FROM deg, nn),
         |$rounds
         |SELECT node AS doc_id, round(pr, 6) AS pagerank
         |FROM p3 ORDER BY doc_id""".stripMargin
    },
    // 8 unrolled peels (monotone => idempotent past the fixed point, so
    // the Spark loop's early-stop and the full unroll agree); final
    // degree recomputed among survivors. Each round references the
    // previous TWICE (both join sides), so the rounds are MATERIALIZED —
    // DuckDB would otherwise re-inline the whole prefix per reference
    // and the plan doubles per round (measured: 0.2 s vs minutes).
    // 3 LPA rounds unrolled: per-round neighbor-label counts and the
    // (count DESC, label ASC) argmax, from label=id over the same
    // df-capped 0.5-Jaccard edge set
    "dedup_communities" -> {
      val rounds = (1 to 3).map { t =>
        s"""f$t AS (SELECT e.src AS v, l.lab, count(*) AS c
           |  FROM edges e JOIN l${t - 1} l ON e.dst = l.v GROUP BY 1, 2),
           |l$t AS (SELECT v, lab FROM (SELECT v, lab,
           |    row_number() OVER (PARTITION BY v ORDER BY c DESC, lab) AS rn
           |  FROM f$t) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $shingleCtes,
         |pairs AS (SELECT doc_a, doc_b
         |  FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.5),
         |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |l0 AS (SELECT DISTINCT src AS v, src AS lab FROM edges),
         |$rounds
         |SELECT v AS doc_id, lab AS community FROM l3 ORDER BY doc_id""".stripMargin
    },
    "dedup_kcore" -> {
      val peels = (1 to 8).map { t =>
        s"""a$t AS MATERIALIZED (SELECT e.src AS node FROM edges e
           |  JOIN a${t - 1} x ON e.src = x.node JOIN a${t - 1} y ON e.dst = y.node
           |  GROUP BY e.src HAVING count(*) >= 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH $shingleCtes,
         |pairs AS (SELECT doc_a, doc_b
         |  FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.5),
         |edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
         |$peels
         |SELECT e.src AS doc_id, count(*) AS core_deg FROM edges e
         |JOIN a8 x ON e.src = x.node JOIN a8 y ON e.dst = y.node
         |GROUP BY e.src ORDER BY doc_id""".stripMargin
    },
    // degree-ordered triangle replay: orient each 0.05-Jaccard edge
    // low-(deg,id) -> high, wedge-join oriented out-edges, close against
    // the canonical pair set; coefficient = one double division of exact
    // integers (identical IEEE tree), deg<2 -> NULL
    "dedup_triangles" ->
      s"""WITH $shingleCtes,
         |pairs AS (SELECT doc_a, doc_b
         |  FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.05),
         |deg AS (SELECT node, count(*) AS deg FROM
         |  (SELECT doc_a AS node FROM pairs UNION ALL SELECT doc_b FROM pairs)
         |  GROUP BY node),
         |ori AS (SELECT
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND doc_a < doc_b)
         |         THEN doc_a ELSE doc_b END AS src,
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND doc_a < doc_b)
         |         THEN doc_b ELSE doc_a END AS dst
         |  FROM pairs JOIN deg da ON da.node = doc_a JOIN deg db ON db.node = doc_b),
         |wed AS (SELECT e1.src AS center, e1.dst AS wa, e2.dst AS wb
         |  FROM ori e1 JOIN ori e2 ON e1.src = e2.src AND e1.dst < e2.dst),
         |tri AS (SELECT center, wa, wb FROM wed JOIN pairs
         |  ON least(wa, wb) = doc_a AND greatest(wa, wb) = doc_b),
         |pern AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
         |  FROM (SELECT unnest([center, wa, wb]) AS node FROM tri) GROUP BY node)
         |SELECT deg.node AS doc_id, CAST(deg.deg AS BIGINT) AS degree,
         |  COALESCE(pern.n_triangles, 0) AS n_triangles,
         |  CASE WHEN deg.deg >= 2 THEN
         |    round((CAST(2 AS DOUBLE) * COALESCE(pern.n_triangles, 0))
         |          / (deg.deg * (deg.deg - 1)), 4) END AS clustering
         |FROM deg LEFT JOIN pern USING (node)
         |ORDER BY doc_id""".stripMargin,
    // LSH candidates + exact verify: the oracle is the full exact-Jaccard
    // computation at the same threshold/cap (see the query declaration for
    // why LSH recall == 1 here).
    "dedup_minhash_lsh_pairs" -> jaccardOracleSql(0.5),
    "dedup_containment_pairs" -> containmentOracleSql,
    "text_winnow_fingerprints" -> winnowFingerprintOracleSql,
    "dedup_winnow_pairs" -> winnowPairsOracleSql,
    // prefix filter is lossless => the oracle is the plain definition
    // (rep-collapsed exact threshold Jaccard), no prefix logic at all
    "dedup_prefix_jaccard" -> prefixJaccardOracleSql,
    "mm_phash_pairs" -> phashPairsOracleSql,
    "mm_phash_clusters" -> phashClustersOracleSql,
    "text_cdc_chunks" -> cdcChunksOracleSql,
    "dedup_cdc_shared" -> cdcSharedOracleSql,
    "sketch_kmv_vocab" -> kmvVocabOracleSql,
    "sketch_kmv_overlap" -> kmvOverlapOracleSql,
    "sketch_heavy_hitters" -> heavyHittersOracleSql,
    "dedup_line_boilerplate" -> lineDedupOracleSql,
    "dedup_bloom_incremental" -> bloomOracleSql,
    "dedup_clusters" ->
      s"""WITH RECURSIVE $clusterCtes
         |SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id""".stripMargin,
    // components + centrality over the SAME 0.5 graph; representative =
    // rank-1 by (rounded pagerank DESC, doc_id) within each cluster
    "dedup_cluster_reps" -> {
      val rounds = (1 to 3).map { t =>
        val prev = s"p${t - 1}"
        s"""p$t AS (SELECT e.dst AS node,
           |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
           |      + CAST(0.85 AS DOUBLE) * sum($prev.pr / d.deg) AS pr
           |  FROM edges e JOIN $prev ON $prev.node = e.src
           |    JOIN deg d ON d.src = e.src, nn
           |  GROUP BY e.dst, nn.n)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE $clusterCtes,
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
         |p0 AS (SELECT src AS node, CAST(1 AS DOUBLE) / nn.n AS pr FROM deg, nn),
         |$rounds,
         |ranked AS (SELECT c.cluster_id, c.doc_id, round(p3.pr, 6) AS pr,
         |    count(*) OVER (PARTITION BY c.cluster_id) AS n_members,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY round(p3.pr, 6) DESC, c.doc_id) AS rn
         |  FROM clusters c JOIN p3 ON p3.node = c.doc_id)
         |SELECT cluster_id, CAST(n_members AS BIGINT) AS n_members,
         |  doc_id AS rep_doc_id, pr AS rep_pagerank
         |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin
    },
    "dedup_keep_list" ->
      s"""WITH RECURSIVE $clusterCtes
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE cluster_id != doc_id)
         |ORDER BY doc_id""".stripMargin,
    // mirrors the banded generator exactly: the np/nb CTEs replay the
    // corpus-adaptive geometry search (smallest p >= 8 with 2^p * 32 >= n;
    // bands scaled to keep the plane-bit budget) in pure integers, then
    // per-band integer hyperplane sign buckets (plane index = band*p + jj),
    // distinct candidates across bands, the same normalize-once + dot
    // verify as the Spark plan. At the verify SF np = the pinned floor,
    // so the replay is byte-identical to the fixed-width oracle.
    "dedup_embedding_pairs" ->
      s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |np AS (SELECT min(p) AS p FROM generate_series(8, 30) t(p)
        |  WHERE (1::BIGINT << p) * ${graft.similarity.Similarity.LshTargetOccupancy} >= (SELECT count(*) FROM e0)),
        |nb AS (SELECT (4 * np.p + 7) // 8 AS b FROM np),
        |bands AS (SELECT unnest(generate_series(0, nb.b - 1)) AS band FROM nb),
        |bk AS (SELECT vec_id, band,
        |  list_sum(list_transform(generate_series(0, np.p - 1), jj ->
        |    CASE WHEN list_sum(list_transform(generate_series(1, 64), d ->
        |      v[d] * CAST((('0x' || substring(md5(CAST(band*np.p + jj AS VARCHAR) || ':' || CAST(d-1 AS VARCHAR)), 1, 8))::BIGINT % 7) - 3 AS DOUBLE))) >= 0
        |    THEN 1::BIGINT << jj ELSE 0::BIGINT END)) AS bucket
        |  FROM e0 CROSS JOIN bands CROSS JOIN np),
        |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
        |e AS (SELECT vec_id, list_transform(v, x -> x/nrm) AS u FROM e1)
        |SELECT c.vec_a, c.vec_b, round(list_dot_product(ea.u, eb.u), 4) AS cosine
        |FROM cand c JOIN e ea ON ea.vec_id = c.vec_a JOIN e eb ON eb.vec_id = c.vec_b
        |WHERE list_dot_product(ea.u, eb.u) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,

    // same banded-bucket replay as dedup_embedding_pairs (here 8 bands x
    // 6 planes — the contamination gate trades bucket width for recall),
    // restricted to eval (vec_id % 17 = 0) x corpus candidates; per
    // corpus vector the closest eval neighbor (cos DESC, eval_id
    // tie-break) at cos >= 0.35
    "dedup_embedding_contamination" ->
      s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |np AS (SELECT min(p) AS p FROM generate_series(6, 30) t(p)
        |  WHERE (1::BIGINT << p) * ${graft.similarity.Similarity.LshTargetOccupancy} >= (SELECT count(*) FROM e0)),
        |nb AS (SELECT (8 * np.p + 5) // 6 AS b FROM np),
        |bands AS (SELECT unnest(generate_series(0, nb.b - 1)) AS band FROM nb),
        |bk AS (SELECT vec_id, band,
        |  list_sum(list_transform(generate_series(0, np.p - 1), jj ->
        |    CASE WHEN list_sum(list_transform(generate_series(1, 64), d ->
        |      v[d] * CAST((('0x' || substring(md5(CAST(band*np.p + jj AS VARCHAR) || ':' || CAST(d-1 AS VARCHAR)), 1, 8))::BIGINT % 7) - 3 AS DOUBLE))) >= 0
        |    THEN 1::BIGINT << jj ELSE 0::BIGINT END)) AS bucket
        |  FROM e0 CROSS JOIN bands CROSS JOIN np),
        |cand AS (SELECT DISTINCT c.vec_id AS vec_id, ev.vec_id AS eval_id
        |  FROM bk ev JOIN bk c ON ev.band = c.band AND ev.bucket = c.bucket
        |  WHERE ev.vec_id % 17 = 0 AND c.vec_id % 17 <> 0),
        |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
        |e AS (SELECT vec_id, list_transform(v, x -> x/nrm) AS u FROM e1),
        |vf AS (SELECT cand.vec_id, cand.eval_id, list_dot_product(ec.u, ee.u) AS cos
        |  FROM cand JOIN e ec ON ec.vec_id = cand.vec_id
        |            JOIN e ee ON ee.vec_id = cand.eval_id
        |  WHERE list_dot_product(ec.u, ee.u) >= 0.35),
        |r AS (SELECT vec_id, eval_id, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, eval_id) AS rn
        |  FROM vf)
        |SELECT vec_id, eval_id, round(cos, 4) AS cosine
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // the keep-list CTEs + one tokenize scan, re-aggregated per source
    "curate_dedup_impact" ->
      s"""WITH RECURSIVE $clusterCtes,
         |keep AS (SELECT doc_id FROM documents
         |  WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE cluster_id != doc_id)),
         |per AS (SELECT d.doc_id, d.source,
         |    len(regexp_extract_all(translate(d.text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS nt,
         |    CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END AS kept
         |  FROM documents d LEFT JOIN keep k ON d.doc_id = k.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(kept) AS BIGINT) AS n_kept,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN kept = 1 THEN nt ELSE 0 END) AS BIGINT) AS tokens_kept,
         |  round(CASE WHEN sum(nt) = 0 THEN 0.0
         |    ELSE CAST(sum(nt) - sum(CASE WHEN kept = 1 THEN nt ELSE 0 END) AS DOUBLE)
         |         / sum(nt) END, 4) AS removed_token_frac
         |FROM per GROUP BY source ORDER BY source""".stripMargin,
    "curate_corpus_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS oh FROM documents WHERE doc_id % 3 <> 0),
        |n AS (SELECT doc_id,
        |        md5(CASE WHEN doc_id % 5 = 0 THEN text || ' amended' ELSE text END) AS nh
        |      FROM documents WHERE doc_id % 7 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.oh IS NULL THEN 'added'
        |       WHEN n.nh IS NULL THEN 'removed'
        |       WHEN o.oh <> n.nh THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY 1""".stripMargin,
    // staged exactly like Curation.curationTags: langid pass = any marker
    // hit; quality = tokens >= 5 AND rounded dup-trigram-frac <= 0.2;
    // exact reps among quality survivors; near-dup clusters (df-cap 100,
    // jaccard >= 0.5, recursive closure) among exact survivors
    // integer-exact bucket: floor(10*distinct/total) on BIGINTs, so the
    // decile boundary (TTR exactly 0.3 -> bucket 3) cannot drift between
    // engines; curve = one 10-row descending cumulative window
    "curate_quality_curve" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |pd AS (SELECT CASE WHEN len(tk) = 0 THEN 0
        |    ELSE least(CAST(floor(10.0 * len(list_distinct(tk)) / len(tk)) AS BIGINT), 9) END AS b,
        |  CAST(len(tk) AS BIGINT) AS nt FROM t),
        |bb AS (SELECT b, count(*) AS docs, CAST(sum(nt) AS BIGINT) AS toks FROM pd GROUP BY 1),
        |g AS (SELECT k AS d, COALESCE(docs, 0) AS docs, COALESCE(toks, 0) AS toks
        |  FROM generate_series(0, 9) s(k) LEFT JOIN bb ON bb.b = k),
        |c AS (SELECT d, CAST(sum(docs) OVER w AS BIGINT) AS docs_kept,
        |    CAST(sum(toks) OVER w AS BIGINT) AS tokens_kept,
        |    CAST(sum(toks) OVER () AS BIGINT) AS tot
        |  FROM g WINDOW w AS (ORDER BY d DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT round(d / 10.0, 1) AS threshold, docs_kept, tokens_kept,
        |  round(CASE WHEN tot = 0 THEN 0.0 ELSE CAST(tokens_kept AS DOUBLE) / tot END, 4) AS token_share
        |FROM c ORDER BY threshold""".stripMargin,
    "curate_funnel" ->
      """WITH RECURSIVE t0 AS (SELECT doc_id, text, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |ls AS (SELECT doc_id,
        |  len(list_intersect(list_distinct(tk), ['der','die','das','und','ist'])) AS s_de,
        |  len(list_intersect(list_distinct(tk), ['the','a','of','and','is'])) AS s_en,
        |  len(list_intersect(list_distinct(tk), ['el','la','los','que','es'])) AS s_es,
        |  len(list_intersect(list_distinct(tk), ['le','la','les','et','est'])) AS s_fr FROM t0),
        |tri AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3 THEN list_transform(generate_series(1, len(tk)-2),
        |          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) ELSE [] END) AS g FROM t0),
        |ta AS (SELECT doc_id, count(*) AS n_tri, count(DISTINCT g) AS n_tri_d FROM tri GROUP BY doc_id),
        |b AS (SELECT t0.doc_id, t0.text,
        |        greatest(s_de, s_en, s_es, s_fr) > 0 AS pl,
        |        (greatest(s_de, s_en, s_es, s_fr) > 0 AND len(t0.tk) >= 5 AND
        |         round(coalesce(1.0 - CAST(n_tri_d AS DOUBLE)/n_tri, 0.0), 4) <= 0.2) AS pq
        |      FROM t0 JOIN ls USING (doc_id) LEFT JOIN ta USING (doc_id)),
        |q AS (SELECT doc_id, text FROM b WHERE pq),
        |reps AS (SELECT md5(text) AS h, min(doc_id) AS rep FROM q GROUP BY md5(text)),
        |ex AS (SELECT q.doc_id, q.doc_id = reps.rep AS pe FROM q JOIN reps ON md5(q.text) = reps.h),
        |t3 AS (SELECT t0.doc_id, t0.tk FROM t0 JOIN ex USING (doc_id) WHERE ex.pe),
        |g3 AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) ELSE [] END AS shl FROM t3),
        |sh0 AS (SELECT doc_id, unnest(shl) AS shingle FROM g3),
        |hot AS (SELECT shingle FROM (SELECT shingle, count(*) AS df FROM sh0 GROUP BY shingle) WHERE df > 100),
        |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.5),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (SELECT src, dst FROM edges
        |  UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |clusters AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
        |tag AS (SELECT b.doc_id,
        |  CASE WHEN NOT pl THEN '1_dropped_langid'
        |       WHEN NOT pq THEN '2_dropped_quality'
        |       WHEN NOT coalesce(pe, false) THEN '3_dropped_exact_dup'
        |       WHEN b.doc_id IN (SELECT doc_id FROM clusters WHERE cluster_id != doc_id) THEN '4_dropped_near_dup'
        |       ELSE '5_kept' END AS stage
        |  FROM b LEFT JOIN ex USING (doc_id))
        |SELECT stage, count(*) AS n FROM tag GROUP BY stage ORDER BY stage""".stripMargin,
    "dedup_contamination" ->
      """WITH t AS (SELECT doc_id, source, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |g AS (SELECT doc_id, source, CASE WHEN len(tk) >= 3 THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) ELSE [] END AS shl FROM t),
        |sh AS (SELECT doc_id, source, unnest(shl) AS shingle FROM g),
        |ev AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0')
        |SELECT doc_id, count(*) AS n_shared
        |FROM sh JOIN ev USING (shingle) WHERE source != 'src0'
        |GROUP BY doc_id HAVING count(*) >= 2 ORDER BY doc_id""".stripMargin,
    // 8-token windows, distinct per doc; df >= 2 marks a window shared
    // with at least one other doc
    "dedup_shared_ngrams" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |sh AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 8
        |    THEN list_distinct(list_transform(generate_series(1, len(tk)-7),
        |      i -> array_to_string(list_slice(tk, i, i+7), ' ')))
        |    ELSE [] END) AS shingle FROM t),
        |dfq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |per AS (SELECT doc_id, count(*) AS nw,
        |          sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS nsw
        |        FROM sh JOIN dfq USING (shingle) GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(nw, 0) AS BIGINT) AS n_windows,
        |  CAST(coalesce(nsw, 0) AS BIGINT) AS n_shared_windows,
        |  round(CASE WHEN coalesce(nw, 0) = 0 THEN 0.0
        |        ELSE CAST(nsw AS DOUBLE)/nw END, 4) AS shared_frac
        |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin,
    // seam replay: same md5-of-rejoined-window keys, same df cap on each
    // side independently (a hot tail seam is dropped even if the matching
    // head seam is cold, and vice versa)
    "dedup_boundary_stitch" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |ok AS (SELECT doc_id, tk FROM t WHERE len(tk) >= 8),
        |tl AS (SELECT doc_id AS left_doc, md5(array_to_string(list_slice(tk, len(tk)-7, len(tk)), ' ')) AS seam FROM ok),
        |hd AS (SELECT doc_id AS right_doc, md5(array_to_string(list_slice(tk, 1, 8), ' ')) AS seam FROM ok),
        |tlc AS (SELECT * FROM tl WHERE seam IN (SELECT seam FROM tl GROUP BY seam HAVING count(*) <= 8)),
        |hdc AS (SELECT * FROM hd WHERE seam IN (SELECT seam FROM hd GROUP BY seam HAVING count(*) <= 8))
        |SELECT left_doc, right_doc, tlc.seam AS seam
        |FROM tlc JOIN hdc ON tlc.seam = hdc.seam AND left_doc <> right_doc
        |ORDER BY left_doc, right_doc""".stripMargin,
    // same positional-window replay: 1-based list slices -> 0-based pos,
    // distinct-doc window df >= 2, then SQL gaps-and-islands (lag + running
    // sum) merges [pos, pos+8) intervals exactly like the Spark window
    "dedup_span_pairs" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |w AS (SELECT doc_id, p - 1 AS pos, array_to_string(list_slice(tk, p, p+7), ' ') AS win
        |      FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-7)) AS p
        |            FROM t WHERE len(tk) >= 8)),
        |s AS (SELECT win FROM (SELECT DISTINCT doc_id, win FROM w) GROUP BY win HAVING count(*) >= 2),
        |h AS (SELECT doc_id, pos FROM w JOIN s USING (win)),
        |i AS (SELECT doc_id, pos,
        |        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |               OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
        |             THEN 1 ELSE 0 END AS brk
        |      FROM h),
        |g AS (SELECT doc_id, pos,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |      FROM i)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 8 AS BIGINT) AS span_end,
        |  CAST(max(pos) + 8 - min(pos) AS BIGINT) AS n_tokens
        |FROM g GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
    // paragraph replay: 25-token blocks of the raw space-split (insertion
    // + regex split == direct slicing since the corpus has no newlines),
    // pkey = doc_id*1e6 + para_id, then the standard capped-Jaccard CTEs
    // at paragraph grain, cross-doc filtered, re-aggregated per doc
    "dedup_paragraph_frac" ->
      """WITH tk0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |par0 AS (SELECT doc_id, p AS para_id,
        |           array_to_string(list_slice(w, CAST(p*25+1 AS INT), CAST(p*25+25 AS INT)), ' ') AS para
        |         FROM (SELECT doc_id, w,
        |                 unnest(generate_series(0, CAST(greatest(ceil(len(w)/25.0), 1) AS BIGINT) - 1)) AS p
        |               FROM tk0)),
        |par AS (SELECT * FROM par0 WHERE length(trim(para)) > 0),
        |pk AS (SELECT doc_id, para_id, doc_id*1000000 + para_id AS pkey, para FROM par),
        |t AS (SELECT pkey, regexp_extract_all(translate(para, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM pk),
        |g AS (SELECT pkey, CASE WHEN len(tk) >= 3 THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) ELSE [] END AS shl FROM t),
        |sh0 AS (SELECT pkey, unnest(shl) AS shingle FROM g),
        |hot AS (SELECT shingle FROM (SELECT shingle, count(*) AS df FROM sh0 GROUP BY shingle) WHERE df > 100),
        |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
        |sizes AS (SELECT pkey, count(*) AS sz FROM sh GROUP BY pkey),
        |shared AS (SELECT a.pkey AS pa, b.pkey AS pb, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.pkey < b.pkey GROUP BY 1, 2),
        |pairs AS (SELECT pa, pb FROM shared
        |  JOIN sizes sa ON sa.pkey = pa JOIN sizes sb ON sb.pkey = pb
        |  WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.5
        |    AND pa // 1000000 != pb // 1000000),
        |dup AS (SELECT DISTINCT pkey FROM (SELECT pa AS pkey FROM pairs UNION ALL SELECT pb FROM pairs)),
        |np AS (SELECT doc_id, count(*) AS n_paras FROM pk GROUP BY doc_id),
        |nd AS (SELECT pkey // 1000000 AS doc_id, count(*) AS n_dup FROM dup GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(np.n_paras, 0) AS BIGINT) AS n_paras,
        |  CAST(coalesce(nd.n_dup, 0) AS BIGINT) AS n_dup_paras,
        |  round(CASE WHEN coalesce(np.n_paras, 0) = 0 THEN 0.0
        |        ELSE CAST(coalesce(nd.n_dup, 0) AS DOUBLE)/np.n_paras END, 4) AS dup_frac
        |FROM documents d LEFT JOIN np USING (doc_id) LEFT JOIN nd USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "curate_dataset_card" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+'))) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
        |  round(CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6) AS dup_frac,
        |  round(CAST(sum(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+'))) AS DOUBLE) / count(*), 6) AS mean_doc_tokens
        |FROM documents""".stripMargin,
    // each check re-spelled as a scalar FILTER aggregate; NOT-EXISTS and
    // Spark's left_anti agree on null keys (never match -> orphan)
    "curate_expectations" ->
      """WITH li AS (SELECT count(*) AS n,
        |    count(*) FILTER (WHERE l_orderkey IS NULL) AS v_complete,
        |    count(*) FILTER (WHERE NOT (l_quantity BETWEEN 1 AND 50)) AS v_qty,
        |    count(*) FILTER (WHERE NOT (l_discount BETWEEN 0.0 AND 0.1)) AS v_disc,
        |    count(*) FILTER (WHERE NOT (l_returnflag IN ('A','N','R'))) AS v_rf,
        |    count(*) FILTER (WHERE NOT (l_linestatus IN ('O','F'))) AS v_ls,
        |    count(*) FILTER (WHERE l_extendedprice <= 0) AS v_price
        |  FROM lineitem),
        |ord AS (SELECT count(*) AS n,
        |    count(*) - count(DISTINCT o_orderkey) AS v_uniq,
        |    count(*) FILTER (WHERE NOT (o_orderstatus IN ('P','O','F'))) AS v_os,
        |    count(*) FILTER (WHERE o_totalprice <= 0) AS v_tp
        |  FROM orders),
        |orph AS (SELECT count(*) AS v FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |rows_ AS (
        |  SELECT 'complete_l_orderkey' AS check, li.n AS n_checked, li.v_complete AS n_violations FROM li
        |  UNION ALL SELECT 'range_l_quantity', li.n, li.v_qty FROM li
        |  UNION ALL SELECT 'range_l_discount', li.n, li.v_disc FROM li
        |  UNION ALL SELECT 'accepted_l_returnflag', li.n, li.v_rf FROM li
        |  UNION ALL SELECT 'accepted_l_linestatus', li.n, li.v_ls FROM li
        |  UNION ALL SELECT 'positive_l_extendedprice', li.n, li.v_price FROM li
        |  UNION ALL SELECT 'ref_l_orderkey', li.n, orph.v FROM li, orph
        |  UNION ALL SELECT 'unique_o_orderkey', ord.n, ord.v_uniq FROM ord
        |  UNION ALL SELECT 'accepted_o_orderstatus', ord.n, ord.v_os FROM ord
        |  UNION ALL SELECT 'positive_o_totalprice', ord.n, ord.v_tp FROM ord)
        |SELECT "check", CAST(n_checked AS BIGINT) AS n_checked,
        |  CAST(n_violations AS BIGINT) AS n_violations,
        |  CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM rows_ ORDER BY "check"""".stripMargin,
    // same integer-exact interpolation in HUGEINT (Spark side: exact
    // DECIMAL(38,0) products) — numerators sum to the denominator by
    // construction, so no double accumulation exists to drift
    "curate_annealing_schedule" ->
      """WITH t AS (SELECT source, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |pd AS (SELECT source, CAST(len(tk) AS BIGINT) AS nt,
        |    (len(tk) > 0 AND 2 * len(list_distinct(tk)) >= len(tk)) AS hiq FROM t),
        |bs AS (SELECT source, CAST(sum(nt) AS HUGEINT) AS nat,
        |    CAST(sum(CASE WHEN hiq THEN nt ELSE 0 END) AS HUGEINT) AS hi FROM pd GROUP BY 1),
        |tot AS (SELECT CAST(sum(nat) AS HUGEINT) AS tt, CAST(sum(hi) AS HUGEINT) AS hh FROM bs)
        |SELECT e AS epoch, source,
        |  CASE WHEN tt = 0 THEN NULL
        |       WHEN hh = 0 THEN round(CAST(nat AS DOUBLE) / CAST(tt AS DOUBLE), 6)
        |       ELSE round(CAST((3 - e) * nat * hh + e * hi * tt AS DOUBLE)
        |                  / CAST(3 * tt * hh AS DOUBLE), 6) END AS weight
        |FROM bs CROSS JOIN tot CROSS JOIN generate_series(0, 3) g(e)
        |ORDER BY epoch, source""".stripMargin,
    "curate_source_mix" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM per),
        |sh AS (SELECT source, n_docs, n_tokens,
        |         CAST(n_tokens AS DOUBLE)/tt AS share,
        |         power(CAST(n_tokens AS DOUBLE)/tt, 0.5) AS w
        |       FROM per CROSS JOIN tot),
        |wt AS (SELECT sum(w) AS wtot FROM sh)
        |SELECT source, n_docs, n_tokens, round(share, 6) AS token_share,
        |  round(w/wtot, 6) AS mix_weight,
        |  round(w/wtot/share, 6) AS resample_factor
        |FROM sh CROSS JOIN wt ORDER BY source""".stripMargin,
    // Hamilton apportionment replay: HUGEINT quota products, // floor
    // (all values nonnegative, so floor == Spark's integral div), seats
    // by (remainder desc, source)
    "curate_apportion_budget" ->
      """WITH per AS (SELECT source,
        |    CAST(sum(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+'))) AS HUGEINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS HUGEINT) AS tt FROM per),
        |q AS (SELECT source, n_tokens, n_tokens * 10000 AS num FROM per),
        |b AS (SELECT source, n_tokens,
        |         CASE WHEN tt = 0 THEN 0 ELSE num // tt END AS base,
        |         CASE WHEN tt = 0 THEN num ELSE num % tt END AS rem,
        |         tt FROM q, tot),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |         sum(base) OVER () AS total_base FROM b)
        |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(base + CASE WHEN tt = 0 THEN 0
        |    WHEN rk <= 10000 - total_base THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r ORDER BY source""".stripMargin,
    // same mix weights (round 6) as curate_source_mix; selection keeps a
    // doc while the integer cumulative sum BEFORE it is under the source
    // budget, in md5(doc_id:42) order
    "curate_budget_sample" ->
      """WITH toks AS (SELECT source, doc_id,
        |    CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR) || ':42') AS k
        |  FROM documents),
        |per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS st FROM toks GROUP BY source),
        |tot AS (SELECT CAST(sum(st) AS BIGINT) AS tt FROM per),
        |sh AS (SELECT source, power(CAST(st AS DOUBLE)/tt, 0.5) AS w FROM per CROSS JOIN tot),
        |wt AS (SELECT sum(w) AS wtot FROM sh),
        |wx AS (SELECT source, round(w/wtot, 6) AS mix FROM sh CROSS JOIN wt),
        |o AS (SELECT t.source, doc_id, n_tokens, mix,
        |        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY t.source ORDER BY k, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |      FROM toks t JOIN wx USING (source))
        |SELECT source, doc_id, n_tokens FROM o
        |WHERE CAST(cum_before AS DOUBLE) < mix * 20000.0
        |ORDER BY source, doc_id""".stripMargin,
    // same weight CTEs as curate_budget_sample; whole epochs = floor of
    // the double target/source-token ratio, partial epoch by the same
    // exact-cumsum-vs-double-threshold rule, budget 200000
    "curate_epoch_plan" ->
      """WITH toks AS (SELECT source, doc_id,
        |    CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR) || ':42') AS k
        |  FROM documents),
        |per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS st FROM toks GROUP BY source),
        |tot AS (SELECT CAST(sum(st) AS BIGINT) AS tt FROM per),
        |sh AS (SELECT source, st, power(CAST(st AS DOUBLE)/tt, 0.5) AS w FROM per CROSS JOIN tot),
        |wt AS (SELECT sum(w) AS wtot FROM sh),
        |wx AS (SELECT source, st, round(w/wtot, 6) AS mix FROM sh CROSS JOIN wt),
        |pl AS (SELECT source, st, mix * 200000.0 AS target,
        |        CAST(floor(mix * 200000.0 / CAST(st AS DOUBLE)) AS BIGINT) AS ef FROM wx),
        |pl2 AS (SELECT source, ef,
        |        target - CAST(ef AS DOUBLE) * CAST(st AS DOUBLE) AS frac_tokens FROM pl),
        |o AS (SELECT t.source, doc_id, n_tokens, ef, frac_tokens,
        |        CAST(coalesce(sum(n_tokens) OVER (PARTITION BY t.source ORDER BY k, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |      FROM toks t JOIN pl2 USING (source))
        |SELECT source, doc_id, n_tokens,
        |  CAST(ef + CASE WHEN CAST(cum_before AS DOUBLE) < frac_tokens THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
        |FROM o ORDER BY source, doc_id""".stripMargin,
    // DSIR oracle: identical md5-prefix bucketing, identical add-one
    // probability tree; round(4) absorbs ln's per-term ulp noise over the
    // per-doc sum (values bounded by |lp| <= ln-ratio of the two tables).
    "curate_dsir_weights" ->
      """WITH t AS (SELECT doc_id, source, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |occ AS (SELECT doc_id, source, ('0x' || substring(md5(bigram), 1, 6))::BIGINT % 1024 AS b
        |  FROM (SELECT doc_id, source, unnest(CASE WHEN len(tk) >= 2
        |    THEN list_transform(generate_series(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1])
        |    ELSE [] END) AS bigram FROM t)),
        |raw AS (SELECT b, count(*) AS cr FROM occ GROUP BY b),
        |tgt AS (SELECT b, count(*) AS ct FROM occ WHERE source = 'src0' GROUP BY b),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nr,
        |  CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS nt FROM occ),
        |sc AS (SELECT doc_id,
        |    ln((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + CAST(1024 AS DOUBLE))) -
        |    ln((CAST(cr AS DOUBLE) + 1.0) / (CAST(nr AS DOUBLE) + CAST(1024 AS DOUBLE))) AS lp
        |  FROM occ JOIN raw USING (b) LEFT JOIN tgt USING (b) CROSS JOIN tot),
        |per AS (SELECT doc_id, count(*) AS nf, round(sum(lp), 4) AS log_ratio FROM sc GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(nf, 0) AS BIGINT) AS n_feats, log_ratio
        |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin,
    // DoReMi mirror-ascent unrolled round-by-round: every weighted sum is
    // an exact DECIMAL(28,18) accumulation of IEEE products and weights
    // re-anchor at round(6) per round — the kmeansFit oracle discipline
    "curate_doremi_weights" -> {
      val rounds = (1 to 3).map { t =>
        val prev = s"w${t - 1}"
        s"""b$t AS (SELECT round(CAST(sum(CAST(w * loss AS DECIMAL(28,18))) AS DOUBLE), 6) AS b FROM $prev),
           |r$t AS (SELECT source, n_tokens, loss, w * exp(2.0 * greatest(loss - b, 0.0)) AS raw
           |  FROM $prev CROSS JOIN b$t),
           |z$t AS (SELECT CAST(sum(CAST(raw AS DECIMAL(28,18))) AS DOUBLE) AS z FROM r$t),
           |w$t AS (SELECT source, n_tokens, loss, round(raw / z, 6) AS w FROM r$t CROSS JOIN z$t)""".stripMargin
      }.mkString(",\n")
      s"""WITH per0 AS (SELECT source,
         |    CAST(sum(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+'))) AS BIGINT) AS n_tokens,
         |    CAST(sum(n_chars) AS BIGINT) AS n_chars
         |  FROM documents GROUP BY source),
         |per AS (SELECT source, n_tokens,
         |    round(CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS loss
         |  FROM per0 WHERE n_tokens > 0),
         |tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS t FROM per),
         |w0 AS (SELECT source, n_tokens, loss,
         |    round(CAST(n_tokens AS DOUBLE) / t, 6) AS w FROM per CROSS JOIN tot),
         |$rounds
         |SELECT w3.source, w3.n_tokens, w3.loss, w0.w AS ref_weight,
         |  w3.w AS doremi_weight, round(w3.w / w0.w, 6) AS reweight_factor
         |FROM w3 JOIN w0 USING (source) ORDER BY w3.source""".stripMargin
    },
    // the dedup_clusters graph + the samp_hash_split assignment applied
    // to the GROUP key (cluster min-id; singletons group as themselves) —
    // every parameter derives from the same Sampling constants
    "curate_split_safe" -> {
      import graft.sources.Sampling._
      val (trainEnd, valEnd) = splitThresholds(DefaultVal256, DefaultTest256)
      s"""WITH RECURSIVE $clusterCtes,
         |grp AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS group_id
         |  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id),
         |k AS (SELECT doc_id, group_id,
         |  substring(md5(CAST(group_id AS VARCHAR) || ':$DefaultSplitSeed'), 1, 2) AS b FROM grp)
         |SELECT doc_id, CAST(group_id AS BIGINT) AS group_id,
         |  CASE WHEN b < '$trainEnd' THEN 'train' WHEN b < '$valEnd' THEN 'val' ELSE 'test' END AS split
         |FROM k ORDER BY doc_id""".stripMargin
    },
    // the split CTEs + the dedup_shared_ngrams 8-token window spelling,
    // joined across the boundary (fresh CTE names: clusterCtes owns t/sh)
    "curate_split_contamination" -> {
      import graft.sources.Sampling._
      val (trainEnd, valEnd) = splitThresholds(DefaultVal256, DefaultTest256)
      s"""WITH RECURSIVE $clusterCtes,
         |grp AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS group_id
         |  FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id),
         |sp AS (SELECT doc_id,
         |  CASE WHEN b < '$trainEnd' THEN 'train' WHEN b < '$valEnd' THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id, substring(md5(CAST(group_id AS VARCHAR) || ':$DefaultSplitSeed'), 1, 2) AS b FROM grp)),
         |t8 AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
         |w8 AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 8
         |    THEN list_distinct(list_transform(generate_series(1, len(tk)-7),
         |      i -> array_to_string(list_slice(tk, i, i+7), ' ')))
         |    ELSE [] END) AS shingle FROM t8),
         |trn AS (SELECT DISTINCT shingle FROM w8 JOIN sp USING (doc_id)
         |        WHERE sp.split = 'train'),
         |ev AS (SELECT w8.doc_id, w8.shingle FROM w8 JOIN sp USING (doc_id)
         |       WHERE sp.split <> 'train'),
         |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsw
         |         FROM ev JOIN trn USING (shingle) GROUP BY doc_id),
         |wc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nw FROM ev GROUP BY doc_id)
         |SELECT sp.doc_id, sp.split,
         |  COALESCE(wc.nw, 0) AS n_windows,
         |  COALESCE(hits.nsw, 0) AS n_shared_windows
         |FROM sp LEFT JOIN wc USING (doc_id) LEFT JOIN hits USING (doc_id)
         |WHERE sp.split <> 'train' ORDER BY sp.doc_id""".stripMargin
    },
    "dedup_embedding_lsh" ->
      s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |np AS (SELECT min(p) AS p FROM generate_series(8, 30) t(p)
        |  WHERE (1::BIGINT << p) * ${graft.similarity.Similarity.LshTargetOccupancy} >= (SELECT count(*) FROM e0)),
        |bk AS (SELECT vec_id, v,
        |  list_sum(list_transform(generate_series(0, np.p - 1), j ->
        |    CASE WHEN list_sum(list_transform(generate_series(1, 64), d ->
        |      v[d] * CAST((('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(d-1 AS VARCHAR)), 1, 8))::BIGINT % 7) - 3 AS DOUBLE))) >= 0
        |    THEN 1::BIGINT << j ELSE 0::BIGINT END)) AS bucket FROM e0 CROSS JOIN np),
        |e1 AS (SELECT vec_id, bucket, v, sqrt(list_dot_product(v, v)) AS nrm FROM bk),
        |e AS (SELECT vec_id, bucket, list_transform(v, x -> x/nrm) AS u FROM e1)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_dot_product(a.u, b.u), 4) AS cosine
        |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.u, b.u) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,

    "sim_cosine_topk" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |  round(list_dot_product(v, qv)/(sqrt(list_dot_product(v, v))*sqrt(list_dot_product(qv, qv))), 4) AS cosine
        |FROM e, q WHERE e.vec_id != 0
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "sim_ann_lsh" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |b AS (SELECT vec_id, label, v,
        |  list_sum(list_transform(generate_series(0, 7), j ->
        |    CASE WHEN list_sum(list_transform(generate_series(1, 64), d ->
        |      v[d] * CAST((('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(d-1 AS VARCHAR)), 1, 8))::BIGINT % 7) - 3 AS DOUBLE))) >= 0
        |    THEN 1 << j ELSE 0 END)) AS bucket FROM e),
        |q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
        |SELECT b.vec_id, b.label,
        |  round(list_dot_product(v, qv)/(sqrt(list_dot_product(v, v))*sqrt(list_dot_product(qv, qv))), 4) AS cosine
        |FROM b, q WHERE b.bucket = q.qbucket AND b.vec_id != 0
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    // same bucket/cosine CTEs, anchors = vec_id % 37, label-mismatch
    // filter, per-anchor (cosine DESC, id) top-3
    "sim_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |b AS (SELECT vec_id, label, v,
        |  list_sum(list_transform(generate_series(0, 7), j ->
        |    CASE WHEN list_sum(list_transform(generate_series(1, 64), d ->
        |      v[d] * CAST((('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(d-1 AS VARCHAR)), 1, 8))::BIGINT % 7) - 3 AS DOUBLE))) >= 0
        |    THEN 1 << j ELSE 0 END)) AS bucket FROM e),
        |a AS (SELECT vec_id AS anchor_id, label AS anchor_label, v AS av, bucket
        |  FROM b WHERE vec_id % 37 = 0),
        |cand AS (SELECT a.anchor_id, a.anchor_label, b.vec_id AS negative_id,
        |    b.label AS negative_label,
        |    round(list_dot_product(v, av)/(sqrt(list_dot_product(v, v))*sqrt(list_dot_product(av, av))), 4) AS cosine
        |  FROM b JOIN a USING (bucket) WHERE b.label <> a.anchor_label),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
        |    ORDER BY cosine DESC, negative_id) AS INT) AS "rank" FROM cand)
        |SELECT anchor_id, anchor_label, negative_id, negative_label, cosine, "rank"
        |FROM r WHERE "rank" <= 3 ORDER BY anchor_id, "rank"""".stripMargin,
    // multi-probe: neighbors of the base bucket by flipping the 3 planes
    // with the smallest |query·plane| margin (ties by plane index) —
    // identical margin arithmetic, so both engines probe the same buckets
    "sim_ann_multiprobe" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |b AS (SELECT vec_id, label, v,
        |  list_sum(list_transform(generate_series(0, 7), j ->
        |    CASE WHEN list_sum(list_transform(generate_series(1, 64), d ->
        |      v[d] * CAST((('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(d-1 AS VARCHAR)), 1, 8))::BIGINT % 7) - 3 AS DOUBLE))) >= 0
        |    THEN 1 << j ELSE 0 END)) AS bucket FROM e),
        |q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = 0),
        |mg AS (SELECT qv, qbucket, j,
        |         abs(list_sum(list_transform(generate_series(1, 64), d ->
        |           qv[d] * CAST((('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(d-1 AS VARCHAR)), 1, 8))::BIGINT % 7) - 3 AS DOUBLE)))) AS m
        |       FROM q, generate_series(0, 7) g(j)),
        |fl AS (SELECT qv, xor(qbucket, 1 << j) AS bucket
        |       FROM mg ORDER BY m, j LIMIT 3),
        |pb AS (SELECT qv, qbucket AS bucket FROM q UNION ALL SELECT qv, bucket FROM fl)
        |SELECT b.vec_id, b.label,
        |  round(list_dot_product(v, qv)/(sqrt(list_dot_product(v, v))*sqrt(list_dot_product(qv, qv))), 4) AS cosine
        |FROM b JOIN pb ON b.bucket = pb.bucket WHERE b.vec_id != 0
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "sim_norms_by_label" ->
      """WITH e AS (SELECT label, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm FROM embeddings)
        |SELECT label, count(*) AS n, round(min(norm), 4) AS min_norm, round(max(norm), 4) AS max_norm
        |FROM e GROUP BY label ORDER BY label""".stripMargin,
    // the md5 {-1,0,+1} plane replay (jlCoef) + the same ascending-dim
    // folds and sqrt(3/16) scale as the Spark expressions
    "sim_jl_norms" ->
      s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |pr AS (SELECT vec_id, v, $jlProjExpr AS p FROM e0)
         |SELECT vec_id,
         |  round(sqrt(list_dot_product(v, v)), 4) AS norm_orig,
         |  round(sqrt(3.0/16.0) * sqrt(list_dot_product(p, p)), 4) AS norm_proj,
         |  CASE WHEN sqrt(list_dot_product(v, v)) > 0
         |       THEN round(sqrt(3.0/16.0) * sqrt(list_dot_product(p, p))
         |                  / sqrt(list_dot_product(v, v)), 4) END AS ratio
         |FROM pr ORDER BY vec_id""".stripMargin,
    "sim_jl_distortion" ->
      s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |smp AS (SELECT vec_id, v FROM e0
         |  ORDER BY md5(CAST(vec_id AS VARCHAR) || ':7'), vec_id LIMIT 64),
         |pr AS (SELECT vec_id, v, $jlProjExpr AS p FROM smp),
         |pairs AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    a.v AS va, b.v AS vb, a.p AS pa, b.p AS pb
         |  FROM pr a JOIN pr b ON a.vec_id < b.vec_id),
         |d AS (SELECT vec_a, vec_b,
         |  sqrt(list_sum(list_transform(generate_series(1, 64), i ->
         |    (va[i]-vb[i])*(va[i]-vb[i])))) AS dorig,
         |  sqrt(3.0/16.0) * sqrt(list_sum(list_transform(generate_series(1, 16), i ->
         |    (pa[i]-pb[i])*(pa[i]-pb[i])))) AS dproj
         |  FROM pairs)
         |SELECT vec_a, vec_b, round(dorig, 4) AS d_orig, round(dproj, 4) AS d_proj,
         |  CASE WHEN dorig > 0 THEN round(dproj / dorig, 4) END AS ratio
         |FROM d ORDER BY vec_a, vec_b""".stripMargin,
    // five DECIMAL(28,18)-exact moment sums per (i,j) with i<=j (products
    // double-multiplied BEFORE the decimal cast, mirroring Spark), then
    // the identical (n*sxy - sx*sy)/(sqrt(...)*sqrt(...)) double tree
    "sim_corr_matrix" ->
      """WITH p AS (
        |  SELECT r1.range AS i, r2.range AS j,
        |    CAST(embedding[CAST(r1.range + 1 AS INT)] AS DOUBLE) AS xi,
        |    CAST(embedding[CAST(r2.range + 1 AS INT)] AS DOUBLE) AS xj
        |  FROM embeddings CROSS JOIN range(0, 8) r1 CROSS JOIN range(0, 8) r2
        |  WHERE r1.range <= r2.range),
        |a AS (
        |  SELECT i, j, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(xi AS DECIMAL(28,18))) AS sx,
        |    sum(CAST(xj AS DECIMAL(28,18))) AS sy,
        |    sum(CAST(xi * xj AS DECIMAL(28,18))) AS sxy,
        |    sum(CAST(xi * xi AS DECIMAL(28,18))) AS sxx,
        |    sum(CAST(xj * xj AS DECIMAL(28,18))) AS syy
        |  FROM p GROUP BY i, j)
        |SELECT CAST(i AS INT) AS dim_i, CAST(j AS INT) AS dim_j, n,
        |  CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        |  THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS corr
        |FROM a ORDER BY dim_i, dim_j""".stripMargin,
    // same round-half-up quantize/dequantize spelling as the Spark plan;
    // list_dot_product is the same left-to-right fold as graft_dot, so the
    // per-vector mse is bit-identical before the rounded aggregate
    // codebook = the same seeded-hash sample as the Spark side; total
    // reconstruction error = sum of per-subspace best distances, summed
    // in subspace order (list ORDER BY s) to match the sequential fold
    "sim_pq_error" ->
      """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |cb0 AS (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR) || ':7') AS ck FROM v ORDER BY ck, vec_id LIMIT 16),
        |cb AS (SELECT v AS cv FROM cb0),
        |ds AS (SELECT t.vec_id, t.label, g.s,
        |    min(list_dot_product(
        |      list_transform(generate_series(1, 8), i -> t.v[g.s*8 + i] - cb.cv[g.s*8 + i]),
        |      list_transform(generate_series(1, 8), i -> t.v[g.s*8 + i] - cb.cv[g.s*8 + i]))) AS d2
        |  FROM v t CROSS JOIN generate_series(0, 7) g(s) CROSS JOIN cb
        |  GROUP BY 1, 2, 3),
        |pm AS (SELECT vec_id, label, list_sum(list(d2 ORDER BY s)) / 64 AS mse
        |       FROM ds GROUP BY 1, 2)
        |SELECT label, count(*) AS n_vecs,
        |  round(CAST(sum(CAST(mse AS DECIMAL(18,12))) AS DOUBLE) / count(*), 8) AS avg_mse,
        |  round(max(mse), 8) AS max_mse
        |FROM pm GROUP BY label ORDER BY label""".stripMargin,
    // unit-vector codebook, rank-1 argmin per (vec, subspace) with ties
    // to the lowest code index, q-codeword partials summed in subspace
    // order (list ORDER BY s) to match Spark's sequential fold
    "sim_ann_pq" ->
      """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |e1 AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
        |e AS (SELECT vec_id, label, list_transform(v, x -> x/nrm) AS u FROM e1),
        |cb0 AS (SELECT vec_id, u, md5(CAST(vec_id AS VARCHAR) || ':7') AS ck FROM e ORDER BY ck, vec_id LIMIT 16),
        |cb AS (SELECT CAST(row_number() OVER (ORDER BY ck, vec_id) AS INT) AS code_id, u AS cu FROM cb0),
        |q AS (SELECT u AS qu FROM e WHERE vec_id = 0),
        |d AS (SELECT t.vec_id, t.label, g.s, cb.code_id, cb.cu,
        |    list_dot_product(
        |      list_transform(generate_series(1, 8), i -> t.u[g.s*8 + i] - cb.cu[g.s*8 + i]),
        |      list_transform(generate_series(1, 8), i -> t.u[g.s*8 + i] - cb.cu[g.s*8 + i])) AS d2
        |  FROM e t CROSS JOIN generate_series(0, 7) g(s) CROSS JOIN cb
        |  WHERE t.vec_id != 0),
        |best AS (SELECT vec_id, label, s, cu FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code_id) AS rn FROM d)
        |  WHERE rn = 1),
        |part AS (SELECT b.vec_id, b.label, b.s,
        |    list_dot_product(
        |      list_transform(generate_series(1, 8), i -> q.qu[b.s*8 + i]),
        |      list_transform(generate_series(1, 8), i -> b.cu[b.s*8 + i])) AS p
        |  FROM best b, q),
        |sc AS (SELECT vec_id, label, list_sum(list(p ORDER BY s)) AS approx
        |       FROM part GROUP BY 1, 2)
        |SELECT vec_id, label, round(approx, 4) AS approx_cosine
        |FROM sc ORDER BY round(approx, 4) DESC, vec_id LIMIT 10""".stripMargin,
    "sim_quantize_error" ->
      """WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
        |m AS (SELECT label, e, list_max(list_transform(e, x -> abs(x))) AS ma FROM v),
        |q AS (SELECT label,
        |        CASE WHEN ma = 0 THEN 0.0 ELSE
        |          list_dot_product(
        |            list_transform(e, x -> x - least(greatest(floor(x * (127.0 / ma) + 0.5), -127.0), 127.0) / (127.0 / ma)),
        |            list_transform(e, x -> x - least(greatest(floor(x * (127.0 / ma) + 0.5), -127.0), 127.0) / (127.0 / ma)))
        |          / len(e) END AS mse
        |      FROM m)
        |SELECT label, count(*) AS n_vecs,
        |  round(CAST(sum(CAST(mse AS DECIMAL(18,12))) AS DOUBLE) / count(*), 8) AS avg_mse,
        |  round(max(mse), 8) AS max_mse
        |FROM q GROUP BY label ORDER BY label""".stripMargin,
    // same bucket expression as sim_ann_lsh; per-query rank over the
    // ROUNDED cosine so cross-engine tie order is pinned
    "sim_ann_multi" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |b AS (SELECT vec_id, label, v,
        |  list_sum(list_transform(generate_series(0, 7), j ->
        |    CASE WHEN list_sum(list_transform(generate_series(1, 64), d ->
        |      v[d] * CAST((('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(d-1 AS VARCHAR)), 1, 8))::BIGINT % 7) - 3 AS DOUBLE))) >= 0
        |    THEN 1 << j ELSE 0 END)) AS bucket FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id IN (0, 1, 2, 3)),
        |s AS (SELECT q.query_id, b.vec_id, b.label,
        |        round(list_dot_product(v, qv)/(sqrt(list_dot_product(v, v))*sqrt(list_dot_product(qv, qv))), 4) AS cosine
        |      FROM b JOIN q USING (bucket) WHERE b.vec_id != q.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn FROM s)
        |SELECT query_id, vec_id, label, cosine, CAST(rn AS INT) AS rn
        |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,
    // brute top-10 and LSH top-10 per query, intersected: measured recall
    "sim_recall_eval" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |b AS (SELECT vec_id, v,
        |  list_sum(list_transform(generate_series(0, 7), j ->
        |    CASE WHEN list_sum(list_transform(generate_series(1, 64), d ->
        |      v[d] * CAST((('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || CAST(d-1 AS VARCHAR)), 1, 8))::BIGINT % 7) - 3 AS DOUBLE))) >= 0
        |    THEN 1 << j ELSE 0 END)) AS bucket FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM b WHERE vec_id IN (0, 1, 2, 3)),
        |br AS (SELECT query_id, vec_id FROM (
        |  SELECT q.query_id, b.vec_id,
        |    row_number() OVER (PARTITION BY q.query_id ORDER BY
        |      round(list_dot_product(b.v, q.qv)/(sqrt(list_dot_product(b.v, b.v))*sqrt(list_dot_product(q.qv, q.qv))), 4) DESC,
        |      b.vec_id) AS rn
        |  FROM b CROSS JOIN q WHERE b.vec_id != q.query_id) WHERE rn <= 10),
        |ap AS (SELECT query_id, vec_id FROM (
        |  SELECT q.query_id, b.vec_id,
        |    row_number() OVER (PARTITION BY q.query_id ORDER BY
        |      round(list_dot_product(b.v, q.qv)/(sqrt(list_dot_product(b.v, b.v))*sqrt(list_dot_product(q.qv, q.qv))), 4) DESC,
        |      b.vec_id) AS rn
        |  FROM b JOIN q ON b.bucket = q.qbucket WHERE b.vec_id != q.query_id) WHERE rn <= 10)
        |SELECT br.query_id AS query_id, count(*) AS k_eff,
        |  CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  round(CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)/count(*), 4) AS recall
        |FROM br LEFT JOIN ap ON br.query_id = ap.query_id AND br.vec_id = ap.vec_id
        |GROUP BY br.query_id ORDER BY br.query_id""".stripMargin,
    // same centroid/assignment CTEs as sim_ann_ivf; new centroid head
    // coordinates as per-cell means over unit vectors
    "sim_kmeans_step" ->
      """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |e1 AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
        |e AS (SELECT vec_id, label, list_transform(v, x -> x/nrm) AS u FROM e1),
        |c0 AS (SELECT vec_id, u, md5(CAST(vec_id AS VARCHAR) || ':7') AS ck FROM e ORDER BY ck, vec_id LIMIT 16),
        |c AS (SELECT row_number() OVER (ORDER BY ck, vec_id) AS cell_id, u AS cu FROM c0),
        |asg AS (SELECT vec_id, u, cell_id FROM (
        |  SELECT e.vec_id, e.u, c.cell_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.u, c.cu) DESC, c.cell_id) AS rn
        |  FROM e CROSS JOIN c) WHERE rn = 1)
        |SELECT CAST(cell_id AS INT) AS cell_id, count(*) AS n_vecs,
        |  round(avg(u[1]), 6) AS c0, round(avg(u[2]), 6) AS c1,
        |  round(avg(u[3]), 6) AS c2, round(avg(u[4]), 6) AS c3
        |FROM asg GROUP BY cell_id ORDER BY cell_id""".stripMargin,
    // Lloyd replay, 3 unrolled rounds: assignment argmax (same CTE as
    // sim_kmeans_step), then per-dim DECIMAL(28,18)-exact sums re-unitized
    // by the identical x/sqrt(dot) tree Spark uses; empty cells keep the
    // previous centroid via the LEFT JOIN + COALESCE.
    "sim_kmeans_fit" -> {
      val rounds = kmeansRoundsSql
      s"""WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
         |e AS (SELECT vec_id, list_transform(v, x -> x/nrm) AS u FROM e1),
         |c0s AS (SELECT vec_id, u, md5(CAST(vec_id AS VARCHAR) || ':7') AS ck FROM e ORDER BY ck, vec_id LIMIT 16),
         |ct0 AS (SELECT CAST(row_number() OVER (ORDER BY ck, vec_id) AS INT) AS cell_id, u AS cu FROM c0s),
         |$rounds
         |SELECT ct3.cell_id, CAST(COALESCE(n3.n, 0) AS BIGINT) AS n_vecs,
         |  round(ct3.cu[1], 6) AS c0, round(ct3.cu[2], 6) AS c1,
         |  round(ct3.cu[3], 6) AS c2, round(ct3.cu[4], 6) AS c3
         |FROM ct3 LEFT JOIN (SELECT cell_id, count(*) AS n FROM a3 GROUP BY cell_id) n3 USING (cell_id)
         |ORDER BY cell_id""".stripMargin
    },
    // Power-iteration oracle: same exact v0 = 0.125, same decimal matvec
    // sums, same sequential self-dot normalization (list_dot_product ≡
    // graft_dot fold order), same per-round round(…,6) re-anchoring.
    "sim_power_iteration" -> {
      val rounds = (1 to 3).map { t =>
        val prev = if (t == 1) "v0" else s"v${t - 1}"
        s"""s$t AS (SELECT vec_id, list_dot_product(x, vv) AS s FROM xc CROSS JOIN $prev),
           |w$t AS (SELECT d, CAST(sum(CAST(s$t.s * x[d] AS DECIMAL(28,18))) AS DOUBLE) AS wd
           |  FROM xc JOIN s$t USING (vec_id), generate_series(1, 64) g(d) GROUP BY d),
           |wl$t AS (SELECT list(wd ORDER BY d) AS wl FROM w$t),
           |v$t AS (SELECT list_transform(wl, c -> round(c / sqrt(list_dot_product(wl, wl)), 6)) AS vv FROM wl$t)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nl FROM e),
         |mu0 AS (SELECT d, CAST(sum(CAST(v[d] AS DECIMAL(28,18))) AS DOUBLE) AS sd
         |  FROM e, generate_series(1, 64) g(d) GROUP BY d),
         |mu AS (SELECT list(sd / CAST(nl AS DOUBLE) ORDER BY d) AS mu FROM mu0 CROSS JOIN nn),
         |xc AS (SELECT vec_id, list_transform(generate_series(1, 64), d -> v[d] - mu[d]) AS x FROM e CROSS JOIN mu),
         |v0 AS (SELECT list_transform(generate_series(1, 64), d -> CAST(0.125 AS DOUBLE)) AS vv),
         |$rounds,
         |sf AS (SELECT vec_id, list_dot_product(x, vv) AS s FROM xc CROSS JOIN v3),
         |s2t AS (SELECT CAST(sum(CAST(s * s AS DECIMAL(28,18))) AS DOUBLE) AS s2 FROM sf),
         |lam AS (SELECT round(s2 / CAST(nl AS DOUBLE), 4) AS lambda FROM s2t CROSS JOIN nn)
         |SELECT CAST(d AS INT) AS d, vv[d] AS loading, lambda
         |FROM v3 CROSS JOIN lam, generate_series(1, 64) g(d)
         |ORDER BY d""".stripMargin
    },
    // the sim_power_iteration chain verbatim for component 1, then the
    // deflated second chain: each round's matvec has its v1 projection
    // removed (v1 as the literal final rounded vector) before the round(6)
    // unit re-anchor — replaying pcaTop2's driver arithmetic exactly
    "sim_pca_top2" -> {
      val r1 = (1 to 3).map { t =>
        val prev = if (t == 1) "v0" else s"v${t - 1}"
        s"""s$t AS (SELECT vec_id, list_dot_product(x, vv) AS s FROM xc CROSS JOIN $prev),
           |w$t AS (SELECT d, CAST(sum(CAST(s$t.s * x[d] AS DECIMAL(28,18))) AS DOUBLE) AS wd
           |  FROM xc JOIN s$t USING (vec_id), generate_series(1, 64) g(d) GROUP BY d),
           |wl$t AS (SELECT list(wd ORDER BY d) AS wl FROM w$t),
           |v$t AS (SELECT list_transform(wl, c -> round(c / sqrt(list_dot_product(wl, wl)), 6)) AS vv FROM wl$t)""".stripMargin
      }.mkString(",\n")
      val r2 = (1 to 3).map { t =>
        val prev = if (t == 1) "u0" else s"u${t - 1}"
        s"""t$t AS (SELECT vec_id, list_dot_product(x, vv) AS s FROM xc CROSS JOIN $prev),
           |y$t AS (SELECT d, CAST(sum(CAST(t$t.s * x[d] AS DECIMAL(28,18))) AS DOUBLE) AS wd
           |  FROM xc JOIN t$t USING (vec_id), generate_series(1, 64) g(d) GROUP BY d),
           |yl$t AS (SELECT list(wd ORDER BY d) AS wl FROM y$t),
           |df$t AS (SELECT list_transform(generate_series(1, 64),
           |    d -> wl[d] - list_dot_product(wl, v1l) * v1l[d]) AS wl
           |  FROM yl$t CROSS JOIN pc1),
           |u$t AS (SELECT list_transform(wl, c -> round(c / sqrt(list_dot_product(wl, wl)), 6)) AS vv FROM df$t)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nl FROM e),
         |mu0 AS (SELECT d, CAST(sum(CAST(v[d] AS DECIMAL(28,18))) AS DOUBLE) AS sd
         |  FROM e, generate_series(1, 64) g(d) GROUP BY d),
         |mu AS (SELECT list(sd / CAST(nl AS DOUBLE) ORDER BY d) AS mu FROM mu0 CROSS JOIN nn),
         |xc AS (SELECT vec_id, list_transform(generate_series(1, 64), d -> v[d] - mu[d]) AS x FROM e CROSS JOIN mu),
         |v0 AS (SELECT list_transform(generate_series(1, 64), d -> CAST(0.125 AS DOUBLE)) AS vv),
         |$r1,
         |pc1 AS (SELECT vv AS v1l FROM v3),
         |sf1 AS (SELECT vec_id, list_dot_product(x, v1l) AS s FROM xc CROSS JOIN pc1),
         |l1s AS (SELECT CAST(sum(CAST(s * s AS DECIMAL(28,18))) AS DOUBLE) AS s2 FROM sf1),
         |lam1 AS (SELECT round(s2 / CAST(nl AS DOUBLE), 4) AS lambda FROM l1s CROSS JOIN nn),
         |u0 AS (SELECT list_transform(generate_series(1, 64),
         |    d -> CASE WHEN d % 2 = 1 THEN CAST(0.125 AS DOUBLE) ELSE CAST(-0.125 AS DOUBLE) END) AS vv),
         |$r2,
         |sf2 AS (SELECT vec_id, list_dot_product(x, vv) AS s FROM xc CROSS JOIN u3),
         |l2s AS (SELECT CAST(sum(CAST(s * s AS DECIMAL(28,18))) AS DOUBLE) AS s2 FROM sf2),
         |lam2 AS (SELECT round(s2 / CAST(nl AS DOUBLE), 4) AS lambda FROM l2s CROSS JOIN nn),
         |c1 AS (SELECT 1 AS component, CAST(d AS INT) AS d, vv[d] AS loading, lambda
         |  FROM v3 CROSS JOIN lam1, generate_series(1, 64) g(d)),
         |c2 AS (SELECT 2 AS component, CAST(d AS INT) AS d, vv[d] AS loading, lambda
         |  FROM u3 CROSS JOIN lam2, generate_series(1, 64) g(d))
         |SELECT * FROM c1 UNION ALL SELECT * FROM c2 ORDER BY component, d""".stripMargin
    },
    // same unrolled 3-iteration kmeans as sim_kmeans_fit, plus a final
    // assignment against the trained ct3 and a within-cell self-join
    // the shared kmeans unroll + final assignment, centroid cosine from
    // ct3, row_number per cell (cos DESC, vec_id) at keepK=20
    "sim_cell_prune" -> {
      val rounds = kmeansRoundsSql
      s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
         |e AS (SELECT vec_id, list_transform(v, x -> x/nrm) AS u FROM e1),
         |c0s AS (SELECT vec_id, u, md5(CAST(vec_id AS VARCHAR) || ':7') AS ck FROM e ORDER BY ck, vec_id LIMIT 16),
         |ct0 AS (SELECT CAST(row_number() OVER (ORDER BY ck, vec_id) AS INT) AS cell_id, u AS cu FROM c0s),
         |$rounds,
         |a4 AS (SELECT vec_id, u, cell_id FROM (
         |  SELECT e.vec_id, e.u, c.cell_id,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY list_dot_product(e.u, c.cu) DESC, c.cell_id) AS rn
         |  FROM e CROSS JOIN ct3 c) WHERE rn = 1),
         |ranked AS (SELECT a4.vec_id, a4.cell_id,
         |    list_dot_product(a4.u, c.cu) AS cs,
         |    row_number() OVER (PARTITION BY a4.cell_id
         |      ORDER BY list_dot_product(a4.u, c.cu) DESC, a4.vec_id) AS rk
         |  FROM a4 JOIN ct3 c USING (cell_id))
         |SELECT vec_id, cell_id, round(cs, 4) AS centroid_cos,
         |  CASE WHEN rk <= 20 THEN 'kept' ELSE 'pruned' END AS verdict
         |FROM ranked ORDER BY vec_id""".stripMargin
    },
    // brute pairwise cosine (ground truth) vs the 4x8 banded buckets,
    // both arms over the SAME 2048-vector seeded-md5 sample (constant
    // cost at any corpus size — a pair's catch verdict depends only on
    // its own two vectors); theory term =
    // 1-(1-(1-acos(mid)/pi)^8)^4 at the bucket center
    "sim_lsh_calibration" ->
      """WITH eall AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |e0 AS (SELECT vec_id, v FROM (
        |  SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR) || ':42') AS sk
        |  FROM eall ORDER BY sk, vec_id LIMIT 2048)),
        |bands AS (SELECT unnest(generate_series(0, 3)) AS band),
        |bk AS (SELECT vec_id, band,
        |  list_sum(list_transform(generate_series(0, 7), jj ->
        |    CASE WHEN list_sum(list_transform(generate_series(1, 64), d ->
        |      v[d] * CAST((('0x' || substring(md5(CAST(band*8 + jj AS VARCHAR) || ':' || CAST(d-1 AS VARCHAR)), 1, 8))::BIGINT % 7) - 3 AS DOUBLE))) >= 0
        |    THEN 1 << jj ELSE 0 END)) AS bucket
        |  FROM e0 CROSS JOIN bands),
        |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
        |e AS (SELECT vec_id, list_transform(v, x -> x/nrm) AS u FROM e1),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, list_dot_product(a.u, b.u) AS cs
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
        |g AS (SELECT CAST(floor(cs*10) AS INT) AS cos_bucket,
        |    count(*) AS n_pairs,
        |    sum(CASE WHEN cand.vec_a IS NOT NULL THEN 1 ELSE 0 END) AS n_caught
        |  FROM p LEFT JOIN cand USING (vec_a, vec_b) GROUP BY 1)
        |SELECT cos_bucket, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(n_caught AS BIGINT) AS n_caught,
        |  round(CAST(n_caught AS DOUBLE)/n_pairs, 4) AS observed,
        |  round(1.0 - power(1.0 - power(1.0 - acos(least(greatest((CAST(cos_bucket AS DOUBLE)+0.5)/10.0, -1.0), 1.0))/pi(), 8), 4), 4) AS theoretical
        |FROM g ORDER BY cos_bucket""".stripMargin,
    "dedup_semantic_pairs" -> {
      val rounds = kmeansRoundsSql
      s"""WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |e1 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
         |e AS (SELECT vec_id, list_transform(v, x -> x/nrm) AS u FROM e1),
         |c0s AS (SELECT vec_id, u, md5(CAST(vec_id AS VARCHAR) || ':7') AS ck FROM e ORDER BY ck, vec_id LIMIT 16),
         |ct0 AS (SELECT CAST(row_number() OVER (ORDER BY ck, vec_id) AS INT) AS cell_id, u AS cu FROM c0s),
         |$rounds,
         |a4 AS (SELECT vec_id, u, cell_id FROM (
         |  SELECT e.vec_id, e.u, c.cell_id,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY list_dot_product(e.u, c.cu) DESC, c.cell_id) AS rn
         |  FROM e CROSS JOIN ct3 c) WHERE rn = 1)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(list_dot_product(a.u, b.u), 4) AS cosine
         |FROM a4 a JOIN a4 b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
         |WHERE list_dot_product(a.u, b.u) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin
    },
    // the full IVF-PQ replay: same unrolled kmeans (ct3), final
    // assignment, residuals vs the assigned centroid, the seeded-md5
    // residual codebook, probe rank over trained cells, per-(vec,subspace)
    // argmin with (d2, code_id) tie-break, and qc + ordered list_sum —
    // every stage of the composed index recomputed independently in SQL.
    "sim_ann_ivfpq" -> {
      val rounds = kmeansRoundsSql
      s"""WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |e1 AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
         |e AS (SELECT vec_id, label, list_transform(v, x -> x/nrm) AS u FROM e1),
         |c0s AS (SELECT vec_id, u, md5(CAST(vec_id AS VARCHAR) || ':7') AS ck FROM e ORDER BY ck, vec_id LIMIT 16),
         |ct0 AS (SELECT CAST(row_number() OVER (ORDER BY ck, vec_id) AS INT) AS cell_id, u AS cu FROM c0s),
         |$rounds,
         |a4 AS (SELECT vec_id, label, u, cell_id FROM (
         |  SELECT e.vec_id, e.label, e.u, c.cell_id,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY list_dot_product(e.u, c.cu) DESC, c.cell_id) AS rn
         |  FROM e CROSS JOIN ct3 c) WHERE rn = 1),
         |res AS (SELECT a4.vec_id, a4.label, a4.cell_id,
         |          list_transform(generate_series(1, 64), i -> a4.u[i] - c.cu[i]) AS r
         |        FROM a4 JOIN ct3 c USING (cell_id)),
         |cb0 AS (SELECT vec_id, r, md5(CAST(vec_id AS VARCHAR) || ':7') AS ck FROM res ORDER BY ck, vec_id LIMIT 16),
         |cb AS (SELECT CAST(row_number() OVER (ORDER BY ck, vec_id) AS INT) AS code_id, r AS cr FROM cb0),
         |q AS (SELECT u AS qu FROM e WHERE vec_id = 0),
         |probe AS (SELECT cell_id, qc FROM (
         |  SELECT c.cell_id, list_dot_product(q.qu, c.cu) AS qc,
         |         row_number() OVER (ORDER BY list_dot_product(q.qu, c.cu) DESC, c.cell_id) AS rn
         |  FROM q CROSS JOIN ct3 c) WHERE rn <= 4),
         |cand AS (SELECT res.vec_id, res.label, res.r, probe.qc
         |         FROM res JOIN probe USING (cell_id) WHERE res.vec_id != 0),
         |d AS (SELECT t.vec_id, t.label, t.qc, g.s, cb.code_id, cb.cr,
         |    list_dot_product(
         |      list_transform(generate_series(1, 8), i -> t.r[g.s*8 + i] - cb.cr[g.s*8 + i]),
         |      list_transform(generate_series(1, 8), i -> t.r[g.s*8 + i] - cb.cr[g.s*8 + i])) AS d2
         |  FROM cand t CROSS JOIN generate_series(0, 7) g(s) CROSS JOIN cb),
         |best AS (SELECT vec_id, label, qc, s, cr FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code_id) AS rn FROM d)
         |  WHERE rn = 1),
         |part AS (SELECT b.vec_id, b.label, b.qc, b.s,
         |    list_dot_product(
         |      list_transform(generate_series(1, 8), i -> q.qu[b.s*8 + i]),
         |      list_transform(generate_series(1, 8), i -> b.cr[b.s*8 + i])) AS p
         |  FROM best b, q),
         |sc AS (SELECT vec_id, label, max(qc) + list_sum(list(p ORDER BY s)) AS approx
         |       FROM part GROUP BY vec_id, label)
         |SELECT vec_id, label, round(approx, 4) AS approx_cosine
         |FROM sc ORDER BY round(approx, 4) DESC, vec_id LIMIT 10""".stripMargin
    },

    "text_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS n_tokens,
        |  CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, text, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents)
        |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, CAST(len(tk) AS BIGINT) AS n_tokens,
        |  round(CASE WHEN len(tk) = 0 THEN 0.0 ELSE list_sum(list_transform(tk, x -> CAST(length(x) AS DOUBLE)))/len(tk) END, 4) AS avg_token_len,
        |  round(CASE WHEN len(tk) = 0 THEN 0.0 ELSE CAST(len(list_distinct(tk)) AS DOUBLE)/len(tk) END, 4) AS type_token_ratio,
        |  round(CASE WHEN len(tk) = 0 THEN 0.0 ELSE CAST(len(list_intersect(list_distinct(tk), ['the','a','of','and','is'])) AS DOUBLE)/len(tk) END, 4) AS stopword_type_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_sentence_stats" ->
      """WITH t AS (SELECT doc_id, text,
        |    len(list_filter(regexp_split_to_array(text, '[.!?]+'), s -> length(trim(s)) > 0)) AS ns,
        |    len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS nt
        |  FROM documents)
        |SELECT doc_id, CAST(ns AS BIGINT) AS n_sentences,
        |  round(CASE WHEN ns = 0 THEN 0.0 ELSE CAST(nt AS DOUBLE) / ns END, 4) AS tokens_per_sentence,
        |  regexp_matches(text, '[.!?]\s*$') AS ends_terminal
        |FROM t ORDER BY doc_id""".stripMargin,
    // same exact counts, same one fixed double tree (prior scaled to the
    // corpus distribution), round(4) z, (z DESC, term) top-5 per source
    "text_keyness" ->
      """WITH occ AS (SELECT source, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
        |st AS (SELECT source, term, count(*) AS ysw FROM occ GROUP BY 1, 2),
        |tot AS (SELECT term, CAST(sum(ysw) AS BIGINT) AS yw FROM st GROUP BY term),
        |ps AS (SELECT source, CAST(sum(ysw) AS BIGINT) AS ns FROM st GROUP BY source),
        |g AS (SELECT CAST(sum(ysw) AS BIGINT) AS n FROM st),
        |z0 AS (SELECT st.source, st.term, st.ysw,
        |    100.0 * CAST(yw AS DOUBLE) / CAST(n AS DOUBLE) AS aw,
        |    CAST(st.ysw AS DOUBLE) AS ysd, CAST(yw AS DOUBLE) - CAST(st.ysw AS DOUBLE) AS yrd,
        |    CAST(ns AS DOUBLE) AS nsd, CAST(n AS DOUBLE) - CAST(ns AS DOUBLE) AS nrd
        |  FROM st JOIN tot USING (term) JOIN ps USING (source) CROSS JOIN g),
        |zz AS (SELECT source, term, ysw,
        |    round((ln((ysd + aw) / (nsd + 100.0 - ysd - aw)) - ln((yrd + aw) / (nrd + 100.0 - yrd - aw)))
        |      / sqrt(1.0 / (ysd + aw) + 1.0 / (yrd + aw)), 4) AS z
        |  FROM z0),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY z DESC, term) AS INT) AS rnk FROM zz)
        |SELECT source, term, CAST(ysw AS BIGINT) AS n_occ, z, rnk AS "rank"
        |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,
    // per-language marker occurrence counts in alphabetical language
    // order; dominant = first language at the max; entropy = the same
    // fixed 4-term tree
    "text_lang_mixture" -> {
      val langs = graft.textstats.TextAnalysis.LangMarkers.toSeq.sortBy(_._1)
      val hitDefs = langs.map { case (l, ms) =>
        s"len(list_filter(tk, t -> t IN (${ms.map(m => s"'$m'").mkString(",")}))) AS h_$l"
      }.mkString(", ")
      val totEx = langs.map(l => s"h_${l._1}").mkString(" + ")
      val topEx = langs.map(l => s"h_${l._1}")
        .reduce((a, b) => s"greatest($a, $b)")
      val nl = langs.map(l => s"CASE WHEN h_${l._1} > 0 THEN 1 ELSE 0 END")
        .mkString(" + ")
      val dom = langs.reverse.foldLeft("'und'") { case (acc, (l, _)) =>
        s"CASE WHEN top > 0 AND h_$l = top THEN '$l' ELSE $acc END"
      }
      val ent = langs.map { case (l, _) =>
        s"CASE WHEN h_$l > 0 THEN -(CAST(h_$l AS DOUBLE) / CAST(tot AS DOUBLE)) * ln(CAST(h_$l AS DOUBLE) / CAST(tot AS DOUBLE)) ELSE 0.0 END"
      }.mkString(" + ")
      s"""WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
         |h AS (SELECT doc_id, $hitDefs FROM t),
         |k AS (SELECT *, $totEx AS tot, $topEx AS top FROM h)
         |SELECT doc_id, CAST(tot AS BIGINT) AS n_marks,
         |  CAST($nl AS INT) AS n_langs,
         |  $dom AS dominant,
         |  round(CASE WHEN tot > 0 THEN CAST(top AS DOUBLE) / CAST(tot AS DOUBLE) ELSE 0.0 END, 4) AS top_share,
         |  round($ent, 4) AS mix_entropy
         |FROM k ORDER BY doc_id""".stripMargin
    },
    "text_quality_regression" -> qualityRegressionOracleSql,
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |tri AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3 THEN list_transform(generate_series(1, len(tk)-2),
        |          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) ELSE [] END) AS g FROM t),
        |ta AS (SELECT doc_id, count(*) AS n_tri, count(DISTINCT g) AS n_tri_d FROM tri GROUP BY doc_id),
        |big AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2 THEN list_transform(generate_series(1, len(tk)-1),
        |          i -> tk[i] || ' ' || tk[i+1]) ELSE [] END) AS g FROM t),
        |bc AS (SELECT doc_id, g, count(*) AS c FROM big GROUP BY doc_id, g),
        |ba AS (SELECT doc_id, max(c) AS max_big, sum(c) AS n_big FROM bc GROUP BY doc_id)
        |SELECT d.doc_id,
        |  round(coalesce(1.0 - CAST(n_tri_d AS DOUBLE)/n_tri, 0.0), 4) AS dup_trigram_frac,
        |  round(coalesce(CAST(max_big AS DOUBLE)/n_big, 0.0), 4) AS top_bigram_frac
        |FROM documents d LEFT JOIN ta USING (doc_id) LEFT JOIN ba USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id, list_distinct(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS tk FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_intersect(tk, ['der','die','das','und','ist'])) AS s_de,
        |  len(list_intersect(tk, ['the','a','of','and','is'])) AS s_en,
        |  len(list_intersect(tk, ['el','la','los','que','es'])) AS s_es,
        |  len(list_intersect(tk, ['le','la','les','et','est'])) AS s_fr FROM t),
        |g AS (SELECT doc_id, greatest(s_de, s_en, s_es, s_fr) AS best, s_de, s_en, s_es, s_fr FROM s)
        |SELECT doc_id, CASE WHEN best = 0 THEN 'und'
        |  WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
        |  WHEN s_es = best THEN 'es' ELSE 'fr' END AS lang_guess
        |FROM g ORDER BY doc_id""".stripMargin,
    // coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    // array_join is '' — a zero-token doc must fingerprint md5('') in
    // both engines (the edge-fixture `empty` corpus)
    "text_fingerprint" ->
      """SELECT doc_id, md5(coalesce(array_to_string(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+'), ' '), '')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_top_terms" ->
      """WITH tok AS (SELECT unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents)
        |SELECT term, count(*) AS n FROM tok GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin,
    // rank tables replayed from the same length histogram; every ratio is
    // an exact-integer division, gaps computed from UNROUNDED pcts
    "text_percentile_calib" ->
      """WITH l AS (SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS len
        |  FROM documents),
        |s AS (SELECT source, len, count(*) AS c FROM l GROUP BY 1, 2),
        |sr AS (SELECT source, len,
        |    COALESCE(sum(c) OVER (PARTITION BY source ORDER BY len
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_lt,
        |    sum(c) OVER (PARTITION BY source) AS n_src
        |  FROM s),
        |a AS (SELECT len, count(*) AS ca FROM l GROUP BY 1),
        |ar AS (SELECT len,
        |    COALESCE(sum(ca) OVER (ORDER BY len
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_all,
        |    sum(ca) OVER () AS n_all
        |  FROM a)
        |SELECT doc_id, l.source, l.len,
        |  round(CASE WHEN n_src > 1 THEN CAST(cum_lt AS DOUBLE)/(n_src - 1) ELSE 0.0 END, 6) AS pct_src,
        |  round(CASE WHEN n_all > 1 THEN CAST(cum_all AS DOUBLE)/(n_all - 1) ELSE 0.0 END, 6) AS pct_all,
        |  round(CASE WHEN n_src > 1 THEN CAST(cum_lt AS DOUBLE)/(n_src - 1) ELSE 0.0 END
        |      - CASE WHEN n_all > 1 THEN CAST(cum_all AS DOUBLE)/(n_all - 1) ELSE 0.0 END, 6) AS calibration_gap
        |FROM l JOIN sr ON sr.source = l.source AND sr.len = l.len
        |  JOIN ar ON ar.len = l.len
        |ORDER BY doc_id""".stripMargin,
    // length() = chars / strlen() = bytes on DuckDB; ratios are one
    // double division of exact long sums on both engines
    "text_utf8_stats" ->
      """WITH c AS (SELECT lang,
        |    CAST(length(text) AS BIGINT) AS chars,
        |    CAST(strlen(text) AS BIGINT) AS bytes,
        |    CAST(length(regexp_replace(text, '[^\x00-\x7F]', '', 'g')) AS BIGINT) AS ascii_chars
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(chars) AS BIGINT) AS total_chars,
        |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |  round(CAST(sum(bytes) AS DOUBLE) / CAST(sum(chars) AS BIGINT), 6) AS bytes_per_char,
        |  round(CAST(sum(chars) - sum(ascii_chars) AS DOUBLE) / CAST(sum(chars) AS BIGINT), 6) AS non_ascii_share
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin,
    // position self-join |d| in [1, window] == the zip_with arms; slot
    // table + hex8Int negative draw replayed with the same md5 strings
    "text_skipgram_pairs" ->
      """WITH tok AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |p AS (SELECT doc_id, unnest(tk) AS w, unnest(generate_series(1, len(tk))) AS pos FROM tok),
        |pos AS (SELECT a.w AS center, b.w AS context, CAST(count(*) AS BIGINT) AS n_cooc
        |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND abs(a.pos - b.pos) BETWEEN 1 AND 2
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |v AS (SELECT DISTINCT w FROM p),
        |nt AS (SELECT w AS negative,
        |    CAST(row_number() OVER (ORDER BY md5(w || ':' || '42'), w) - 1 AS BIGINT) AS slot
        |  FROM v),
        |vc AS (SELECT count(*) AS vv FROM nt),
        |ex AS (SELECT center, context, n_cooc, r.range AS i,
        |    CAST('0x' || substring(md5(center || ':' || context || ':' || CAST(r.range AS VARCHAR) || ':' || '42'), 1, 8) AS BIGINT) % vv AS slot
        |  FROM pos CROSS JOIN range(0, 2) r CROSS JOIN vc)
        |SELECT center, context, n_cooc, CAST(i AS INT) AS neg_idx, negative
        |FROM ex JOIN nt USING (slot)
        |ORDER BY center, context, neg_idx""".stripMargin,
    // same two regexp passes + trim; md5 compares the cleaned text
    "text_normalize" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_hash,
        |  n_chars AS chars_before,
        |  CAST(length(trim(regexp_replace(regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS chars_after
        |FROM documents ORDER BY doc_id""".stripMargin,
    // both medians over DOUBLE-cast integer lengths (identical
    // interpolation type); dev and 3*mad are exact IEEE on int-or-half
    // values, so the outlier CASE can never disagree across engines
    "text_mad_outliers" ->
      """WITH l AS (SELECT source,
        |    CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS DOUBLE) AS len
        |  FROM documents),
        |m AS (SELECT source, median(len) AS med FROM l GROUP BY source),
        |d AS (SELECT l.source, abs(len - med) AS dev, med FROM l JOIN m USING (source)),
        |md AS (SELECT source, median(dev) AS mad FROM d GROUP BY source)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  max(d.med) AS median_len, max(md.mad) AS mad,
        |  CAST(sum(CASE WHEN (CASE WHEN md.mad > 0 THEN dev > 3.0 * md.mad
        |                           ELSE dev > 0 END) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN md USING (source) GROUP BY source ORDER BY source""".stripMargin,
    // distinct (source, shingle) reduction, then per-shingle source-pair
    // counting (buckets bounded by the source count); zero-overlap pairs
    // absent via inner join on both engines
    "dedup_source_overlap" ->
      """WITH t AS (SELECT source, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |g AS (SELECT source, CASE WHEN len(tk) >= 3 THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) ELSE [] END AS shl FROM t),
        |s AS (SELECT DISTINCT source, shingle FROM (SELECT source, unnest(shl) AS shingle FROM g)),
        |sz AS (SELECT source, count(*) AS sz FROM s GROUP BY source),
        |io AS (SELECT a.source AS source_a, b.source AS source_b, CAST(count(*) AS BIGINT) AS inter
        |  FROM s a JOIN s b ON a.shingle = b.shingle AND a.source < b.source GROUP BY 1, 2)
        |SELECT source_a, source_b, inter,
        |  round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard,
        |  round(CAST(inter AS DOUBLE) / least(sa.sz, sb.sz), 6) AS containment
        |FROM io JOIN sz sa ON sa.source = source_a JOIN sz sb ON sb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,
    // mean_chars unrounded: exact-long sum / count is one identical
    // double division in both engines
    "text_source_stats" ->
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+'))) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars
        |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    "text_vocab_stats" ->
      """WITH tok AS (SELECT source, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
        |tc AS (SELECT source, term, count(*) AS n FROM tok GROUP BY 1, 2)
        |SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens, count(*) AS n_types,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  round(CAST(count(*) AS DOUBLE) / CAST(sum(n) AS BIGINT), 6) AS type_token_ratio,
        |  round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS hapax_share
        |FROM tc GROUP BY source ORDER BY source""".stripMargin,
    // Gopher rules: each flag replayed as the same exact-integer /
    // regexp-count arithmetic; mean word length sums integer lengths
    // (exact in double at any order), '#'/'...' counts via
    // regexp_extract_all (non-overlapping, same as split-1)
    "text_gopher_rules" ->
      """WITH t AS (SELECT source, text,
        |    regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |d AS (SELECT source, CAST(len(tk) AS BIGINT) AS w,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(tk, x -> len(x))) AS DOUBLE) / len(tk) END AS ml,
        |    CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS sy,
        |    len(list_filter(str_split(text, chr(10)), l -> len(l) > 0)) AS nl,
        |    len(list_filter(str_split(text, chr(10)), l -> len(l) > 0 AND regexp_matches(l, '^\s*[-*]'))) AS bl,
        |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS aw,
        |    CAST(len(list_intersect(list_distinct(tk), ['the','a','of','and','is'])) AS BIGINT) AS sh
        |  FROM t),
        |f AS (SELECT source,
        |    CASE WHEN w < 50 OR w > 100000 THEN 1 ELSE 0 END AS f_wc,
        |    CASE WHEN ml < 3.0 OR ml > 10.0 THEN 1 ELSE 0 END AS f_ml,
        |    CASE WHEN w > 0 AND CAST(sy AS DOUBLE)/w > 0.1 THEN 1 ELSE 0 END AS f_sr,
        |    CASE WHEN nl > 0 AND CAST(bl AS DOUBLE)/nl >= 0.9 THEN 1 ELSE 0 END AS f_bu,
        |    CASE WHEN w > 0 AND CAST(aw AS DOUBLE)/w < 0.8 THEN 1 ELSE 0 END AS f_aw,
        |    CASE WHEN sh < 2 THEN 1 ELSE 0 END AS f_sw
        |  FROM d)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(f_wc) AS BIGINT) AS fail_word_count,
        |  CAST(sum(f_ml) AS BIGINT) AS fail_mean_len,
        |  CAST(sum(f_sr) AS BIGINT) AS fail_symbol_ratio,
        |  CAST(sum(f_bu) AS BIGINT) AS fail_bullet_lines,
        |  CAST(sum(f_aw) AS BIGINT) AS fail_alpha_words,
        |  CAST(sum(f_sw) AS BIGINT) AS fail_stopwords,
        |  CAST(count(*) - sum(greatest(f_wc, f_ml, f_sr, f_bu, f_aw, f_sw)) AS BIGINT) AS n_keep,
        |  round(CAST(count(*) - sum(greatest(f_wc, f_ml, f_sr, f_bu, f_aw, f_sw)) AS DOUBLE) / count(*), 6) AS keep_rate
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    // readability: pure regexp counts -> exact long sums -> the two
    // formulas evaluate once per source in the same association order
    "text_readability" ->
      """WITH d AS (SELECT source,
        |    CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[aeiouy]+')) AS BIGINT) AS sy,
        |    greatest(CAST(1 AS BIGINT), CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS se
        |  FROM documents),
        |a AS (SELECT source, count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS words,
        |    CAST(sum(sy) AS BIGINT) AS syllables, CAST(sum(se) AS BIGINT) AS sentences
        |  FROM d WHERE w > 0 GROUP BY source)
        |SELECT source, n_docs, words, syllables, sentences,
        |  round(206.835 - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)) - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)), 4) AS flesch_ease,
        |  round(0.39 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)) + 11.8 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)) - 15.59, 4) AS fk_grade
        |FROM a ORDER BY source""".stripMargin,
    // Zipf fit: ln() on exact integers (the bm25 ln precedent), products
    // as single IEEE multiplies, SUMS as DECIMAL(28,18) (order-free),
    // one fixed double tree at the end — same discipline as the engine
    "text_zipf_fit" ->
      """WITH tok AS (SELECT source, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
        |tc AS (SELECT source, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |rk AS (SELECT source, cnt, row_number() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS r FROM tc),
        |xy AS (SELECT source, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y FROM rk WHERE r <= 200),
        |s AS (SELECT source, count(*) AS n,
        |    sum(CAST(x AS DECIMAL(28,18))) AS sx, sum(CAST(y AS DECIMAL(28,18))) AS sy,
        |    sum(CAST(x*x AS DECIMAL(28,18))) AS sxx, sum(CAST(x*y AS DECIMAL(28,18))) AS sxy,
        |    sum(CAST(y*y AS DECIMAL(28,18))) AS syy FROM xy GROUP BY source),
        |f AS (SELECT source, n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
        |    CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd FROM s),
        |g AS (SELECT source, n, nd, sxd, syd, sxyd, syyd,
        |    CASE WHEN nd*sxxd - sxd*sxd = 0 THEN 0.0
        |         ELSE (nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd) END AS slope FROM f)
        |SELECT source, CAST(n AS BIGINT) AS n_terms,
        |  round(slope, 6) AS zipf_slope,
        |  round((syd - slope*sxd) / nd, 6) AS zipf_intercept,
        |  round(CASE WHEN syyd - syd*syd/nd = 0 THEN 0.0
        |    ELSE (slope*(sxyd - sxd*syd/nd)) / (syyd - syd*syd/nd) END, 6) AS r2
        |FROM g ORDER BY source""".stripMargin,
    // Heaps curve: checkpoint bounds are pure INTEGER arithmetic (// not
    // /), cumulative counts via the bound range-join, beta over the 10
    // checkpoint rows with decimal sums; heaps_k uses the UNROUNDED beta
    "text_heaps_law" ->
      """WITH b0 AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
        |ck AS (SELECT i AS ckpt, lo + (hi - lo) * i // 10 AS bound FROM b0, range(1, 11) t(i)),
        |dt AS (SELECT doc_id, len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS ntok FROM documents),
        |fs AS (SELECT term, min(doc_id) AS first_doc FROM (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents) GROUP BY term),
        |ta AS (SELECT ckpt, bound, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens
        |  FROM dt JOIN ck ON doc_id <= bound GROUP BY 1, 2),
        |ty AS (SELECT ckpt, count(*) AS n_types FROM fs JOIN ck ON first_doc <= bound GROUP BY 1),
        |curve AS (SELECT ta.ckpt, bound, n_docs, n_tokens, n_types
        |  FROM ta JOIN ty ON ta.ckpt = ty.ckpt),
        |xy AS (SELECT ln(CAST(n_tokens AS DOUBLE)) AS x, ln(CAST(n_types AS DOUBLE)) AS y
        |  FROM curve WHERE n_tokens > 0),
        |s AS (SELECT count(*) AS n,
        |    sum(CAST(x AS DECIMAL(28,18))) AS sx, sum(CAST(y AS DECIMAL(28,18))) AS sy,
        |    sum(CAST(x*x AS DECIMAL(28,18))) AS sxx, sum(CAST(x*y AS DECIMAL(28,18))) AS sxy FROM xy),
        |f AS (SELECT CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
        |    CAST(sxy AS DOUBLE) AS sxyd FROM s),
        |g AS (SELECT nd, sxd, syd,
        |    CASE WHEN nd*sxxd - sxd*sxd = 0 THEN 0.0
        |         ELSE (nd*sxyd - sxd*syd) / (nd*sxxd - sxd*sxd) END AS beta FROM f)
        |SELECT ckpt, bound, n_docs, n_tokens, n_types,
        |  round(beta, 6) AS heaps_beta,
        |  round(exp((syd - beta*sxd) / nd), 6) AS heaps_k
        |FROM curve, g ORDER BY ckpt""".stripMargin,

    // decimal-exact per-dim sums -> rounded centroid coords -> pair
    // cosine; the VARCHAR hop is not needed because round(...,6) absorbs
    // DuckDB's occasional 1-ulp wide-decimal->DOUBLE cast
    "sim_label_centroids" ->
      """WITH e AS (SELECT label, embedding AS v FROM embeddings),
        |x AS (SELECT label, d, CAST(v[d] AS DECIMAL(28,18)) AS x
        |      FROM (SELECT label, v, unnest(generate_series(1, 64)) AS d FROM e)),
        |s AS (SELECT label, d, sum(x) AS s FROM x GROUP BY label, d),
        |n AS (SELECT label, count(*) AS n FROM e GROUP BY label),
        |c AS (SELECT s.label, d, round(CAST(s / n AS DOUBLE), 6) AS c
        |      FROM s JOIN n USING (label)),
        |dt AS (SELECT a.label AS label_a, b.label AS label_b, sum(a.c * b.c) AS dot
        |       FROM c a JOIN c b ON a.d = b.d AND a.label < b.label GROUP BY 1, 2),
        |nrm AS (SELECT label, sum(c * c) AS n2 FROM c GROUP BY label)
        |SELECT d.label_a, d.label_b, na.n AS n_a, nb.n AS n_b,
        |  round(d.dot / sqrt(xa.n2 * xb.n2), 4) AS cosine
        |FROM dt d JOIN nrm xa ON xa.label = d.label_a
        |  JOIN nrm xb ON xb.label = d.label_b
        |  JOIN n na ON na.label = d.label_a JOIN n nb ON nb.label = d.label_b
        |ORDER BY label_a, label_b""".stripMargin,

    // replays the top-3 BIGRAM tf-idf signature, then the feature-bucket
    // cosine: df-capped term join, dot over <= m rounded weights, norms
    // over the full top-m vector, rank on the ROUNDED cosine
    "sim_sparse_topk" ->
      """WITH t0 AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |tok AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1])) AS term
        |        FROM t0 WHERE len(tk) >= 2),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.term,
        |        round(tf * ln(CAST(n.n AS DOUBLE)/df), 4) AS tfidf
        |      FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, tfidf,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM s),
        |feats AS (SELECT doc_id, term, tfidf FROM r WHERE rn <= 3),
        |fdf AS (SELECT term FROM feats GROUP BY term HAVING count(*) <= 1000),
        |f2 AS (SELECT feats.* FROM feats JOIN fdf USING (term)),
        |dots AS (SELECT a.doc_id AS doc_id, b.doc_id AS neighbor_id,
        |           sum(a.tfidf * b.tfidf) AS dot
        |         FROM f2 a JOIN f2 b ON a.term = b.term AND a.doc_id != b.doc_id
        |         GROUP BY 1, 2),
        |norms AS (SELECT doc_id, sum(tfidf * tfidf) AS n2 FROM feats GROUP BY doc_id),
        |c AS (SELECT d.doc_id, d.neighbor_id,
        |        round(d.dot / sqrt(na.n2 * nb.n2), 4) AS cosine
        |      FROM dots d JOIN norms na ON na.doc_id = d.doc_id
        |        JOIN norms nb ON nb.doc_id = d.neighbor_id),
        |rk AS (SELECT doc_id, neighbor_id, cosine,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY cosine DESC, neighbor_id) AS rn
        |       FROM c WHERE cosine > 0)
        |SELECT doc_id, neighbor_id, cosine, CAST(rn AS INT) AS rn
        |FROM rk WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin,

    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.term,
        |        round(tf * ln(CAST(n.n AS DOUBLE)/df), 4) AS tfidf
        |      FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, tfidf,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM s)
        |SELECT doc_id, term, tfidf, CAST(rn AS INT) AS rn
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    // MLE bigram LM self-trained on the corpus: p(w2|w1) = c2/c1 where c1
    // sums c2 over bigrams with the same LEFT token (exact normalization);
    // docs with < 2 tokens carry NULL score
    "text_bigram_lm" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |occ AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
        |    THEN list_transform(generate_series(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1])
        |    ELSE [] END) AS bigram FROM t),
        |bc AS (SELECT bigram, count(*) AS c2 FROM occ GROUP BY bigram),
        |bcw AS (SELECT bigram, c2, split_part(bigram, ' ', 1) AS w1 FROM bc),
        |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM bcw GROUP BY w1),
        |sc AS (SELECT doc_id, ln(CAST(c2 AS DOUBLE)) - ln(CAST(c1 AS DOUBLE)) AS lp
        |       FROM occ JOIN bcw USING (bigram) JOIN c1 USING (w1)),
        |per AS (SELECT doc_id, count(*) AS nb, round(avg(lp), 4) AS avg_logp FROM sc GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams, avg_logp
        |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_cross_lm" ->
      """WITH t AS (SELECT doc_id, source, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |occ AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
        |    THEN list_transform(generate_series(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1])
        |    ELSE [] END) AS bigram FROM t),
        |rt AS (SELECT tk FROM t WHERE source = 'src0'),
        |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vs FROM (SELECT unnest(tk) AS w FROM rt)),
        |rocc AS (SELECT unnest(CASE WHEN len(tk) >= 2
        |    THEN list_transform(generate_series(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1])
        |    ELSE [] END) AS bigram FROM rt),
        |bc AS (SELECT bigram, count(*) AS c2 FROM rocc GROUP BY bigram),
        |bcw AS (SELECT bigram, c2, split_part(bigram, ' ', 1) AS w1 FROM bc),
        |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM bcw GROUP BY w1),
        |sc AS (SELECT doc_id,
        |    ln(CAST(coalesce(c2, 0) AS DOUBLE) + 1.0)
        |      - ln(CAST(coalesce(c1, 0) AS DOUBLE) + 1.0 * vs) AS lp,
        |    CASE WHEN c2 IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM occ
        |  LEFT JOIN bcw ON occ.bigram = bcw.bigram
        |  LEFT JOIN c1 ON split_part(occ.bigram, ' ', 1) = c1.w1
        |  CROSS JOIN v),
        |per AS (SELECT doc_id, count(*) AS nb, CAST(sum(oov) AS BIGINT) AS n_oov,
        |        round(avg(lp), 4) AS avg_logp FROM sc GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov, avg_logp
        |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin,
    // Stupid-backoff oracle: the same three-branch CASE over the same
    // integer count tables; alpha literals forced to DOUBLE (DuckDB would
    // otherwise fold 0.4*0.4 as exact DECIMAL and diverge from the
    // engine's IEEE product); round(4) absorbs ln's 1-ulp noise.
    "text_stupid_backoff" ->
      s"""WITH $stupidBackoffCtes
        |SELECT d.doc_id, CAST(coalesce(nt, 0) AS BIGINT) AS n_trigrams,
        |  CAST(coalesce(nb, 0) AS BIGINT) AS n_bi_backoff,
        |  CAST(coalesce(nu, 0) AS BIGINT) AS n_uni_backoff, avg_logp
        |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin,
    // CCNet head/middle/tail from the same LM chain; boundaries from the
    // per-(source, score) histogram, value-threshold cut (ties -> head)
    "text_perplexity_buckets" ->
      s"""WITH $stupidBackoffCtes,
        |base AS (SELECT t.doc_id, t.source, CAST(len(tk) AS BIGINT) AS ntok, per.avg_logp
        |  FROM t LEFT JOIN per ON t.doc_id = per.doc_id),
        |h AS (SELECT source, avg_logp, count(*) AS hd FROM base WHERE avg_logp IS NOT NULL GROUP BY 1, 2),
        |cm AS (SELECT source, avg_logp,
        |    CAST(sum(hd) OVER (PARTITION BY source ORDER BY avg_logp DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(hd) OVER (PARTITION BY source) AS BIGINT) AS n FROM h),
        |b AS (SELECT source,
        |    max(CASE WHEN cum >= ceil(n / 3.0) THEN avg_logp END) AS s1,
        |    max(CASE WHEN cum >= ceil(n * 2 / 3.0) THEN avg_logp END) AS s2
        |  FROM cm GROUP BY source),
        |a AS (SELECT base.source,
        |    CASE WHEN avg_logp IS NULL THEN 'no_lm'
        |         WHEN avg_logp >= s1 THEN 'head'
        |         WHEN avg_logp >= s2 THEN 'middle' ELSE 'tail' END AS bucket,
        |    ntok, avg_logp FROM base LEFT JOIN b ON base.source = b.source)
        |SELECT source, bucket, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  min(avg_logp) AS min_logp, max(avg_logp) AS max_logp
        |FROM a GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin,
    // Logistic-GD oracle: the same iters/lr interpolated from the engine
    // constants, each round unrolled CTE-by-CTE with the identical
    // decimal-exact gradient sums and the identical round(…,12) update;
    // the sigmoid literal 1.0 is exactly representable so DuckDB's
    // decimal-literal parsing cannot diverge from the double tree.
    "text_quality_classifier" -> (classifierScoredSql + "\nORDER BY doc_id"),
    "text_nb_classifier" -> nbOracleSql,
    // wraps the SAME NB replay; the matrix is a |C|^2 aggregate over it
    "text_nb_confusion" ->
      s"""WITH base AS ($nbOracleSql),
         |cm AS (SELECT source, pred, count(*) AS n FROM base GROUP BY 1, 2),
         |bt AS (SELECT source, sum(n) AS n_true FROM cm GROUP BY 1),
         |bp AS (SELECT pred, sum(n) AS n_pred FROM cm GROUP BY 1)
         |SELECT cm.source, cm.pred, CAST(cm.n AS BIGINT) AS n,
         |  round(CAST(cm.n AS DOUBLE) / bt.n_true, 4) AS recall_share,
         |  round(CAST(cm.n AS DOUBLE) / bp.n_pred, 4) AS precision_share
         |FROM cm JOIN bt USING (source) JOIN bp USING (pred)
         |ORDER BY cm.source, cm.pred""".stripMargin,
    // wraps the SAME classifier replay; ranks double to stay integral,
    // the cumulative window runs over one-row-per-distinct-score so its
    // frame is deterministic
    "text_classifier_auc" ->
      s"""WITH sc AS ($classifierScoredSql),
         |h AS (SELECT score, count(*) AS n,
         |        count(*) FILTER (WHERE label = 1) AS np
         |      FROM sc GROUP BY score),
         |c AS (SELECT score, n, np,
         |        COALESCE(sum(n) OVER (ORDER BY score
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |      FROM h),
         |agg AS (SELECT CAST(sum(np * (2 * cb + n + 1)) AS BIGINT) AS sum_ranks2,
         |          CAST(sum(np) AS BIGINT) AS n_pos,
         |          CAST(sum(n - np) AS BIGINT) AS n_neg
         |        FROM c)
         |SELECT n_pos, n_neg, sum_ranks2,
         |  CASE WHEN n_pos > 0 AND n_neg > 0
         |    THEN round(CAST(sum_ranks2 - n_pos * (n_pos + 1) AS DOUBLE) /
         |               (2.0 * n_pos * n_neg), 6) END AS auc
         |FROM agg""".stripMargin,
    // the classifier chain verbatim as a subquery, then the reliability
    // binning: DECIMAL(18,4) sums of the round(4) scores (order-
    // independent), one division + round per reported column
    "text_classifier_calibration" ->
      s"""WITH scored AS (
         |${classifierScoredSql}
         |)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(CAST(sum(CAST(score AS DECIMAL(18,4))) AS DOUBLE)/count(*), 4) AS mean_score,
         |  round(CAST(sum(label) AS DOUBLE)/count(*), 4) AS frac_positive,
         |  round(abs(CAST(sum(CAST(score AS DECIMAL(18,4))) AS DOUBLE)/count(*)
         |    - CAST(sum(label) AS DOUBLE)/count(*)), 4) AS gap
         |FROM (SELECT least(CAST(floor(score*10) AS INT), 9) AS bin, score, label FROM scored)
         |GROUP BY bin ORDER BY bin""".stripMargin,
    "text_chunk_seqs" ->
      """WITH t AS (SELECT lang AS shard, doc_id,
        |    CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS n
        |  FROM documents),
        |nz AS (SELECT * FROM t WHERE n > 0),
        |o AS (SELECT shard, doc_id, n,
        |    sum(n) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n AS s
        |  FROM nz),
        |sp AS (SELECT shard, doc_id, s, s + n AS e FROM o),
        |x AS (SELECT shard, doc_id, s, e,
        |    unnest(generate_series(CAST(s // 512 AS BIGINT), CAST((e - 1) // 512 AS BIGINT))) AS chunk_id
        |  FROM sp)
        |SELECT shard, chunk_id, doc_id,
        |  CAST(greatest(s, chunk_id * 512) - chunk_id * 512 AS BIGINT) AS start_in_chunk,
        |  CAST(least(e, (chunk_id + 1) * 512) - greatest(s, chunk_id * 512) AS BIGINT) AS n_toks
        |FROM x ORDER BY shard, chunk_id, doc_id""".stripMargin,
    // same integer-count derivation: dense source x support grid,
    // cumulative sums, KS gap as double division of exact integers
    "text_ks_drift" ->
      """WITH t AS (SELECT source, CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS n FROM documents),
        |per AS (SELECT source, n, count(*) AS c FROM t GROUP BY 1, 2),
        |support AS (SELECT DISTINCT n FROM per),
        |src AS (SELECT source, CAST(sum(c) AS BIGINT) AS src_total FROM per GROUP BY 1),
        |gn AS (SELECT n, CAST(sum(c) AS BIGINT) AS g FROM per GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS grand FROM per),
        |grid AS (SELECT s.source, s.src_total, sup.n, coalesce(p.c, 0) AS c, gn.g, tot.grand
        |  FROM src s CROSS JOIN support sup
        |  LEFT JOIN per p ON p.source = s.source AND p.n = sup.n
        |  JOIN gn ON gn.n = sup.n CROSS JOIN tot),
        |cum AS (SELECT source, src_total, grand, n,
        |    sum(c) OVER (PARTITION BY source ORDER BY n ROWS UNBOUNDED PRECEDING) AS cum_src,
        |    sum(g) OVER (PARTITION BY source ORDER BY n ROWS UNBOUNDED PRECEDING) AS cum_all
        |  FROM grid)
        |SELECT source, max(src_total) AS n_docs,
        |  round(max(abs(CAST(cum_src AS DOUBLE) / src_total
        |    - CAST(cum_all - cum_src AS DOUBLE) / (grand - src_total))), 6) AS ks_stat
        |FROM cum GROUP BY source ORDER BY source""".stripMargin,
    "text_len_quantiles" ->
      """WITH t AS (SELECT lang, CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS n_tokens FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  round(quantile_cont(n_tokens, 0.25), 4) AS p25,
        |  round(quantile_cont(n_tokens, 0.5), 4) AS p50,
        |  round(quantile_cont(n_tokens, 0.75), 4) AS p75
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "text_redact_pii" ->
      """WITH r AS (SELECT doc_id, translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS lt,
        |  regexp_replace(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+', '<EMAIL>', 'g') AS er FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(lt, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(er, '\+[0-9][0-9()\- ]+[0-9]')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(er, '\+[0-9][0-9()\- ]+[0-9]', '<PHONE>', 'g')) AS redacted_hash
        |FROM r ORDER BY doc_id""".stripMargin,
    // same md5(:7) shuffle key, (n-1)//16 length bands, shard from the
    // hex8Int contract % 4, row_number batches of 8
    "text_batch_plan" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR) || ':7') AS k
        |  FROM documents),
        |nz AS (SELECT doc_id, n_tokens, k,
        |    CAST((n_tokens - 1) // 16 AS INT) AS bucket,
        |    CAST(('0x' || substring(k, 1, 8))::BIGINT % 4 AS INT) AS shard
        |  FROM t WHERE n_tokens > 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY bucket, shard ORDER BY k, doc_id) AS rn FROM nz),
        |b AS (SELECT bucket, shard, CAST((rn - 1) // 8 AS BIGINT) AS batch_id, n_tokens FROM r)
        |SELECT bucket, shard, batch_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(max(n_tokens) AS BIGINT) AS max_tokens,
        |  round(1.0 - CAST(sum(n_tokens) AS DOUBLE)/CAST(count(*)*max(n_tokens) AS DOUBLE), 4) AS pad_frac
        |FROM b GROUP BY 1, 2, 3 ORDER BY bucket, shard, batch_id""".stripMargin,
    // three offset arms (the engine's zip_with slices) unioned, canonical
    // (least, greatest) pairs, corpus totals as 1-row sides
    "text_pmi_pairs" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |arm AS (SELECT least(p[1], p[2]) AS a, greatest(p[1], p[2]) AS b FROM (
        |    SELECT unnest(list_transform(generate_series(1, len(tk)-o), i -> [tk[i], tk[i+o]])) AS p
        |    FROM t, (SELECT unnest([1, 2, 3]) AS o) offs WHERE len(tk) > o)),
        |pc AS (SELECT a, b, count(*) AS c_ab FROM arm GROUP BY 1, 2),
        |tc AS (SELECT tt, count(*) AS c_t FROM (SELECT unnest(tk) AS tt FROM t) GROUP BY 1),
        |tp AS (SELECT CAST(sum(c_ab) AS BIGINT) AS tot_pairs FROM pc),
        |tn AS (SELECT CAST(sum(c_t) AS BIGINT) AS tot_toks FROM tc)
        |SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
        |  round(ln((CAST(c_ab AS DOUBLE)/tot_pairs) /
        |    ((CAST(ca.c_t AS DOUBLE)/tot_toks) * (CAST(cb.c_t AS DOUBLE)/tot_toks))), 4) AS pmi
        |FROM pc JOIN tc ca ON ca.tt = pc.a JOIN tc cb ON cb.tt = pc.b
        |  CROSS JOIN tp CROSS JOIN tn
        |WHERE c_ab >= 5
        |ORDER BY pmi DESC, a, b LIMIT 30""".stripMargin,
    // C4 bad-words replay: same tokenize, same ['dup','slow','big'] list,
    // membership via list_filter/list_intersect
    "text_blocklist_filter" ->
      """WITH t AS (SELECT doc_id, source, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents)
        |SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(tk, x -> list_contains(['dup','slow','big'], x))) AS BIGINT) AS n_hits,
        |  CAST(len(list_intersect(list_distinct(tk), ['dup','slow','big'])) AS BIGINT) AS n_blocked_terms,
        |  CASE WHEN len(list_filter(tk, x -> list_contains(['dup','slow','big'], x))) > 0
        |    THEN 'dropped' ELSE 'kept' END AS verdict
        |FROM t ORDER BY doc_id""".stripMargin,
    // novelty vs src0: the dedup_contamination trigram CTEs, flipped to
    // count the UNSEEN side; NULL novelty when a doc has no trigram
    "text_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, source, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |g AS (SELECT doc_id, source, CASE WHEN len(tk) >= 3 THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) ELSE [] END AS shl FROM t),
        |sh AS (SELECT doc_id, source, unnest(shl) AS g1 FROM g),
        |ref AS (SELECT DISTINCT g1 FROM sh WHERE source = 'src0'),
        |per AS (SELECT doc_id, count(*) AS n_ngrams,
        |        sum(CASE WHEN r.g1 IS NULL THEN 1 ELSE 0 END) AS n_novel
        |      FROM sh LEFT JOIN ref r USING (g1) WHERE sh.source <> 'src0' GROUP BY doc_id)
        |SELECT t.doc_id, t.source, CAST(coalesce(n_ngrams, 0) AS BIGINT) AS n_ngrams,
        |  CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
        |  CASE WHEN coalesce(n_ngrams, 0) > 0
        |    THEN round(CAST(n_novel AS DOUBLE)/n_ngrams, 4) END AS novelty
        |FROM t LEFT JOIN per USING (doc_id) WHERE t.source <> 'src0'
        |ORDER BY doc_id""".stripMargin,
    // same planted-card arithmetic (hash base, computed Luhn check,
    // off-by-one invalid), then the same 16-digit extraction + checksum
    "text_luhn_pii" ->
      """WITH base AS (SELECT doc_id, text,
        |    '4' || lpad(CAST((doc_id * 2654435761) % 100000000000000 AS VARCHAR), 14, '0') AS b
        |  FROM documents),
        |gen AS (SELECT doc_id, text, b,
        |    list_sum(list_transform(generate_series(0, 14), j ->
        |      CASE WHEN j % 2 = 0 THEN
        |        CASE WHEN CAST(substring(b, 15-j, 1) AS INT)*2 > 9
        |          THEN CAST(substring(b, 15-j, 1) AS INT)*2 - 9
        |          ELSE CAST(substring(b, 15-j, 1) AS INT)*2 END
        |      ELSE CAST(substring(b, 15-j, 1) AS INT) END)) AS s
        |  FROM base),
        |planted AS (SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0 THEN text || ' card ' || b || CAST((10 - s % 10) % 10 AS VARCHAR)
        |         WHEN doc_id % 9 = 1 THEN text || ' card ' || b || CAST(((10 - s % 10) % 10 + 1) % 10 AS VARCHAR)
        |         ELSE text END AS text
        |  FROM gen),
        |c AS (SELECT doc_id, unnest(regexp_extract_all(text, '[0-9]{16}')) AS cand FROM planted),
        |v AS (SELECT doc_id,
        |    CASE WHEN list_sum(list_transform(generate_series(0, 15), i ->
        |      CASE WHEN i % 2 = 1 THEN
        |        CASE WHEN CAST(substring(cand, 16-i, 1) AS INT)*2 > 9
        |          THEN CAST(substring(cand, 16-i, 1) AS INT)*2 - 9
        |          ELSE CAST(substring(cand, 16-i, 1) AS INT)*2 END
        |      ELSE CAST(substring(cand, 16-i, 1) AS INT) END)) % 10 = 0 THEN 1 ELSE 0 END AS ok
        |  FROM c)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(ok) AS BIGINT) AS n_valid
        |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // T5 denoising-plan replay: the hex8Int md5 coin per (doc, pos, seed
    // 17) at rate 15, then the same gaps-and-islands span merge
    "text_span_corruption" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |p AS (SELECT doc_id, unnest(generate_series(0, len(tk)-1)) AS pos FROM t WHERE len(tk) > 0),
        |m AS (SELECT doc_id, pos FROM p
        |  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR) || ':17'), 1, 8))::BIGINT % 100 < 15),
        |isl AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM m),
        |sp AS (SELECT doc_id, grp, min(pos) AS start_pos, max(pos) AS end_pos,
        |    count(*) AS span_len FROM isl GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_pos) AS BIGINT) AS span_id,
        |  CAST(start_pos AS INT) AS start_pos, CAST(end_pos AS INT) AS end_pos,
        |  CAST(span_len AS BIGINT) AS span_len
        |FROM sp ORDER BY doc_id, span_id""".stripMargin,
    // last chunk index floor((n-17)/48) for n>16 (a trailing chunk must add
    // >=1 new token); n_chunk_tokens from the slice bounds
    "text_chunks" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |b AS (SELECT doc_id, tk,
        |        CASE WHEN len(tk) <= 16 THEN 0 ELSE CAST(floor((len(tk)-17)/48.0) AS INT) END AS last_chunk
        |      FROM t WHERE len(tk) > 0),
        |c AS (SELECT doc_id, unnest(generate_series(0, last_chunk)) AS chunk_id, tk, len(tk) AS n FROM b)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  CAST(least(64, n - chunk_id*48) AS BIGINT) AS n_chunk_tokens,
        |  md5(array_to_string(list_slice(tk, chunk_id*48 + 1, chunk_id*48 + 64), ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "text_pack_bins" ->
      """WITH t AS (SELECT lang AS shard, doc_id,
        |  CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS n_tokens FROM documents),
        |o AS (SELECT shard, doc_id, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_offset FROM t)
        |SELECT shard, doc_id, n_tokens, start_offset,
        |  CAST(floor(start_offset/2048.0) AS BIGINT) AS bin_id
        |FROM o ORDER BY shard, doc_id""".stripMargin,
    "sim_ann_ivf_multi" ->
      """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |e1 AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
        |e AS (SELECT vec_id, label, list_transform(v, x -> x/nrm) AS u FROM e1),
        |c0 AS (SELECT vec_id, u, md5(CAST(vec_id AS VARCHAR) || ':7') AS ck FROM e ORDER BY ck, vec_id LIMIT 16),
        |c AS (SELECT row_number() OVER (ORDER BY ck, vec_id) AS cell_id, u AS cu FROM c0),
        |asg AS (SELECT vec_id, label, u, cell_id FROM (
        |  SELECT e.vec_id, e.label, e.u, c.cell_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.u, c.cu) DESC, c.cell_id) AS rn
        |  FROM e CROSS JOIN c) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, u AS qu FROM asg WHERE vec_id IN (0, 1, 2, 3)),
        |probe AS (SELECT query_id, cell_id, qu FROM (
        |  SELECT q.query_id, c.cell_id, q.qu,
        |         row_number() OVER (PARTITION BY q.query_id ORDER BY list_dot_product(q.qu, c.cu) DESC, c.cell_id) AS rn
        |  FROM q CROSS JOIN c) WHERE rn <= 4),
        |s AS (SELECT p.query_id, a.vec_id, a.label, round(list_dot_product(a.u, p.qu), 4) AS cosine
        |      FROM asg a JOIN probe p USING (cell_id)
        |      WHERE a.vec_id != p.query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn FROM s)
        |SELECT query_id, vec_id, label, cosine, CAST(rn AS INT) AS rn
        |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,
    "sim_ann_ivf" ->
      """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |e1 AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0),
        |e AS (SELECT vec_id, label, list_transform(v, x -> x/nrm) AS u FROM e1),
        |c0 AS (SELECT vec_id, u, md5(CAST(vec_id AS VARCHAR) || ':7') AS ck FROM e ORDER BY ck, vec_id LIMIT 16),
        |c AS (SELECT row_number() OVER (ORDER BY ck, vec_id) AS cell_id, u AS cu FROM c0),
        |asg AS (SELECT vec_id, label, u, cell_id FROM (
        |  SELECT e.vec_id, e.label, e.u, c.cell_id,
        |         row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.u, c.cu) DESC, c.cell_id) AS rn
        |  FROM e CROSS JOIN c) WHERE rn = 1),
        |q AS (SELECT u AS qu FROM asg WHERE vec_id = 0),
        |probe AS (SELECT cell_id FROM (
        |  SELECT c.cell_id, row_number() OVER (ORDER BY list_dot_product(q.qu, c.cu) DESC, c.cell_id) AS rn
        |  FROM q CROSS JOIN c) WHERE rn <= 4)
        |SELECT a.vec_id, a.label, round(list_dot_product(a.u, q.qu), 4) AS cosine
        |FROM asg a JOIN probe USING (cell_id) CROSS JOIN q
        |WHERE a.vec_id != 0
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "text_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '''[a-z]+|[a-z]+|[0-9]+|[^a-z0-9\s'']+')) AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // replays the full BPE training trajectory: same wrapped-symbol form
    // ('.h..e..y.'), same pair counting (zipped parallel unnests of the
    // offset list slices), same (count DESC, lhs, rhs) tie-break, same
    // single-replace() greedy merge — unrolled one CTE trio per round.
    "text_bpe_merges" -> {
      val n = 8
      val rounds = (1 to n).map { r =>
        s"""p$r AS (
           |  SELECT lhs, rhs, CAST(sum(freq) AS BIGINT) AS pair_count
           |  FROM (SELECT freq,
           |          unnest(els[1:len(els)-1]) AS lhs,
           |          unnest(els[2:len(els)]) AS rhs
           |        FROM (SELECT freq, string_split(substring(sym, 2, length(sym)-2), '..') AS els
           |              FROM w${r - 1}))
           |  GROUP BY 1, 2),
           |m$r AS (
           |  SELECT lhs, rhs, lhs || rhs AS merged, pair_count
           |  FROM p$r ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
           |w$r AS (
           |  SELECT replace(sym, '.' || lhs || '..' || rhs || '.', '.' || merged || '.') AS sym, freq
           |  FROM w${r - 1}, m$r)"""
      }.mkString(",\n")
      val sel = (1 to n).map(r =>
        s"SELECT CAST($r AS BIGINT) AS merge_round, lhs, rhs, merged, pair_count FROM m$r")
        .mkString("\nUNION ALL ")
      s"""WITH w0 AS (
         |  SELECT '.' || array_to_string(list_transform(range(1, length(term)+1),
         |           i -> substring(term, CAST(i AS INT), 1)), '..') || '.' AS sym,
         |         CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents)
         |  GROUP BY 1),
         |$rounds
         |SELECT * FROM ($sel) ORDER BY merge_round""".stripMargin
    },
    // the same 8-round unroll as text_bpe_merges, with a parallel
    // per-TERM symbol chain (v0..v8) receiving each round's replace, then
    // the per-doc rollup through the (doc_id, term, tf) frame
    "text_bpe_encode" -> {
      val n = 8
      val rounds = (1 to n).map { r =>
        s"""p$r AS (
           |  SELECT lhs, rhs, CAST(sum(freq) AS BIGINT) AS pair_count
           |  FROM (SELECT freq,
           |          unnest(els[1:len(els)-1]) AS lhs,
           |          unnest(els[2:len(els)]) AS rhs
           |        FROM (SELECT freq, string_split(substring(sym, 2, length(sym)-2), '..') AS els
           |              FROM w${r - 1}))
           |  GROUP BY 1, 2),
           |m$r AS (
           |  SELECT lhs, rhs, lhs || rhs AS merged, pair_count
           |  FROM p$r ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
           |w$r AS (
           |  SELECT replace(sym, '.' || lhs || '..' || rhs || '.', '.' || merged || '.') AS sym, freq
           |  FROM w${r - 1}, m$r),
           |v$r AS (
           |  SELECT term, replace(sym, '.' || lhs || '..' || rhs || '.', '.' || merged || '.') AS sym
           |  FROM v${r - 1}, m$r)"""
      }.mkString(",\n")
      s"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
         |w0 AS (
         |  SELECT '.' || array_to_string(list_transform(range(1, length(term)+1),
         |           i -> substring(term, CAST(i AS INT), 1)), '..') || '.' AS sym,
         |         CAST(count(*) AS BIGINT) AS freq
         |  FROM tok GROUP BY 1),
         |v0 AS (
         |  SELECT DISTINCT term, '.' || array_to_string(list_transform(range(1, length(term)+1),
         |           i -> substring(term, CAST(i AS INT), 1)), '..') || '.' AS sym
         |  FROM tok),
         |$rounds,
         |enc AS (SELECT term, len(string_split(substring(sym, 2, length(sym)-2), '..')) AS n_sym FROM v$n),
         |wc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
         |  CAST(sum(tf * n_sym) AS BIGINT) AS n_bpe_tokens,
         |  round(CAST(sum(tf * n_sym) AS DOUBLE) / sum(tf), 4) AS compression
         |FROM wc JOIN enc USING (term)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // the text_bpe_encode unroll with a per-prefix rollup: one curve row
    // per v_k chain, totals over the same (term, tf) frame
    "text_bpe_curve" -> {
      val n = 8
      val rounds = (1 to n).map { r =>
        s"""p$r AS (
           |  SELECT lhs, rhs, CAST(sum(freq) AS BIGINT) AS pair_count
           |  FROM (SELECT freq,
           |          unnest(els[1:len(els)-1]) AS lhs,
           |          unnest(els[2:len(els)]) AS rhs
           |        FROM (SELECT freq, string_split(substring(sym, 2, length(sym)-2), '..') AS els
           |              FROM w${r - 1}))
           |  GROUP BY 1, 2),
           |m$r AS (
           |  SELECT lhs, rhs, lhs || rhs AS merged, pair_count
           |  FROM p$r ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
           |w$r AS (
           |  SELECT replace(sym, '.' || lhs || '..' || rhs || '.', '.' || merged || '.') AS sym, freq
           |  FROM w${r - 1}, m$r),
           |v$r AS (
           |  SELECT term, replace(sym, '.' || lhs || '..' || rhs || '.', '.' || merged || '.') AS sym
           |  FROM v${r - 1}, m$r)"""
      }.mkString(",\n")
      val sel = (0 to n).map(k =>
        s"""SELECT CAST($k AS BIGINT) AS n_merges, CAST(sum(tf) AS BIGINT) AS n_words,
           |  CAST(sum(tf * len(string_split(substring(v.sym, 2, length(v.sym)-2), '..'))) AS BIGINT) AS n_tokens,
           |  round(CAST(sum(tf * len(string_split(substring(v.sym, 2, length(v.sym)-2), '..'))) AS DOUBLE) / sum(tf), 4) AS tokens_per_word
           |FROM wc JOIN v$k v USING (term) GROUP BY 1""".stripMargin)
        .mkString("\nUNION ALL ")
      s"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
         |w0 AS (
         |  SELECT '.' || array_to_string(list_transform(range(1, length(term)+1),
         |           i -> substring(term, CAST(i AS INT), 1)), '..') || '.' AS sym,
         |         CAST(count(*) AS BIGINT) AS freq
         |  FROM tok GROUP BY 1),
         |v0 AS (
         |  SELECT DISTINCT term, '.' || array_to_string(list_transform(range(1, length(term)+1),
         |           i -> substring(term, CAST(i AS INT), 1)), '..') || '.' AS sym
         |  FROM tok),
         |$rounds,
         |wc AS (SELECT term, count(*) AS tf FROM tok GROUP BY 1)
         |SELECT * FROM ($sel) ORDER BY n_merges""".stripMargin
    },
    "text_bigrams" ->
      """WITH t AS (SELECT regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |b AS (SELECT unnest(list_transform(generate_series(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1])) AS bigram
        |      FROM t WHERE len(tk) >= 2)
        |SELECT bigram, count(*) AS n FROM b GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "text_langid_confusion" ->
      """WITH t AS (SELECT doc_id, list_distinct(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS tk FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_intersect(tk, ['der','die','das','und','ist'])) AS s_de,
        |  len(list_intersect(tk, ['the','a','of','and','is'])) AS s_en,
        |  len(list_intersect(tk, ['el','la','los','que','es'])) AS s_es,
        |  len(list_intersect(tk, ['le','la','les','et','est'])) AS s_fr FROM t),
        |g0 AS (SELECT doc_id, greatest(s_de, s_en, s_es, s_fr) AS best, s_de, s_en, s_es, s_fr FROM s),
        |g AS (SELECT doc_id, CASE WHEN best = 0 THEN 'und'
        |  WHEN s_de = best THEN 'de' WHEN s_en = best THEN 'en'
        |  WHEN s_es = best THEN 'es' ELSE 'fr' END AS lang_guess FROM g0)
        |SELECT d.lang, g.lang_guess, count(*) AS n
        |FROM g JOIN documents d USING (doc_id)
        |GROUP BY d.lang, g.lang_guess ORDER BY d.lang, g.lang_guess""".stripMargin,

    // ASCII corpus (verified): char positions == byte positions, so
    // DuckDB's VARCHAR substr mirrors Spark's BINARY substring.
    // BYTE-true replay: the payload is encode(text) — UTF-8 BYTES, not
    // chars (unicode text has more bytes than chars; the edge-fixture
    // `unicode` gate). DuckDB can't substring a BLOB, so every byte slice
    // is a slice of hex(encode(text)) at 2 hex chars per byte — md5(text)
    // already hashes the UTF-8 bytes, matching Spark's md5(binary).
    "mm_meta" ->
      """WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS blen,
        |  hex(encode(text)) AS h, text FROM documents)
        |SELECT media_id, 'text' AS modality, CAST(blen AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash, substring(h, 1, 16) AS magic_prefix
        |FROM m ORDER BY media_id""".stripMargin,
    // even-stride byte sampling: position i reads byte floor(i*blen/32)+1
    "mm_resize" ->
      """WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS blen,
        |  hex(encode(text)) AS h FROM documents)
        |SELECT media_id, 'text' AS modality, CAST(blen AS BIGINT) AS n_bytes,
        |  array_to_string(list_transform(generate_series(0, 31),
        |    i -> substring(h, 2*CAST(floor(i*blen/32) AS INT) + 1, 2)), '') AS resized_hex
        |FROM m ORDER BY media_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS blen,
        |  hex(encode(text)) AS h FROM documents),
        |f AS (SELECT media_id, blen, h,
        |  unnest(generate_series(0, CAST(floor((blen-1)/64.0) AS INT))) AS frame_idx FROM m)
        |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        |  substring(h, frame_idx*128 + 1, 32) AS frame,
        |  CAST(length(substring(h, frame_idx*128 + 1, 32)) // 2 AS BIGINT) AS frame_bytes
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    // independent byte-level replay: re-assemble the same image hex, cut
    // it into per-position bytes (unnest over range), group to the exact
    // 256-bucket histogram, and recompute entropy = -sum((c/n)*ln(c/n))
    // and the nibble counts in SQL. width/height come from the corpus
    // formulas — ground truth the Spark side must RECOVER from the bytes
    // (decode inverts encode; the independent parse is mm_image_meta).
    "mm_features" -> {
      val hs = (0 until 16).map(i =>
        s"CAST(coalesce(sum(c) FILTER (WHERE b // 16 = $i), 0) AS BIGINT) AS h$i")
        .mkString(",\n|    ")
      s"""WITH base AS (
         |  SELECT doc_id AS media_id, doc_id % 2 = 0 AS is_png,
         |         CAST(doc_id % 509 + 16 AS INT) AS w,
         |         CAST((doc_id * 7) % 389 + 16 AS INT) AS h,
         |         CAST(doc_id % 11 AS INT) AS k
         |  FROM documents),
         |hb AS (
         |  SELECT media_id, is_png,
         |    CASE WHEN is_png THEN
         |      '89504E470D0A1A0A' || '0000000D' || '49484452' ||
         |      lpad(to_hex(w), 8, '0') || lpad(to_hex(h), 8, '0') || '0806000000' ||
         |      'DEADBEEF' || '0000000049454E44AE426082'
         |    ELSE
         |      'FFD8FFFE' || lpad(to_hex(k + 2), 4, '0') ||
         |      substring('4142434445464748494A4B', 1, k * 2) ||
         |      'FFC0000B08' || lpad(to_hex(h), 4, '0') || lpad(to_hex(w), 4, '0') ||
         |      '01011100FFD9'
         |    END AS hx
         |  FROM base),
         |bytes AS (
         |  SELECT media_id, CAST('0x' || substring(hx, CAST(2*p+1 AS INT), 2) AS INT) AS b
         |  FROM (SELECT media_id, hx, unnest(range(length(hx) // 2)) AS p FROM hb)),
         |counts AS (
         |  SELECT media_id, b, CAST(count(*) AS BIGINT) AS c
         |  FROM bytes GROUP BY 1, 2),
         |tot AS (
         |  SELECT media_id, CAST(sum(c) AS BIGINT) AS n_bytes
         |  FROM counts GROUP BY 1),
         |stats AS (
         |  SELECT media_id,
         |    round(-sum((CAST(c AS DOUBLE) / CAST(n_bytes AS DOUBLE))
         |               * ln(CAST(c AS DOUBLE) / CAST(n_bytes AS DOUBLE))), 4) AS entropy,
         |    $hs
         |  FROM counts JOIN tot USING (media_id) GROUP BY media_id)
         |SELECT media_id,
         |  CASE WHEN is_png THEN 'png' ELSE 'jpeg' END AS format,
         |  w AS width, h AS height, n_bytes, entropy,
         |  ${(0 until 16).map(i => s"h$i").mkString(", ")}
         |FROM stats JOIN tot USING (media_id) JOIN base USING (media_id)
         |ORDER BY media_id""".stripMargin
    },
    // independent byte-level parse: build the same hex, read PNG IHDR at
    // fixed offsets, walk JPEG marker segments with a recursive CTE (byte
    // b lives at hex chars 2b+1..2b+2; lengths/dims are big-endian ints
    // via '0x…' casts). The walk's last row is the SOFn frame header.
    "mm_image_meta" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id AS media_id, doc_id % 2 = 0 AS is_png,
        |         CAST(doc_id % 509 + 16 AS INT) AS w,
        |         CAST((doc_id * 7) % 389 + 16 AS INT) AS h,
        |         CAST(doc_id % 11 AS INT) AS k
        |  FROM documents),
        |hb AS (
        |  SELECT media_id, is_png,
        |    CASE WHEN is_png THEN
        |      '89504E470D0A1A0A' || '0000000D' || '49484452' ||
        |      lpad(to_hex(w), 8, '0') || lpad(to_hex(h), 8, '0') || '0806000000' ||
        |      'DEADBEEF' || '0000000049454E44AE426082'
        |    ELSE
        |      'FFD8FFFE' || lpad(to_hex(k + 2), 4, '0') ||
        |      substring('4142434445464748494A4B', 1, k * 2) ||
        |      'FFC0000B08' || lpad(to_hex(h), 4, '0') || lpad(to_hex(w), 4, '0') ||
        |      '01011100FFD9'
        |    END AS hx
        |  FROM base),
        |walk AS (
        |  SELECT media_id, hx, 2 AS pos FROM hb
        |  WHERE NOT is_png AND substring(hx, 1, 4) = 'FFD8'
        |  UNION ALL
        |  SELECT media_id, hx,
        |    CASE WHEN (m BETWEEN 208 AND 215) OR m = 1 THEN pos + 2
        |         ELSE pos + 2 + seglen END
        |  FROM (SELECT media_id, hx, pos,
        |          COALESCE(TRY_CAST('0x' || substring(hx, 2*pos+1, 2) AS INT), -1) AS ff,
        |          COALESCE(TRY_CAST('0x' || substring(hx, 2*pos+3, 2) AS INT), -1) AS m,
        |          COALESCE(TRY_CAST('0x' || substring(hx, 2*pos+5, 4) AS INT), -1) AS seglen
        |        FROM walk) s
        |  WHERE ff = 255 AND m >= 0
        |    AND NOT (m BETWEEN 192 AND 207 AND m NOT IN (196, 200, 204))
        |    AND m NOT IN (217, 218)
        |    AND (((m BETWEEN 208 AND 215) OR m = 1) OR seglen >= 2)),
        |jpeg AS (
        |  SELECT media_id, 'jpeg' AS format,
        |         CAST('0x' || substring(hx, 2*pos+15, 4) AS INT) AS width,
        |         CAST('0x' || substring(hx, 2*pos+11, 4) AS INT) AS height,
        |         CAST('0x' || substring(hx, 2*pos+9, 2) AS INT) AS bit_depth
        |  FROM walk
        |  WHERE COALESCE(TRY_CAST('0x' || substring(hx, 2*pos+1, 2) AS INT), -1) = 255
        |    AND COALESCE(TRY_CAST('0x' || substring(hx, 2*pos+3, 2) AS INT), -1)
        |          BETWEEN 192 AND 207
        |    AND TRY_CAST('0x' || substring(hx, 2*pos+3, 2) AS INT) NOT IN (196, 200, 204)),
        |png AS (
        |  SELECT media_id, 'png' AS format,
        |         CAST('0x' || substring(hx, 33, 8) AS INT) AS width,
        |         CAST('0x' || substring(hx, 41, 8) AS INT) AS height,
        |         CAST('0x' || substring(hx, 49, 2) AS INT) AS bit_depth
        |  FROM hb
        |  WHERE is_png AND substring(hx, 1, 16) = '89504E470D0A1A0A'
        |    AND substring(hx, 25, 8) = '49484452')
        |SELECT media_id, format, width, height, bit_depth
        |FROM (SELECT * FROM png UNION ALL SELECT * FROM jpeg)
        |ORDER BY media_id""".stripMargin,
    // independent byte-level parse: re-assemble the same WAV hex, then a
    // recursive-CTE RIFF chunk walk (advance = 8 + size + size%2 — the
    // even-boundary pad rule) locates `fmt ` and `data`; all multi-byte
    // fields are LITTLE-endian, read as positional byte sums. Durations
    // are exact integer divisions on both engines.
    "mm_audio_meta" -> {
      // LE u{16,32} read at byte offset `pos` of the hex string `hx`
      def le(pos: String, n: Int): String =
        (0 until n).map(i =>
          s"${1L << (8 * i)} * CAST('0x' || substring(hx, CAST(2*(($pos) + $i) + 1 AS INT), 2) AS BIGINT)")
          .mkString("(", " + ", ")")
      // LE hex encoding of value `v` over n bytes (assembly side)
      def leh(v: String, n: Int): String =
        (0 until n).map(i =>
          s"lpad(to_hex((($v) // ${1L << (8 * i)}) % 256), 2, '0')")
          .mkString(" || ")
      s"""WITH RECURSIVE base AS (
         |  SELECT doc_id AS media_id,
         |    CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
         |    CAST((doc_id % 3 + 1) * 8 AS BIGINT) AS bits,
         |    CAST(8000 + (doc_id % 5) * 11025 AS BIGINT) AS rate,
         |    CAST(doc_id % 7 AS BIGINT) AS k,
         |    CAST(doc_id % 9 + 1 AS BIGINT) AS ns,
         |    CAST((doc_id % 2 + 1) * (doc_id % 3 + 1) AS BIGINT) AS blk
         |  FROM documents),
         |hb AS (
         |  SELECT media_id,
         |    upper('52494646' || ${leh("4 + (8 + k + k % 2) + 24 + 8 + blk * ns", 4)} || '57415645' ||
         |    '4C495354' || ${leh("k", 4)} ||
         |    substring('41414141414141', 1, CAST(2*k AS INT)) ||
         |    CASE WHEN k % 2 = 1 THEN '00' ELSE '' END ||
         |    '666D7420' || ${leh("16", 4)} || ${leh("1", 2)} || ${leh("ch", 2)} ||
         |    ${leh("rate", 4)} || ${leh("rate * blk", 4)} || ${leh("blk", 2)} || ${leh("bits", 2)} ||
         |    '64617461' || ${leh("blk * ns", 4)} || repeat('00', CAST(blk * ns AS INT))) AS hx
         |  FROM base),
         |walk AS (
         |  SELECT media_id, hx, CAST(12 AS BIGINT) AS pos FROM hb
         |  WHERE substring(hx, 1, 8) = '52494646' AND substring(hx, 17, 8) = '57415645'
         |  UNION ALL
         |  SELECT media_id, hx, pos + 8 + sz + (sz % 2)
         |  FROM (SELECT media_id, hx, pos, ${le("pos + 4", 4)} AS sz FROM walk) s
         |  WHERE 2*(pos + 8) <= length(hx)),
         |fmtc AS (
         |  SELECT media_id,
         |    CAST(${le("pos + 8", 2)} AS INT) AS audio_format,
         |    CAST(${le("pos + 10", 2)} AS INT) AS channels,
         |    ${le("pos + 12", 4)} AS rate,
         |    ${le("pos + 20", 2)} AS blk,
         |    CAST(${le("pos + 22", 2)} AS INT) AS bits_per_sample
         |  FROM walk
         |  WHERE 2*(pos + 8) <= length(hx)
         |    AND substring(hx, CAST(2*pos + 1 AS INT), 8) = '666D7420'),
         |datac AS (
         |  SELECT media_id, ${le("pos + 4", 4)} AS data_size FROM walk
         |  WHERE 2*(pos + 8) <= length(hx)
         |    AND substring(hx, CAST(2*pos + 1 AS INT), 8) = '64617461')
         |SELECT media_id, 'wav' AS format, audio_format, channels,
         |  CAST(rate AS INT) AS sample_rate, bits_per_sample,
         |  CAST(data_size // blk AS BIGINT) AS n_samples,
         |  CAST((data_size // blk) * 1000 // rate AS BIGINT) AS duration_ms
         |FROM fmtc JOIN datac USING (media_id)
         |ORDER BY media_id""".stripMargin
    },
    // independent byte-level parse: re-assemble the same MP4 hex, walk the
    // top-level box list with a recursive CTE (64-bit largesize honored
    // when size == 1), then walk moov's children for mvhd (v0/v1 field
    // layouts) and the trak count. All reads are big-endian '0x' casts.
    "mm_video_meta" -> {
      def be(pos: String, nBytes: Int): String =
        s"CAST('0x' || substring(hx, CAST(2*($pos) + 1 AS INT), ${2 * nBytes}) AS BIGINT)"
      s"""WITH RECURSIVE base AS (
         |  SELECT doc_id AS media_id, doc_id % 3 = 0 AS v1,
         |    CAST(600 + (doc_id % 4) * 400 AS BIGINT) AS tsc,
         |    CAST((600 + (doc_id % 4) * 400) * (doc_id % 20 + 1) + doc_id % 37 AS BIGINT) AS dur,
         |    CAST(doc_id % 3 + 1 AS BIGINT) AS ntrk,
         |    CAST(doc_id % 13 AS BIGINT) AS f,
         |    doc_id % 5 = 0 AS lg
         |  FROM documents),
         |hb AS (
         |  SELECT media_id,
         |    upper('0000001066747970' || '69736F6D' || '00000000' ||
         |    CASE WHEN lg THEN '00000001' || '66726565' || lpad(to_hex(f + 16), 16, '0')
         |         ELSE lpad(to_hex(f + 8), 8, '0') || '66726565' END ||
         |    substring('414141414141414141414141', 1, CAST(2*f AS INT)) ||
         |    lpad(to_hex(CASE WHEN v1 THEN 128 ELSE 116 END + ntrk * 20), 8, '0') || '6D6F6F76' ||
         |    CASE WHEN v1 THEN '00000078' || '6D766864' || '01000000' || repeat('00', 16) ||
         |                      lpad(to_hex(tsc), 8, '0') || lpad(to_hex(dur), 16, '0')
         |         ELSE '0000006C' || '6D766864' || '00000000' || repeat('00', 8) ||
         |              lpad(to_hex(tsc), 8, '0') || lpad(to_hex(dur), 8, '0') END ||
         |    repeat('00', 80) ||
         |    repeat('000000147472616B0000000C6672656500000000', CAST(ntrk AS INT))) AS hx
         |  FROM base),
         |twalk AS (
         |  SELECT media_id, hx, CAST(0 AS BIGINT) AS pos FROM hb
         |  UNION ALL
         |  SELECT media_id, hx, pos + CASE WHEN s32 = 1 THEN s64 ELSE s32 END
         |  FROM (SELECT media_id, hx, pos, ${be("pos", 4)} AS s32,
         |          COALESCE(TRY_CAST('0x' || substring(hx, CAST(2*pos + 17 AS INT), 16) AS BIGINT), 0) AS s64
         |        FROM twalk) s
         |  WHERE 2*(pos + 8) <= length(hx)
         |    AND substring(hx, CAST(2*pos + 9 AS INT), 8) <> '6D6F6F76'),
         |moov AS (
         |  SELECT media_id, hx, pos, ${be("pos", 4)} AS msize FROM twalk
         |  WHERE 2*(pos + 8) <= length(hx)
         |    AND substring(hx, CAST(2*pos + 9 AS INT), 8) = '6D6F6F76'),
         |mwalk AS (
         |  SELECT media_id, hx, pos + 8 AS pos, pos + msize AS endp FROM moov
         |  UNION ALL
         |  SELECT media_id, hx, pos + ${be("pos", 4)}, endp
         |  FROM mwalk WHERE pos + 8 <= endp AND ${be("pos", 4)} >= 8),
         |children AS (
         |  SELECT media_id, hx, pos,
         |         substring(hx, CAST(2*pos + 9 AS INT), 8) AS btype
         |  FROM mwalk WHERE pos + 8 <= endp),
         |mvhd AS (
         |  SELECT media_id,
         |    CAST(${be("pos + 8", 1)} AS INT) AS mvhd_version,
         |    CASE WHEN ${be("pos + 8", 1)} = 1 THEN ${be("pos + 28", 4)}
         |         ELSE ${be("pos + 20", 4)} END AS timescale,
         |    CASE WHEN ${be("pos + 8", 1)} = 1 THEN ${be("pos + 32", 8)}
         |         ELSE ${be("pos + 24", 4)} END AS duration
         |  FROM children WHERE btype = '6D766864'),
         |trakc AS (
         |  SELECT media_id, CAST(count(*) FILTER (WHERE btype = '7472616B') AS INT) AS n_tracks
         |  FROM children GROUP BY media_id),
         |brand AS (
         |  SELECT media_id,
         |    CASE WHEN substring(hx, 17, 8) = '69736F6D' THEN 'isom' END AS brand
         |  FROM hb)
         |SELECT media_id, 'mp4' AS format, brand, mvhd_version,
         |  timescale, duration,
         |  CAST(duration * 1000 // timescale AS BIGINT) AS duration_ms, n_tracks
         |FROM mvhd JOIN trakc USING (media_id) JOIN brand USING (media_id)
         |ORDER BY media_id""".stripMargin
    },
    "samp_seeded" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS sample_key
        |FROM documents ORDER BY sample_key, doc_id LIMIT 100""".stripMargin,
    "samp_stratified" ->
      """WITH k AS (SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS sk FROM documents),
        |r AS (SELECT lang, doc_id,
        |        CAST(row_number() OVER (PARTITION BY lang ORDER BY sk, doc_id) AS INT) AS sample_rank
        |      FROM k)
        |SELECT lang, doc_id, sample_rank FROM r WHERE sample_rank <= 10
        |ORDER BY lang, sample_rank""".stripMargin,
    "samp_balanced" ->
      """WITH c AS (SELECT min(n) AS fl FROM (SELECT lang, count(*) AS n FROM documents GROUP BY lang)),
        |r AS (SELECT lang, doc_id,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY md5(CAST(doc_id AS VARCHAR) || ':17'), doc_id) AS rn
        |      FROM documents)
        |SELECT lang, doc_id FROM r CROSS JOIN c WHERE rn <= fl
        |ORDER BY lang, doc_id""".stripMargin,
    "sketch_cms_topk" -> cmsOracleSql,
    // the booleans are computed properties on the Spark side; the oracle
    // asserts them as literals plus the exact distinct count
    "sketch_hll_merge" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact,
        |  TRUE AS direct_within_5pct, TRUE AS merged_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "samp_hash_split" -> hashSplitOracleSql,
    // same A-ES ranking: u = (hex8(md5)+1)/2^32 exactly, ln-monotone key;
    // only the selected set is compared (see the query declaration)
    "samp_weighted" ->
      """WITH k AS (SELECT doc_id, n_chars,
        |  ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))::BIGINT + 1.0) / 4294967296.0)
        |    / CAST(n_chars AS DOUBLE) AS aes_key
        |  FROM documents WHERE n_chars > 0),
        |s AS (SELECT doc_id, n_chars FROM k ORDER BY aes_key DESC, doc_id LIMIT 50)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM s ORDER BY doc_id""".stripMargin,
    // grouped A-Res: the same ln-monotone key ranked PER LANGUAGE; the
    // declared set-compare (no key, no rank) is the samp_weighted argument
    "samp_reservoir" ->
      """WITH k AS (SELECT lang, doc_id, n_chars,
        |  ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))::BIGINT + 1.0) / 4294967296.0)
        |    / CAST(n_chars AS DOUBLE) AS aes_key
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY aes_key DESC, doc_id) AS rn
        |  FROM k)
        |SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
        |FROM r WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin,
    // same md5-uniform draw through the same interpolated inverse-CDF
    // ladder (Double.toString literals parse to the identical IEEE
    // double in both engines); k*revenue stays decimal until the end
    "samp_poisson_bootstrap" -> {
      import graft.sources.Sampling.PoissonCum
      val ladder = PoissonCum.zipWithIndex
        .map { case (c, i) => s"WHEN u < $c THEN ${i}::BIGINT" }
        .mkString(" ")
      s"""WITH f AS (SELECT l_returnflag, l_orderkey, l_linenumber, r AS replica,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
        |  FROM lineitem CROSS JOIN generate_series(0, 2) t(r)),
        |d AS (SELECT l_returnflag, replica, rev,
        |    ('0x' || substring(md5(l_orderkey || '_' || l_linenumber || '#' || replica), 1, 8))::BIGINT / 4294967296.0 AS u
        |  FROM f),
        |k AS (SELECT l_returnflag, replica, rev,
        |    CASE $ladder ELSE 7::BIGINT END AS k FROM d)
        |SELECT l_returnflag, replica, CAST(sum(k) AS BIGINT) AS boot_rows,
        |  CAST(sum(k * rev) AS DOUBLE) AS boot_revenue
        |FROM k GROUP BY 1, 2 ORDER BY l_returnflag, replica""".stripMargin
    },
    "bm25_stored" -> bm25OracleSql("('spark','join','window')"),
    "bm25_multi_stored" -> bm25MultiOracleSql,
    // BM25 over the phrase terms (same CTEs as bm25OracleSql) left-joined
    // to the phrase-occurrence replay (same chain as idx_phrase_stored);
    // boost multiplies the UNROUNDED sum, then one final round(4)
    "bm25_phrase_boost" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term IN ('row','column','sort') GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok WHERE term IN ('row','column','sort') GROUP BY term),
        |dl AS (SELECT doc_id, CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |scored AS (
        |  SELECT tf.doc_id,
        |         sum( ln(CAST(n AS DOUBLE)/df) * (2.0*tf) / (1.0*(0.25 + 0.75*dl/avgdl) + tf) ) AS score
        |  FROM tf JOIN dfq USING(term) JOIN dl USING(doc_id) CROSS JOIN stats
        |  GROUP BY tf.doc_id),
        |t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
        |p AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS pos, unnest(tk) AS term FROM t),
        |ph AS (SELECT p0.doc_id AS doc_id, count(*) AS n_occ
        |       FROM p p0
        |       JOIN p p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1 AND p1.term = 'column'
        |       JOIN p p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2 AND p2.term = 'sort'
        |       WHERE p0.term = 'row'
        |       GROUP BY 1)
        |SELECT s.doc_id,
        |  round(s.score * (1.0 + 0.5 * ln(1.0 + COALESCE(ph.n_occ, 0))), 4) AS doc_rank,
        |  CAST(COALESCE(ph.n_occ, 0) AS BIGINT) AS n_phrase
        |FROM scored s LEFT JOIN ph USING (doc_id)
        |ORDER BY doc_rank DESC, doc_id LIMIT 10""".stripMargin,
  )

  /** sketch_cms_topk oracle — the full CMS replay (same md5 hash family,
    * width, depth, top-k and min-fold), every parameter derived from the
    * operator's own constants (Sketches.DefaultCms*). */
  private def cmsOracleSql: String = {
    import graft.sketch.Sketches._
    val js = (0 until DefaultCmsDepth).mkString("[", ",", "]")
    s"""WITH tok AS (SELECT unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
       |tf AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
       |js AS (SELECT unnest($js) AS j),
       |tb AS (SELECT term, n, j,
       |         (('0x' || substring(md5(term || ':' || j), 1, 8))::BIGINT % $DefaultCmsWidth) AS bucket
       |       FROM tf CROSS JOIN js),
       |cms AS (SELECT j, bucket, sum(n) AS bn FROM tb GROUP BY j, bucket),
       |topk AS (SELECT term, n FROM tf ORDER BY n DESC, term LIMIT $DefaultCmsTopK),
       |est AS (SELECT t.term, t.n, min(c.bn) AS cms_n
       |        FROM topk t JOIN tb ON tb.term = t.term
       |        JOIN cms c ON c.j = tb.j AND c.bucket = tb.bucket
       |        GROUP BY t.term, t.n)
       |SELECT term, CAST(n AS BIGINT) AS true_n, CAST(cms_n AS BIGINT) AS cms_n,
       |       CAST(cms_n - n AS BIGINT) AS overcount
       |FROM est ORDER BY true_n DESC, term""".stripMargin
  }

  /** sketch_heavy_hitters oracle — the PLAIN group-by + HAVING
    * definition, no Misra-Gries logic: the MG guarantee (every key with
    * n > N/(cap+1) survives the summary) + the exact recount make the
    * pruning invisible, so the oracle needs only the threshold
    * t = N // (cap+1) + 1 derived from the operator's own capacity. */
  private def heavyHittersOracleSql: String = {
    val div = graft.sketch.Sketches.DefaultMgCapacity + 1
    s"""WITH tok AS (SELECT unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
       |tot AS (SELECT count(*) // $div + 1 AS t FROM tok),
       |cnt AS (SELECT term, count(*) AS n FROM tok GROUP BY term)
       |SELECT c.term, c.n, t.t AS hh_threshold
       |FROM cnt c CROSS JOIN tot t
       |WHERE c.n >= t.t
       |ORDER BY c.n DESC, c.term""".stripMargin
  }

  /** text_nb_classifier oracle — full NB replay: same md5 split
    * thresholds (Sampling constants), same add-one counts, and the same
    * micro-nat quantization (round(ln·1e6) → BIGINT), so every score is
    * an integer sum and the argmax cannot straddle an ulp. */
  private def nbOracleSql: String = {
    import graft.sources.Sampling._
    val (trainEnd, _) = splitThresholds(DefaultVal256, DefaultTest256)
    val sc = graft.textstats.TextAnalysis.NbScale
    s"""WITH sp AS (SELECT doc_id, source,
       |    regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk,
       |    substring(md5(CAST(doc_id AS VARCHAR) || ':$DefaultSplitSeed'), 1, 2) AS b
       |  FROM documents),
       |tr AS (SELECT * FROM sp WHERE b < '$trainEnd'),
       |ev AS (SELECT * FROM sp WHERE b >= '$trainEnd'),
       |ctn AS (SELECT source AS cls, term, count(*) AS n
       |        FROM (SELECT source, unnest(tk) AS term FROM tr) GROUP BY 1, 2),
       |tot AS (SELECT cls, sum(n) AS nc FROM ctn GROUP BY 1),
       |voc AS (SELECT count(DISTINCT term) AS v FROM ctn),
       |pri AS (SELECT source AS cls, count(*) AS nd FROM tr GROUP BY 1),
       |ndt AS (SELECT count(*) AS ndt FROM tr),
       |cl AS (SELECT t.cls,
       |    CAST(round(ln(CAST(1 AS DOUBLE) / (t.nc + voc.v)) * $sc, 0) AS BIGINT) AS lw0,
       |    CAST(round(ln(CAST(p.nd AS DOUBLE) / ndt.ndt) * $sc, 0) AS BIGINT) AS pw
       |  FROM tot t JOIN pri p USING (cls) CROSS JOIN voc CROSS JOIN ndt),
       |w AS (SELECT ctn.cls, ctn.term,
       |    CAST(round(ln(CAST(ctn.n + 1 AS DOUBLE) / (t.nc + voc.v)) * $sc, 0) AS BIGINT) AS lw
       |  FROM ctn JOIN tot t USING (cls) CROSS JOIN voc),
       |etc AS (SELECT doc_id, term, count(*) AS cnt
       |  FROM (SELECT doc_id, unnest(tk) AS term FROM ev)
       |  WHERE term IN (SELECT DISTINCT term FROM ctn) GROUP BY 1, 2),
       |s AS (SELECT etc.doc_id, c.cls, sum(etc.cnt * COALESCE(w.lw, c.lw0)) AS s
       |  FROM etc CROSS JOIN cl c LEFT JOIN w ON w.cls = c.cls AND w.term = etc.term
       |  GROUP BY 1, 2),
       |sc AS (SELECT e.doc_id, e.source, c.cls, c.pw + COALESCE(s.s, 0) AS score
       |  FROM ev e CROSS JOIN cl c LEFT JOIN s ON s.doc_id = e.doc_id AND s.cls = c.cls),
       |r AS (SELECT doc_id, source, cls, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
       |  FROM sc)
       |SELECT doc_id, source, cls AS pred, CAST(score AS BIGINT) AS score_unats,
       |  CASE WHEN source = cls THEN 1 ELSE 0 END AS correct
       |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** samp_hash_split oracle: thresholds AND seed derived from the SAME
    * constants as the operator defaults (Sampling.splitThresholds /
    * DefaultSplitSeed). */
  private def hashSplitOracleSql: String = {
    import graft.sources.Sampling._
    val (trainEnd, valEnd) = splitThresholds(DefaultVal256, DefaultTest256)
    s"""WITH k AS (SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR) || ':$DefaultSplitSeed'), 1, 2) AS b FROM documents)
       |SELECT doc_id,
       |  CASE WHEN b < '$trainEnd' THEN 'train' WHEN b < '$valEnd' THEN 'val' ELSE 'test' END AS split
       |FROM k ORDER BY doc_id""".stripMargin
  }

  /** Shared CTE chain: df-capped (<= 100) shingle universe, set sizes, and
    * pair intersection counts — mirroring Dedup's capped lineage exactly
    * (the cap applies before intersections AND sizes). */
  /** DuckDB replay of Similarity.jlProject (k=16 over 64 dims): component
    * j = the ascending-dim dot of `v` with the md5-derived Achlioptas
    * {-1,0,+1} plane (hex8 % 6 -> 0=+1, 1=-1, else 0) — shared by the
    * sim_jl_norms and sim_jl_distortion oracles so the plane derivation
    * can never desynchronize between them. */
  private val jlProjExpr: String =
    """list_transform(generate_series(0, 15), j ->
      |    list_sum(list_transform(generate_series(1, 64), d ->
      |      v[d] * CAST(CASE (('0x' || substring(md5('jl:' || CAST(j AS VARCHAR) || ':' || CAST(d-1 AS VARCHAR)), 1, 8))::BIGINT % 6)
      |        WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS DOUBLE))))""".stripMargin

  private def shingleCtesOver(src: String): String =
    s"""t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM $src),
       |g AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
       |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) ELSE [] END AS shl FROM t),
       |sh0 AS (SELECT doc_id, unnest(shl) AS shingle FROM g),
       |hot AS (SELECT shingle FROM (SELECT shingle, count(*) AS df FROM sh0 GROUP BY shingle) WHERE df > 100),
       |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2)""".stripMargin

  private val shingleCtes: String = shingleCtesOver("documents")

  /** Shared grid-spatial CTE prefix for ev_geo_pairs / ev_geo_knn: the
    * md5-derived integer points, 64-wide cell assignment, and 3x3
    * neighborhood expansion. One spelling so a seed or cell-size retune
    * can't desynchronize the two oracles (round-5 advice). */
  private val geoGridCtes: String =
    """u AS (SELECT DISTINCT user_id FROM events),
      |p AS (SELECT user_id,
      |    ('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':17'), 1, 8))::BIGINT % 1024 AS x,
      |    ('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':23'), 1, 8))::BIGINT % 1024 AS y
      |  FROM u),
      |c AS (SELECT user_id, x, y, x // 64 AS cx, y // 64 AS cy FROM p),
      |n AS (SELECT user_id, x, y, cx + dx.d AS ncx, cy + dy.d AS ncy
      |  FROM c, (SELECT unnest([-1, 0, 1]) AS d) dx, (SELECT unnest([-1, 0, 1]) AS d) dy)""".stripMargin

  /** Exact n-gram-Jaccard pair oracle over the capped shingle universe. */
  /** dedup_edit_pairs oracle, generated from the SAME constants as the
    * Spark operator's defaults (Dedup.DefaultEdit*) so a retune can't
    * desynchronize the two sides. ASCII normalization mirrors the operator:
    * DuckDB's levenshtein counts BYTES where Spark counts codepoints, so
    * on ASCII-only input the metrics coincide exactly. */
  private def editDistOracleSql: String = {
    import graft.dedup.Dedup._
    s"""WITH d AS (SELECT doc_id, regexp_replace(lower(text), '[^\\x00-\\x7F]', '', 'g') AS t FROM documents),
       |b AS (SELECT doc_id, substring(t, 1, $DefaultEditPrefixLen) AS pref,
       |             substring(t, 1, $DefaultEditBlockChars) || '|' || CAST(floor(length(t)/$DefaultEditLengthBand) AS BIGINT) AS block
       |      FROM d),
       |cap AS (SELECT block FROM b GROUP BY block HAVING count(*) > $DefaultMaxShingleDf)
       |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
       |       CAST(levenshtein(a.pref, c.pref) AS BIGINT) AS edit_dist
       |FROM b a JOIN b c USING (block)
       |WHERE a.doc_id < c.doc_id AND a.block NOT IN (SELECT block FROM cap)
       |  AND levenshtein(a.pref, c.pref) <= $DefaultEditMaxDist
       |ORDER BY id_a, id_b""".stripMargin
  }

  private def jaccardOracleSql(minJaccard: Double): String =
    s"""WITH $shingleCtes
       |SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter), 4) AS jaccard
       |FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= $minJaccard
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Quality-regression oracle: the same exact-BIGINT sums and the same
    * post-aggregation double expression tree, term by term (association
    * order matters — both engines evaluate the identical IEEE tree, which
    * is what makes the doubles hash-equal); markers interpolate from
    * TextAnalysis.LangMarkers so a list change cannot desynchronize. */
  private def qualityRegressionOracleSql: String = {
    val markers = graft.textstats.TextAnalysis.LangMarkers("en")
      .map(m => s"'$m'").mkString(", ")
    s"""WITH f AS (SELECT source,
       |    CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS x,
       |    CAST(len(list_filter(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+'), t -> t IN ($markers))) AS BIGINT) AS y
       |  FROM documents),
       |tot AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy FROM f),
       |ab AS (SELECT n, sx, sy,
       |    CASE WHEN CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) = 0.0 THEN 0.0
       |         ELSE (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
       |              / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) END AS slope
       |  FROM tot),
       |ab2 AS (SELECT slope, (CAST(sy AS DOUBLE) - slope*CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept FROM ab),
       |s AS (SELECT source, count(*) AS ns, CAST(sum(x) AS BIGINT) AS sxs, CAST(sum(y) AS BIGINT) AS sys,
       |    CAST(sum(x*x) AS BIGINT) AS sxxs, CAST(sum(x*y) AS BIGINT) AS sxys, CAST(sum(y*y) AS BIGINT) AS syys
       |  FROM f GROUP BY source)
       |SELECT source, ns AS n_docs, round(slope, 6) AS slope, round(intercept, 6) AS intercept,
       |  round((CAST(sys AS DOUBLE) - slope*CAST(sxs AS DOUBLE) - intercept*CAST(ns AS DOUBLE)) / CAST(ns AS DOUBLE), 6) AS mean_resid,
       |  round(sqrt(greatest(CAST(syys AS DOUBLE) - 2.0*slope*CAST(sxys AS DOUBLE) - 2.0*intercept*CAST(sys AS DOUBLE) + CAST(ns AS DOUBLE)*intercept*intercept + 2.0*slope*intercept*CAST(sxs AS DOUBLE) + slope*slope*CAST(sxxs AS DOUBLE), 0.0) / CAST(ns AS DOUBLE)), 6) AS rmse
       |FROM s CROSS JOIN ab2 ORDER BY source""".stripMargin
  }

  /** Postings-compression oracle: same block-local delta (lag over
    * (term, block)) and the same integer varint byte thresholds; the
    * block width interpolates from InvertedIndex.PostingsBlockWidth. */
  private def postingsCompressionOracleSql: String = {
    val bw = graft.index.InvertedIndex.PostingsBlockWidth
    s"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
       |d AS (SELECT DISTINCT doc_id, term FROM tok),
       |e AS (SELECT term, doc_id, doc_id // $bw AS block,
       |        coalesce(doc_id - lag(doc_id) OVER (PARTITION BY term, doc_id // $bw ORDER BY doc_id), doc_id) AS gap
       |      FROM d),
       |v AS (SELECT term, block,
       |        CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
       |             WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
       |             ELSE 5 END AS vb
       |      FROM e)
       |SELECT term, count(*) AS df, CAST(count(*) * 8 AS BIGINT) AS raw_bytes,
       |  CAST(sum(vb) AS BIGINT) AS varint_bytes,
       |  count(DISTINCT block) AS n_blocks,
       |  round(CAST(sum(vb) AS DOUBLE) / (count(*) * 8), 4) AS ratio
       |FROM v GROUP BY term ORDER BY term""".stripMargin
  }

  /** Bloom triage oracle: replays the md5 position arithmetic (6-hex
    * windows -> BIGINT mod m) with m/k interpolated from Dedup's
    * constants; bit set = distinct positions over even-id hashes. */
  /** Winnow CTEs shared by the fingerprint and pair oracles: per-token
    * md5-prefix hashes, the degree-(k-1) polynomial window hashes
    * (unrolled here — the same values the operator's O(n) rolling update
    * produces), then the frame-min selection with the packed
    * (hash, rightmost-pos) key. Every constant is interpolated from
    * Dedup / RollingHashExpr so a retune cannot desynchronize the sides. */
  private def winnowCtes: String = {
    import graft.dedup.Dedup.{DefaultWinnowK, DefaultWinnowW, WinnowPosBase}
    import graft.functions.RollingHashExpr.{HashB, HashM}
    val k = DefaultWinnowK
    val w = DefaultWinnowW
    val poly = (1 until k).foldLeft("hs[p]") { (acc, j) =>
      s"(($acc)*$HashB + hs[p+$j]) % $HashM"
    }
    val pb = WinnowPosBase
    s"""t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
       |th AS (SELECT doc_id, list_transform(tk, x -> ('0x' || substring(md5(x), 1, 8))::BIGINT % $HashM) AS hs
       |       FROM t WHERE len(tk) >= $k),
       |wh AS (SELECT doc_id, p - 1 AS pos, $poly AS h
       |       FROM (SELECT doc_id, hs, unnest(generate_series(1, len(hs) - ${k - 1})) AS p FROM th)),
       |sel AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY doc_id) AS n,
       |          min(h*$pb + (${pb - 1} - pos)) OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS sel
       |        FROM wh),
       |fp AS (SELECT DISTINCT doc_id, ${pb - 1} - (sel % $pb) AS fp_pos, sel // $pb AS fp
       |       FROM sel WHERE pos <= greatest(n - $w, 0))""".stripMargin
  }

  private def winnowFingerprintOracleSql: String =
    s"""WITH $winnowCtes
       |SELECT doc_id, CAST(fp_pos AS BIGINT) AS fp_pos, CAST(fp AS BIGINT) AS fp
       |FROM fp ORDER BY doc_id, fp_pos""".stripMargin

  private def winnowPairsOracleSql: String = {
    import graft.dedup.Dedup.{DefaultMaxShingleDf, DefaultWinnowMinJaccard}
    s"""WITH $winnowCtes,
       |fps AS (SELECT DISTINCT doc_id, fp FROM fp),
       |hot AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM fps GROUP BY fp) WHERE df > $DefaultMaxShingleDf),
       |f2 AS (SELECT * FROM fps WHERE fp NOT IN (SELECT fp FROM hot)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM f2 GROUP BY doc_id),
       |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter), 4) AS jaccard
       |FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= $DefaultWinnowMinJaccard
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Line-dedup oracle: replants the same header/footer chrome (strings
    * interpolated from Dedup), splits on newline positionally, counts
    * line df by DISTINCT doc over md5 hashes, then rebuilds the cleaned
    * text in line order. string_agg skips removed (NULL) lines exactly
    * like the Spark side's collect_list; coalesce('') keeps the
    * all-lines-removed doc at md5('') on both sides. */
  private def lineDedupOracleSql: String = {
    import graft.dedup.Dedup.{BoilerplateFooter, BoilerplateHeader, DefaultLineMinDf}
    s"""WITH base AS (SELECT doc_id,
       |    CASE WHEN doc_id % 2 = 0 THEN '$BoilerplateHeader' || chr(10) ELSE '' END
       |    || text ||
       |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || '$BoilerplateFooter' ELSE '' END AS text
       |  FROM documents),
       |ls AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM base),
       |l0 AS (SELECT doc_id, p - 1 AS line_id, ls[p] AS line
       |       FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS p FROM ls)),
       |l AS (SELECT * FROM l0 WHERE length(trim(line)) > 0),
       |hot AS (SELECT h FROM (SELECT md5(line) AS h, count(DISTINCT doc_id) AS df
       |                       FROM l GROUP BY 1) WHERE df >= $DefaultLineMinDf),
       |t AS (SELECT doc_id, line_id, line, md5(line) IN (SELECT h FROM hot) AS dup FROM l)
       |SELECT doc_id, count(*) AS n_lines,
       |  CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |  md5(coalesce(string_agg(CASE WHEN NOT dup THEN line END, chr(10) ORDER BY line_id), '')) AS cleaned_hash
       |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private def bloomOracleSql: String = {
    import graft.dedup.Dedup.{DefaultBloomBits, DefaultBloomHashes}
    val idx = (0 until DefaultBloomHashes).map(i => s"($i)").mkString(", ")
    s"""WITH k AS (SELECT * FROM (VALUES $idx) AS t(i)),
       |store AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
       |bits AS (SELECT DISTINCT ('0x' || substring(h, i*6 + 1, 6))::BIGINT % $DefaultBloomBits AS pos
       |         FROM store CROSS JOIN k),
       |probe AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1
       |          UNION ALL
       |          SELECT doc_id + 800000000, md5(text) FROM documents WHERE doc_id % 50 = 0),
       |pp AS (SELECT DISTINCT doc_id, ('0x' || substring(h, i*6 + 1, 6))::BIGINT % $DefaultBloomBits AS pos
       |       FROM probe CROSS JOIN k),
       |np AS (SELECT doc_id, count(*) AS np FROM pp GROUP BY doc_id),
       |nh AS (SELECT doc_id, count(*) AS nhit FROM pp JOIN bits USING (pos) GROUP BY doc_id),
       |sh AS (SELECT DISTINCT h FROM store)
       |SELECT p.doc_id,
       |  CAST(coalesce(nhit, 0) = np.np AS INT) AS bloom_maybe,
       |  CAST(p.h IN (SELECT h FROM sh) AS INT) AS exact_dup,
       |  CAST(coalesce(nhit, 0) = np.np AND p.h NOT IN (SELECT h FROM sh) AS INT) AS false_positive
       |FROM probe p JOIN np USING (doc_id) LEFT JOIN nh USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Containment oracle: replants the first-half excerpt docs (identical
    * space-word slice arithmetic, constants interpolated from Dedup so a
    * retune cannot desynchronize the sides), then runs the same capped
    * shingle chain over the widened corpus with the min-size scorer. */
  private def containmentOracleSql: String = {
    s"""WITH $excerptCorpusCtes,
       |${shingleCtesOver("corpus")}
       |SELECT doc_a, doc_b,
       |  round(CAST(inter AS DOUBLE)/least(sa.sz, sb.sz), 4) AS containment,
       |  round(CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter), 4) AS jaccard
       |FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE CAST(inter AS DOUBLE)/least(sa.sz, sb.sz) >= 0.9
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Excerpt-fixture CTE prefix shared by the containment / prefix-join /
    * CDC-shared oracles: replants the first-half excerpt docs with the
    * identical space-word slice arithmetic (constants interpolated from
    * Dedup). Yields a `corpus(doc_id, text)` relation. */
  private def excerptCorpusCtes: String = {
    import graft.dedup.Dedup.{DefaultExcerptEvery, ExcerptKeyBase}
    s"""sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |ex AS (SELECT doc_id + $ExcerptKeyBase AS doc_id,
       |         array_to_string(w[1:greatest(len(w)//2, 1)], ' ') AS text
       |       FROM sp WHERE doc_id % $DefaultExcerptEvery = 0),
       |corpus AS (SELECT doc_id, text FROM documents UNION ALL SELECT * FROM ex)""".stripMargin
  }

  /** Trigram stupid-backoff LM chain (t -> occp -> count tables -> sc ->
    * per) — shared by text_stupid_backoff (per-doc report) and
    * text_perplexity_buckets (CCNet head/middle/tail over the same
    * scores), so a constant retune cannot desynchronize them. */
  private def stupidBackoffCtes: String =
    """t AS (SELECT doc_id, source, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
      |occ AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
      |    THEN list_transform(generate_series(1, len(tk)-2), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
      |    ELSE [] END) AS tri FROM t),
      |occp AS (SELECT doc_id, tri,
      |    split_part(tri, ' ', 1) || ' ' || split_part(tri, ' ', 2) AS w12,
      |    split_part(tri, ' ', 2) || ' ' || split_part(tri, ' ', 3) AS w23,
      |    split_part(tri, ' ', 2) AS w2, split_part(tri, ' ', 3) AS w3 FROM occ),
      |rt AS (SELECT tk FROM t WHERE source = 'src0'),
      |c3 AS (SELECT tri, count(*) AS c3 FROM (SELECT unnest(CASE WHEN len(tk) >= 3
      |    THEN list_transform(generate_series(1, len(tk)-2), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
      |    ELSE [] END) AS tri FROM rt) GROUP BY tri),
      |c2 AS (SELECT bi, count(*) AS c2 FROM (SELECT unnest(CASE WHEN len(tk) >= 2
      |    THEN list_transform(generate_series(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1])
      |    ELSE [] END) AS bi FROM rt) GROUP BY bi),
      |c1 AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(tk) AS w FROM rt) GROUP BY w),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(DISTINCT w) AS BIGINT) AS v
      |  FROM (SELECT unnest(tk) AS w FROM rt)),
      |sc AS (SELECT doc_id,
      |    CASE WHEN c3.c3 IS NOT NULL THEN ln(CAST(c3.c3 AS DOUBLE) / CAST(p2.c2 AS DOUBLE))
      |         WHEN s2.c2 IS NOT NULL THEN ln(CAST(0.4 AS DOUBLE) * (CAST(s2.c2 AS DOUBLE) / CAST(m1.c1 AS DOUBLE)))
      |         ELSE ln(CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE) *
      |              ((CAST(coalesce(l1.c1, 0) AS DOUBLE) + 1.0) / (CAST(n AS DOUBLE) + CAST(v AS DOUBLE)))) END AS lp,
      |    CASE WHEN c3.c3 IS NOT NULL THEN 0 WHEN s2.c2 IS NOT NULL THEN 1 ELSE 2 END AS lvl
      |  FROM occp
      |  LEFT JOIN c3 ON occp.tri = c3.tri
      |  LEFT JOIN c2 p2 ON occp.w12 = p2.bi
      |  LEFT JOIN c2 s2 ON occp.w23 = s2.bi
      |  LEFT JOIN c1 m1 ON occp.w2 = m1.w
      |  LEFT JOIN c1 l1 ON occp.w3 = l1.w
      |  CROSS JOIN tot),
      |per AS (SELECT doc_id, count(*) AS nt,
      |    CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
      |    CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS nu,
      |    round(avg(lp), 4) AS avg_logp FROM sc GROUP BY doc_id)""".stripMargin

  /** rel_zorder_skipping oracle: the identical md5-derived dims, the
    * 32-term unrolled Morton interleave (integer div/mod arithmetic —
    * DuckDB's `//` on BIGINT equals Spark's shift/mask on non-negative
    * inputs), the same range-bucket file assignment, and the same 8-box
    * min/max pruning test. */
  private def zorderOracleSql: String = {
    def ileave(src: String, off: Int): String =
      (0 until 16).map(i =>
        s"((($src // ${1L << i}) % 2) * ${1L << (2 * i + off)})")
        .mkString(" + ")
    s"""WITH d AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
       |    ('0x'||substring(md5(l_orderkey||'x'||l_linenumber),1,8))::BIGINT % 65536 AS x,
       |    ('0x'||substring(md5(l_orderkey||'y'||l_linenumber),1,8))::BIGINT % 65536 AS y
       |  FROM lineitem),
       |z AS (SELECT ok, ln, x, y, ${ileave("x", 0)} + ${ileave("y", 1)} AS zaddr FROM d),
       |fl AS (SELECT x, y,
       |    (ok*8+ln) // ((SELECT (max(ok*8+ln)+1) // 64 + 1 FROM z)) AS file_nat,
       |    zaddr // 67108864 AS file_z FROM z),
       |boxes AS (SELECT k AS pred_id, k*8192 AS x0, k*8192+12287 AS x1,
       |    8192 AS y0, 40959 AS y1 FROM generate_series(0,7) t(k)),
       |nstat AS (SELECT file_nat AS f, min(x) xmin, max(x) xmax, min(y) ymin, max(y) ymax FROM fl GROUP BY 1),
       |zstat AS (SELECT file_z AS f, min(x) xmin, max(x) xmax, min(y) ymin, max(y) ymax FROM fl GROUP BY 1),
       |ncnt AS (SELECT pred_id, count(*) AS files_nat FROM boxes JOIN nstat
       |    ON x0 <= xmax AND x1 >= xmin AND y0 <= ymax AND y1 >= ymin GROUP BY 1),
       |zcnt AS (SELECT pred_id, count(*) AS files_z FROM boxes JOIN zstat
       |    ON x0 <= xmax AND x1 >= xmin AND y0 <= ymax AND y1 >= ymin GROUP BY 1)
       |SELECT b.pred_id, COALESCE(files_nat, 0) AS files_nat, COALESCE(files_z, 0) AS files_z
       |FROM boxes b LEFT JOIN ncnt USING (pred_id) LEFT JOIN zcnt USING (pred_id)
       |ORDER BY pred_id""".stripMargin
  }

  /** dedup_prefix_jaccard oracle: the prefix filter is LOSSLESS, so the
    * oracle needs none of it — it spells the DEFINITION the operator must
    * match: collapse identical (uncapped) shingle sets to their min-doc_id
    * representative, then exact Jaccard >= t between representatives.
    * Threshold interpolated from Dedup so a retune cannot desynchronize
    * the sides. */
  private def prefixJaccardOracleSql: String = {
    import graft.dedup.Dedup.DefaultPrefixMinJaccard
    s"""WITH $excerptCorpusCtes,
       |t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM corpus),
       |g AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN list_distinct(list_transform(generate_series(1, len(tk)-2),
       |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) ELSE [] END AS shl FROM t),
       |sh0 AS (SELECT doc_id, unnest(shl) AS shingle FROM g),
       |sig AS (SELECT doc_id, md5(string_agg(shingle, '|' ORDER BY shingle)) AS sg FROM sh0 GROUP BY doc_id),
       |rp AS (SELECT sg, min(doc_id) AS rep FROM sig GROUP BY sg),
       |rsh AS (SELECT doc_id AS rep, shingle FROM sh0 WHERE doc_id IN (SELECT rep FROM rp)),
       |sizes AS (SELECT rep, count(*) AS sz FROM rsh GROUP BY rep),
       |shared AS (SELECT a.rep AS rep_a, b.rep AS rep_b, count(*) AS inter
       |  FROM rsh a JOIN rsh b ON a.shingle = b.shingle AND a.rep < b.rep GROUP BY 1, 2)
       |SELECT rep_a, rep_b,
       |  round(CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter), 4) AS jaccard
       |FROM shared JOIN sizes sa ON sa.rep = rep_a JOIN sizes sb ON sb.rep = rep_b
       |WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= $DefaultPrefixMinJaccard
       |ORDER BY rep_a, rep_b""".stripMargin
  }

  /** CDC chunk CTE chain over `src`: token md5-prefix hashes, unrolled
    * degree-(k-1) polynomial window hashes (the winnowCtes spelling),
    * boundary positions where hash % mask == 0, then chunk ranges from
    * the boundary list. Every constant interpolated from Dedup /
    * RollingHashExpr. Yields `ch(doc_id, chunk_idx, start_tok, n_tokens,
    * chunk_md5)`. */
  private def cdcChunkCtesOver(src: String): String = {
    import graft.dedup.Dedup.{DefaultCdcK, DefaultCdcMask}
    import graft.functions.RollingHashExpr.{HashB, HashM}
    val k = DefaultCdcK
    val poly = (1 until k).foldLeft("hs[p]") { (acc, j) =>
      s"(($acc)*$HashB + hs[p+$j]) % $HashM"
    }
    s"""t AS (SELECT doc_id, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM $src),
       |th AS (SELECT doc_id, tk, list_transform(tk, x -> ('0x' || substring(md5(x), 1, 8))::BIGINT % $HashM) AS hs FROM t),
       |wh AS (SELECT doc_id, tk,
       |         CASE WHEN len(tk) >= $k THEN
       |           list_transform(generate_series(1, len(tk) - ${k - 1}), p -> $poly)
       |         ELSE [] END AS ws FROM th),
       |bnd AS (SELECT doc_id, tk,
       |          list_transform(list_filter(generate_series(1, len(ws)),
       |            p -> ws[p] % $DefaultCdcMask = 0), p -> p + ${k - 2}) AS bs
       |        FROM wh),
       |se AS (SELECT doc_id, tk,
       |         list_prepend(0, list_transform(bs, b -> b + 1)) AS starts,
       |         list_append(bs, len(tk) - 1) AS ends FROM bnd),
       |ch AS (SELECT doc_id, ci - 1 AS chunk_idx, starts[ci] AS start_tok,
       |         ends[ci] - starts[ci] + 1 AS n_tokens,
       |         md5(array_to_string(tk[starts[ci]+1:ends[ci]+1], ' ')) AS chunk_md5
       |       FROM (SELECT doc_id, tk, starts, ends,
       |               unnest(generate_series(1, len(starts))) AS ci FROM se)
       |       WHERE starts[ci] <= ends[ci])""".stripMargin
  }

  private def cdcChunksOracleSql: String =
    s"""WITH ${cdcChunkCtesOver("documents")}
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(start_tok AS BIGINT) AS start_tok,
       |  CAST(n_tokens AS BIGINT) AS n_tokens, chunk_md5
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  private def cdcSharedOracleSql: String =
    s"""WITH $excerptCorpusCtes,
       |${cdcChunkCtesOver("corpus")}
       |SELECT chunk_md5, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  count(DISTINCT doc_id) AS df, min(doc_id) AS first_doc
       |FROM ch GROUP BY chunk_md5, n_tokens
       |HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY chunk_md5""".stripMargin

  /** KMV sketch CTE chain: distinct per-source BIGRAM hashes (hex8Int
    * spelling), per-source bottom-k rank. Constants from Sketches. */
  private def kmvCtes: String = {
    import graft.sketch.Sketches.DefaultKmvK
    s"""tk0 AS (SELECT source, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents),
       |tok AS (SELECT source, unnest(CASE WHEN len(tk) >= 2
       |    THEN list_transform(generate_series(1, len(tk)-1), i -> tk[i] || ' ' || tk[i+1])
       |    ELSE [] END) AS term FROM tk0),
       |dh AS (SELECT DISTINCT source, ('0x' || substring(md5(term), 1, 8))::BIGINT AS h FROM tok),
       |rkd AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk FROM dh),
       |sk AS (SELECT source, h FROM rkd WHERE rk <= $DefaultKmvK)""".stripMargin
  }

  private def kmvVocabOracleSql: String = {
    import graft.sketch.Sketches.DefaultKmvK
    val k = DefaultKmvK
    s"""WITH $kmvCtes,
       |s AS (SELECT source, count(*) AS n, max(h) AS mk FROM sk GROUP BY source),
       |e AS (SELECT DISTINCT source, term FROM tok),
       |x AS (SELECT source, count(*) AS exact_distinct FROM e GROUP BY source)
       |SELECT x.source, exact_distinct,
       |  round(CASE WHEN n < $k THEN CAST(n AS DOUBLE)
       |             ELSE ${k - 1} * 4294967296.0 / mk END, 4) AS kmv_est
       |FROM x JOIN s USING (source) ORDER BY source""".stripMargin
  }

  private def kmvOverlapOracleSql: String = {
    import graft.sketch.Sketches.DefaultKmvK
    val k = DefaultKmvK
    s"""WITH $kmvCtes,
       |ss AS (SELECT DISTINCT source FROM sk),
       |pr AS (SELECT a.source AS sa, b.source AS sb FROM ss a JOIN ss b ON a.source < b.source),
       |u AS (SELECT sa, sb, h, max(ina) AS ina, max(inb) AS inb FROM (
       |        SELECT pr.sa, pr.sb, k1.h, 1 AS ina, 0 AS inb FROM pr JOIN sk k1 ON k1.source = pr.sa
       |        UNION ALL
       |        SELECT pr.sa, pr.sb, k2.h, 0, 1 FROM pr JOIN sk k2 ON k2.source = pr.sb)
       |      GROUP BY 1, 2, 3),
       |r2 AS (SELECT *, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk FROM u),
       |est AS (SELECT sa, sb, count(*) AS kk, max(h) AS uk, sum(ina * inb) AS m
       |        FROM r2 WHERE rk <= $k GROUP BY 1, 2),
       |e AS (SELECT DISTINCT source, term FROM tok),
       |xi AS (SELECT a.source AS sa, b.source AS sb, count(*) AS exact_inter
       |       FROM e a JOIN e b ON a.term = b.term AND a.source < b.source GROUP BY 1, 2)
       |SELECT est.sa AS source_a, est.sb AS source_b,
       |  coalesce(exact_inter, 0) AS exact_inter,
       |  round((CAST(m AS DOUBLE) / kk) *
       |    CASE WHEN kk < $k THEN CAST(kk AS DOUBLE)
       |         ELSE ${k - 1} * 4294967296.0 / uk END, 4) AS kmv_inter,
       |  round(CAST(m AS DOUBLE) / kk, 4) AS kmv_jaccard
       |FROM est LEFT JOIN xi ON est.sa = xi.sa AND est.sb = xi.sb
       |ORDER BY source_a, source_b""".stripMargin
  }

  /** mm_phash_pairs oracle: replants the one-char-perturbed copies, then
    * rebuilds every 64-bit dHash from the payload's hex bytes — segment
    * sums by integer floor-division bounds, adjacent-mean comparison by
    * cross-multiplication, the identical arithmetic as PHashExpr (all
    * constants interpolated) — and thresholds Hamming over ALL pairs,
    * with NO band blocking: the operator's pruning must be invisible. */
  private def phashCtes: String = {
    import graft.functions.PHashExpr.Segments
    import graft.multimodal.Multimodal.{DefaultPerturbEvery, PerturbKeyBase}
    val sg = Segments
    s"""corpus AS (SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + $PerturbKeyBase, 'q' || substring(text, 2)
       |  FROM documents WHERE doc_id % $DefaultPerturbEvery = 0),
       |pc AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM corpus),
       |pb AS (SELECT doc_id, n,
       |         -- one LINEAR regex pass per doc: per-byte substring() is
       |         -- a char-position scan from the string head, quadratic on
       |         -- a megabyte doc (the 100k-token edge fixture ran hours)
       |         list_transform(regexp_extract_all(hx, '..'),
       |           x -> ('0x' || x)::BIGINT) AS bytes
       |       FROM pc WHERE n >= $sg),
       |segs AS (SELECT doc_id,
       |         list_transform(generate_series(1, $sg),
       |           j -> list_aggregate(bytes[((j-1)*n//$sg)+1:(j*n//$sg)], 'sum')) AS s,
       |         list_transform(generate_series(1, $sg),
       |           j -> (j*n//$sg) - ((j-1)*n//$sg)) AS c
       |       FROM pb),
       |ph AS (SELECT doc_id,
       |         list_aggregate(list_transform(generate_series(33, $sg - 1),
       |           j -> CASE WHEN s[j]*c[j+1] > s[j+1]*c[j]
       |                THEN 1::BIGINT << (j-33) ELSE 0::BIGINT END), 'sum') AS hi,
       |         list_aggregate(list_transform(generate_series(1, 32),
       |           j -> CASE WHEN s[j]*c[j+1] > s[j+1]*c[j]
       |                THEN 1::BIGINT << (j-1) ELSE 0::BIGINT END), 'sum') AS lo
       |       FROM segs)""".stripMargin
  }

  private def phashPairsOracleSql: String = {
    import graft.multimodal.Multimodal.DefaultPHashMaxHamming
    s"""WITH $phashCtes
       |SELECT a.doc_id AS media_a, b.doc_id AS media_b,
       |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
       |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= $DefaultPHashMaxHamming
       |ORDER BY media_a, media_b""".stripMargin
  }

  /** mm_phash_clusters oracle: the phash pair set (unbanded, all-pairs —
    * the blocking must be invisible), then the recursive-CTE transitive
    * closure with min-id labels, the clusterCtes discipline. */
  private def phashClustersOracleSql: String = {
    import graft.multimodal.Multimodal.DefaultPHashMaxHamming
    s"""WITH RECURSIVE $phashCtes,
       |pr AS (SELECT a.doc_id AS ma, b.doc_id AS mb
       |  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= $DefaultPHashMaxHamming),
       |edges AS (SELECT ma AS src, mb AS dst FROM pr UNION SELECT mb, ma FROM pr),
       |reach(src, dst) AS (SELECT src, dst FROM edges
       |  UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |clusters AS (SELECT src AS media_id, CAST(least(src, min(dst)) AS BIGINT) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT media_id, cluster_id FROM clusters ORDER BY media_id""".stripMargin
  }

  /** Jaccard >= 0.5 pairs -> undirected edges -> transitive closure; the
    * recursive CTE is the oracle for the engine's min-label propagation. */
  private val clusterCtes: String =
    s"""$shingleCtes,
       |pairs AS (SELECT doc_a, doc_b
       |  FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.5),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(src, dst) AS (SELECT src, dst FROM edges
       |  UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |clusters AS (SELECT src AS doc_id, CAST(least(src, min(dst)) AS BIGINT) AS cluster_id
       |  FROM reach GROUP BY src)""".stripMargin

  /** Multi-query BM25 oracle — shared by the recompute (bm25_multi) and
    * stored (bm25_multi_stored) declarations: stored ≡ recompute. */
  private val bm25MultiOracleSql: String =
    """WITH q AS (SELECT * FROM (VALUES (1, 'spark'), (1, 'join'), (1, 'window'), (2, 'batch'), (2, 'stream')) AS t(query_id, term)),
      |tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term IN ('spark','join','window','batch','stream') GROUP BY doc_id, term),
      |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok WHERE term IN ('spark','join','window','batch','stream') GROUP BY term),
      |dl AS (SELECT doc_id, CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS dl FROM documents),
      |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
      |scored AS (
      |  SELECT q.query_id, tf.doc_id,
      |         sum( ln(CAST(n AS DOUBLE)/df) * (2.0*tf) / (1.0*(0.25 + 0.75*dl.dl/avgdl) + tf) ) AS score
      |  FROM tf JOIN q USING(term) JOIN dfq USING(term) JOIN dl USING(doc_id) CROSS JOIN stats
      |  GROUP BY q.query_id, tf.doc_id),
      |r AS (SELECT query_id, doc_id, round(score, 4) AS doc_rank,
      |        row_number() OVER (PARTITION BY query_id ORDER BY round(score, 4) DESC, doc_id) AS rn FROM scored)
      |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, doc_rank, CAST(rn AS INT) AS rn
      |FROM r WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin

  /** BM25 oracle pipeline (k1=1, b=0.75, raw ln(N/df) idf — app/query.py:131-135). */
  /** bm25OracleSql with the per-term champion restriction: the tf CTE
    * keeps only each term's top-m postings by (tf desc, doc_id); df and
    * the doc/corpus stats stay TRUE corpus values, like the operator. */
  private def bm25ChampionOracleSql(termsInList: String, m: Int): String =
    s"""WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
       |tf0 AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term IN $termsInList GROUP BY doc_id, term),
       |tf AS (SELECT doc_id, term, tf FROM (
       |         SELECT doc_id, term, tf,
       |           row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS r
       |         FROM tf0) WHERE r <= $m),
       |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok WHERE term IN $termsInList GROUP BY term),
       |dl AS (SELECT doc_id, CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS dl FROM documents),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
       |scored AS (
       |  SELECT tf.doc_id,
       |         sum( ln(CAST(n AS DOUBLE)/df) * (2.0*tf) / (1.0*(0.25 + 0.75*dl/avgdl) + tf) ) AS score
       |  FROM tf JOIN dfq USING(term) JOIN dl USING(doc_id) CROSS JOIN stats
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, round(score, 4) AS doc_rank FROM scored
       |ORDER BY doc_rank DESC, doc_id LIMIT 10""".stripMargin

  /** The 3 unrolled Lloyd rounds every kmeans-backed oracle replays
    * (assignment rank-1, per-dim decimal sums, renormalized centroids
    * with empty-cell carry) — ONE spelling shared by semantic dedup,
    * IVF-PQ, and cell pruning so the replays cannot drift. */
  private lazy val kmeansRoundsSql: String = (1 to 3).map { t =>
    val prev = if (t == 1) "ct0" else s"ct${t - 1}"
    s"""a$t AS (SELECT vec_id, u, cell_id FROM (
       |  SELECT e.vec_id, e.u, c.cell_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY list_dot_product(e.u, c.cu) DESC, c.cell_id) AS rn
       |  FROM e CROSS JOIN $prev c) WHERE rn = 1),
       |s$t AS (SELECT cell_id, d, CAST(sum(CAST(u[d] AS DECIMAL(28,18))) AS DOUBLE) AS sd
       |        FROM a$t, generate_series(1, 64) g(d) GROUP BY cell_id, d),
       |m$t AS (SELECT cell_id, list(sd ORDER BY d) AS m FROM s$t GROUP BY cell_id),
       |ct$t AS (SELECT p.cell_id,
       |           COALESCE(list_transform(m$t.m, x -> x / sqrt(list_dot_product(m$t.m, m$t.m))), p.cu) AS cu
       |         FROM $prev p LEFT JOIN m$t USING (cell_id))""".stripMargin
  }.mkString(",\n")

  /** The trained-classifier replay (GD rounds unrolled CTE-by-CTE),
    * WITHOUT a final ORDER BY so it serves both as the declared
    * text_quality_classifier oracle (order appended) and as the scored
    * subquery of the calibration report. */
  private lazy val classifierScoredSql: String = {
    val iters = TextAnalysis.ClassifierIters
    val markers = TextAnalysis.LangMarkers("en")
      .map(m => s"'$m'").mkString(", ")
    val sig = (w: String) =>
      s"1.0/(1.0+exp(-($w.w0 + $w.w1*x1 + $w.w2*x2)))"
    val rounds = (1 to iters).map { t =>
      val prev = s"ww${t - 1}"
      s"""gg$t AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  CAST(sum(CAST((${sig(prev)} - y) AS DECIMAL(28,18))) AS DOUBLE) AS g0,
         |  CAST(sum(CAST((${sig(prev)} - y) * x1 AS DECIMAL(28,18))) AS DOUBLE) AS g1,
         |  CAST(sum(CAST((${sig(prev)} - y) * x2 AS DECIMAL(28,18))) AS DOUBLE) AS g2
         |  FROM f CROSS JOIN $prev),
         |ww$t AS (SELECT round($prev.w0 - 1.0 * (g0 / n), 12) AS w0,
         |  round($prev.w1 - 1.0 * (g1 / n), 12) AS w1,
         |  round($prev.w2 - 1.0 * (g2 / n), 12) AS w2
         |  FROM gg$t CROSS JOIN $prev)""".stripMargin
    }.mkString(",\n")
    val wf = s"ww$iters"
    s"""WITH f AS (SELECT doc_id,
       |    CASE WHEN lang = 'en' THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y,
       |    CASE WHEN len(tk) = 0 THEN CAST(0 AS DOUBLE)
       |         ELSE CAST(len(list_filter(tk, t -> t IN ($markers))) AS DOUBLE) / CAST(len(tk) AS DOUBLE) END AS x1,
       |    CASE WHEN len(tk) = 0 THEN CAST(0 AS DOUBLE)
       |         ELSE CAST(len(array_to_string(tk, '')) AS DOUBLE) / CAST(len(tk) AS DOUBLE) END AS x2
       |  FROM (SELECT doc_id, lang, regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+') AS tk FROM documents)),
       |ww0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1, CAST(0 AS DOUBLE) AS w2),
       |$rounds
       |SELECT doc_id, CAST(y AS INT) AS label,
       |  round(${sig(wf)}, 4) AS score,
       |  CASE WHEN round(${sig(wf)}, 4) >= 0.5 THEN 1 ELSE 0 END AS pred
       |FROM f CROSS JOIN $wf""".stripMargin
  }

  /** The shared exact-BM25 CTE chain ending in `top` (doc_id, doc_rank,
    * top-10) — one definition feeds the plain/WAND/block-max oracles and
    * the snippet oracle, so the formula can never desynchronize. */
  private def bm25TopCtes(termsInList: String): String =
    s"""tok AS (SELECT doc_id, unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term IN $termsInList GROUP BY doc_id, term),
       |dfq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok WHERE term IN $termsInList GROUP BY term),
       |dl AS (SELECT doc_id, CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z0-9_'']+')) AS BIGINT) AS dl FROM documents),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
       |scored AS (
       |  SELECT tf.doc_id,
       |         sum( ln(CAST(n AS DOUBLE)/df) * (2.0*tf) / (1.0*(0.25 + 0.75*dl/avgdl) + tf) ) AS score
       |  FROM tf JOIN dfq USING(term) JOIN dl USING(doc_id) CROSS JOIN stats
       |  GROUP BY tf.doc_id),
       |top AS (SELECT doc_id, round(score, 4) AS doc_rank FROM scored
       |        ORDER BY round(score, 4) DESC, doc_id LIMIT 10)""".stripMargin

  private def bm25OracleSql(termsInList: String): String =
    s"""WITH ${bm25TopCtes(termsInList)}
       |SELECT doc_id, doc_rank FROM top
       |ORDER BY doc_rank DESC, doc_id""".stripMargin
}
