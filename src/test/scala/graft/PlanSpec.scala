package graft

/** Physical-plan invariants — the 100 TB design assertions (SURVEY.md §7.4
  * "100 TB design notes"). These lock in what .explain review established:
  * pushdown reaches the scan, small sides broadcast, top-k never global-sorts,
  * nothing falls back to a cartesian product.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filter+projection push into the parquet scan") {
    val p = plan("rel_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    // pruned read schema: 5 columns, never the full 11-column lineitem
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double,l_shipdate"))
  }

  test("global top-k plans as TakeOrderedAndProject, not sort+limit") {
    assert(plan("rel_topk").contains("TakeOrderedAndProject"))
    assert(plan("sim_cosine_topk").contains("TakeOrderedAndProject"))
    assert(plan("bm25_search").contains("TakeOrderedAndProject"))
  }

  test("dimension joins broadcast; no cartesian products anywhere") {
    val p = plan("rel_local_supplier_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    SparkEntry.queries.keys.foreach { name =>
      assert(!plan(name).contains("CartesianProduct"), s"$name has a cartesian")
    }
  }

  test("no UDFs anywhere: every declared query stays native/codegen") {
    // the "functions, not UDFs" rule as a hard invariant — custom logic is
    // either a built-in or a registered codegen Expression; the ONLY
    // object-space operator is the documented multimodal decode stub
    // (mapPartitions), which is not a UDF and is allowed to appear
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
        s"$name plans a UDF")
    }
  }

  test("aggregations are partial+final (map-side combine before shuffle)") {
    val p = plan("rel_pricing_summary")
    assert(p.contains("partial_sum"))
    assert(p.contains("HashAggregate"))
  }

  test("embedding near-dup pair generation is bucketed, never nested-loop") {
    // the round-2 defect was a BroadcastNestedLoopJoin over n^2/2 pairs as
    // the declared query; the banded generator must plan pure equi-joins
    val p = plan("dedup_embedding_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "banded LSH pair generation planned a nested-loop join")
  }

  test("IVF cell assignment is a shuffle-free fold: no Window in the plan") {
    // round-2 review: assignment via crossJoin + row_number shuffled
    // n×nCells rows for a per-row argmax. The fold form must plan with no
    // Window node at all (the probe is a TakeOrderedAndProject).
    val p = plan("sim_ann_ivf")
    assert(!p.contains("Window"), "sim_ann_ivf plans a Window exchange")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("BM25 query-term restriction is a broadcast join, not a driver loop") {
    val p = plan("bm25_search")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
  }

  test("global sort is range-partitioned, never a single-node sort") {
    val p = plan("rel_global_sort")
    assert(p.contains("rangepartitioning"),
      "total-order sort must sample range bounds and sort partitions independently")
    assert(!p.contains("CollectLimit"))
  }

  test("correlated EXISTS decorrelates to one semi-join, not a per-row probe") {
    val p = plan("rel_exists_subquery")
    assert(p.contains("LeftSemi"))
    assert(!p.contains("InSubquery") && !p.contains("exists#"),
      "EXISTS survived as an undecorrelated subquery")
  }

  test("typed UDAF aggregates partial+final like a built-in") {
    // the Chan-merge design only pays off if executors pre-fold locally:
    // pin the partial_ stage so a plan change can't silently shuffle rows
    val p = plan("rel_welford_stats")
    assert(p.contains("partial_momentsaggregator"))
    assert(p.contains("ObjectHashAggregate"))
  }

  test("edit-distance near-dup pairs join on the block key, never all-pairs") {
    val p = plan("dedup_edit_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // both the hot-block anti-join and the pair self-join are equi-joins
    assert(p.contains("LeftAnti"))
  }

  test("batch ANN joins the corpus once on bucket with a broadcast query side") {
    val p = plan("sim_ann_multi")
    assert(p.contains("BroadcastHashJoin"))
    // the corpus side must not shuffle for the join; the only hash
    // exchange is the per-query top-k window over the small candidate set
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("kmeans step assigns cells without a Window or per-row shuffle") {
    val p = plan("sim_kmeans_step")
    assert(!p.contains("Window"))
    // one exchange for the per-cell aggregate, one for the output sort
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("Q17 broadcasts the brand dim and never probes per row") {
    val p = plan("rel_small_qty_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("Q19's OR-of-ANDs pushes each side's disjunction to its scan") {
    // the whole predicate spans both tables, but Catalyst must still
    // derive and push the single-side unions: quantity ranges prune the
    // lineitem scan, brand/size clauses prune the part scan — the join
    // only sees rows that could satisfy SOME clause
    val p = plan("rel_disjunctive_join")
    assert(p.contains("PushedFilters: [IsNotNull(l_partkey), " +
      "Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)"), p)
    assert(p.contains("Or(Or(And(EqualTo(p_brand"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("Q20's window re-exchange moves only reduced per-(part,supp) rows") {
    // raw lineitems shuffle once (map-side combined on the composite
    // key); the per-part window total then re-exchanges the already
    // reduced frame on l_partkey — never the raw scan
    val p = plan("rel_excess_share")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin")) // part prefix dim + nation supplier dim
    // exactly three hash exchanges: composite-key agg (map-side combined),
    // partkey window over reduced rows, suppkey distinct — a fourth would
    // mean raw lineitems started crossing a second time
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 3, p)
  }
}
