package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively (builder brief: "as-of
  * join, range join"), built by composition — preference order (a): no
  * custom plan nodes needed.
  *
  * Scale notes:
  *  - asOfJoin is the union+ordered-window formulation: ONE shuffle on the
  *    key and a per-key sort, instead of the naive inequality join's
  *    per-row scan of the right side. This is how kdb/Flink-style as-of
  *    semantics map onto a shuffle engine.
  *  - bandedRangeJoin turns an |tL - tR| <= tol predicate into an equi-join
  *    on (key, time-band) with each right row replicated into 3 adjacent
  *    bands — a hash join Catalyst can plan and AQE can skew-split, where
  *    the raw inequality would fall back to BroadcastNestedLoopJoin.
  */
object TemporalJoins {

  /** Both joins add internal helper columns with fixed names; a caller
    * frame that already uses one of them would be silently overwritten by
    * withColumn, corrupting that column in the output — fail loudly
    * instead. */
  private[graft] def requireFree(op: String, df: DataFrame, names: String*): Unit = {
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"$op: input already contains internal column(s) ${clash.mkString(", ")} — rename them first")
  }

  /** For each left row, attach `valueCol` from the most recent right row
    * with rightTime <= leftTime, matching on `key`. Right rows at exactly
    * leftTime match (<=). Left rows with no earlier right row get null.
    * SQL ASOF null semantics: right rows with null time never match, and
    * left rows with null time match nothing.
    *
    * Known limitation of this union+window encoding (where `asOfJoinExec`
    * is exact): `last(__v, ignoreNulls)` is how LEFT marker rows stay
    * transparent in the stream, so a matched right row whose VALUE is
    * null is indistinguishable from a marker — the previous non-null
    * value leaks forward instead of the matched null. Use the exec form
    * when the value column can hold nulls. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               valueCol: String, as: String = "asof_value"): DataFrame = {
    // as colliding with a helper name would collapse the requireFree set
    // and silently drop the output column (round-3 review)
    require(!Set("__t", "__isLeft", "__v").contains(as),
      s"asOfJoin: output column name '$as' is reserved")
    requireFree("asOfJoin", left, "__t", "__isLeft", "__v", as)
    requireFree("asOfJoin", right, "__isLeft")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__isLeft", lit(1))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    // null-time right rows would sort to the partition head (nulls first)
    // and leak their value into every frame — SQL says they never match
    val r = right.filter(col(rightTime).isNotNull)
      .select(col(key), col(rightTime).as("__t"), col(valueCol).as("__v"))
      .withColumn("__isLeft", lit(0))
    // right-before-left on time ties so "<=" semantics hold; __v as the
    // final tie-break makes duplicate (key, rightTime) rows deterministic
    // (the greatest value wins) instead of shuffle-order-dependent
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__isLeft"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      // null-time left rows sort to the head too (no frame) but guard
      // explicitly: SQL gives them no match
      .withColumn(as, when(col(leftTime).isNotNull,
        last(col("__v"), ignoreNulls = true).over(w)))
      .filter(col("__isLeft") === 1)
      .drop("__t", "__isLeft", "__v")
  }

  /** Forward as-of: for each left row, `valueCol` from the EARLIEST right
    * row with rightTime >= leftTime ("next event at-or-after" — the lookup
    * behind next-maintenance-after-failure / first-purchase-after-signup
    * questions). Exact mirror of `asOfJoin`: right rows at exactly
    * leftTime match (>=), no-later-right rows get null, SQL ASOF null
    * semantics on both time columns. Left sorts BEFORE right on time ties
    * (isLeft descending) so the equal-time right row lands inside the
    * [current, following) frame; among duplicate (key, time) right rows
    * the SMALLEST value wins (first over __v ascending) — deterministic,
    * where shuffle order would not be. Same one-shuffle union+window
    * shape, and the same matched-null-value caveat, as asOfJoin. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      valueCol: String, as: String = "asof_value"): DataFrame = {
    require(!Set("__t", "__isLeft", "__v").contains(as),
      s"asOfJoinForward: output column name '$as' is reserved")
    requireFree("asOfJoinForward", left, "__t", "__isLeft", "__v", as)
    requireFree("asOfJoinForward", right, "__isLeft")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__isLeft", lit(1))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.filter(col(rightTime).isNotNull)
      .select(col(key), col(rightTime).as("__t"), col(valueCol).as("__v"))
      .withColumn("__isLeft", lit(0))
    val w = Window.partitionBy(key)
      .orderBy(col("__t"), col("__isLeft").desc, col("__v"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(as, when(col(leftTime).isNotNull,
        first(col("__v"), ignoreNulls = true).over(w)))
      .filter(col("__isLeft") === 1)
      .drop("__t", "__isLeft", "__v")
  }

  /** The as-of join as a first-class PLAN NODE (`plans.AsOfJoinNode` →
    * `AsOfJoinExec`): same output shape as `asOfJoin` and identical
    * results whenever the value column is non-null (see the asOfJoin
    * scaladoc for the one divergence — a matched null value — where the
    * exec form is the exact one). Executed as a co-partitioned
    * forward-only merge with O(1) state instead of the union+window
    * composition — see `graft.plans.AsOfJoinExec` for the execution
    * contract. The planner strategy is registered idempotently on first
    * use (or ship it via `GraftExtensions`). */
  def asOfJoinExec(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   valueCol: String, as: String = "asof_value",
                   forward: Boolean = false): DataFrame = {
    requireFree("asOfJoinExec", left, as)
    val spark = left.sparkSession
    graft.plans.AsOfJoinPlans.ensureRegistered(spark)
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    val lPlan = left.queryExecution.analyzed
    // Fresh-alias the right side: when both inputs derive from the same
    // relation (the usual self-as-of), the analyzer's DeduplicateRelations
    // re-aliases the duplicate subtree's attributes but cannot rewrite the
    // expressions inside a node type it doesn't know — stale right-side
    // references would then bind against pruned output at runtime. The
    // alias layer gives this node ids that are already unique, so dedup
    // never needs to touch them.
    val rAliases = right.queryExecution.analyzed.output.map(a => Alias(a, a.name)())
    val rPlan: LogicalPlan = Project(rAliases, right.queryExecution.analyzed)
    // resolution mirrors Spark's: honors spark.sql.caseSensitive and
    // fails loudly on ambiguity instead of silently picking a duplicate
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def resolve(attrs: Seq[Attribute], n: String, side: String): Attribute = {
      val hits = attrs.filter(a =>
        if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n))
      require(hits.nonEmpty, s"asOfJoinExec: no column '$n' on the $side side")
      require(hits.size == 1,
        s"asOfJoinExec: ambiguous column '$n' on the $side side (${hits.size} matches)")
      hits.head
    }
    def lAttr(n: String) = resolve(lPlan.output, n, "left")
    def rAttr(n: String) = resolve(rAliases.map(_.toAttribute), n, "right")
    val (lk, rk) = (lAttr(key), rAttr(key))
    val (lt, rt) = (lAttr(leftTime), rAttr(rightTime))
    // no analyzer coercion runs on an unknown node: mismatched types would
    // mis-partition (hash of Int 5 != hash of Long 5) or CCE in the merge
    require(lk.dataType == rk.dataType,
      s"asOfJoinExec: key types differ (${lk.dataType} vs ${rk.dataType}) — cast first")
    require(lt.dataType == rt.dataType,
      s"asOfJoinExec: time types differ (${lt.dataType} vs ${rt.dataType}) — cast first")
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      lk, rk, lt, rt, rAttr(valueCol),
      AttributeReference(as, right.schema(valueCol).dataType, nullable = true)(),
      forward)
    org.apache.spark.sql.classic.GraftSqlBridge.ofRows(spark, node)
  }

  /** `asOfJoinExec` in the FORWARD direction: smallest rightTime >=
    * leftTime, ties to the smallest value — the physical-operator twin of
    * `asOfJoinForward`, sharing its semantics exactly (including matched
    * null values, where the exec form is the exact one). */
  def asOfJoinExecForward(left: DataFrame, right: DataFrame, key: String,
                          leftTime: String, rightTime: String,
                          valueCol: String, as: String = "asof_value"): DataFrame =
    asOfJoinExec(left, right, key, leftTime, rightTime, valueCol, as,
      forward = true)

  /** All (left, right) pairs with the same key whose timestamps differ by
    * at most `toleranceSeconds`. Equi-join on (key, band) with 3-band
    * replication of the right side, exact filter after. */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds > 0)
    // each side also rejects the OTHER side's helper name: a left __rt
    // would make the post-join filter ambiguous instead of failing here
    requireFree("bandedRangeJoin", left, "__lt", "__rt", "__band")
    requireFree("bandedRangeJoin", right, "__rt", "__lt", "__band")
    val tolUs = toleranceSeconds * 1000000L
    val l = left.withColumn("__lt", unix_micros(col(leftTime)))
      .withColumn("__band", floor(col("__lt") / tolUs))
    val r = right.withColumn("__rt", unix_micros(col(rightTime)))
      .withColumn("__band", explode(array(
        floor(col("__rt") / tolUs) - 1,
        floor(col("__rt") / tolUs),
        floor(col("__rt") / tolUs) + 1)))
    l.join(r, Seq(key, "__band"))
      .filter(abs(col("__lt") - col("__rt")) <= tolUs)
      .drop("__band", "__lt", "__rt")
  }
}
