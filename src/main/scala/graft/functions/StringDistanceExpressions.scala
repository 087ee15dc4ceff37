package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen expression — the scoring
  * kernel for blocked fuzzy record linkage (EntityResolution). Textbook
  * definition, pinned to the exact semantics DuckDB's
  * `jaro_winkler_similarity` implements so the oracle can replay scores:
  *
  *   - match window = max(0, max(|a|,|b|)/2 - 1); zero-window strings
  *     ("ab" vs "ba") match only at identical positions → 0.0
  *   - jaro = (m/|a| + m/|b| + (m-t)/m)/3, t = FLOOR of half the
  *     out-of-order matched chars (rapidfuzz's integer division — an odd
  *     count rounds down); m = 0 → 0.0; both empty → 1.0, one empty → 0.0
  *   - Winkler boost ONLY when jaro > 0.7: jw = jaro + L·0.1·(1-jaro),
  *     L = common prefix capped at 4
  *
  * (Each rule above is verified against DuckDB in the spec.) Operates on
  * UTF-16 code units — identical to code points for the BMP text this
  * engine links; a 1-ulp FP divergence between engines is absorbed by
  * the callers' round(6) discipline.
  *
  * Scale notes: a branch-free-allocation kernel (two boolean arrays per
  * pair, no boxing) called from generated code, so a blocked candidate
  * join scores pairs inside whole-stage codegen — the same pattern as
  * DotProductExpr, which measured 6.5x over a Scala UDF.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerExpr.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {

  // called from generated Java code — must stay a static-forwardable
  // companion method
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in their respective orders
    var half = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) half += 1
        j += 1
      }
      i += 1
    }
    // rapidfuzz/DuckDB semantics: the transposition count is an INTEGER
    // half (floor), not half/2.0 — an odd out-of-order count rounds down,
    // which is observable (verified against DuckDB in the spec)
    val t = (half / 2).toDouble
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(la, lb))
    while (prefix < maxP && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

object StringDistanceFunctions {
  val JaroWinklerName = "graft_jaro_winkler"

  val jwBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"$JaroWinklerName expects 2 arguments")
    JaroWinklerExpr(args.head, args(1))
  }

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      JaroWinklerName, jwBuilder, "built-in")

  def jaroWinkler(a: Column, b: Column): Column =
    call_function(JaroWinklerName, a, b)
}
