package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{DotProductExpr, UnitVectorExpr}

/** Library packaging for the native functions: sessions built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) get `graft_dot` / `graft_unit`
  * without any per-session registration call — the idiomatic way to ship
  * Catalyst expressions with a Spark library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      { args: Seq[Expression] =>
        require(args.length == 2, "graft_dot expects 2 arguments")
        DotProductExpr(
          Cast(args(0), ArrayType(DoubleType)),
          Cast(args(1), ArrayType(DoubleType)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_unit"),
      new ExpressionInfo(classOf[UnitVectorExpr].getName, "graft_unit"),
      { args: Seq[Expression] =>
        require(args.length == 1, "graft_unit expects 1 argument")
        UnitVectorExpr(Cast(args(0), ArrayType(DoubleType)))
      }))
  }
}
