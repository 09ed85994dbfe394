package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProduct, Ewma, RollingHash}

/** Session-extension entry point: registers the engine's native Catalyst
  * expressions at session build time, so a cluster deployment gets them
  * everywhere via `--conf spark.sql.extensions=graft.GraftExtensions`
  * (no per-session register() calls). The same builders back the
  * per-session GraftFunctions/TextFunctions/Ewma registration helpers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product of two ARRAY<DOUBLE>"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "polynomial rolling hash of a string"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_ewma"),
      info("graft_ewma", "EWMA running window function"),
      (exprs: Seq[Expression]) => {
        val alpha = exprs(1) match {
          case Literal(v, _) => v.toString.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_ewma alpha must be a literal, got $other")
        }
        Ewma(exprs.head, alpha)
      }))
  }
}
