package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exponentially-weighted moving average as a native running-frame window
  * function: ewma_0 = x_0; ewma_t = α·x_t + (1−α)·ewma_{t−1}, evaluated
  * over `PARTITION BY key ORDER BY time` like lag/lead — one pass, no
  * per-row lookback frame, streaming-friendly state of one double.
  *
  * The reference README promises EWMA smoothing but never implements it
  * (SURVEY.md §2.6 last row); this provides it Spark-natively. The same
  * recurrence is expressible in DuckDB as
  * list_reduce(list(x ORDER BY ...), (acc, v) -> α*v + (1-α)*acc),
  * making it oracle-checkable.
  */
case class Ewma(child: Expression, alpha: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewma"

  private lazy val ewma =
    AttributeReference("ewma", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(ewma)

  override val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))

  override val updateExpressions: Seq[Expression] = {
    val x = child.cast(DoubleType)
    // first non-null input seeds the average; nulls carry prior state
    Seq(coalesce(
      Add(Multiply(Literal(alpha), x),
        Multiply(Literal(1.0 - alpha), ewma)),
      x, ewma))
  }

  override val evaluateExpression: Expression = ewma

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Ewma {
  /** Shared builder (per-session registry AND GraftExtensions): arity
    * checked, alpha must be a literal. */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2,
      s"graft_ewma expects (value, alpha), got ${exprs.length} arguments")
    val alpha = exprs(1) match {
      case Literal(v, _) => v.toString.toDouble
      case other => throw new IllegalArgumentException(
        s"graft_ewma alpha must be a literal, got $other")
    }
    Ewma(exprs.head, alpha)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ewma", builder, "built-in")

  /** Column API — requires register(spark); use with
    * .over(Window.partitionBy(...).orderBy(...)). */
  def ewma(c: Column, alpha: Double): Column =
    org.apache.spark.sql.functions.call_function("graft_ewma", c,
      org.apache.spark.sql.functions.lit(alpha))
}
