package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Numeric parsing with the reference's exact (Python) semantics.
  *
  * Three deliberately distinct parsers exist in the reference:
  *  - `pyFloat`  — Python `float(str)`: accepts inf/infinity/nan (any case,
  *    signed); used when exploding event_metrics
  *    (tools/storage.py:128-139).
  *  - `safeFloat` — multi-token parser: split on whitespace, skip tokens
  *    equal to "inf"/"nan" (case-insensitive), parse the rest, drop `-1`
  *    sentinels when other values exist, return the max; fall back to
  *    whole-string parse (tools/storage.py:144-174). Used for events_wide.
  *  - `parseNumeric` — the anomaly gate's twin: only if the string contains
  *    a space, exclude tokens by exact string match '-1'/'inf', and fail
  *    the WHOLE value if any remaining token is non-numeric
  *    (tools/anomaly_detector.py:169-184).
  */
object PyNum {

  private val plainNumber =
    """^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$""".r

  /** Python float(str) semantics (subset: no underscores/hex). */
  def pyFloat(s: String): Option[Double] = {
    if (s == null) return None
    val t = s.trim
    if (t.isEmpty) return None
    val (sign, body) = t.charAt(0) match {
      case '+' => (1.0, t.substring(1))
      case '-' => (-1.0, t.substring(1))
      case _ => (1.0, t)
    }
    body.toLowerCase match {
      case "inf" | "infinity" => Some(sign * Double.PositiveInfinity)
      case "nan" => Some(Double.NaN)
      case _ =>
        if (plainNumber.matches(t)) Some(t.toDouble) else None
    }
  }

  /** tools/storage.py:144-174 — max-of-tokens with -1/inf/nan rules. */
  def safeFloat(s: String): Option[Double] = {
    if (s == null) return None
    val parts = s.split("\\s+").filter(_.nonEmpty)
    val nums = parts.toSeq
      .filterNot(p => { val l = p.toLowerCase; l == "inf" || l == "nan" })
      .flatMap(pyFloat)
    if (nums.nonEmpty) {
      val cleaned = nums.filterNot(_ == -1.0)
      val kept = if (cleaned.nonEmpty) cleaned else nums
      Some(kept.max)
    } else pyFloat(s)
  }

  /** tools/anomaly_detector.py:169-184 — strict multi-token twin. */
  def parseNumeric(s: String): Option[Double] = {
    if (s == null) return None
    if (s.contains(" ")) {
      val kept = s.split("\\s+").filter(_.nonEmpty)
        .filter(p => p != "-1" && p != "inf")
      val parsed = kept.map(pyFloat)
      // Python: any unparseable token aborts the max() with an exception
      // → None. Empty survivor list likewise raises (max of empty).
      if (parsed.isEmpty || parsed.exists(_.isEmpty)) None
      else Some(parsed.flatten.max)
    } else pyFloat(s)
  }

  // ---- Spark surface -------------------------------------------------------
  // Native codegen expression, not a Scala UDF: these parsers sit inside
  // the hottest projections of the 100 TB ingest path (eventMetrics
  // explodes every payload entry, eventsWide calls safe_float ~15× per
  // row), where a UDF pays catalyst↔JVM conversion and Option boxing per
  // call and breaks the WholeStageCodegen span.

  /** Names in the session function registry (also injected by
    * GraftExtensions at session build time). */
  val Names: Map[Int, String] = Map(
    PyParse.PyFloat -> "py_float",
    PyParse.SafeFloat -> "safe_float",
    PyParse.ParseNumeric -> "parse_numeric")

  def builder(mode: Int): Seq[Expression] => Expression = exprs => {
    require(exprs.length == 1,
      s"${Names(mode)} expects (text), got ${exprs.length} arguments")
    PyParse(exprs.head, mode)
  }

  def register(spark: SparkSession): Unit =
    Names.foreach { case (mode, name) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder(mode), "built-in")
    }

  private def fn(mode: Int, c: Column): Column = {
    // lazy registration on the active (driver-side, plan-building)
    // session, so Column-level callers with no session in scope keep
    // working; cluster deployments get the same builders from
    // GraftExtensions. Skipped when already present — eventsWide builds
    // ~15 of these per plan and replace-logging is per-call noise.
    val spark = SparkSession.active
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(Names(mode))))
      register(spark)
    call_function(Names(mode), c)
  }

  def py_float(c: Column): Column = fn(PyParse.PyFloat, c)
  def safe_float(c: Column): Column = fn(PyParse.SafeFloat, c)
  def parse_numeric(c: Column): Column = fn(PyParse.ParseNumeric, c)
}

/** Catalyst-native wrapper over the PyNum parsers: interpreted and
  * generated paths share the exact scala implementations above, so the
  * randomized PyNumSpec properties pin both. Result is nullable on
  * non-null input (parse failure → NULL), hence the hand-rolled null
  * handling in doGenCode. */
case class PyParse(child: Expression, mode: Int) extends UnaryExpression {

  override def prettyName: String = PyNum.Names(mode)

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if PyNum.Names.contains(mode) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"unknown PyParse mode $mode")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    PyParse.eval(v.asInstanceOf[UTF8String].toString, mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val parsed = ctx.freshName("parsed")
      // Call through the companion's MODULE$ singleton: the `PyParse`
      // *class* inherits a member named `eval` from Expression, which
      // suppresses scalac's static forwarder for the companion's
      // eval(String,int) — a bare `PyParse.eval(...)` reference would
      // fail janino compilation and silently de-codegen the whole stage.
      s"""
      java.lang.Double $parsed =
        graft.functions.PyParse$$.MODULE$$.eval($c.toString(), $mode);
      if ($parsed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $parsed.doubleValue();
      }
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PyParse {
  final val PyFloat = 0
  final val SafeFloat = 1
  final val ParseNumeric = 2

  /** Shared by interpreted + generated code paths; null ⇔ unparseable. */
  def eval(s: String, mode: Int): java.lang.Double = {
    val opt = mode match {
      case PyFloat => PyNum.pyFloat(s)
      case SafeFloat => PyNum.safeFloat(s)
      case ParseNumeric => PyNum.parseNumeric(s)
    }
    opt match {
      case Some(d) => java.lang.Double.valueOf(d)
      case None => null
    }
  }
}
