package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

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

  val pyFloatUdf = udf((s: String) => pyFloat(s))
  val safeFloatUdf = udf((s: String) => safeFloat(s))
  val parseNumericUdf = udf((s: String) => parseNumeric(s))

  def py_float(c: Column): Column = pyFloatUdf(c)
  def safe_float(c: Column): Column = safeFloatUdf(c)
  def parse_numeric(c: Column): Column = parseNumericUdf(c)

  /** Optional SQL registration. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("py_float", pyFloatUdf)
    spark.udf.register("safe_float", safeFloatUdf)
    spark.udf.register("parse_numeric", parseNumericUdf)
  }
}
