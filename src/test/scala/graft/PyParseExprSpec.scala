package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{PyNum, PyParse}

/** The Catalyst-native PyParse expression must agree with the plain
  * scala parsers (which PyNumSpec pins against the reference semantics)
  * on BOTH physical paths: the interpreted eval and the whole-stage
  * codegen running inside a real projection. The corpus mixes every
  * branch: inf/nan casing, signs, sentinels, multi-token, junk tokens,
  * empties, and randomized token lists. */
class PyParseExprSpec extends SparkSpec {

  private val handPicked: Seq[String] = Seq(
    "3.5", " 42 ", "+7", "-0.0", "1.79769e+308", "-.5", "5.", ".5e-3",
    "inf", "Infinity", "-INF", "-infinity", "nan", "NaN", "-nan",
    "", " ", "abc", "1d", "0x1p3", "1_000", "5 x 3", "a b c",
    "-1", "-1 -1", "0.1 0.5 -1", "3.2 -1 inf", "nan nan",
    "inf inf", "7 -1", "-1 8", "  1   2  ", "1\t2", "-1.0 -1",
    "1e309", "-1e309", "99 -1 nan", "-1 inf nan")

  private def fuzz(seed: Int, n: Int): Seq[String] = {
    val rng = new scala.util.Random(seed)
    val token = () => rng.nextInt(8) match {
      case 0 => "-1"
      case 1 => Seq("inf", "nan", "INF", "NaN")(rng.nextInt(4))
      case 2 => "x" + rng.nextInt(10)
      case 3 => rng.nextInt(2000).toString
      case _ => (math.rint((rng.nextDouble() - 0.5) * 2e6) / 4).toString
    }
    Seq.fill(n)(Seq.fill(1 + rng.nextInt(5))(token()).mkString(" "))
  }

  private val corpus: Seq[String] =
    (handPicked ++ fuzz(11, 400)) :+ null

  private def sameDouble(a: Option[Double], b: Option[Double]): Boolean =
    (a, b) match {
      case (Some(x), Some(y)) =>
        (x.isNaN && y.isNaN) ||
          java.lang.Double.compare(x, y) == 0
      case (x, y) => x == y
    }

  private val scalaFns: Map[Int, String => Option[Double]] = Map(
    PyParse.PyFloat -> PyNum.pyFloat,
    PyParse.SafeFloat -> PyNum.safeFloat,
    PyParse.ParseNumeric -> PyNum.parseNumeric)

  test("codegen projection path agrees with the scala parsers") {
    import spark.implicits._
    // codegen.fallback=false makes a janino compile failure THROW instead
    // of silently degrading to an interpreted projection — the structural
    // WholeStageCodegenExec check below can't see execution-time fallback,
    // so without this the test would pass while every real plan ran
    // interpreted (the round-6 regression this guards against).
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
    // repartition breaks ConvertToLocalRelation, which would otherwise
    // fold the whole projection at optimize time (interpreted, no codegen)
    val df = corpus.toDF("s").repartition(2)
    val projected = df.select(
      PyNum.py_float($"s").as("pf"),
      PyNum.safe_float($"s").as("sf"),
      PyNum.parse_numeric($"s").as("pn"),
      $"s")
    val out = projected.collect()
    // the projection must have run inside whole-stage codegen, not as a
    // fallback interpreted projection — that's the point of the expression
    // (executed plan walked AFTER collect so AQE has finalized it;
    // structural, since AQE's treeString renders codegen only as a `*(n)`
    // prefix)
    import org.apache.spark.sql.execution.{ProjectExec, SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => nodes(s.plan)
      case o => o.children.flatMap(nodes)
    })
    val codegenProject = nodes(projected.queryExecution.executedPlan)
      .exists {
        case w: WholeStageCodegenExec =>
          w.collectFirst { case p: ProjectExec => p }.isDefined
        case _ => false
      }
    assert(codegenProject,
      projected.queryExecution.executedPlan.toString())
    out.foreach { r =>
      val s = r.getAs[String]("s")
      def got(i: Int): Option[Double] =
        if (r.isNullAt(i)) None else Some(r.getDouble(i))
      assert(sameDouble(got(0), PyNum.pyFloat(s)), s"py_float <$s>")
      assert(sameDouble(got(1), PyNum.safeFloat(s)), s"safe_float <$s>")
      assert(sameDouble(got(2), PyNum.parseNumeric(s)), s"parse_numeric <$s>")
    }
    } finally spark.conf.set("spark.sql.codegen.fallback", prevFallback)
  }

  test("interpreted eval path agrees with the scala parsers") {
    val ref = BoundReference(0, StringType, nullable = true)
    scalaFns.foreach { case (mode, fn) =>
      val expr = PyParse(ref, mode)
      corpus.foreach { s =>
        val in = InternalRow(
          if (s == null) null else UTF8String.fromString(s))
        val got = Option(expr.eval(in)).map(_.asInstanceOf[Double])
        assert(sameDouble(got, fn(s)),
          s"${PyNum.Names(mode)} interpreted <$s>")
      }
    }
  }

  test("SQL surface resolves via the registry") {
    PyNum.register(spark)
    val r: Row = spark.sql(
      "SELECT py_float(' 42 ') a, safe_float('0.1 0.5 -1') b, " +
        "parse_numeric('5 x 3') c").head()
    assert(r.getDouble(0) == 42.0)
    assert(r.getDouble(1) == 0.5)
    assert(r.isNullAt(2))
  }
}
