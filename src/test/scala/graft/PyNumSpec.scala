package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PyNum._

/** safe_float / parse_numeric / python-float parity
  * (tools/storage.py:144-174, tools/anomaly_detector.py:169-184,
  * FIXTURES.md §7 edge cases). */
class PyNumSpec extends AnyFunSuite {

  test("pyFloat basics and python-isms") {
    assert(pyFloat("3.5").contains(3.5))
    assert(pyFloat("1.79769e+308").contains(1.79769e308))
    assert(pyFloat(" 42 ").contains(42.0))          // python strips
    assert(pyFloat("inf").contains(Double.PositiveInfinity))
    assert(pyFloat("-Infinity").contains(Double.NegativeInfinity))
    assert(pyFloat("nan").exists(_.isNaN))
    assert(pyFloat("").isEmpty)
    assert(pyFloat("abc").isEmpty)
    assert(pyFloat("1d").isEmpty)                    // java-ism rejected
    assert(pyFloat("0x1p3").isEmpty)                 // hex float rejected
    assert(pyFloat(null).isEmpty)
  }

  test("safeFloat multi-token max with -1 sentinel") {
    assert(safeFloat("0.1 0.5 -1").contains(0.5))
    assert(safeFloat("3.2 -1 inf").contains(3.2))    // inf token skipped
    assert(safeFloat("-1").contains(-1.0))           // lone sentinel kept
    assert(safeFloat("-1 -1").contains(-1.0))
    assert(safeFloat("7").contains(7.0))
    assert(safeFloat("a b c").isEmpty)
    assert(safeFloat("nan nan").isEmpty)             // all skipped → fallback fails
    assert(safeFloat("5 x 3").contains(5.0))         // bad token ignored
    assert(safeFloat("").isEmpty)
    assert(safeFloat(null).isEmpty)
  }

  test("parseNumeric strict twin: any bad token poisons the value") {
    assert(parseNumeric("0.1 0.5 -1").contains(0.5))
    assert(parseNumeric("5 x 3").isEmpty)            // unlike safeFloat
    assert(parseNumeric("3.2 -1 inf").contains(3.2))
    assert(parseNumeric("7").contains(7.0))
    assert(parseNumeric("-1 -1").isEmpty)            // all excluded → empty max
    assert(parseNumeric("abc").isEmpty)
  }

  test("property: single plain numeric token round-trips") {
    val rng = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val d = (rng.nextDouble() - 0.5) * 2e15
      val s = d.toString
      assert(pyFloat(s).contains(d))
      assert(safeFloat(s).contains(d))
      assert(parseNumeric(s).contains(d))
    }
  }

  test("property: safeFloat of token list = max of kept tokens") {
    val rng = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val ts = List.fill(1 + rng.nextInt(6))(
        math.rint((rng.nextDouble() - 0.5) * 2000) / 2)
      val s = ts.mkString(" ")
      val cleaned = ts.filterNot(_ == -1.0)
      val expected = (if (cleaned.nonEmpty) cleaned else ts).max
      assert(safeFloat(s).contains(expected), s"input <$s>")
    }
  }
}
