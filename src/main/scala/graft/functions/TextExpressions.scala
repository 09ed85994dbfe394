package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint: h = (h*31 + codepoint)
  * mod 1_000_000_007, over unicode codepoints. Deterministic, partition
  * independent, and cheap enough to run inline with the scan (whole-stage
  * codegen). The same fold is expressible in DuckDB
  * (list_reduce over unicode()) so fingerprints are oracle-checkable.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    RollingHash.hash(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RollingHash {
  final val Mod = 1000000007L

  /** Shared by interpreted + generated code paths. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** 32-bit SimHash over token n-grams (bigrams of whitespace tokens), using
  * the first 4 md5 bytes of each feature as per-bit votes: bit b of the
  * signature is 1 iff more features have bit b set than not. Deterministic
  * and md5-based → reproducible in any engine; near-duplicate texts differ
  * in few bits (Hamming distance). Bigram features keep word-order
  * sensitivity so vocabulary-similar but distinct docs don't collide.
  */
object SimHash {
  final val Bits = 32

  private def tokenBits(tok: String): Long = {
    val d = java.security.MessageDigest.getInstance("md5")
      .digest(tok.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def simhash(text: String): Long = {
    if (text == null) return 0L
    val votes = new Array[Int](Bits)
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val features =
      if (toks.length < 2) toks.toSeq
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    features.foreach { tok =>
      val bits = tokenBits(tok)
      var b = 0
      while (b < Bits) {
        if (((bits >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    votes.zipWithIndex.foldLeft(0L) { case (acc, (v, b)) =>
      if (v > 0) acc | (1L << b) else acc
    }
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  val simhashUdf = org.apache.spark.sql.functions.udf(simhash _)
}

object TextFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
    spark.udf.register("simhash32", SimHash.simhashUdf)
  }

  def rollingHash(c: Column): Column = call_function("rolling_hash", c)
  def simhash32(c: Column): Column = SimHash.simhashUdf(c)
}
