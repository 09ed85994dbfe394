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

/** All `n` seeded md5 hex digests of a string in ONE pass:
  * element i == md5(concat('i|', input)) — byte-for-byte the form the
  * DuckDB oracle computes — but with a single reused MessageDigest, the
  * input's UTF-8 bytes extracted once, cached seed-prefix bytes, and a
  * branch-free hex encode. The per-seed `md5(concat(...))` plan this
  * replaces pays a digest lookup + UTF8String concat allocation + hex
  * string build per seed per row; on MinHash signatures (16 seeds ×
  * every shingle occurrence in the corpus) that is the dominant cost of
  * the whole dedup pipeline. */
case class Md5Seeds(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"md5_seeds seed count must be positive, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_seeds expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    Md5Seeds.all(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Seeds.all($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5Seeds {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".getBytes("US-ASCII")
  // seed prefixes "0|".."63|" precomputed; beyond that, built on the fly
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(64)(i => s"$i|".getBytes("UTF-8"))

  /** Shared by interpreted + generated code paths. */
  def all(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val in = s.getBytes
    val md = digest.get()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(if (i < prefixes.length) prefixes(i)
        else s"$i|".getBytes("UTF-8"))
      md.update(in)
      val d = md.digest()
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = Hex((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = Hex(d(j) & 0xf)
        j += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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
  /** Shared builder (per-session registry AND GraftExtensions). */
  val md5SeedsBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2,
      s"graft_md5_seeds expects (text, n), got ${exprs.length} arguments")
    val n = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
        v.toString.toInt
      case other => throw new IllegalArgumentException(
        s"graft_md5_seeds n must be a literal, got $other")
    }
    Md5Seeds(exprs.head, n)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_md5_seeds", md5SeedsBuilder, "built-in")
    spark.udf.register("simhash32", SimHash.simhashUdf)
  }

  def rollingHash(c: Column): Column = call_function("rolling_hash", c)
  def simhash32(c: Column): Column = SimHash.simhashUdf(c)
  /** Requires register(spark) on the session first. */
  def md5Seeds(c: Column, n: Int): Column =
    call_function("graft_md5_seeds", c, org.apache.spark.sql.functions.lit(n))
}
