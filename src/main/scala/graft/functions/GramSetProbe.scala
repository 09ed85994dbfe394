package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** "Does ANY of this row's md5-gram hashes sit in the eval set?" as one
  * bounded-cost native probe — the streaming decontamination gate's
  * replacement for `arrays_overlap(grams, <collect_set of ALL eval
  * grams>)`, whose per-document cost was O(|eval| · |doc grams|) over a
  * single collected 1-row array (≈ 32 MB scanned per doc at a 1M-gram
  * eval suite).
  *
  * The eval set rides as a SORTED packed long[] of 128-bit md5 digests
  * (two longs per gram, 16 bytes each — 16 MB at 1M grams), shipped once
  * per executor inside the (torrent-broadcast) task binary, and each doc
  * gram binary-searches it: O(g · log n) per document, independent of
  * |eval|. Membership is EXACT on the full 128-bit digest — identical
  * semantics to the string-equality form it replaces (the grams on both
  * sides are md5 hex strings), so this is strictly stronger than the
  * bloom-prescreen-plus-confirm alternative: one pass, no false
  * positives, no second probe.
  */
case class AnyGramInSet(child: Expression, packed: Array[Long])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if packed.length % 2 != 0 => TypeCheckResult.TypeCheckFailure(
      "graft_any_gram_in_set packed set must hold (hi, lo) long pairs")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_any_gram_in_set expects ARRAY<STRING> of md5 hex grams, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    AnyGramInSet.probe(v.asInstanceOf[ArrayData], packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("gramSet", packed, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AnyGramInSet.probe($c, $setRef)")
  }

  // the packed set would otherwise render element-by-element in plan
  // strings; show its cardinality instead
  override def toString: String =
    s"any_gram_in_set($child, <${packed.length / 2} grams>)"
  override def sql: String =
    s"any_gram_in_set(${child.sql}, <${packed.length / 2} grams>)"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object AnyGramInSet {

  /** All 32 bytes hex digits? A malformed gram (right length, non-hex
    * chars) can never be a member — the set holds only well-formed
    * digests — so the probe skips its binary search entirely rather
    * than parsing it into an in-band sentinel that could collide with
    * a real all-FF digest half. */
  private def isHex32(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < 32) {
      val c = bytes(i)
      val ok = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
        (c >= 'A' && c <= 'F')
      if (!ok) return false
      i += 1
    }
    true
  }

  /** Parse 16 validated hex chars into a long (callers check
    * [[isHex32]] first). */
  private def hexLong(bytes: Array[Byte], from: Int): Long = {
    var h = 0L
    var i = from
    while (i < from + 16) {
      val c = bytes(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else c - 'A' + 10
      h = (h << 4) | d
      i += 1
    }
    h
  }

  /** Shared by interpreted + generated code: any gram present? */
  def probe(grams: ArrayData, packed: Array[Long]): Boolean = {
    val n = packed.length / 2
    if (n == 0) return false
    var gi = 0
    val len = grams.numElements()
    while (gi < len) {
      val g = grams.getUTF8String(gi)
      val bytes = if (g != null && g.numBytes() == 32) g.getBytes else null
      if (bytes != null && isHex32(bytes)) {
        val hi = hexLong(bytes, 0)
        val lo = hexLong(bytes, 16)
        // unsigned binary search over (hi, lo) pairs
        var a = 0
        var b = n - 1
        while (a <= b) {
          val m = (a + b) >>> 1
          val c = java.lang.Long.compareUnsigned(hi, packed(2 * m))
          val cmp = if (c != 0) c
            else java.lang.Long.compareUnsigned(lo, packed(2 * m + 1))
          if (cmp == 0) return true
          else if (cmp < 0) b = m - 1
          else a = m + 1
        }
      }
      gi += 1
    }
    false
  }

  /** Pack md5 hex strings into the sorted (hi, lo) long-pair array the
    * probe searches. Malformed entries are rejected loudly — the eval
    * set is operator-supplied configuration, not row data. */
  def pack(hexDigests: Iterable[String]): Array[Long] = {
    val pairs = hexDigests.iterator.map { s =>
      require(s != null && s.length == 32,
        s"eval gram must be a 32-char md5 hex digest, got: $s")
      (java.lang.Long.parseUnsignedLong(s.substring(0, 16), 16),
        java.lang.Long.parseUnsignedLong(s.substring(16), 16))
    }.toArray
    java.util.Arrays.sort(pairs, (x: (Long, Long), y: (Long, Long)) => {
      val c = java.lang.Long.compareUnsigned(x._1, y._1)
      if (c != 0) c else java.lang.Long.compareUnsigned(x._2, y._2)
    })
    val out = new Array[Long](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      out(2 * i) = pairs(i)._1
      out(2 * i + 1) = pairs(i)._2
      i += 1
    }
    out
  }

  /** Shared builder: the packed set arrives as a literal ARRAY<LONG>
    * (consumed at build time — the plan keeps only the expression, so
    * the 2n-long payload never renders in plan strings). */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2,
      s"graft_any_gram_in_set expects (grams, packed), got ${exprs.length} arguments")
    exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
          arr: ArrayData, ArrayType(LongType, _)) =>
        AnyGramInSet(exprs.head, arr.toLongArray())
      case other => throw new IllegalArgumentException(
        s"graft_any_gram_in_set packed set must be a literal ARRAY<LONG>, got ${other.getClass}")
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_any_gram_in_set", builder, "built-in")

  /** Column API; self-registers on the active session. */
  def anyGramInSet(grams: Column, packed: Array[Long]): Column = {
    register(SparkSession.active)
    call_function("graft_any_gram_in_set", grams, lit(packed))
  }
}
