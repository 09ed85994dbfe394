package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch as a native aggregate — the
  * approximate, MERGEABLE twin of the exact `COUNT(DISTINCT ...)` the
  * registry exercises in `ev_stats_by_type` / `q13`. At 100 TB an exact
  * distinct is a full shuffle of every distinct key; this sketch is a
  * fixed 256-byte buffer per group with map-side partial aggregation, so
  * cardinality rollups over arbitrarily many rows shuffle only
  * `groups × 256 bytes`. Flajolet et al.'s HLL with m = 2^8 registers
  * (standard error 1.04/√256 ≈ 6.5%) and the small-range linear-counting
  * correction; no large-range branch — with a 56-bit rho domain the
  * hash-collision term is negligible at any realistic cardinality.
  *
  * Determinism is the design constraint (the driver hash-compares against
  * DuckDB): the row hash is md5 — not xxhash64/Murmur, whose seeds differ
  * across engines — so both engines fill IDENTICAL registers:
  *   bucket = first 2 hex chars of md5(value)      (8 bits, 0..255)
  *   rho    = leading-zero count of the next 14 hex chars + 1 (1..57)
  * and the estimate is derived via an EXACT integer register sum
  * S = Σ 2^(57-reg) (BigInt here, HUGEINT in the oracle — the float form
  * Σ 2^-reg is order-sensitive in the last ulp), then ONE float division:
  * est = α·m²·2^57 / S, written as the same IEEE expression in both
  * engines. The linear-counting branch 256·ln(256/V) has only 256 possible
  * inputs; Java, DuckDB and CPython agree on all of them at %.6e
  * (verified), and HllSpec pins the Java values.
  *
  * Buffer layout: 256 register bytes. eval returns
  * struct(zeros INT, est DOUBLE) so queries can surface the live branch.
  */
case class HllAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  import HllAgg._

  override def dataType: DataType = StructType(Seq(
    StructField("zeros", IntegerType, nullable = false),
    StructField("est", DoubleType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll expects STRING input (cast keys explicitly), got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  // first 8 md5 digest bytes big-endian == first 16 hex chars of
  // md5(value); bucket = top byte, rho over the low 56 bits
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] =
    updateBuffer(buf, child.eval(input))

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val (zeros, est) = estimate(buf)
    InternalRow(zeros, est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The register-exposing twin of [[HllAgg]]: identical md5-seeded
  * update/merge, but eval returns the raw 256-byte register array
  * (BinaryType) instead of the folded estimate — the form sketch SET
  * OPERATIONS need. Register arrays are mergeable by element-wise max
  * (union), so audience-overlap questions at 100 TB move types×256 bytes
  * instead of re-scanning the fact table per slice combination; the
  * estimate over a union (and inclusion-exclusion intersections) is then
  * pure column arithmetic — see EventAnalytics.ev_hll_overlap. */
case class HllRegsAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  import HllAgg._

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_regs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_regs expects STRING input (cast keys explicitly), got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] =
    updateBuffer(buf, child.eval(input))
  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }
  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(o: Int): HllRegsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HllAgg {
  val M = 256 // registers; p = 8 bits of bucket

  /** Shared register update: md5 the value, route to the first-byte
    * bucket, keep the max rho of the 56-bit tail (see class doc). */
  private[functions] def updateBuffer(buf: Array[Byte], v: Any): Array[Byte] = {
    if (v != null) {
      val md = digest.get()
      md.reset()
      md.update(v.asInstanceOf[UTF8String].getBytes)
      val d = md.digest()
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      val bucket = (h >>> 56).toInt
      val tail = h & 0x00ffffffffffffffL
      val rho =
        if (tail == 0L) 57
        else java.lang.Long.numberOfLeadingZeros(tail) - 7
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  /** 2^(57-reg) for reg in 0..57 — the exact integer register weights. */
  private val PowTable: Array[BigInt] =
    Array.tabulate(58)(r => BigInt(1) << (57 - r))

  /** α_m · m² · 2^57 with the SAME folding order as the oracle SQL:
    * (0.7213/(1.0 + 1.079/256.0)) * 65536.0 * 2^57 — the two divisions
    * round once each; the power-of-two multiplies are exact. */
  private val Numerator: Double =
    0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 144115188075855872.0

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** String-input register update — the streaming-state entry point
    * (StreamingOps.runningDistinct holds the same 256-byte array in
    * flatMapGroupsWithState state). */
  def updateString(buf: Array[Byte], s: String): Array[Byte] =
    updateBuffer(buf, UTF8String.fromString(s))

  /** (zeros, estimate) from a register array — the identical IEEE op
    * sequence to the DuckDB oracle: exact BigInt register sum, one cast,
    * one divide, the linear-counting branch below 2.5·m. */
  def estimate(buf: Array[Byte]): (Int, Double) = {
    var zeros = 0
    var s = BigInt(0)
    var i = 0
    while (i < M) {
      if (buf(i) == 0) zeros += 1
      s += PowTable(buf(i))
      i += 1
    }
    val raw = Numerator / s.toDouble
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    (zeros, est)
  }

  /** Shared builder (per-session registry AND GraftExtensions). */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 1,
      s"graft_hll expects (key), got ${exprs.length} arguments")
    HllAgg(exprs.head).toAggregateExpression()
  }

  /** Shared builder for the register-exposing twin. */
  val regsBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 1,
      s"graft_hll_regs expects (key), got ${exprs.length} arguments")
    HllRegsAgg(exprs.head).toAggregateExpression()
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll", builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll_regs", regsBuilder, "built-in")
  }

  /** Requires register(spark) on the session first (or GraftExtensions). */
  def hll(c: Column): Column = call_function("graft_hll", c)

  /** Raw 256-byte register array — the mergeable sketch form. */
  def hllRegs(c: Column): Column = call_function("graft_hll_regs", c)
}
