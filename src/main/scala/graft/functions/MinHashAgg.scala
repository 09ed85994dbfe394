package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature as ONE native aggregate: for each seed
  * `i < n`, the minimum of `md5(concat('i|', shingle))` over the group —
  * value-identical to `min(md5('i|' || shingle))` per seed (hex encoding
  * is monotonic in unsigned byte order, so min-of-hex == hex-of-min), and
  * that per-seed form is exactly what the DuckDB oracle computes.
  *
  * Why not 16 × `min(md5(...))` columns: that plan allocates 16 hex
  * UTF8Strings per input row and runs them through a 16-string-wide
  * hash-aggregate — on a dedup corpus the string churn in the aggregate,
  * not the hashing, dominates the whole pipeline. Here the state is 16
  * raw 16-byte digests (one fixed 256-byte buffer per doc), updates are
  * digest-reusing byte compares with zero allocation on the
  * no-new-minimum path, and hex materializes once per GROUP, not per row.
  * Partial aggregation (map-side combine) and buffer merge work as for
  * any Spark aggregate, so the shuffle carries one small buffer per doc
  * per partition.
  */
case class MinHashAgg(
    child: Expression,
    n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Array[Byte]]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash seed count must be positive, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects STRING input, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Array[Byte]] =
    new Array[Array[Byte]](n)

  override def update(buf: Array[Array[Byte]], input: InternalRow):
      Array[Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) {
      val in = v.asInstanceOf[UTF8String].getBytes
      val md = MinHashAgg.digest.get()
      var i = 0
      while (i < n) {
        md.reset()
        md.update(MinHashAgg.prefix(i))
        md.update(in)
        val d = md.digest()
        if (buf(i) == null ||
            java.util.Arrays.compareUnsigned(d, buf(i)) < 0) buf(i) = d
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Array[Byte]], b2: Array[Array[Byte]]):
      Array[Array[Byte]] = {
    var i = 0
    while (i < n) {
      if (b1(i) == null ||
          (b2(i) != null &&
            java.util.Arrays.compareUnsigned(b2(i), b1(i)) < 0)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Array[Byte]]): Any = {
    if (buf(0) == null) return null // no non-null input in the group
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val d = buf(i)
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = MinHashAgg.Hex((d(j) >> 4) & 0xf)
        hex(2 * j + 1) = MinHashAgg.Hex(d(j) & 0xf)
        j += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    // fixed layout: n × (1 presence byte + 16 digest bytes)
    val out = new Array[Byte](n * 17)
    var i = 0
    while (i < n) {
      if (buf(i) != null) {
        out(i * 17) = 1
        System.arraycopy(buf(i), 0, out, i * 17 + 1, 16)
      }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (bytes(i * 17) == 1)
        buf(i) = java.util.Arrays.copyOfRange(bytes, i * 17 + 1, i * 17 + 17)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashAgg {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".getBytes("US-ASCII")
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(64)(i => s"$i|".getBytes("UTF-8"))

  private def prefix(i: Int): Array[Byte] =
    if (i < prefixes.length) prefixes(i) else s"$i|".getBytes("UTF-8")

  /** Shared builder (per-session registry AND GraftExtensions). */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2,
      s"graft_minhash expects (text, n), got ${exprs.length} arguments")
    val n = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
        v.toString.toInt
      case other => throw new IllegalArgumentException(
        s"graft_minhash n must be a literal, got $other")
    }
    MinHashAgg(exprs.head, n).toAggregateExpression()
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", builder, "built-in")

  /** Requires register(spark) on the session first. */
  def minhash(c: Column, n: Int): Column =
    call_function("graft_minhash", c, org.apache.spark.sql.functions.lit(n))
}
