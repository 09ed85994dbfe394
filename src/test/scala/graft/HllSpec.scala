package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.HllAgg

/** functions/HllAgg — the mergeable approximate-distinct sketch.
  * The cross-engine value identity is proven by the ev_hll_users oracle;
  * these cases pin the algebraic properties that make it safe at scale:
  * partition invariance (merge order can't change the answer), accuracy
  * within the m=256 error envelope, and both estimate branches. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def run(n: Int, partitions: Int): (Int, Double) = {
    HllAgg.register(spark)
    val df = spark.range(n.toLong).repartition(partitions)
      .select(concat(lit("key-"), col("id")).as("k"))
      .agg(HllAgg.hll(col("k")).as("h"))
      .select(col("h.zeros"), col("h.est"))
    val r = df.collect().head
    (r.getInt(0), r.getDouble(1))
  }

  test("partition invariance: 1, 4 and 64 partitions agree bit-for-bit") {
    val variants = Seq(1, 4, 64).map(p => run(10000, p))
    assert(variants.distinct.size == 1,
      s"estimate must not depend on merge order, got $variants")
  }

  test("accuracy stays inside the 256-register error envelope") {
    // standard error 1.04/sqrt(256) = 6.5%; 3 sigma ≈ 20%
    for (n <- Seq(100, 1000, 10000, 100000)) {
      val (_, est) = run(n, 4)
      val err = math.abs(est - n) / n
      assert(err < 0.20, s"n=$n est=$est err=$err")
    }
  }

  test("small sets take the linear-counting branch exactly") {
    val (zeros, est) = run(10, 4)
    // 10 md5-random keys can collide into >=1 shared bucket, so derive
    // the expectation from the observed zero-register count.
    assert(zeros >= 246 && zeros < 256)
    assert(est == 256.0 * math.log(256.0 / zeros))
  }

  test("all-null group: zeros=256, estimate 0") {
    HllAgg.register(spark)
    val r = Seq[Option[String]](None, None).toDF("k")
      .agg(HllAgg.hll(col("k")).as("h"))
      .select(col("h.zeros"), col("h.est")).collect().head
    assert(r.getInt(0) == 256 && r.getDouble(1) == 0.0)
  }

  test("grouped sketches are independent per group") {
    HllAgg.register(spark)
    val df = spark.range(3000)
      .select((col("id") % 3).as("g"), concat(lit("u"), col("id")).as("k"))
      .groupBy("g").agg(HllAgg.hll(col("k")).as("h"))
      .select(col("g"), col("h.est"))
    val ests = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((_, est) <- ests) assert(math.abs(est - 1000) / 1000 < 0.25)
    // different key sets -> different registers with near-certainty
    assert(ests.values.toSeq.distinct.size == 3)
  }

  test("register sketches: union == sketch of the union; intersection tracks truth") {
    HllAgg.register(spark)
    // planted overlap: A = 0..5999, B = 4000..9999 → |A∪B| = 10000,
    // |A∩B| = 2000
    def regsOf(lo: Int, hi: Int): Array[Byte] =
      spark.range(lo.toLong, hi.toLong)
        .select(concat(lit("user-"), col("id")).as("k"))
        .agg(HllAgg.hllRegs(col("k")).as("r"))
        .collect().head.getAs[Array[Byte]](0)
    val (ra, rb) = (regsOf(0, 6000), regsOf(4000, 10000))
    val runion = regsOf(0, 10000)
    val merged = ra.zip(rb).map { case (x, y) => if (y > x) y else x }
    // the algebraic identity sketch set-ops rest on: register-max of two
    // sketches IS the sketch of the union of their inputs
    assert(merged.toSeq === runion.toSeq,
      "register-wise max must equal the union's own sketch")
    def estOf(regs: Array[Byte]): Double = {
      var zeros = 0
      var s = BigInt(0)
      regs.foreach { r =>
        if (r == 0) zeros += 1
        s += BigInt(1) << (57 - r)
      }
      val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
        144115188075855872.0 / s.toDouble
      if (raw <= 640.0 && zeros > 0) 256.0 * math.log(256.0 / zeros) else raw
    }
    val (ea, eb, eu) = (estOf(ra), estOf(rb), estOf(merged))
    val ei = math.max(0.0, ea + eb - eu)
    assert(math.abs(eu - 10000) / 10000 < 0.20, s"union est $eu")
    // inclusion-exclusion compounds three estimates' errors — the bound
    // is on the UNION size, not the intersection, so allow 3×6.5%·|A∪B|
    assert(math.abs(ei - 2000) < 0.20 * 10000, s"intersect est $ei")
  }

  test("sql surface: graft_hll through the per-session registry") {
    HllAgg.register(spark)
    spark.range(100).createOrReplaceTempView("hll_sql_in")
    val row = spark.sql(
      """SELECT h.zeros AS zeros, h.est AS est FROM (
        |  SELECT graft_hll(CAST(id AS STRING)) AS h FROM hll_sql_in) t
        |""".stripMargin).collect().head
    assert(row.getInt(0) < 256 && row.getDouble(1) > 50 &&
      row.getDouble(1) < 200)
  }
}
