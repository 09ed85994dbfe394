package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

/** Backward as-of join: <= matching, per-key isolation, no-match nulls,
  * tolerance, and equivalence with a naive range-join ground truth. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private val left = Seq(
    (1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"),
    (2L, 15L, "f1"), (3L, 50L, "g1")).toDF("k", "ord", "name")
  private val right = Seq(
    (1L, 10L, 100.0), (1L, 18L, 200.0),
    (2L, 1L, 300.0), (4L, 5L, 400.0)).toDF("k", "ord", "v")

  test("backward: latest right with ord <= left ord, per key") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "ord", Seq("v"))
      .orderBy("k", "ord").collect()
    val got = out.map(r => (r.getAs[Long]("k"), r.getAs[Long]("ord"),
      Option(r.getAs[Any]("asof_ord")), Option(r.getAs[Any]("asof_v"))))
    assert(got.toSeq === Seq(
      (1L, 5L, None, None),              // nothing at or before 5
      (1L, 10L, Some(10L), Some(100.0)), // equal ord matches (<=)
      (1L, 20L, Some(18L), Some(200.0)),
      (2L, 15L, Some(1L), Some(300.0)),
      (3L, 50L, None, None)))            // key 3 has no right rows at all
  }

  test("tolerance nulls stale matches") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "ord", Seq("v"),
      tolerance = Some(5L)).orderBy("k", "ord").collect()
    val got = out.map(r => (r.getAs[Long]("k"), r.getAs[Long]("ord"),
      Option(r.getAs[Any]("asof_v"))))
    assert(got.toSeq === Seq(
      (1L, 5L, None),
      (1L, 10L, Some(100.0)),   // gap 0 <= 5
      (1L, 20L, Some(200.0)),   // gap 2 <= 5
      (2L, 15L, None),          // gap 14 > 5 → stale
      (3L, 50L, None)))
  }

  test("matched right row with NULL payload supersedes older non-null rows") {
    val l = Seq((1L, 10L)).toDF("k", "ord")
    val r = Seq((1L, 5L, Option(100.0)), (1L, 8L, Option.empty[Double]))
      .toDF("k", "ord", "v")
    val out = AsOfJoin.backward(l, r, Seq("k"), "ord", Seq("v"))
      .collect().head
    // DuckDB ASOF semantics: the ord=8 row wins even though its payload
    // is NULL — the payload must not leak from the stale ord=5 row
    assert(out.getAs[Long]("asof_ord") === 8L)
    assert(out.getAs[Any]("asof_v") === null)
  }

  test("matches naive range-join ground truth on random data") {
    val rnd = new scala.util.Random(7)
    val l = Seq.fill(300)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "ord")
    val r = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(100).toDouble)).distinct
      .toDF("k", "ord", "v")
      // unique per (k, ord) as the operator requires
      .groupBy("k", "ord").agg(max(col("v")).as("v"))
    val fast = AsOfJoin.backward(l, r, Seq("k"), "ord", Seq("v"))
      .groupBy("k", "ord")
      .agg(max(col("asof_ord")).as("asof_ord"),
        max(col("asof_v")).as("asof_v"))
    // ground truth: join ALL right rows of the key, keep the max
    // (ord, v) struct among those at-or-before; max ignores nulls so
    // no-match rows survive with null payloads
    val naive = l.join(r.select(col("k"), col("ord").as("rord"),
          col("v").as("rv")),
        Seq("k"), "left")
      .groupBy("k", "ord")
      .agg(max(when(col("rord") <= col("ord"),
        struct(col("rord"), col("rv")))).as("m"))
      .select(col("k"), col("ord"), col("m.rord").as("asof_ord"),
        col("m.rv").as("asof_v"))
    val a = fast.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.getAs[Any]("asof_ord")), Option(r.getAs[Any]("asof_v")))).toSet
    val b = naive.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.getAs[Any]("asof_ord")), Option(r.getAs[Any]("asof_v")))).toSet
    assert(a === b)
  }
}
