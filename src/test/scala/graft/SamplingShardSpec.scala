package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** The round-7 sharded token-budget sampler (two-level running sum over
  * 256 hash-prefix shards) must be EXACTLY the old single-window sampler
  * — same cum_tokens, same kept set — while bounding every task by the
  * largest 1/256th slice of a stratum instead of the whole stratum.
  *
  * Three pins:
  *  1. ScalaCheck equality vs BOTH the retained naive single-window form
  *     and a driver-side md5-order replay (the definition), on random
  *     corpora where stratum assignment is drawn from a 90%-one-stratum
  *     frequency — the real pre-training regime (en ≈ 50-90%) the r6
  *     verdict flagged;
  *  2. the same equality for tokenBudgetMix's per-stratum budgets
  *     (including strata absent from the budget map → defaultBudget);
  *  3. a 400k-row mega-stratum straggler probe: with the whole corpus 90%
  *     one language, no task in any heavyweight stage may run far beyond
  *     its stage median — the single-window form provably fails this
  *     shape (one task walks 360k rows).
  */
class SamplingShardSpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  /** Driver-side replay of the sampler definition: per stratum, walk docs
    * in (md5(id:salt), id) order accumulating tokens; kept iff the doc
    * STARTS under budget. */
  private def model(rows: Seq[(Long, String, Long)],
      budget: String => Long): Map[Long, (Long, Int)] =
    rows.groupBy(_._2).flatMap { case (st, rs) =>
      val ordered = rs.sortBy { case (id, _, _) => (md5hex(s"$id:sample:v1"), id) }
      var cum = 0L
      ordered.map { case (id, _, tok) =>
        val kept = if (cum < budget(st)) 1 else 0
        cum += tok
        id -> ((cum, kept))
      }
    }

  private def collectSample(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Int)] =
    df.select("doc_id", "cum_tokens", "kept").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap

  test("property: sharded sampler == naive window == md5-order replay " +
      "under 90%-one-stratum skew") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val genCase = for {
      nStrata <- Gen.choose(1, 4)
      // 90% of docs land on stratum 0 — the mega-stratum regime
      n <- Gen.choose(1, 120)
      strata <- Gen.listOfN(n, Gen.frequency(
        9 -> Gen.const(0), 1 -> Gen.choose(0, nStrata - 1)))
      tokens <- Gen.listOfN(n, Gen.frequency(
        1 -> Gen.const(0L), 5 -> Gen.choose(1L, 50L)))
      budget <- Gen.oneOf(0L, 1L, 100L, 2000L)
    } yield (strata.zip(tokens).zipWithIndex.map {
      case ((s, t), i) => (i.toLong, s"lang$s", t)
    }, budget)

    val prop = Prop.forAll(genCase) { case (rows, budget) =>
      val df = rows.toDF("doc_id", "stratum", "n_tokens").repartition(5)
      val sharded = collectSample(
        Sampling.tokenBudgetSample(df, "stratum", "n_tokens", budget))
      val naive = collectSample(
        Sampling.tokenBudgetSampleNaive(df, "stratum", "n_tokens", budget))
      val replay = model(rows, _ => budget)
      val ok = sharded == naive && sharded == replay
      if (!ok) info(s"budget=$budget sharded=$sharded naive=$naive replay=$replay")
      ok
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"sharded sampler property falsified: ${res.status}")
  }

  test("property: sharded mix == per-stratum-budget replay incl. " +
      "default-budget strata") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val genCase = for {
      n <- Gen.choose(1, 100)
      strata <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.const(0), 2 -> Gen.choose(0, 3)))
      tokens <- Gen.listOfN(n, Gen.choose(0L, 40L))
      b0 <- Gen.choose(0L, 1500L)
      b1 <- Gen.choose(0L, 300L)
      dflt <- Gen.oneOf(0L, 50L)
    } yield (strata.zip(tokens).zipWithIndex.map {
      case ((s, t), i) => (i.toLong, s"lang$s", t)
    }, Map("lang0" -> b0, "lang1" -> b1), dflt)

    val prop = Prop.forAll(genCase) { case (rows, budgets, dflt) =>
      val df = rows.toDF("doc_id", "stratum", "n_tokens").repartition(3)
      val got = collectSample(
        Sampling.tokenBudgetMix(df, "stratum", "n_tokens", budgets, dflt))
      val want = model(rows, st => budgets.getOrElse(st, dflt))
      val ok = got == want
      if (!ok) info(s"budgets=$budgets dflt=$dflt got=$got want=$want")
      ok
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"sharded mix property falsified: ${res.status}")
  }

  test("mega-stratum probe: 400k docs, 90% one lang — no straggler task") {
    // default 400k runs on every `sbt test`; GRAFT_SAMPLER_PROBE_N=4000000
    // is the 10× regime recorded in COVERAGE.md (same shape, same asserts)
    val n = sys.env.get("GRAFT_SAMPLER_PROBE_N").map(_.toLong)
      .getOrElse(400000L)
    // 90% en, the rest across 9 cold langs; tokens vary so cum sums are
    // non-trivial; budget keeps roughly half the hot stratum
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) < 9, "en")
        .otherwise(concat(lit("l"), pmod(col("id"), lit(9)))).as("stratum"),
      (lit(100L) + pmod(col("id"), lit(7))).as("n_tokens"))

    val tasks = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null && e.taskInfo.successful) tasks.synchronized {
          tasks.getOrElseUpdate(e.stageId, mutable.ArrayBuffer.empty) +=
            e.taskInfo.duration
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val result =
      try {
        val out = Sampling.tokenBudgetSample(docs, "stratum", "n_tokens",
            budget = 18000000L)
          .groupBy("stratum")
          .agg(count(lit(1)).as("n"), sum("kept").as("n_kept"),
            max("cum_tokens").as("total_tokens"))
          .collect()
        // drain the async listener bus: wait until task counts stabilize
        var last = -1; var stable = 0; var waited = 0
        while (stable < 5 && waited < 15000) {
          val now = tasks.synchronized(tasks.valuesIterator.map(_.length).sum)
          if (now == last) stable += 1 else { stable = 0; last = now }
          Thread.sleep(100); waited += 100
        }
        out
      } finally spark.sparkContext.removeSparkListener(listener)

    // correctness of the aggregate shape: the hot stratum keeps ~178k of
    // 360k docs (18M budget / ~100.9 avg tokens + the one straddler)
    val en = result.find(_.getString(0) == "en").get
    assert(en.getLong(1) === n / 10L * 9L)
    val enKept = en.getLong(2)
    assert(enKept > 170000L && enKept < 190000L, s"en kept $enKept")
    // total_tokens must equal the true stratum token sum — the sharded
    // offsets reconstructed the exact global running sum
    val expectedEnTokens = (0L until n).filter(_ % 10 < 9)
      .map(i => 100L + i % 7).sum
    assert(en.getLong(3) === expectedEnTokens)

    // no straggler: in every stage heavy enough to measure, max task
    // within 8× of median (the single-window form puts 90% of the corpus
    // in ONE task of the window stage and blows far past this)
    tasks.synchronized {
      tasks.view.filter(_._2.length >= 4).foreach { case (stage, ds) =>
        val sorted = ds.toSeq.sorted
        val median = sorted(sorted.length / 2).max(1L)
        if (median >= 50L) {
          val ratio = sorted.last.toDouble / median
          assert(ratio <= 8.0,
            s"stage $stage: max ${sorted.last}ms vs median ${median}ms " +
              s"(${ratio}×) — mega-stratum straggler")
        }
      }
    }
  }
}
