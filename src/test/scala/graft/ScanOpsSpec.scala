package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.ScanOps

/** ScanOps must reproduce single-partition Window.orderBy results exactly
  * while staying distributed (input forced across 8 range partitions).
  * Data includes nulls, runs of equal sort keys resolved by a unique
  * tiebreaker, and partitions whose every value is null (so carries must
  * cross more than one boundary).
  */
class ScanOpsSpec extends SparkSpec {

  // 2,000 rows, deterministic: id unique, key has heavy ties, v is ~40% null
  private lazy val df: DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    (1 to 2000).map { i =>
      val v: Option[Long] =
        if (rng.nextDouble() < 0.4) None else Some(rng.nextInt(1000).toLong)
      val mark = if (rng.nextDouble() < 0.02) 1 else 0
      (i.toLong, i / 7, v, mark)
    }.toDF("id", "key", "v", "mark").repartition(16)
  }

  private def rows(d: DataFrame, cols: String*): Seq[Seq[Any]] =
    d.select(cols.map(col): _*).collect().toSeq
      .map(_.toSeq)
      .sortBy(_.head.asInstanceOf[Long])

  test("runningSum matches single-partition window (exclusive + inclusive)") {
    val w = Window.orderBy("key", "id")
    val expectedEx = df.withColumn("rs",
      coalesce(sum(col("mark")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
    val gotEx = ScanOps.runningSum(df, Seq("key", "id"), col("mark"), "rs",
      inclusive = false, numPartitions = 8)
    assert(rows(gotEx, "id", "rs") === rows(expectedEx, "id", "rs"))

    val expectedIn = df.withColumn("rs",
      sum(col("mark")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val gotIn = ScanOps.runningSum(df, Seq("key", "id"), col("mark"), "rs",
      inclusive = true, numPartitions = 8)
    assert(rows(gotIn, "id", "rs") === rows(expectedIn, "id", "rs"))
  }

  test("rowNumber matches single-partition window") {
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy("key", "id")).cast("long"))
    val got = ScanOps.rowNumber(df, Seq("key", "id"), "rn", numPartitions = 8)
    assert(rows(got, "id", "rn") === rows(expected, "id", "rn"))
  }

  test("prevNonNull matches single-partition window, carries across empty partitions") {
    val w = Window.orderBy("key", "id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df.withColumn("pv",
      last(col("v"), ignoreNulls = true).over(w))
    val got = ScanOps.prevNonNull(df, Seq("key", "id"), Seq("v" -> "pv"),
      numPartitions = 8)
    assert(rows(got, "id", "pv") === rows(expected, "id", "pv"))

    // all-null high range: the carry must cross the final partitions intact
    val sparse = df.withColumn("v",
      when(col("id") > 200, lit(null).cast("long")).otherwise(col("v")))
    val expectedSparse = sparse.withColumn("pv",
      last(col("v"), ignoreNulls = true).over(w))
    val gotSparse = ScanOps.prevNonNull(sparse, Seq("key", "id"),
      Seq("v" -> "pv"), numPartitions = 8)
    assert(rows(gotSparse, "id", "pv") === rows(expectedSparse, "id", "pv"))
  }

  test("lagK and leadK match single-partition windows across boundaries") {
    val w = Window.orderBy("key", "id")
    for (k <- Seq(1, 2, 5)) {
      val expectedLag = df.withColumn("lv", lag(col("v"), k).over(w))
      val gotLag = ScanOps.lagK(df, Seq("key", "id"), "v", "lv", k,
        numPartitions = 8)
      assert(rows(gotLag, "id", "lv") === rows(expectedLag, "id", "lv"),
        s"lag($k)")

      val expectedLead = df.withColumn("lv", lead(col("v"), k).over(w))
      val gotLead = ScanOps.leadK(df, Seq("key", "id"), "v", "lv", k,
        numPartitions = 8)
      assert(rows(gotLead, "id", "lv") === rows(expectedLead, "id", "lv"),
        s"lead($k)")
    }
  }

  test("lagK seeds reach back through partitions smaller than k") {
    import spark.implicits._
    // 12 rows over 8 partitions: most partitions hold 1-2 rows < k=5
    val tiny = (1 to 12).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .repartition(4)
    val expected = tiny.withColumn("p",
      lag(col("s"), 5).over(Window.orderBy("id")))
    val got = ScanOps.lagK(tiny, Seq("id"), "s", "p", 5, numPartitions = 8)
    assert(rows(got, "id", "p") === rows(expected, "id", "p"))
  }

  test("property: boundary carry == single window at adversarial partition counts") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    import spark.implicits._

    // Random inputs with HEAVY duplicate ordering keys (key ∈ [0,8), so
    // repartitionByRange must split tie runs across partition boundaries)
    // and a unique tiebreaker id; v is ~40% null so prevNonNull's carry is
    // exercised, including all-null partitions at high partition counts.
    val genRows: Gen[List[(Long, Int, Option[Long])]] = for {
      n <- Gen.choose(1, 180)
      keys <- Gen.listOfN(n, Gen.choose(0, 7))
      vs <- Gen.listOfN(n, Gen.frequency(
        2 -> Gen.const(Option.empty[Long]),
        3 -> Gen.choose(0L, 50L).map(Option(_))))
    } yield keys.lazyZip(vs).lazyZip(0 until n).map {
      case (k, v, i) => (i.toLong, k, v)
    }.toList

    val order = Seq("key", "id")
    val prop = Prop.forAll(genRows) { rowsIn =>
      val base = rowsIn.toDF("id", "key", "v").repartition(5)
      val w = Window.orderBy("key", "id")
      val expected = base
        .withColumn("rs", coalesce(sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("pv", last(col("v"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("lg", lag(col("v"), 3).over(w))
      val want = rows(expected, "id", "rs", "rn", "pv", "lg")
      Seq(1, 2, 7, 64).forall { np =>
        // one chained plan per partition count; explicit numPartitions pins
        // the distributed path (the np=1 degenerate case included)
        var d = ScanOps.runningSum(base, order, col("v"), "rs",
          inclusive = false, numPartitions = np)
        d = ScanOps.rowNumber(d, order, "rn", numPartitions = np)
        d = ScanOps.prevNonNull(d, order, Seq("v" -> "pv"), numPartitions = np)
        d = ScanOps.lagK(d, order, "v", "lg", k = 3, numPartitions = np)
        val got = rows(d, "id", "rs", "rn", "pv", "lg")
        val ok = got == want
        if (!ok) info(s"MISMATCH at numPartitions=$np for n=${rowsIn.size}:" +
          s"\n got ${got.take(10)}\nwant ${want.take(10)}")
        ok
      }
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"ScanOps property falsified: ${res.status}")
  }

  test("Generate gate is expansion-aware: tiny explodes fast-path, billed expansion trips the guard") {
    import spark.implicits._
    val base = (1 to 50).map(i => (i.toLong, Seq.fill(4)(i.toLong)))
      .toDF("id", "xs")
    val exploded = base.select(col("id"), explode(col("xs")).as("x"))
      .withColumn("k", col("id") * 10 + col("x"))
    // a KB-scale exploded frame: the 16x-per-Generate bill still fits the
    // default 128 MB budget, so the single-window fast path engages...
    val fast = ScanOps.rowNumber(exploded, Seq("k", "id"), "rn")
    assert(!fast.queryExecution.optimizedPlan.toString.contains("__scan_pid"),
      "expected the global-window fast path for a tiny exploded frame")
    // ...and produces exactly the distributed answer
    def sorted(d: DataFrame) = d.select("id", "x", "rn").collect().toSeq
      .map(_.toSeq).sortBy(r => (r(2).asInstanceOf[Long]))
    val dist = ScanOps.rowNumber(exploded, Seq("k", "id"), "rn",
      numPartitions = 8)
    assert(sorted(fast) === sorted(dist))

    // shrink the budget to 4x the child estimate: the Generate-free frame
    // still fast-paths, but one Generate (billed GenerateExpansion = 16x)
    // must trip the guard and force the distributed path — the OOM guard
    // survives the r5 softening
    val est = exploded.queryExecution.optimizedPlan.stats.sizeInBytes
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, (est * 4).toString)
      val guarded = ScanOps.rowNumber(exploded, Seq("k", "id"), "rn")
      assert(guarded.queryExecution.optimizedPlan.toString
        .contains("__scan_pid"),
        "expected the distributed path once the billed expansion " +
          s"(est=$est x 16) exceeds the ${est * 4} budget")
      val plain = base.select(col("id"), lit(0L).as("x"),
        (col("id") * 10).as("k"))
      val plainFast = ScanOps.rowNumber(plain, Seq("k", "id"), "rn")
      assert(!plainFast.queryExecution.optimizedPlan.toString
        .contains("__scan_pid"),
        "a Generate-free plan under the budget must keep the fast path")
    } finally spark.conf.set(key, old)
  }

  test("plan stays distributed: no whole-input single-partition window") {
    val got = ScanOps.runningSum(df, Seq("key", "id"), col("mark"), "rs",
      numPartitions = 8)
    // every window over the main input must be partitioned by the scan pid;
    // unpartitioned windows may only sit above the tiny per-partition
    // aggregate (one row per partition)
    val plan = got.queryExecution.optimizedPlan.toString
    assert(plan.contains("__scan_pid"), plan)
  }

  test("Funnel.steps == naive per-key sequential scan; nulls propagate") {
    import spark.implicits._
    import java.sql.Timestamp
    val rng = new scala.util.Random(13)
    val types = Seq("a", "b", "c")
    val evs = (1 to 3000).map { i =>
      val user = if (rng.nextDouble() < 0.05) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rng.nextInt(80).toLong)
      (i.toLong, user, types(rng.nextInt(3)),
        new Timestamp(1700000000000L + rng.nextInt(1000000) * 1000L))
    }
    val df = evs.toDF("event_id", "user_id", "event_type", "ts")
      .repartition(8)
    val got = graft.ops.Funnel.steps(df, Seq("a", "b", "c"))
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getInt(4)))).toMap
    // naive model: per user, ordered scan with strict-after mins
    val byUser = evs.filter(_._2 != null)
      .groupBy(_._2.longValue).view.mapValues(_.sortBy(_._4.getTime))
    val want = byUser.toSeq.flatMap { case (u, es) =>
      def us(t: Timestamp) = t.getTime * 1000L
      val t1 = es.filter(_._3 == "a").map(e => us(e._4)).minOption
      val t2 = t1.flatMap(p =>
        es.filter(e => e._3 == "b" && us(e._4) > p).map(e => us(e._4)).minOption)
      val t3 = t2.flatMap(p =>
        es.filter(e => e._3 == "c" && us(e._4) > p).map(e => us(e._4)).minOption)
      t1.map { _ =>
        val n = if (t3.isDefined) 3 else if (t2.isDefined) 2 else 1
        u -> ((t1.map(_.asInstanceOf[Any]), t2.map(_.asInstanceOf[Any]),
          t3.map(_.asInstanceOf[Any]), n))
      }
    }.toMap
    assert(got.keySet === want.keySet, "funnel keys must be step-1 reachers")
    got.foreach { case (u, g) =>
      assert(g === want(u), s"user $u: $g != ${want(u)}")
    }
    // report consistency: counts derive from the steps frame
    val rep = graft.ops.Funnel.report(df, Seq("a", "b", "c"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(rep(1) === want.size.toLong)
    assert(rep(2) === want.values.count(_._2.isDefined).toLong)
    assert(rep(3) === want.values.count(_._3.isDefined).toLong)
  }

  test("Funnel.stepLatency == naive lag percentiles (under-k exact) + exact mean") {
    import spark.implicits._
    import java.sql.Timestamp
    val rng = new scala.util.Random(13)
    val types = Seq("a", "b", "c")
    val evs = (1 to 3000).map { i =>
      val user = if (rng.nextDouble() < 0.05) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rng.nextInt(80).toLong)
      (i.toLong, user, types(rng.nextInt(3)),
        new Timestamp(1700000000000L + rng.nextInt(1000000) * 1000L))
    }
    val df = evs.toDF("event_id", "user_id", "event_type", "ts")
      .repartition(8)
    // ≤80 users < k=1024 → the sampled percentiles ARE the exact ones
    val got = graft.ops.Funnel.stepLatency(df, Seq("a", "b", "c"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(3), r.getLong(4),
        r.getLong(5), r.getDouble(6)))).toMap
    // naive lags from the (already naive-verified) steps semantics
    val steps = graft.ops.Funnel.steps(df, Seq("a", "b", "c")).collect()
    def lagsOf(iFrom: Int): Seq[Long] = steps.toSeq.flatMap { r =>
      (Option(r.get(iFrom)), Option(r.get(iFrom + 1))) match {
        case (Some(a: Long), Some(b: Long)) => Some(b - a)
        case _ => None
      }
    }
    def pct(v: Seq[Long], q: Double): Long = {
      val s = v.sorted.map(_.toDouble)
      val pos = (s.size - 1) * q
      val lo = pos.toInt
      val x = if (lo + 1 < s.size) s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
        else s(lo)
      math.floor(x + 0.5).toLong // HALF_UP on positive lags
    }
    (1 to 2).foreach { st =>
      val lags = lagsOf(st) // t{st}_us is column index st
      val (n, p50, p95, mean) = got(st)
      assert(n == lags.size.toLong, s"step $st count")
      assert(p50 == pct(lags, 0.5), s"step $st p50")
      assert(p95 == pct(lags, 0.95), s"step $st p95")
      val wantMean = BigDecimal(lags.map(BigDecimal(_)).sum.toDouble / lags.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(mean - wantMean) < 1e-6, s"step $st mean")
    }
  }

  test("Markov.stationary: exact fixed-point mass; absorbing chain drains to sink") {
    import spark.implicits._
    import java.sql.Timestamp
    def evd(seq: Seq[(Long, Long, String)]) = seq.map { case (eid, u, t) =>
      (eid, java.lang.Long.valueOf(u), t,
        new Timestamp(1700000000000L + eid * 1000))
    }.toDF("event_id", "user_id", "event_type", "ts")
    // period-2 chain (a↔b): uniform IS stationary — the integer
    // iteration must hold it exactly instead of oscillating drift
    val ab = evd((1L to 20L).map(i => (i, 1L, if (i % 2 == 1) "a" else "b")))
    val got1 = graft.ops.Markov.stationary(spark, ab).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got1 === Map("a" -> 500000L, "b" -> 500000L))
    // absorbing chain a → b → c⟲ (c has only a self-loop via the
    // mass-conserving patch-free path): all mass drains to the sink
    val abc = evd(Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"),
      (4L, 1L, "c"), (5L, 1L, "c")))
    val got2 = graft.ops.Markov.stationary(spark, abc).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 === Map("a" -> 0L, "b" -> 0L, "c" -> 1000000L))
    // mass conservation on the real fixture: Σ pi_micro is EXACTLY 10⁶
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val tot = graft.ops.Markov.stationary(spark, ev)
      .agg(sum("pi_micro")).first().getLong(0)
    assert(tot == 1000000L, s"mass must be exactly 1e6, got $tot")
  }

  test("Funnel.sessionPaths: gap split, step cap, deterministic cut") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(1700000000000L + sec * 1000)
    // user 1: two sessions split by a 2000s gap (paths a>b and c);
    // user 2: a 10-event session of alternating a/b — capped at 8 steps,
    //   counted truncated; user 3: a lone a>b session (ties with user
    //   1's first session path); null user dropped.
    val rows =
      Seq((1L, java.lang.Long.valueOf(1L), "a", t(0)),
        (2L, java.lang.Long.valueOf(1L), "b", t(10)),
        (3L, java.lang.Long.valueOf(1L), "c", t(2100)),
        (10L, java.lang.Long.valueOf(3L), "a", t(0)),
        (11L, java.lang.Long.valueOf(3L), "b", t(5))) ++
        (0 until 10).map(i => (20L + i, java.lang.Long.valueOf(2L),
          if (i % 2 == 0) "a" else "b", t(i.toLong))) :+
        ((99L, null.asInstanceOf[java.lang.Long], "z", t(0)))
    val ev = rows.toDF("event_id", "user_id", "event_type", "ts")
    val got = graft.ops.Funnel.sessionPaths(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet === Set(
      ("a>b", 2L, 0L),
      ("a>b>a>b>a>b>a>b", 1L, 1L),
      ("c", 1L, 0L)), s"got ${got.mkString(", ")}")
    // deterministic order: n DESC then path ASC
    assert(got.head === (("a>b", 2L, 0L)))
    assert(got.map(_._1).toSeq ===
      got.sortBy(x => (-x._2, x._1)).map(_._1).toSeq)
    // topN cut honors the total order
    val top1 = graft.ops.Funnel.sessionPaths(ev, topN = 1).collect()
    assert(top1.length === 1 && top1(0).getString(0) === "a>b")
  }

  test("Profile: exact == hand counts; approx within rsd of exact") {
    import spark.implicits._
    val df = Seq(
      (java.lang.Long.valueOf(1L), "x"), (java.lang.Long.valueOf(1L), "y"),
      (java.lang.Long.valueOf(2L), null), (null.asInstanceOf[java.lang.Long], "x"))
      .toDF("k", "s")
    val got = graft.ops.Profile.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got("k") === ((4L, 1L, 2L)))
    assert(got("s") === ((4L, 1L, 2L)))
    // the 100 TB twin tracks the exact form within HLL++ tolerance on a
    // real table (and null/row counts are exact by construction)
    val evf = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val exact = graft.ops.Profile.profile(evf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val approx = graft.ops.Profile.profileApprox(evf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    exact.foreach { case (c, (nr, nn, nd)) =>
      val (ar, an, ad) = approx(c)
      assert(ar === nr && an === nn, s"col $c row/null counts must be exact")
      assert(math.abs(ad - nd).toDouble <= math.max(1.0, 0.15 * nd),
        s"col $c distinct est $ad vs exact $nd")
    }
  }

  test("Funnel.retention == naive cohort/activity model") {
    import spark.implicits._
    import java.sql.Timestamp
    val rng = new scala.util.Random(29)
    val weekMs = 604800000L
    val t0 = 1700000000000L
    val evs = (1 to 2500).map { i =>
      val user = rng.nextInt(60).toLong
      val tp = if (rng.nextDouble() < 0.3) "signup" else "other"
      (i.toLong, user, tp,
        new Timestamp(t0 + rng.nextInt(6) * weekMs + rng.nextInt(100000) * 1000L))
    }
    val df = evs.toDF("event_id", "user_id", "event_type", "ts").repartition(8)
    val got = graft.ops.Funnel.retention(df)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def wk(t: Timestamp) = (t.getTime * 1000L) / 604800000000L
    val cohorts = evs.filter(_._3 == "signup").groupBy(_._2).view
      .mapValues(_.map(e => wk(e._4)).min).toMap
    val activity = evs.map(e => (e._2, wk(e._4))).toSet
    val want = cohorts.groupBy(_._2).flatMap { case (cw, members) =>
      val offsets = activity.filter(a => members.contains(a._1) && a._2 >= cw)
        .groupBy(_._2 - cw)
      offsets.map { case (off, acts) =>
        val nAct = acts.map(_._1).size.toLong
        val nCoh = members.size.toLong
        (cw, off) -> ((nAct, nCoh,
          BigDecimal(nAct.toDouble / nCoh)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    assert(got === want, s"retention matrix mismatch")
    assert(got.nonEmpty && got.keys.map(_._2).max >= 1,
      "fixture must span multiple week offsets")
  }
}
