package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming forms of the batch semantics (SURVEY.md §2.9):
  * the reference is batch-only, but its rollups/sessionization/anomaly
  * shapes are streaming-native — tumbling windows, session windows, and
  * keyed running state. The same column logic is shared with the batch
  * operators; only the source/sink differ.
  */
object StreamingOps {

  /** Upper bound on the decontam eval suite [[cleanStream]] will pack
    * into the per-executor probe set: 4M grams = 64 MB resident (16 B
    * per 128-bit digest) — the broadcast-budget line past which the
    * suite must be sharded, not shipped. */
  val MaxEvalGrams: Long = 4000000L

  /** Tumbling metric rollups over a (streaming) metrics frame:
    * groupBy(window(ts, Ns), role, metric) agg n/avg/max — the streaming
    * twin of DerivedTables.rollups. With `watermark` set, late rows beyond
    * it are dropped and windows finalize in append mode. */
  def rollupStream(metrics: DataFrame, intervalSeconds: Int = 60,
      watermark: String = "2 minutes"): DataFrame =
    metrics
      .withWatermark("ts", watermark)
      // group by the window STRUCT (it carries the event-time/watermark
      // metadata append mode needs); project .start only afterwards
      .groupBy(window(col("ts"), s"$intervalSeconds seconds"),
        col("role"), col("metric_name"))
      .agg(count(lit(1)).as("n"), avg(col("metric_value")).as("avg"),
        max(col("metric_value")).as("max"))
      .select(col("window.start").as("window_start"), col("role"),
        col("metric_name"), col("n"), col("avg"), col("max"))

  /** Session windows per key with a gap — the streaming twin of the
    * gaps-and-islands episode clustering (W5). */
  def sessionStream(events: DataFrame, keyCol: String,
      gapSeconds: Int = 60, watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapSeconds seconds"),
        col(keyCol))
      .agg(count(lit(1)).as("n_events"), max(col("severity")).as("max_severity"))
      .select(col(keyCol),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("n_events"),
        col("max_severity"))

  /** Streaming exact dedup on content hash: first occurrence of each
    * fingerprint passes, later duplicates are dropped. State is bounded
    * by the watermark — a fingerprint's dedup state expires once no
    * older-than-watermark duplicate can arrive, which is what makes
    * continuous corpus ingest (the 100 TB training-data path) feasible:
    * unbounded dedup state is recoverable from the batch table, the
    * stream only guards the recent horizon. */
  def dedupStream(docs: DataFrame, textCol: String = "text",
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .withColumn("fingerprint", graft.ops.Dedup.fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Continuous ingest into the partitioned event store: every
    * micro-batch is appended through the SAME writer the batch path uses
    * (`Store.writeEvents` — event_date directory partitioning, ts-sorted
    * files), so a live stream and a batch rebuild produce the identical
    * layout and every Store reader (the partition-pruned trace analytics
    * family) works unchanged over either. Exactly-once at the batch
    * level comes from the checkpoint; at 100 TB the per-batch
    * `repartition(event_date)` keeps one writer task per open day
    * instead of one tiny file per executor per day. */
  def ingestToStore(events: DataFrame, dir: String,
      checkpoint: String): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.sources.Store.writeEvents(batch, dir, mode = "append")
      }
      .start()

  /** Streaming benchmark-contamination alerts: a stream-static join of
    * the live ingest's word n-gram hashes against a STATIC eval-set gram
    * table (graft.ops.Decontam.ngramHashes output). Stream-static joins
    * are stateless in Structured Streaming — no watermark, no state
    * store; each micro-batch probes the broadcast eval grams exactly the
    * way the batch decontamination plan does, so flagged docs surface
    * DURING ingest instead of in a nightly sweep. Emits one row per
    * (doc, matching gram hash); dedupe/aggregate downstream if alert
    * volume matters. */
  def contaminationAlerts(docs: DataFrame, evalGrams: DataFrame,
      n: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val grams = docs
      .select(col(idCol),
        explode(array_distinct(graft.functions.TextFunctions.gramMd5(
          col(textCol), n, clip = true))).as("gram"))
    grams.join(broadcast(evalGrams.select(col("gram")).distinct()),
      Seq("gram"), "inner")
  }

  /** Streaming near-duplicate ingest alerts: each arriving doc's MinHash
    * signature is computed STATELESSLY as a per-row projection (array_min
    * over the doc's shingle array per seed — value-identical to the
    * batch MinHashAgg, which is a groupBy aggregate and therefore not
    * stream-friendly without state), banded, and probed against the
    * STATIC corpus band index (`Dedup.bands(Dedup.minhashSignatures(...))`
    * of the existing corpus — the same stored index the batch
    * `incrementalAdmit` probes). Stream-static inner join → stateless,
    * no watermark. Emits one row per (doc_id, old_id, band) collision —
    * NOT distinct-ed (distinct on a stream would need state); a pair
    * colliding in several bands alerts once per band, dedupe downstream
    * if alert volume matters. */
  def nearDupAlerts(docs: DataFrame, corpusBands: DataFrame,
      hashes: Int = 16, bandCount: Int = 4, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val rows = hashes / bandCount
    val bandStructs = (0 until bandCount).map { k =>
      struct(lit(k).as("band"), bandHash(k, rows).as("bh"))
    }
    docs
      .withColumn("__w", split(col(textCol), " "))
      .withColumn("__sh", shingleArray)
      .select(col(idCol) +: sigCols(hashes): _*)
      .select(col(idCol), explode(array(bandStructs: _*)).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.bh").as("bh"))
      .join(broadcast(
        corpusBands.select(col("doc_id").as("old_id"), col("band"), col("bh"))),
        Seq("band", "bh"), "inner")
      .select(col(idCol), col("old_id"), col("band"))
  }

  /** 3-word shingle array over the pre-split `__w` column — the per-row
    * twin of Dedup.shingles' explode. */
  private def shingleArray: org.apache.spark.sql.Column = expr(
    "array_distinct(transform(sequence(1, greatest(size(__w)-2, 1)), i -> concat_ws(' ', slice(__w, i, 3))))")

  /** Per-row MinHash signature columns `__m0..` over `__sh` —
    * value-identical to the batch MinHashAgg (min over the shingle set
    * per seed), as a stateless projection. */
  private def sigCols(hashes: Int) = (0 until hashes).map { i =>
    array_min(expr(s"transform(__sh, s -> md5(concat('$i|', s)))"))
      .as(s"__m$i")
  }

  /** Band-k hash over `rows` consecutive signature columns. */
  private def bandHash(k: Int, rows: Int): org.apache.spark.sql.Column =
    md5(concat((0 until rows).map(r => col(s"__m${rows * k + r}")): _*))

  /** The full cleaning pipeline's per-doc keep decision DURING ingest —
    * the streaming twin of `ops.CleanPipeline.decisions`, entirely
    * STATELESS (no watermark, no state store, decisions emit in the same
    * micro-batch the doc arrives in):
    *
    *  - quality + repetition gates are per-row projections (the
    *    repetition top-gram via `TextAnalysis.top2GramStats`' sorted
    *    array fold — no explode/groupBy);
    *  - the dedup gate runs in the INCREMENTAL regime (the only regime a
    *    stream can see): each doc probes the STATIC corpus index —
    *    content-hash table + per-band MinHash bucket sets — through
    *    key-unique stream-static left joins, exactly the batch
    *    `Dedup.incrementalAdmit` semantics (admit ⇔ no exact hit and no
    *    band collision). Batch-vs-corpus self-dedup (connected
    *    components) stays the nightly batch job's business;
    *  - the decontam gate probes the benchmark suite's gram hashes
    *    through `AnyGramInSet` — the eval digests packed into one sorted
    *    long[] shipped per executor inside the task binary; each doc
    *    binary-searches it in O(g · log |eval|), so per-doc cost is
    *    independent of eval-set size (a 1M-gram suite is 16 MB resident
    *    and ~20 compares per gram, vs the former collected-array
    *    `arrays_overlap` scan that was O(|eval|) PER DOCUMENT).
    *    Membership is exact on the full 128-bit digest — same gate, same
    *    hashes, no bloom false-positive path to confirm.
    *
    * Each static side is key-unique (distinct hashes / distinct bucket
    * hashes per band / one row of grams), so the stream keeps exactly
    * one output row per ingested doc. Returns (idCol, is_quality,
    * not_repetitive, dedup_keep, not_contaminated, keep). */
  def cleanStream(docs: DataFrame, corpusBands: DataFrame,
      corpusHashes: DataFrame, evalGrams: DataFrame,
      cfg: graft.ops.CleanPipeline.Config = graft.ops.CleanPipeline.Config(),
      hashes: Int = 16, bandCount: Int = 4, idCol: String = "doc_id",
      textCol: String = "text",
      maxEvalGrams: Long = MaxEvalGrams): DataFrame = {
    val rows = hashes / bandCount
    val n = cfg.decontamN
    // static side, materialized ONCE at stream build: the eval suite's
    // distinct gram digests, packed sorted for the per-row binary probe.
    // The pack rides inside the task binary shipped to every executor
    // (16 B/gram), so its size is a broadcast budget, not a data plan —
    // fail FAST at stream build past the documented bound (the
    // jaccardPairs guard pattern) instead of collecting an unbounded
    // suite onto the driver and shipping a multi-GB closure.
    val distinctGrams = evalGrams.select(col("gram")).distinct()
    val nGrams = distinctGrams.count()
    require(nGrams <= maxEvalGrams,
      s"cleanStream eval suite has $nGrams distinct grams; the packed " +
        s"probe set is bounded at $maxEvalGrams (${16L * maxEvalGrams >> 20} MB " +
        "resident per executor). Shard the eval suite across gates or " +
        "pre-filter it to the benchmark splits this stream must guard.")
    val packedEval = graft.functions.AnyGramInSet.pack(
      distinctGrams.collect().map(_.getString(0)))
    val base = docs
      .withColumn("__w", split(col(textCol), " "))
      .withColumn("__sh", shingleArray)
      .withColumn("__g8", array_distinct(
        graft.functions.TextFunctions.gramMd5(col(textCol), n, clip = true)))
      .withColumn("__top2", graft.ops.TextAnalysis.top2GramStats(col(textCol)))
      .withColumn("__content_hash", md5(col(textCol)))
    val withSig = base.select(col("*") +: sigCols(hashes): _*)
    val withBands = (0 until bandCount).foldLeft(withSig) { (df, k) =>
      df.withColumn(s"__bh$k", bandHash(k, rows))
    }
    val exactIdx = corpusHashes
      .select(col("content_hash").as("__content_hash")).distinct()
      .withColumn("__exact_hit", lit(1))
    val probed = (0 until bandCount).foldLeft(
        withBands.join(exactIdx, Seq("__content_hash"), "left")) { (df, k) =>
      val idx = corpusBands.filter(col("band") === k)
        .select(col("bh").as(s"__bh$k")).distinct()
        .withColumn(s"__nd$k", lit(1))
      df.join(idx, Seq(s"__bh$k"), "left")
    }
    val ndHit = (0 until bandCount).map(k => col(s"__nd$k").isNotNull)
      .reduce(_ || _)
    val toks = col("__w")
    probed
      .withColumn("is_quality",
        when(size(toks) >= cfg.minTokens &&
          size(filter(toks, x => x.isin(cfg.stopwords: _*))).cast("double") /
            size(toks) < cfg.maxStopFrac, 1).otherwise(0))
      .withColumn("not_repetitive",
        when((col("__top2")("cnt") * length(col("__top2")("gram")))
          .cast("double") / greatest(length(col(textCol)), lit(1)) <
            cfg.maxTopGramFrac, 1).otherwise(0))
      .withColumn("dedup_keep",
        when(col("__exact_hit").isNull && !ndHit, 1).otherwise(0))
      .withColumn("not_contaminated",
        when(!graft.functions.AnyGramInSet.anyGramInSet(
          col("__g8"), packedEval), 1).otherwise(0))
      .withColumn("keep",
        when(col("is_quality") === 1 && col("not_repetitive") === 1 &&
          col("dedup_keep") === 1 && col("not_contaminated") === 1, 1)
          .otherwise(0))
      .select(col(idCol), col("is_quality"), col("not_repetitive"),
        col("dedup_keep"), col("not_contaminated"), col("keep"))
  }

  /** Streaming EMBEDDING near-duplicate ingest alerts — the
    * vector-modality twin of `nearDupAlerts`: each arriving embedding's
    * hyperplane-LSH bucket ids are computed STATELESSLY per row (the same
    * sign-bit projection the batch `VectorSearch` paths use, seeded
    * identically), exploded per table, and probed against the STATIC
    * bucketed corpus index (`VectorSearch.explodedBuckets` of the
    * existing corpus — the stored index shape). Candidates sharing a
    * bucket in any table verify by EXACT cosine against `threshold`, so
    * precision is exact and recall is the usual LSH bargain. Stream-static
    * inner join → stateless, no watermark/state store. Emits one row per
    * (vec_id, old_id, tbl) collision that clears the threshold — a pair
    * colliding in several tables alerts once per table (distinct-ing a
    * stream would need state); dedupe downstream if volume matters.
    * `bits` must be given explicitly: a stream has no count() to size
    * autoBits from — size it from the STORED corpus count at deploy
    * time. */
  def embNearDupAlerts(vecs: DataFrame, corpusBuckets: DataFrame,
      dim: Int, threshold: Double, bits: Int, tables: Int = 4,
      seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(bits > 0, "bits must be sized from the stored corpus count")
    val q = graft.ops.VectorSearch.explodedBuckets(
      vecs.withColumn("__qnrm",
        sqrt(graft.functions.GraftFunctions.dotProduct(col(vecCol), col(vecCol)))),
      vecCol, dim, bits, tables, seed)
      .select(col(idCol), col(vecCol).as("__qvec"), col("__qnrm"),
        col("tbl"), col("bucket"))
    q.join(
        corpusBuckets.select(col(idCol).as("old_id"),
          col(vecCol).as("__nvec"), col("nrm").as("__nnrm"),
          col("tbl"), col("bucket")),
        Seq("tbl", "bucket"), "inner")
      .filter(col(idCol) =!= col("old_id"))
      .withColumn("cosine",
        graft.functions.GraftFunctions.dotProduct(col("__qvec"), col("__nvec")) /
          (col("__qnrm") * col("__nnrm")))
      .filter(col("cosine") >= threshold)
      .select(col(idCol), col("old_id"), col("tbl"), col("cosine"))
  }

  /** ==== streaming image near-dup alerts ==== the multimodal twin of
    * [[embNearDupAlerts]]: each ARRIVING image decodes to its perceptual
    * aHash per-partition (a stateless projection — no state store, no
    * watermark), bands exactly as `Multimodal.imageNearDupPairs`, and
    * probes the STATIC corpus band index (`Multimodal.bandedHashes` over
    * the stored fingerprints) via a stream-static inner join; candidates
    * verify by exact XOR popcount ≤ `maxDist`. Unlike the LSH alert
    * there is NO recall trade: banding is exact by pigeonhole
    * (maxDist < bands), so every stored near-duplicate of an arriving
    * image alerts. Emits one row per shared band like the other alerts
    * (distinct-ing a stream needs state) — dedupe downstream if volume
    * matters. Returns (media_id, old_id, band, hamming). */
  def imageNearDupAlerts(media: Dataset[graft.ops.Multimodal.MediaRecord],
      corpusBands: DataFrame, maxDist: Int = 3, bands: Int = 4,
      grid: Int = 8): DataFrame = {
    require(maxDist >= 0 && maxDist < bands,
      s"exact recall needs maxDist < bands (pigeonhole), got $maxDist/$bands")
    val hashed = graft.ops.Multimodal.imageAHash(media, grid).toDF()
    graft.ops.Multimodal.bandedHashes(hashed, "media_id", "ahash", bands)
      .select(col("media_id"), col("ahash").as("__h"),
        col("band"), col("key"))
      .join(corpusBands.select(col("media_id").as("old_id"),
        col("ahash").as("__oh"), col("band"), col("key")),
        Seq("band", "key"), "inner")
      .filter(col("media_id") =!= col("old_id"))
      .withColumn("hamming", bit_count(col("__h").bitwiseXOR(col("__oh"))))
      .filter(col("hamming") <= maxDist)
      .select(col("media_id"), col("old_id"), col("band"),
        col("hamming").cast("int").as("hamming"))
  }

  case class DistinctPoint(key: String, value: String,
      ts: java.sql.Timestamp = null)
  case class HllState(n_seen: Long, regs: Array[Byte])
  case class RunningDistinct(key: String, n_seen: Long, zeros: Int,
      est: Double)

  /** State-TTL plumbing shared by the three keyed running carriers.
    * `stateTtlMs = 0` (the default) keeps the exact NoTimeout semantics —
    * state lives forever and the batch twin is bit-for-bit unchanged.
    * `stateTtlMs > 0` bounds key-cardinality growth on 100-TB streams
    * (keys churn; an abandoned key's 8-to-24k-byte state must not
    * accumulate forever): the input gets an event-time watermark
    * (`watermarkDelay`) and each key's state an EventTimeTimeout at
    * (current watermark + ttl), re-armed on every arrival — once the
    * watermark passes a key's last-activity horizon its state is
    * REMOVED, and a later re-arrival starts a fresh, correct
    * sketch/sample seeded only by post-eviction rows (spec-pinned).
    * Nothing is emitted at eviction; the last pre-eviction emission
    * already carried the final state. */
  private def armTtl[S](state: GroupState[S], stateTtlMs: Long): Unit =
    if (stateTtlMs > 0L)
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + stateTtlMs)

  /** Keyed RUNNING approximate-distinct — the streaming carrier of the
    * HLL sketch (functions.HllAgg): per key, hold the SAME md5-seeded
    * 256-byte register array across triggers (state = EXACTLY 8 + 256
    * bytes per key FOREVER — a distinct-count stream that runs
    * indefinitely), and after each trigger emit the current (zeros,
    * estimate). Register max is commutative/idempotent and the hash is a
    * pure function of the value — not of arrival order, trigger
    * boundaries, or duplication — so the emission after the last trigger
    * is EXACTLY the batch `graft_hll` over everything seen, which is
    * what lets a batch execution of this operator be oracle-verified
    * (`ev_streaming_distinct`) and StreamingSpec pin stream == batch
    * across micro-batches. */
  def runningDistinct(points: Dataset[DistinctPoint],
      stateTtlMs: Long = 0L,
      watermarkDelay: String = "10 minutes"): Dataset[RunningDistinct] = {
    import points.sparkSession.implicits._
    import graft.functions.HllAgg
    val src = if (stateTtlMs > 0L)
      points.withWatermark("ts", watermarkDelay) else points
    val timeout = if (stateTtlMs > 0L) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (key: String, rows: Iterator[DistinctPoint],
            state: GroupState[HllState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val s0 = state.getOption.getOrElse(
            HllState(0L, new Array[Byte](HllAgg.M)))
          val regs = s0.regs.clone()
          var n = s0.n_seen
          rows.foreach { p =>
            if (p.value != null) HllAgg.updateString(regs, p.value)
            n += 1
          }
          state.update(HllState(n, regs))
          armTtl(state, stateTtlMs)
          val (zeros, est) = HllAgg.estimate(regs)
          Iterator.single(RunningDistinct(key, n, zeros, est))
          }
        })
  }

  case class QuantilePoint(key: String, row_key: String, value: Double,
      ts: java.sql.Timestamp = null)
  case class QuantileState(n_seen: Long, sample: Array[Byte])
  case class RunningQuantiles(key: String, n_seen: Long,
      quantiles: Seq[Double])

  /** Keyed RUNNING sampled quantiles — the streaming carrier of round
    * 8's bounded-state percentile (functions.PctSampleAgg): per key,
    * maintain the SAME deterministic bottom-k-by-md5(row_key) sample
    * across triggers (state = the serialized sample, AT MOST 4 + 24·k
    * bytes per key forever — a quantile stream that runs indefinitely),
    * and after each trigger emit the current interpolated quantiles.
    * Because the sample rule is a pure function of the row keys — not of
    * arrival order or trigger boundaries — the emission after the last
    * trigger is EXACTLY the batch `graft_pct_sample` over everything
    * seen, which is what lets a batch execution of this operator be
    * oracle-verified (`ev_streaming_quantile`) and StreamingSpec pin
    * stream == batch across micro-batches. */
  def runningQuantiles(points: Dataset[QuantilePoint],
      pcts: Seq[Double], k: Int = 1024,
      stateTtlMs: Long = 0L,
      watermarkDelay: String = "10 minutes"): Dataset[RunningQuantiles] = {
    import points.sparkSession.implicits._
    import graft.functions.PctSampleAgg
    val src = if (stateTtlMs > 0L)
      points.withWatermark("ts", watermarkDelay) else points
    val timeout = if (stateTtlMs > 0L) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (key: String, rows: Iterator[QuantilePoint],
            state: GroupState[QuantileState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val s0 = state.getOption.getOrElse(
            QuantileState(0L, PctSampleAgg.serializeBuffer(
              new PctSampleAgg.Buffer(k))))
          val buf = PctSampleAgg.deserializeBuffer(s0.sample, k)
          var n = s0.n_seen
          rows.foreach { p =>
            PctSampleAgg.insertKeyed(buf, p.row_key, p.value)
            n += 1
          }
          state.update(QuantileState(n, PctSampleAgg.serializeBuffer(buf)))
          armTtl(state, stateTtlMs)
          Option(PctSampleAgg.quantilesOf(buf, pcts))
            .map(qs => RunningQuantiles(key, n, qs.toSeq)).iterator
          }
        })
  }

  case class MetricPoint(metric: String, ts: java.sql.Timestamp, value: Double)
  /** Exact integer power sums at cent scale (n, Σc, Σc²) — sumSq rides as
    * DECIMAL(38,0) through the state encoder; the math runs in BigInt. */
  case class MetricState(n: Long, sumCents: Long, sumSqCents: BigDecimal)
  case class Flagged(metric: String, ts: java.sql.Timestamp, value: Double,
      zscore: Double)

  /** Keyed running anomaly gate: per metric key, maintain running state
    * across triggers and emit points whose z-score against the
    * state-so-far exceeds the threshold — the streaming twin of the
    * per-event z-score gate, with true incremental state instead of a
    * global recompute.
    *
    * The state is EXACT integer power sums of the 2-dp values at cent
    * scale (n, Σcents, Σcents²) rather than float Welford (mean, M2):
    * z² = (c·n − S)²·(n−1) / ((Q·n − S²)·n) with every term an exact
    * integer, so the SAME BigInt numerator/denominator arise from any
    * fold order or engine, and the only float ops are one cast-divide-
    * sqrt from those exact integers — bit-identical everywhere. The
    * Welford form was algebraically the same z but accumulated in
    * floats, and at 100×-scale groups (~2M rows/metric) its ulp drift
    * near the threshold flipped ~20 boundary rows vs the oracle's
    * windowed VAR_SAMP — caught by the round-8 full-registry 100× gate.
    * Exactness rests on the engine-wide 2-dp data contract (QueryDef's
    * DECIMAL(18,2) convention); `centsScale` generalizes the precision.
    *
    * `sortWithinTrigger` orders each group's rows by (ts, value) before
    * folding. In a live stream, rows fold in arrival order (per trigger);
    * sorting makes the fold order — and therefore every emitted z — a
    * pure function of the data, which is what lets the batch execution
    * of this exact operator be value-verified against an external
    * oracle. (With exact state the STATE no longer depends on fold order
    * at all; ordering still pins which rows are scored before which.)
    * Cost: one in-memory sort of the rows a trigger delivers per key
    * (bounded by trigger size, not corpus size).
    *
    * Scale note: parallelism equals key cardinality — per-metric state is
    * inherently sequential. With few metrics and heavy streams, key by a
    * composite (metric, shard) and accept per-shard baselines, or keep
    * the gate behind the per-window rollup (rollupStream) so each task
    * folds pre-aggregated points; the state itself stays O(1) per key
    * either way. */
  def runningAnomalyGate(points: Dataset[MetricPoint],
      zThreshold: Double = 3.0, minSamples: Long = 3,
      sortWithinTrigger: Boolean = false,
      centsScale: Double = 100.0,
      stateTtlMs: Long = 0L,
      watermarkDelay: String = "10 minutes"): Dataset[Flagged] = {
    import points.sparkSession.implicits._
    val src = if (stateTtlMs > 0L)
      points.withWatermark("ts", watermarkDelay) else points
    val timeout = if (stateTtlMs > 0L) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.metric)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (metric: String, rows: Iterator[MetricPoint],
            state: GroupState[MetricState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val s0 = state.getOption.getOrElse(
            MetricState(0L, 0L, BigDecimal(0)))
          var n = s0.n
          var sum = s0.sumCents
          var q = s0.sumSqCents.toBigInt
          val out = scala.collection.mutable.ArrayBuffer.empty[Flagged]
          val ordered =
            if (sortWithinTrigger)
              // full microsecond precision: getTime truncates to millis,
              // so two sub-millisecond neighbors would fold in a different
              // order than the oracle's microsecond ORDER BY derives
              rows.toSeq.sortBy(p => (p.ts.toInstant.getEpochSecond * 1000000L
                + p.ts.toInstant.getNano / 1000L, p.value)).iterator
            else rows
          ordered.foreach { p =>
            val c = Math.round(p.value * centsScale)
            if (n >= minSamples) {
              val num = (BigInt(c) * n - sum).pow(2) * (n - 1)
              val den = (q * n - BigInt(sum).pow(2)) * n
              if (den.signum > 0) {
                // the ONLY float ops: one cast each, one divide, one sqrt
                // — identical IEEE sequence to the oracle's
                val z = math.sqrt(num.toDouble / den.toDouble)
                if (z > zThreshold) out += Flagged(metric, p.ts, p.value, z)
              }
            }
            // update AFTER scoring: each point is judged against the
            // history before it (streaming semantics)
            n += 1
            sum += c
            q += BigInt(c) * BigInt(c)
          }
          state.update(MetricState(n, sum, BigDecimal(q)))
          armTtl(state, stateTtlMs)
          out.iterator
          }
        })
  }

  case class FunnelPoint(key: Long, step: Int, us: Long,
      ts: java.sql.Timestamp = null)
  /** t(i) = epoch-micros of funnel step i+1, [[FunnelUnset]] when the key
    * has not reached it. The set entries are strictly increasing and form
    * a prefix (step i can only be set once step i-1 is). */
  case class FunnelState(t: Array[Long])
  case class RunningFunnel(key: Long, t_us: Seq[Long], steps_completed: Int)

  val FunnelUnset: Long = Long.MinValue

  /** Keyed RUNNING ordered funnel — the streaming carrier of
    * [[graft.ops.Funnel.steps]]: per key, hold ONLY the t₁..tₙ step-time
    * vector across triggers (state = EXACTLY 8·n bytes per key, TTL-able
    * like the other carriers) and after each trigger emit the key's
    * current (step times, steps_completed) — `t_us` carries the completed
    * prefix, so `get(t_us, i-1)` is tᵢ or null, matching the batch
    * schema.
    *
    * Within a trigger the group's rows fold SORTED by (us, step), and the
    * sorted greedy fold IS the batch funnel: t₁ is set by the earliest
    * step-1 event before any later event folds; a step-i event at time s
    * folds after tᵢ₋₁ is final (s > tᵢ₋₁ means it sorts later), so the
    * first accepted one is exactly min{s ∈ Sᵢ : s > tᵢ₋₁} — and events
    * skipped while tᵢ₋₁ was unset are ≤ the eventual tᵢ₋₁, which the
    * batch's STRICTLY-after rule excludes too. Hence one batch = the
    * whole corpus (the registered `ev_streaming_funnel` execution)
    * reproduces `Funnel.steps` bit-for-bit on ANY input order, and a
    * multi-trigger stream reproduces it whenever each key's triggers
    * arrive event-time ordered (the watermark contract). Cross-trigger
    * LATE data degrades gracefully, never inconsistently: a late step-1
    * event lowers t₁ (the chain t₁<t₂<… stays valid); a late step-i
    * event refines tᵢ only against evidence still in hand — the t-vector
    * cannot recall step-i events discarded in earlier triggers (that
    * would take unbounded state), which is the documented approximation.
    *
    * Scale note: the per-trigger sort is bounded by what the trigger
    * delivers per key, not the corpus. In the batch-as-oracle execution a
    * key's ENTIRE history sorts in one task — that is the verification
    * harness's cost; a batch job wants [[graft.ops.Funnel.steps]], whose
    * conditional-min plan never materializes a key's event list. */
  def runningFunnel(points: Dataset[FunnelPoint], nSteps: Int,
      stateTtlMs: Long = 0L,
      watermarkDelay: String = "10 minutes"): Dataset[RunningFunnel] = {
    require(nSteps >= 2, "a funnel needs at least two steps")
    import points.sparkSession.implicits._
    val src = if (stateTtlMs > 0L)
      points.withWatermark("ts", watermarkDelay) else points
    val timeout = if (stateTtlMs > 0L) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (key: Long, rows: Iterator[FunnelPoint],
            state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val t = state.getOption.map(_.t.clone())
            .getOrElse(Array.fill(nSteps)(FunnelUnset))
          val ordered = rows.toArray.sortBy(p => (p.us, p.step))
          ordered.foreach { p =>
            val i = p.step - 1
            if (i == 0) {
              if (t(0) == FunnelUnset || p.us < t(0)) t(0) = p.us
            } else if (i > 0 && i < nSteps && t(i - 1) != FunnelUnset &&
                p.us > t(i - 1) &&
                (t(i) == FunnelUnset || p.us < t(i))) {
              t(i) = p.us
            }
          }
          if (t(0) == FunnelUnset) {
            // no step-1 evidence yet: batch emits nothing for this key,
            // and (strictly-after) its step-2+ events seen so far could
            // never have counted — hold no state at all
            Iterator.empty
          } else {
            state.update(FunnelState(t))
            armTtl(state, stateTtlMs)
            val done = t.takeWhile(_ != FunnelUnset)
            Iterator.single(RunningFunnel(key, done.toSeq, done.length))
          }
          }
        })
  }

  case class DedupPoint(key: String, doc_id: Long,
      ts: java.sql.Timestamp = null)
  case class DedupAdmit(key: String, doc_id: Long, admitted: Boolean)

  /** Keyed RUNNING exact-dedup — the streaming carrier of fingerprint
    * dedup (continuous-ingest admission: the first document carrying a
    * content fingerprint is admitted, every later copy rejected). State
    * per fingerprint is ONLY the winning doc_id — 8 bytes, TTL-able —
    * so the admission set never materializes.
    *
    * Within a trigger rows fold SORTED by doc_id, so a single-batch
    * execution admits exactly the per-fingerprint MINIMUM id — the batch
    * dedup rule, which is what the registered `doc_streaming_dedup`
    * oracle verifies. Across triggers the winner is FIRST-SEEN: a later
    * trigger cannot dethrone it even with a smaller id (re-admitting
    * would retract the earlier rejection — unbounded output revision),
    * which equals the batch rule whenever delivery is id-ordered — the
    * same contract as the other carriers.
    *
    * Memory bounds, precisely: cross-trigger STATE is O(1) per key (the
    * 8-byte winner), but the per-trigger fold buffers each key's rows
    * delivered IN THAT TRIGGER (`rows.toArray.sortBy`) — O(rows per key
    * per trigger) task memory, which in the single-batch oracle
    * execution is the key's entire history on one task. That is the
    * verification harness's cost, not the streaming deployment's (a
    * trigger delivers an interval's worth of rows). Two unbounded-horizon
    * caveats: (a) with no TTL the state map grows with |distinct
    * fingerprints| — 8 bytes each, honest but unbounded; admission-
    * forever semantics at corpus scale belongs to the store-backed
    * [[graft.ops.Dedup.incrementalAdmit]], with TTL'd runningDedup as
    * the windowed-recency form; (b) a fingerprint hot WITHIN one trigger
    * buffers all its copies in the fold — cap the trigger interval, not
    * this operator. */
  def runningDedup(points: Dataset[DedupPoint],
      stateTtlMs: Long = 0L,
      watermarkDelay: String = "10 minutes"): Dataset[DedupAdmit] = {
    import points.sparkSession.implicits._
    val src = if (stateTtlMs > 0L)
      points.withWatermark("ts", watermarkDelay) else points
    val timeout = if (stateTtlMs > 0L) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (key: String, rows: Iterator[DedupPoint],
            state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = rows.toArray.sortBy(_.doc_id)
            val out = Seq.newBuilder[DedupAdmit]
            var has = state.exists
            var winner = if (has) state.get else Long.MinValue
            ordered.foreach { p =>
              if (!has) {
                winner = p.doc_id; has = true
                out += DedupAdmit(key, p.doc_id, admitted = true)
              } else {
                out += DedupAdmit(key, p.doc_id, admitted = false)
              }
            }
            if (has) { state.update(winner); armTtl(state, stateTtlMs) }
            out.result().iterator
          }
        })
  }

  case class SessionPoint(key: Long, eid: Long, sec: Long,
      ts: java.sql.Timestamp = null)
  /** The OPEN session only: its running index, extrema, the previous
    * event's sec (the gap test is against the PREVIOUS event in eid
    * order, not the max — events need not be time-ordered by eid), and
    * its event count. Fixed 40 bytes per key, forever. */
  case class SessionState(idx: Long, minSec: Long, maxSec: Long,
      lastSec: Long, n: Long)
  case class RunningSession(key: Long, session_id: Long, n_events: Long,
      start_sec: Long, end_sec: Long, closed: Boolean)

  /** Keyed RUNNING gap-sessionization — the streaming carrier of the W5
    * gaps-and-islands operator (the `ev_sessionize` semantics: per key,
    * events in eid order start a new session when the gap to the
    * PREVIOUS event exceeds `gapSec`; session stats are min/max/count
    * over its events). State per key is ONLY the open session's 40-byte
    * summary — never an event list — so a key with 10⁹ events costs the
    * same as one with 10.
    *
    * Each trigger folds its rows SORTED by eid and emits every session
    * CLOSED by the fold (final — no later event can re-open it, because
    * eid-ordered delivery means all its members have arrived) plus the
    * currently-open session's refined summary (closed = false; a later
    * trigger may extend it, and the LAST emission per (key, session_id)
    * is the settled value). A single-batch execution therefore
    * reproduces batch sessionization EXACTLY — every session appears
    * once, the final one open — which is what the registered
    * `ev_streaming_sessions` oracle verifies; StreamingSpec pins
    * multi-trigger == batch under eid-ordered delivery (the analogue of
    * the other carriers' event-time-ordered contract) and the TTL path.
    *
    * Memory bounds, precisely: cross-trigger STATE is the fixed 40
    * bytes, but the per-trigger fold buffers each key's rows delivered
    * in THAT trigger (`rows.toArray.sortBy`) — O(rows per key per
    * trigger) task memory. The "a key with 10⁹ events costs the same as
    * one with 10" claim is about state; in the single-batch oracle
    * execution the whole key sorts on one task (the harness's cost —
    * a batch job wants `ev_sessionize`'s window plan). A real streaming
    * deployment bounds the fold by the trigger interval. */
  def runningSessions(points: Dataset[SessionPoint], gapSec: Long = 1800L,
      stateTtlMs: Long = 0L,
      watermarkDelay: String = "10 minutes"): Dataset[RunningSession] = {
    require(gapSec >= 0L, s"session gap must be >= 0, got $gapSec")
    import points.sparkSession.implicits._
    val src = if (stateTtlMs > 0L)
      points.withWatermark("ts", watermarkDelay) else points
    val timeout = if (stateTtlMs > 0L) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (key: Long, rows: Iterator[SessionPoint],
            state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = rows.toArray.sortBy(_.eid)
            var cur = state.getOption.orNull
            val out = Seq.newBuilder[RunningSession]
            ordered.foreach { p =>
              cur match {
                case null =>
                  cur = SessionState(0L, p.sec, p.sec, p.sec, 1L)
                case s if p.sec - s.lastSec > gapSec =>
                  out += RunningSession(key, s.idx, s.n,
                    s.minSec, s.maxSec, closed = true)
                  cur = SessionState(s.idx + 1L, p.sec, p.sec, p.sec, 1L)
                case s =>
                  cur = SessionState(s.idx, math.min(s.minSec, p.sec),
                    math.max(s.maxSec, p.sec), p.sec, s.n + 1L)
              }
            }
            if (cur == null) Iterator.empty
            else {
              state.update(cur)
              armTtl(state, stateTtlMs)
              out += RunningSession(key, cur.idx, cur.n,
                cur.minSec, cur.maxSec, closed = false)
              out.result().iterator
            }
          }
        })
  }

  case class KmvPoint(key: String, v: String,
      ts: java.sql.Timestamp = null)
  case class KmvState(bytes: Array[Byte], n: Long)
  case class RunningKmv(key: String, n_rows: Long, distinct_est: Double)

  /** Keyed RUNNING distinct-cardinality monitor — the streaming carrier
    * of [[graft.functions.KmvAgg]] (the per-key "how many distinct X so
    * far" gauge: distinct users per event type, distinct fingerprints
    * per source, ...). State per key is the serialized KMV sketch plus a
    * row counter — at most 4 + 16·k + 8 bytes FOREVER, TTL-able.
    *
    * Because KMV insertion is commutative and duplicate-insensitive,
    * this carrier's batch equality needs NO delivery-order contract at
    * all (stronger than the funnel/session/dedup carriers'
    * ordered-delivery clause): any partitioning of any permutation of
    * the input through any trigger boundaries yields the same final
    * sketch, so the LAST emission per key always equals the batch
    * `graft_kmv` aggregate — which is what the registered
    * `ev_streaming_kmv` oracle verifies on a single-batch execution.
    * Each trigger emits the key's refined (n_rows, distinct_est);
    * estimates are exact below sketch capacity. */
  def runningKmv(points: Dataset[KmvPoint], k: Int = 256,
      stateTtlMs: Long = 0L,
      watermarkDelay: String = "10 minutes"): Dataset[RunningKmv] = {
    import points.sparkSession.implicits._
    import graft.functions.KmvAgg
    require(k >= 2, s"k must be >= 2, got $k")
    val src = if (stateTtlMs > 0L)
      points.withWatermark("ts", watermarkDelay) else points
    val timeout = if (stateTtlMs > 0L) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (key: String, rows: Iterator[KmvPoint],
            state: GroupState[KmvState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prior = state.getOption
            val buf = prior.map(p => KmvAgg.deserializeBuffer(p.bytes, k))
              .getOrElse(new KmvAgg.Buffer(k))
            var n = prior.map(_.n).getOrElse(0L)
            rows.foreach { p =>
              if (p.v != null) { KmvAgg.insertString(buf, p.v); n += 1 }
            }
            state.update(KmvState(KmvAgg.serializeBuffer(buf), n))
            armTtl(state, stateTtlMs)
            Iterator.single(RunningKmv(key, n, KmvAgg.estimate(buf)))
          }
        })
  }
}
