package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.trace._

/** CLI mirroring the reference's subcommand surface
  * (cli_wrapper/main.py:39-230): init / load / parse / query / stats /
  * export / pipeline / rollup / chunk — with a parquet table store per
  * "database" directory instead of a DuckDB file.
  *
  * Usage: graft.Cli --db <storeDir> <command> [args...]
  */
object Cli {

  case class Ctx(spark: SparkSession, store: String) {
    def path(t: String) = s"$store/$t"
    def read(t: String): DataFrame = spark.read.parquet(path(t))
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(path(t))
    /** Register every materialized table in the store as a view — whatever
      * load/rollup/chunk wrote (events, event_metrics, metric_baselines,
      * rollups_{N}s, chunks, ...), so `query`/`export` SQL can reach it. */
    def registerAll(): Unit = {
      val dirs = Option(new java.io.File(store).listFiles()).getOrElse(Array())
      // a completed PARQUET table: _SUCCESS plus at least one .parquet
      // data file (directly, or one level down for partitioned layouts).
      // The marker alone is not enough — csv/json exports written into
      // the store dir also carry _SUCCESS and must not register.
      def hasParquet(d: java.io.File): Boolean = {
        val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids.exists(f => f.isFile && f.getName.endsWith(".parquet")) ||
          kids.exists(f => f.isDirectory && hasParquet(f))
      }
      dirs.filter(d => d.isDirectory &&
          new java.io.File(d, "_SUCCESS").exists() && hasParquet(d))
        .foreach(d => read(d.getName).createOrReplaceTempView(d.getName))
    }
  }

  def main(args: Array[String]): Unit = sys.exit(run(args))

  /** Parses and runs; returns an exit code (testable without exiting). */
  def run(args: Array[String],
      sessionOverride: Option[SparkSession] = None): Int = {
    var db = "graft_store"
    val rest = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--db" => db = args(i + 1); i += 2
        case a => rest += a; i += 1
      }
    }
    if (rest.isEmpty) { println(usage); return 1 }
    val spark = sessionOverride.getOrElse(GraftSession.build("graft-cli"))
    val ctx = Ctx(spark, db)
    try {
      rest.head match {
        case "init" => init(ctx)
        case "load" => load(ctx, rest.tail.toSeq)
        case "parse" => parse(ctx, rest.tail.toSeq)
        case "query" => query(ctx, rest.tail.toSeq)
        case "stats" => stats(ctx)
        case "export" => export(ctx, rest.tail.toSeq)
        case "pipeline" => load(ctx, rest.tail.toSeq); rollup(ctx, Seq()); stats(ctx)
        case "rollup" => rollup(ctx, rest.tail.toSeq)
        case "chunk" => chunk(ctx, rest.tail.toSeq)
        case "forced-recovery" => forcedRecovery(ctx, rest.tail.toSeq)
        case "detect" => detect(ctx)
        case "clean" => clean(ctx, rest.tail.toSeq)
        case "split" => splitCmd(ctx, rest.tail.toSeq)
        case "pack" => pack(ctx, rest.tail.toSeq)
        case "sample" => sample(ctx, rest.tail.toSeq)
        case "redact" => redact(ctx, rest.tail.toSeq)
        case "score" => score(ctx, rest.tail.toSeq)
        case "shard" => shard(ctx, rest.tail.toSeq)
        case "compact" =>
          val (b, a) = graft.sources.Store.compactEvents(
            ctx.spark, ctx.path("events"))
          println(s"compacted events: $b files -> $a files")
        case other => println(s"unknown command: $other\n$usage"); return 1
      }
      0
    } finally if (sessionOverride.isEmpty) spark.stop()
  }

  val usage: String =
    """graft-log-analyzer — FoundationDB trace log analysis on Spark
      |  --db <dir>                 table store directory (default graft_store)
      |  init                       initialize an empty store
      |  load <path> [--stable-ids] ingest XML/JSON/plaintext logs + derive tables
      |       [--all]               path is a directory: recursively ingest every
      |                             .xml/.json/.log/.txt file, sorted
      |  parse <path> [--limit N]   parse and display, no storage
      |  query <sql>                SQL over events/event_metrics/... views
      |  stats                      severity/event/role/time-span report
      |  export <sql> <out> [--format csv|json|parquet] [--partitions N]
      |  pipeline <path>            load + rollup + stats
      |  rollup [--interval N]      materialize rollups_{N}s
      |  chunk [--marker E]         marker-based chunking + 500/100 splits
      |  forced-recovery [--trigger-comment S]
      |                             chunk trigger→StatusCode=14 windows; trigger =
      |                             CodeCoverage whose Comment contains S
      |                             (default "forced recovery", case-insensitive)
      |  detect                     run the detector battery
      |  clean <docs.parquet> [--eval <bench.parquet>] [--eval-mod N]
      |                             training-corpus cleaning pipeline (quality +
      |                             repetition + near-dup CC + decontamination);
      |                             writes clean_decisions / clean_docs (kept) /
      |                             clean_report. Eval set = the external
      |                             benchmark parquet, or the doc_id %% N = 0
      |                             holdout (default N=7)
      |  split <docs.parquet>       deterministic salted-md5 train/val/test
      |                             split; writes doc_splits + prints stats
      |  pack <docs.parquet> [--budget N] [--buckets N] [--examples]
      |                             greedy sequence packing into token-budget
      |                             bins (default 512 tokens, 8 bucket streams);
      |                             writes packed; --examples additionally
      |                             materializes packed_examples (one row per
      |                             bin with ordered members + concatenated
      |                             text)
      |  sample <docs.parquet> [--stratum COL] [--budget N]
      |         [--budgets k=v,k=v,...] [--default-budget N]
      |                             deterministic token-budget sampling per
      |                             stratum (default lang, 2000 tokens) or a
      |                             weighted per-stratum mix via --budgets;
      |                             writes doc_sample
      |  redact <docs.parquet>      PII-style scrub (emails, IPv4, 7+-digit
      |                             runs) of the text column; writes
      |                             doc_redacted (scrubbed text + per-pattern
      |                             counts) and prints per-source PII density
      |  score <docs.parquet> [--vocab V] [--bigram]
      |                             LM quality scores (avg -log2 p per
      |                             token, corpus-fit top-V model, default
      |                             V=1000); writes doc_lm_scores and
      |                             prints the per-source NLL distribution.
      |                             --bigram scores order-2 conditionals
      |                             instead (writes doc_lm_scores2)
      |  shard <docs.parquet> [--shards N]
      |                             deterministic md5-shuffle shard
      |                             addressing (default 8 shards); writes
      |                             doc_shards partitioned by shard, rows
      |                             in permutation order inside each file
      |  compact                    rewrite the events table into one ts-sorted
      |                             file per date partition (merges the small
      |                             files streaming ingest appends)
      |""".stripMargin

  private def init(ctx: Ctx): Unit = {
    new java.io.File(ctx.store).mkdirs()
    println(s"initialized store at ${ctx.store}")
  }

  private def load(ctx: Ctx, args: Seq[String]): Unit = {
    val stable = args.contains("--stable-ids")
    val all = args.contains("--all")
    val path = args.filterNot(_.startsWith("--")).headOption
      .getOrElse(sys.error("load requires a path"))
    val events = (if (all) {
      val files = TraceEvents.discover(path)
      if (files.isEmpty) sys.error(s"no supported log files under $path")
      println(s"loading ${files.length} files: ${files.take(5).mkString(", ")}" +
        (if (files.length > 5) ", ..." else ""))
      TraceEvents.loadAll(ctx.spark, files, stableIds = stable)
    } else TraceEvents.load(ctx.spark, path, stableIds = stable)).cache()
    // the events write materializes the cache; the five derived tables
    // then all read cached events and write to independent directories —
    // submit them as concurrent jobs (same win on a cluster: independent
    // write stages overlap instead of serializing on the driver)
    ctx.write(events, "events")
    val metrics = DerivedTables.eventMetrics(events)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    import scala.util.{Failure, Try}
    // dedicated bounded pool (not the global EC shared with library
    // callers); every write's outcome is collected so a multi-failure
    // load reports ALL failed tables, not just the first awaited one
    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val writes = Seq[(String, () => DataFrame)](
        "event_metrics" -> (() => metrics),
        "events_wide" -> (() => DerivedTables.eventsWide(events)),
        "processes" -> (() => DerivedTables.processes(events)),
        "process_roles" -> (() => DerivedTables.processRoles(events)),
        "metric_baselines" ->
          (() => DerivedTables.metricBaselines(metrics, minCount = 5))
      ).map { case (t, df) => Future(t -> Try(ctx.write(df(), t))) }
      val outcomes = Await.result(Future.sequence(writes), Duration.Inf)
      val failed = outcomes.collect { case (t, Failure(e)) => t -> e }
      if (failed.nonEmpty) {
        failed.foreach { case (t, e) =>
          System.err.println(s"[load] write of $t failed: ${e.getMessage}") }
        throw new RuntimeException(
          s"derived-table writes failed: ${failed.map(_._1).mkString(", ")}",
          failed.head._2)
      }
    } finally pool.shutdown()
    println(s"loaded ${events.count()} events from $path into ${ctx.store}")
  }

  private def parse(ctx: Ctx, args: Seq[String]): Unit = {
    val limit = opt(args, "--limit").map(_.toInt).getOrElse(10)
    val path = positionals(args, Set("--limit")).headOption
      .getOrElse(sys.error("parse requires a path"))
    TraceEvents.load(ctx.spark, path).show(limit, truncate = false)
  }

  private def query(ctx: Ctx, args: Seq[String]): Unit = {
    ctx.registerAll()
    ctx.spark.sql(args.mkString(" ")).show(50, truncate = false)
  }

  private def stats(ctx: Ctx): Unit = {
    val events = ctx.read("events").cache()
    println(s"events: ${events.count()}")
    println("— severity distribution —")
    GlobalScanner.severityCounts(events).show()
    println("— top event types —")
    GlobalScanner.eventHistogram(events, 5).show(truncate = false)
    println("— top roles —")
    events.filter(col("role").isNotNull).groupBy("role")
      .agg(count(lit(1)).as("n")).orderBy(col("n").desc).show(10)
    println("— time span —")
    GlobalScanner.timeSpan(events).show(truncate = false)
  }

  private def export(ctx: Ctx, args: Seq[String]): Unit = {
    val fmt = opt(args, "--format").getOrElse("csv")
    // single-file output for CLI parity with the reference's one-CSV
    // export; --partitions N is the escape hatch for big extracts
    val parts = opt(args, "--partitions").map { p =>
      p.toIntOption.filter(_ >= 1)
        .getOrElse(sys.error(s"--partitions must be a positive integer, got '$p'"))
    }.getOrElse(1)
    val positional = positionals(args, Set("--format", "--partitions"))
    val (sql, out) = (positional(0), positional(1))
    ctx.registerAll()
    // coalesce can only REDUCE partition count — an explicit request for
    // more output files than the plan has partitions needs a repartition
    val base = ctx.spark.sql(sql)
    val df = if (parts == 1) base.coalesce(1) else base.repartition(parts)
    fmt match {
      case "csv" => df.write.mode("overwrite").option("header", "true").csv(out)
      case "json" => df.write.mode("overwrite").json(out)
      case "parquet" => df.write.mode("overwrite").parquet(out)
      case other => sys.error(s"unsupported format $other")
    }
    println(s"exported to $out ($fmt)")
  }

  private def rollup(ctx: Ctx, args: Seq[String]): Unit = {
    val interval = opt(args, "--interval").map(_.toInt).getOrElse(60)
    val metrics = ctx.read("event_metrics")
    ctx.write(DerivedTables.rollups(metrics, interval), s"rollups_${interval}s")
    println(s"created rollups_${interval}s")
  }

  private def chunk(ctx: Ctx, args: Seq[String]): Unit = {
    val marker = opt(args, "--marker").getOrElse("MasterRecoveryState")
    // cache: the chunk frame (carried-state scan + collect_list groupBy)
    // is read by BOTH sinks plus the count/report — without it the whole
    // chunker recomputes four times
    val chunks = Chunker.chunkByMarker(ctx.read("events"), marker).cache()
    try {
      ctx.write(chunks, "chunks")
      ctx.write(Chunker.splitChunks(chunks), "chunk_pieces")
      println(s"wrote ${chunks.count()} chunks")
      chunks.select("chunk_id", "start_event_id", "end_event_id", "n_events",
        "chunk_type").show()
    } finally chunks.unpersist(false)
  }

  /** Forced-recovery chunking (forced_recovery/chunk_logs.py:26-69):
    * trigger events open a chunk that runs to the first
    * MasterRecoveryState StatusCode=14. The trigger predicate is
    * CodeCoverage + Comment-substring because the reference's chunker
    * module is absent upstream — SURVEY.md W8 documents the semantics. */
  private def forcedRecovery(ctx: Ctx, args: Seq[String]): Unit = {
    val needle = opt(args, "--trigger-comment").getOrElse("forced recovery")
    val trigger = col("event") === "CodeCoverage" &&
      lower(element_at(col("fields"), "Comment")).contains(needle.toLowerCase)
    val chunks = Chunker.forcedRecoveryChunks(ctx.read("events"), trigger)
    ctx.write(chunks, "forced_recovery_chunks")
    println(s"wrote ${chunks.count()} forced-recovery chunks")
    chunks.show(truncate = false)
  }

  private def detect(ctx: Ctx): Unit = {
    val events = ctx.read("events").cache()
    val metrics = DerivedTables.eventMetrics(events)
    val baselines = DerivedTables.metricBaselines(metrics, minCount = 5)
    val battery = Seq(
      "storage_pressure" -> Detectors.storagePressureAnomalies(events, baselines),
      "ratekeeper_throttling" -> Detectors.ratekeeperThrottling(events),
      "missing_tlogs" -> Detectors.missingTlogs(events),
      "recovery_loop" -> Detectors.recoveryLoops(events),
      "coordination_loss" -> Detectors.coordinationLoss(events),
      "metric_anomalies" -> Detectors.metricAnomalies(events),
      "zscore_hotspots" -> Detectors.zscoreHotspots(events),
      "baseline_window_anomalies" ->
        Detectors.baselineWindowAnomalies(metrics, baselines))
    battery.foreach { case (name, df) =>
      Detectors.summary(df).withColumn("detector", lit(name))
        .select("detector", "detected", "count", "first_ts", "last_ts")
        .show(truncate = false)
    }
    println("— rollback analysis —")
    GlobalScanner.rollbackStatus(events).show(truncate = false)
    println("— timeline —")
    TimelineBuilder.build(events).show(truncate = false)
  }

  /** Training-corpus cleaning (quality + repetition + near-dup CC +
    * decontam, one composed plan — ops.CleanPipeline). The eval
    * (benchmark) set is either an external parquet (--eval) or the
    * doc_id % N = 0 holdout of the corpus itself (--eval-mod, default 7
    * — the registered doc_clean_pipeline cut). */
  private def clean(ctx: Ctx, args: Seq[String]): Unit = {
    val evalPath = opt(args, "--eval")
    val evalMod = opt(args, "--eval-mod").map(_.toInt).getOrElse(7)
    val path = positionals(args, Set("--eval", "--eval-mod")).headOption
      .getOrElse(sys.error("clean requires a documents parquet path"))
    val docs = ctx.spark.read.parquet(path)
    val (train, eval) = evalPath match {
      case Some(p) => (docs, ctx.spark.read.parquet(p))
      case None => (docs.filter(col("doc_id") % evalMod =!= 0),
        docs.filter(col("doc_id") % evalMod === 0))
    }
    val decisions = graft.ops.CleanPipeline.decisions(train, eval)
    ctx.write(decisions, "clean_decisions")
    // kept corpus: the full original rows of every doc that passed all
    // gates (broadcast-free equi-join on doc_id; both sides big → SMJ)
    val decided = ctx.read("clean_decisions")
    ctx.write(
      train.join(decided.filter(col("keep") === 1).select("doc_id"), "doc_id"),
      "clean_docs")
    val report = graft.ops.CleanPipeline.report(decided).orderBy("source")
    ctx.write(report, "clean_report")
    println(s"cleaned ${ctx.read("clean_docs").count()} of ${train.count()} docs kept")
    report.show(truncate = false)
    // decisions() caches the train projection for its four gates and the
    // caller owns the unpersist — drop it now that every output is
    // written, so a long-lived CLI/REPL session doesn't retain the corpus
    train.unpersist()
  }

  /** Deterministic salted-md5 train/val/test split (13/2/1 of 16). */
  private def splitCmd(ctx: Ctx, args: Seq[String]): Unit = {
    val path = positionals(args, Set.empty).headOption
      .getOrElse(sys.error("split requires a documents parquet path"))
    val split = graft.ops.Sampling.deterministicSplit(
      ctx.spark.read.parquet(path))
    ctx.write(split.select("doc_id", "h", "split"), "doc_splits")
    println("wrote doc_splits")
    ctx.read("doc_splits").groupBy("split")
      .agg(count(lit(1)).as("n_docs")).orderBy("split").show()
  }

  /** Greedy sequence packing into (bucket, bin) token-budget examples;
    * --examples additionally materializes one row per bin with the
    * ordered member list and the concatenated text the tokenizer sees. */
  private def pack(ctx: Ctx, args: Seq[String]): Unit = {
    val budget = opt(args, "--budget").map(_.toLong).getOrElse(512L)
    val buckets = opt(args, "--buckets").map(_.toInt).getOrElse(8)
    val examples = args.contains("--examples")
    val path = positionals(args, Set("--budget", "--buckets"),
      boolFlags = Set("--examples")).headOption
      .getOrElse(sys.error("pack requires a documents parquet path"))
    val docs = ctx.spark.read.parquet(path)
      .withColumn("n_tokens",
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")))
    val packed = graft.ops.Packing.packGreedy(docs,
      idCol = "doc_id", tokensCol = "n_tokens",
      budget = budget, buckets = buckets)
    ctx.write(packed, "packed")
    if (examples) {
      ctx.write(ctx.read("packed")
        .join(docs.select(col("doc_id"), col("text"), col("n_tokens")),
          "doc_id")
        .groupBy("bucket", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          concat_ws("|", transform(
            array_sort(collect_list(col("doc_id"))),
            x => x.cast("string"))).as("doc_ids"),
          concat_ws("\n\n", transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            s => s.getField("text"))).as("example_text")),
        "packed_examples")
      println("wrote packed_examples")
    }
    val bins = ctx.read("packed")
    println(s"packed ${bins.count()} docs into " +
      s"${bins.select("bucket", "bin").distinct().count()} bins " +
      s"(budget $budget, $buckets bucket streams)")
    bins.groupBy("bucket").agg(max("bin").as("last_bin"))
      .orderBy("bucket").show()
  }

  /** Deterministic token-budget sampling (uniform per-stratum budget) or
    * a weighted per-stratum mix (--budgets lang=N,...). Token counts are
    * whitespace-token counts over `text` (the registered queries'
    * derivation). */
  private def sample(ctx: Ctx, args: Seq[String]): Unit = {
    val stratum = opt(args, "--stratum").getOrElse("lang")
    val budget = opt(args, "--budget").map(_.toLong).getOrElse(2000L)
    val dflt = opt(args, "--default-budget").map(_.toLong).getOrElse(0L)
    val budgets = opt(args, "--budgets").map(_.split(",").map { kv =>
      kv.split("=") match {
        case Array(k, v) => k -> v.toLong
        case _ => sys.error(s"--budgets expects k=v pairs, got '$kv'")
      }
    }.toMap)
    val path = positionals(args,
      Set("--stratum", "--budget", "--budgets", "--default-budget")).headOption
      .getOrElse(sys.error("sample requires a documents parquet path"))
    val docs = ctx.spark.read.parquet(path)
      .withColumn("n_tokens",
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long"))
    val sampled = budgets match {
      case Some(b) => graft.ops.Sampling.tokenBudgetMix(
        docs, stratum, "n_tokens", b, defaultBudget = dflt)
      case None => graft.ops.Sampling.tokenBudgetSample(
        docs, stratum, "n_tokens", budget)
    }
    ctx.write(sampled, "doc_sample")
    println("wrote doc_sample")
    ctx.read("doc_sample").groupBy(stratum)
      .agg(count(lit(1)).as("n_docs"), sum("kept").as("n_kept"),
        sum(when(col("kept") === 1, col("n_tokens"))).as("kept_tokens"))
      .orderBy(stratum).show()
  }

  /** Deterministic shuffle-shard materialization: addresses every doc as
    * (shard, pos) under the reproducible md5 permutation, then writes
    * the corpus partitioned by shard with rows in pos order inside each
    * file — the layout a training run streams directly. The write is
    * repartition(shard) + sortWithinPartitions(pos): the rank window's
    * sort IS the file sort, paid once. */
  private def shard(ctx: Ctx, args: Seq[String]): Unit = {
    val n = opt(args, "--shards").map(_.toInt).getOrElse(8)
    val path = positionals(args, Set("--shards")).headOption
      .getOrElse(sys.error("shard requires a documents parquet path"))
    val sharded = graft.ops.Sampling.shuffleShards(
      ctx.spark.read.parquet(path), nShards = n)
    sharded
      .repartition(n, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard")
      .parquet(ctx.path("doc_shards"))
    println(s"wrote doc_shards ($n shards)")
    ctx.read("doc_shards").groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), max("pos").as("last_pos"))
      .orderBy("shard").show()
  }

  /** Unigram-LM quality scoring (the perplexity filter): fit the
    * corpus-level smoothed top-V unigram model, score every doc's
    * average per-token -log2 p, write doc_lm_scores, and print the
    * per-source score distribution (a source whose NLL jumps is
    * degenerate text or the wrong language). */
  private def score(ctx: Ctx, args: Seq[String]): Unit = {
    val vocab = opt(args, "--vocab").map(_.toInt).getOrElse(1000)
    val bigram = args.contains("--bigram")
    val path = positionals(args, Set("--vocab"),
      boolFlags = Set("--bigram")).headOption
      .getOrElse(sys.error("score requires a documents parquet path"))
    val docs = ctx.spark.read.parquet(path)
    if (bigram) {
      val scored = graft.ops.TextAnalysis.bigramNll(docs, vocabSize = vocab)
      ctx.write(scored, "doc_lm_scores2")
      // bigramNll cached its exploded pair frame (caller-owned, per its
      // contract) — release it now that the scores are materialized,
      // mirroring the clean subcommand's train.unpersist(); the summary
      // below re-reads the written table, not the cache
      ctx.spark.catalog.clearCache()
      println("wrote doc_lm_scores2")
      ctx.read("doc_lm_scores2")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("avg_nll_bits"), 3).as("mean_nll2_bits"),
          round(avg("backoff_rate"), 4).as("mean_backoff_rate"))
        .orderBy("source").show()
    } else {
      val scored = graft.ops.TextAnalysis.unigramNll(docs, vocabSize = vocab)
      ctx.write(scored, "doc_lm_scores")
      println("wrote doc_lm_scores")
      ctx.read("doc_lm_scores")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("avg_nll_bits"), 3).as("mean_nll_bits"),
          round(avg("oov_rate"), 4).as("mean_oov_rate"))
        .orderBy("source").show()
    }
  }

  /** PII-style scrub of the corpus text: replaces the original text with
    * the redacted form, keeps per-pattern counts as audit columns, and
    * prints PII density per source (the upstream-corruption alarm). */
  private def redact(ctx: Ctx, args: Seq[String]): Unit = {
    val path = positionals(args, Set.empty).headOption
      .getOrElse(sys.error("redact requires a documents parquet path"))
    val docs = ctx.spark.read.parquet(path)
    val out = docs
      .withColumn("__c", graft.ops.TextAnalysis.redactCounts(col("text")))
      .withColumn("text", graft.ops.TextAnalysis.redact(col("text")))
      .withColumn("n_email", col("__c.n_email"))
      .withColumn("n_ip", col("__c.n_ip"))
      .withColumn("n_num", col("__c.n_num"))
      .drop("__c")
    ctx.write(out, "doc_redacted")
    println("wrote doc_redacted")
    ctx.read("doc_redacted").groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_email") + col("n_ip") + col("n_num")).as("pii_hits"))
      .orderBy("source").show()
  }

  private def opt(args: Seq[String], flag: String): Option[String] = {
    val i = args.indexOf(flag)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  /** Strip `flags` (value-taking: skip flag + value) and `boolFlags`
    * (zero-argument: skip flag alone) from the argument list; what
    * remains are the positionals. A boolean flag passed in the
    * value-taking set would swallow the following positional — keep the
    * two sets honest per subcommand. */
  private def positionals(args: Seq[String], flags: Set[String],
      boolFlags: Set[String] = Set.empty): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      if (flags.contains(args(i))) i += 2
      else if (boolFlags.contains(args(i))) i += 1
      else { out += args(i); i += 1 }
    }
    out.toSeq
  }
}
