package graft

import java.nio.file.Files

/** End-to-end CLI flow over the reference XML fixture: load → stats →
  * query → rollup → chunk → export → detect. */
class CliSpec extends SparkSpec {

  test("cli: full pipeline over the XML fixture") {
    val store = Files.createTempDirectory("graft-cli").toString
    def run(args: String*): Int =
      Cli.run(args.toArray, sessionOverride = Some(spark))

    assert(run("--db", store, "init") === 0)
    assert(run("--db", store, "load", RefXml, "--stable-ids") === 0)
    assert(new java.io.File(s"$store/events").exists())
    assert(new java.io.File(s"$store/event_metrics").exists())
    assert(spark.read.parquet(s"$store/events").count() === 319)

    assert(run("--db", store, "stats") === 0)
    assert(run("--db", store, "query",
      "SELECT event, COUNT(*) n FROM events GROUP BY 1 ORDER BY n DESC LIMIT 3") === 0)
    assert(run("--db", store, "rollup", "--interval", "60") === 0)
    assert(spark.read.parquet(s"$store/rollups_60s").count() > 0)
    assert(run("--db", store, "chunk") === 0)
    assert(spark.read.parquet(s"$store/chunks").count() === 5)

    val out = s"$store/export_out"
    assert(run("--db", store, "export",
      "SELECT severity, COUNT(*) AS n FROM events GROUP BY 1", out,
      "--format", "csv") === 0)
    assert(new java.io.File(out).exists())
    assert(run("--db", store, "detect") === 0)

    // compact migrates the flat events dir into the date-partitioned
    // ts-sorted Store layout; readers and SQL keep working over it
    assert(run("--db", store, "compact") === 0)
    assert(spark.read.parquet(s"$store/events").count() === 319)
    assert(run("--db", store, "query",
      "SELECT COUNT(*) n FROM events WHERE severity >= 20") === 0)
    assert(run("--db", store, "stats") === 0)

    assert(run("--db", store, "nope") === 1)
  }

  test("cli: load --all walks a directory tree, mixed suffixes, sorted") {
    val store = Files.createTempDirectory("graft-cli-all").toString
    val logs = Files.createTempDirectory("graft-logs")
    val nested = Files.createDirectory(logs.resolve("nested"))
    // one XML (copied fixture), one JSON-lines in a subdirectory, and an
    // unsupported suffix that must be ignored
    Files.copy(java.nio.file.Paths.get(RefXml), logs.resolve("a.xml"))
    Files.write(nested.resolve("b.json"), java.util.Arrays.asList(
      """{"Severity": "20", "Time": "1.5", "DateTime": "2025-01-01T00:00:01Z", "Type": "JsonThing"}"""))
    Files.write(logs.resolve("ignore.parquet"), java.util.Arrays.asList("x"))

    val found = trace.TraceEvents.discover(logs.toString)
    assert(found.length === 2)
    assert(found.head.endsWith("a.xml")) // sorted
    assert(found(1).endsWith("b.json"))

    def run(args: String*): Int =
      Cli.run(args.toArray, sessionOverride = Some(spark))
    assert(run("--db", store, "load", logs.toString, "--all",
      "--stable-ids") === 0)
    val events = spark.read.parquet(s"$store/events")
    assert(events.count() === 320) // 319 XML + 1 JSON
    assert(events.filter(org.apache.spark.sql.functions.col("event") ===
      "JsonThing").count() === 1)
    // stable ids stay contiguous across the multi-file load
    assert(events.agg(org.apache.spark.sql.functions.max("event_id"))
      .first().getLong(0) === 320L)
  }

  test("cli: forced-recovery subcommand writes trigger-bounded chunks") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val store = Files.createTempDirectory("graft-cli-fr").toString
    val events = Seq(
      (1L, "2025-01-01 00:00:01", "Before", 10, Map.empty[String, String]),
      (2L, "2025-01-01 00:00:02", "CodeCoverage", 10,
        Map("Comment" -> "Forced recovery requested")),
      (3L, "2025-01-01 00:00:03", "Working", 10, Map.empty[String, String]),
      (4L, "2025-01-01 00:00:04", "MasterRecoveryState", 10,
        Map("StatusCode" -> "14")))
      .toDF("event_id", "tss", "event", "severity", "fields")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
      .withColumn("role", lit(null).cast("string"))
    events.write.mode("overwrite").parquet(s"$store/events")
    def run(args: String*): Int =
      Cli.run(args.toArray, sessionOverride = Some(spark))
    assert(run("--db", store, "forced-recovery") === 0)
    val chunks = spark.read.parquet(s"$store/forced_recovery_chunks")
    assert(chunks.count() === 1)
    val c = chunks.first()
    assert(c.getAs[Boolean]("complete"))
    assert(c.getAs[String]("start_comment") === "Forced recovery requested")
    // export partitions escape hatch
    val out = s"$store/export_parts"
    assert(run("--db", store, "export",
      "SELECT event_id, event, severity FROM events", out, "--format", "csv",
      "--partitions", "2") === 0)
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".csv")) === 2)
  }

  test("cli: clean/split/pack subcommands hash-match the registered queries") {
    import org.apache.spark.sql.functions._
    val store = Files.createTempDirectory("graft-cli-train").toString
    val docsPath = s"${sf("")}/documents.parquet"
    def run(args: String*): Int =
      Cli.run(args.toArray, sessionOverride = Some(spark))
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[String]] = {
      val cols = df.columns.sorted
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf)).toSet
    }

    // clean — per-doc decisions and the per-source report must equal the
    // registered doc_clean_pipeline / doc_pipeline_report results
    assert(run("--db", store, "clean", docsPath) === 0)
    val decisionCols = Seq("doc_id", "is_quality", "not_repetitive",
      "dedup_keep", "not_contaminated", "keep")
    assert(rows(spark.read.parquet(s"$store/clean_decisions")
        .select(decisionCols.map(col): _*)) ===
      rows(graft.queries.Registry.byName("doc_clean_pipeline")
        .run(spark, sf(""))))
    assert(rows(spark.read.parquet(s"$store/clean_report")) ===
      rows(graft.queries.Registry.byName("doc_pipeline_report")
        .run(spark, sf(""))))
    // kept corpus = exactly the keep=1 decision rows, full original docs
    val keptIds = spark.read.parquet(s"$store/clean_decisions")
      .filter(col("keep") === 1).select("doc_id")
    val cleanDocs = spark.read.parquet(s"$store/clean_docs")
    assert(cleanDocs.count() === keptIds.count())
    assert(cleanDocs.join(keptIds, Seq("doc_id"), "left_anti").count() === 0L)
    assert(cleanDocs.columns.toSet ===
      spark.read.parquet(docsPath).columns.toSet)

    // split — stats over the written assignment must equal doc_split_stats
    assert(run("--db", store, "split", docsPath) === 0)
    val splitStats = spark.read.parquet(s"$store/doc_splits")
      .join(spark.read.parquet(docsPath).select("doc_id", "n_chars"), "doc_id")
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    assert(rows(splitStats) ===
      rows(graft.queries.Registry.byName("doc_split_stats").run(spark, sf(""))))

    // pack — default budget/buckets must equal doc_seq_pack; --examples
    // materializes one consistent row per bin
    assert(run("--db", store, "pack", docsPath, "--examples") === 0)
    assert(rows(spark.read.parquet(s"$store/packed")) ===
      rows(graft.queries.Registry.byName("doc_seq_pack").run(spark, sf(""))))
    val ex = spark.read.parquet(s"$store/packed_examples")
    val nDocs = spark.read.parquet(docsPath).count()
    assert(ex.agg(sum("n_docs")).first().getLong(0) === nDocs)
    // every example's member count matches its id list and its text join
    assert(ex.filter(size(split(col("doc_ids"), "\\|")) =!= col("n_docs"))
      .count() === 0L)
    assert(ex.filter(col("total_tokens") > 512)
      .filter(col("n_docs") > 1).count() === 0L,
      "only oversize singleton docs may exceed the budget")

    // sample — default budget must equal doc_budget_sample; a --budgets
    // mix must equal doc_mix_sample
    val sampleCols = Seq("doc_id", "lang", "n_tokens", "cum_tokens", "kept")
    assert(run("--db", store, "sample", docsPath) === 0)
    assert(rows(spark.read.parquet(s"$store/doc_sample")
        .select(sampleCols.map(col): _*)) ===
      rows(graft.queries.Registry.byName("doc_budget_sample")
        .run(spark, sf(""))))
    assert(run("--db", store, "sample", docsPath, "--budgets",
      "en=4000,de=2000,fr=1500,es=1000,zh=500") === 0)
    assert(rows(spark.read.parquet(s"$store/doc_sample")
        .select((sampleCols :+ "stratum_budget").map(col): _*)) ===
      rows(graft.queries.Registry.byName("doc_mix_sample")
        .run(spark, sf(""))))

    // redact — written corpus carries the scrubbed text + audit counts,
    // equal to applying the ops directly
    assert(run("--db", store, "redact", docsPath) === 0)
    val redacted = spark.read.parquet(s"$store/doc_redacted")
    val want = spark.read.parquet(docsPath)
      .select(col("doc_id"),
        graft.ops.TextAnalysis.redact(col("text")).as("text"),
        graft.ops.TextAnalysis.redactCounts(col("text")).as("c"))
      .select(col("doc_id"), col("text"), col("c.n_email").as("n_email"),
        col("c.n_ip").as("n_ip"), col("c.n_num").as("n_num"))
    assert(rows(redacted.select("doc_id", "text", "n_email", "n_ip", "n_num"))
      === rows(want))
    assert(redacted.count() === spark.read.parquet(docsPath).count())

    // score — written LM scores must equal the registered doc_unigram_nll
    assert(run("--db", store, "score", docsPath) === 0)
    assert(rows(spark.read.parquet(s"$store/doc_lm_scores")) ===
      rows(graft.queries.Registry.byName("doc_unigram_nll")
        .run(spark, sf(""))))

    // score --bigram — the order-2 scores must equal doc_bigram_nll
    assert(run("--db", store, "score", docsPath, "--bigram") === 0)
    assert(rows(spark.read.parquet(s"$store/doc_lm_scores2")) ===
      rows(graft.queries.Registry.byName("doc_bigram_nll")
        .run(spark, sf(""))))

    // shard — the partitioned-by-shard layout must carry exactly the
    // registered doc_shuffle_shards addressing, and each shard's file
    // must hold its rows in permutation (pos) order
    assert(run("--db", store, "shard", docsPath) === 0)
    val shards = spark.read.parquet(s"$store/doc_shards")
    assert(rows(shards.select("doc_id", "shard", "pos")) ===
      rows(graft.queries.Registry.byName("doc_shuffle_shards")
        .run(spark, sf(""))))
    // in-file order: reading one shard partition back preserves pos order
    val shard0dir = new java.io.File(s"$store/doc_shards")
      .listFiles().filter(_.getName.startsWith("shard=")).head
    val inFile = spark.read.parquet(shard0dir.toString)
      .select("pos").collect().map(_.getInt(0)).toSeq
    assert(inFile === inFile.sorted,
      "rows inside a shard file must be in permutation order")
  }
}
