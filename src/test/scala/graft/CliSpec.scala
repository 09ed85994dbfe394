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
    assert(run("--db", store, "nope") === 1)
  }
}
