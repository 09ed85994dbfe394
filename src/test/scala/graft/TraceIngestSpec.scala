package graft

import org.apache.spark.sql.functions._

import graft.trace.{DerivedTables, TraceEvents}

/** Ingest the reference's own fixtures (FIXTURES.md §1-2) and check the
  * normalized schema + derived tables. */
class TraceIngestSpec extends SparkSpec {

  lazy val xmlEvents = TraceEvents.load(spark, RefXml, stableIds = true).cache()
  lazy val jsonEvents = TraceEvents.load(spark, RefJson, stableIds = true).cache()

  test("XML fixture: 319 events, envelope extracted") {
    assert(xmlEvents.count() === 319)
    val first = xmlEvents.orderBy("event_id").first()
    assert(first.getAs[Long]("event_id") === 1L)
    assert(first.getAs[String]("event") === "Net2Starting")
    assert(first.getAs[Int]("severity") === 10)
    assert(first.getAs[String]("machine_id") === "172.17.0.3:4500")
    assert(first.getAs[java.sql.Timestamp]("ts").toString
      .startsWith("2025-11-23 03:37:49"))
    // envelope keys stripped from the payload bag
    val fields = first.getAs[Map[String, String]]("fields")
    assert(!fields.contains("Severity") && !fields.contains("DateTime"))
    assert(fields.contains("ID") && fields.contains("ThreadID"))
  }

  test("XML fixture: MasterRecoveryState states present") {
    val mrs = xmlEvents.filter(col("event") === "MasterRecoveryState")
    assert(mrs.count() === 4)
    val codes = mrs.select(element_at(col("fields"), "StatusCode"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(codes === Seq("0", "1", "3", "5"))
  }

  test("JSON-lines fixture: 490 events, all severity 10") {
    assert(jsonEvents.count() === 490)
    assert(jsonEvents.filter(col("severity") === 10).count() === 490)
    val roles = jsonEvents.filter(col("event") === "Role")
    assert(roles.count() === 50)
  }

  test("plaintext fallback: bad JSON degrades to key=value pairs") {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft-plain")
    val p = tmp.resolve("mixed.log")
    Files.writeString(p,
      """{"Severity": "20", "Type": "JsonEvent", "DateTime": "2025-01-01T00:00:00Z", "K": "1"}
        |
        |Severity=30 Type=PlainEvent DateTime=2025-01-02T00:00:00Z Foo=bar
        |""".stripMargin)
    val ev = TraceEvents.load(spark, p.toString, stableIds = true)
    assert(ev.count() === 2) // blank line skipped
    val plain = ev.filter(col("event") === "PlainEvent").first()
    assert(plain.getAs[Int]("severity") === 30)
    assert(plain.getAs[Map[String, String]]("fields")("Foo") === "bar")
    val js = ev.filter(col("event") === "JsonEvent").first()
    assert(js.getAs[Int]("severity") === 20)
  }

  test("event_metrics: python-float explode keeps inf, drops text") {
    val m = DerivedTables.eventMetrics(jsonEvents).cache()
    assert(m.count() > 0)
    // no envelope keys; values numeric
    assert(m.filter(col("metric_name") === "Severity").count() === 0)
    val grv = DerivedTables.eventMetrics(xmlEvents)
    assert(grv.filter(col("metric_name") === "Time").count() === 0)
    // GetKeyMetrics emits 1.79769e+308 sentinels — kept by float()
    assert(m.filter(col("metric_value") > 1e307).count() > 0)
  }

  test("events_wide: Mean falsiness quirk and precedence") {
    // fixture GetKeyMetrics rows have Mean="0", P95="0" → grv NULL
    val wide = DerivedTables.eventsWide(jsonEvents)
    val getKey = jsonEvents.filter(col("event") === "GetKeyMetrics")
      .select("event_id")
    val grvForGetKey = wide.join(getKey, "event_id")
      .filter(col("grv_latency_ms").isNotNull)
    assert(grvForGetKey.count() === 0)

    // synthetic checks of the chain rules
    import spark.implicits._
    val df = Seq(
      (1L, Map("Mean" -> "0.25", "P95" -> "0.5")),    // 250ms
      (2L, Map("Mean" -> "0", "P95" -> "0.5")),       // falsiness → null
      (3L, Map("GRVLatency" -> "7")),                 // fallthrough
      (4L, Map("Committed" -> "5", "Mutations" -> "9")), // precedence
      (5L, Map("Version" -> "300000", "DurableVersion" -> "100000"))
    ).toDF("event_id", "fields")
    val w = DerivedTables.eventsWide(df).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(w(1L).getAs[Double]("grv_latency_ms") === 250.0)
    assert(w(2L).isNullAt(w(2L).fieldIndex("grv_latency_ms")))
    assert(w(3L).getAs[Double]("grv_latency_ms") === 7.0)
    assert(w(4L).getAs[Double]("txn_volume") === 5.0)
    assert(w(5L).getAs[Double]("durability_lag_s") === 2.0)
  }

  test("processes and process_roles registries") {
    // Parity quirk: the reference keys processes on Address or
    // fields_json["Machine"], but Machine is a MANDATORY field stripped
    // from the payload — so for Address-less logs (both fixtures) its
    // processes table is empty too (tools/storage.py:271-303).
    assert(DerivedTables.processes(jsonEvents).count() === 0)

    import spark.implicits._
    val ev = Seq(
      (1L, "2025-01-01 00:00:01", "A", "r1", "1.2.3.4:1"),
      (2L, "2025-01-01 00:00:05", "B", "r1", "1.2.3.4:1"),
      (3L, "2025-01-01 00:00:03", "C", "r2", "5.6.7.8:2"))
      .toDF("event_id", "tss", "event", "role", "address")
      .withColumn("ts", to_timestamp(col("tss")))
      .withColumn("fields", map().cast("map<string,string>"))
    val procs = DerivedTables.processes(ev).collect()
      .map(r => r.getAs[String]("process_key") ->
        (r.getAs[java.sql.Timestamp]("first_seen_ts"),
          r.getAs[java.sql.Timestamp]("last_seen_ts"))).toMap
    assert(procs("1.2.3.4:1")._1.toString.startsWith("2025-01-01 00:00:01"))
    assert(procs("1.2.3.4:1")._2.toString.startsWith("2025-01-01 00:00:05"))
    val roles = DerivedTables.processRoles(ev)
    assert(roles.count() === 2)
  }

  test("metric baselines: one-pass stats with exclusions") {
    val m = DerivedTables.eventMetrics(jsonEvents)
    val b = DerivedTables.metricBaselines(m, minCount = 5).cache()
    assert(b.count() > 0)
    // identifier-ish metrics excluded
    assert(b.filter(col("metric_name").isin("ThreadID", "ID", "PID")).count() === 0)
    // sentinel 1.79e308 filtered before stats
    assert(b.filter(col("max") > 1e307).count() === 0)
    val row = b.filter(col("count") < 5).count()
    assert(row === 0)
  }

  test("rollups: tumbling windows per role/metric") {
    val m = DerivedTables.eventMetrics(xmlEvents)
    val r = DerivedTables.rollups(m, 60)
    assert(r.count() > 0)
    assert(r.filter(col("n") <= 0).count() === 0)
  }
}
