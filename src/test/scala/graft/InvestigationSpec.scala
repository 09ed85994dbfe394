package graft

import java.sql.Timestamp
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.trace._

/** Context windows, hotspot selection, filter builder, forced-recovery
  * chunking, normalized-JSON re-loading (SURVEY §2.2/§2.5/§2.6). */
class InvestigationSpec extends SparkSpec {

  import spark.implicits._

  private def mk(rows: Seq[(Long, String, String, Int, Map[String, String])]) =
    rows.toDF("event_id", "tss", "event", "severity", "fields")
      .withColumn("ts", to_timestamp(col("tss")))
      .withColumn("role", lit("SS"))
      .drop("tss")

  lazy val ev = mk(Seq(
    (1L, "2025-01-01 00:00:00", "Start", 10, Map.empty[String, String]),
    (2L, "2025-01-01 00:00:20", "StorageMetrics", 20, Map.empty[String, String]),
    (3L, "2025-01-01 00:00:40", "TLogFailed", 40, Map.empty[String, String]),
    (4L, "2025-01-01 00:30:00", "StorageMetrics", 30, Map.empty[String, String]),
    (5L, "2025-01-01 00:30:10", "Quiet", 10, Map.empty[String, String])))

  test("EventFilter: optional conjunctive predicates, LIKE iff %") {
    import Investigation.EventFilter
    assert(EventFilter()(ev).count() === 5)
    assert(EventFilter(severityMin = Some(30))(ev).count() === 2)
    assert(EventFilter(eventType = Some("StorageMetrics"))(ev).count() === 2)
    assert(EventFilter(eventType = Some("%Metrics%"))(ev).count() === 2)
    assert(EventFilter(eventType = Some("%Fail%"),
      severityMin = Some(40))(ev).count() === 1)
    assert(EventFilter(
      startTime = Some(Timestamp.valueOf("2025-01-01 00:00:10")),
      endTime = Some(Timestamp.valueOf("2025-01-01 00:01:00")))(ev).count() === 2)
  }

  test("contextWindow and similarEvents") {
    val around = Timestamp.valueOf("2025-01-01 00:00:30")
    val ctx = Investigation.contextWindow(ev, around, 30).collect()
    assert(ctx.map(_.getAs[Long]("event_id")).toSeq === Seq(1L, 2L, 3L))
    val sim = Investigation.similarEvents(ev, "Metrics", 5).collect()
    assert(sim.map(_.getAs[Long]("event_id")).toSeq === Seq(4L, 2L)) // recent first
  }

  test("high-severity + uncovered buckets via anti join") {
    val high = Investigation.highSeverityBuckets(ev, minSeverity = 30,
      bucketSeconds = 600)
    val buckets = high.collect().map(_.getAs[Long]("bucket")).toSeq
    assert(buckets.length === 2)
    val inspected = Seq(buckets.head).toDF("bucket")
    val uncovered = Investigation.uncoveredBuckets(ev, inspected,
      minSeverity = 30, bucketSeconds = 600).collect()
    assert(uncovered.map(_.getAs[Long]("bucket")).toSeq ===
      buckets.filterNot(_ == buckets.head))
  }

  test("priorityOrder: severe first, then chronological") {
    val ordered = Investigation.priorityOrder(ev).collect()
      .map(_.getAs[Long]("event_id")).toSeq
    assert(ordered === Seq(3L, 1L, 2L, 4L, 5L))
  }

  test("chunkStats: interval stats with top types + token estimate") {
    val stats = Investigation.chunkStats(ev, 600).collect()
    assert(stats.length === 2)
    assert(stats(0).getAs[Long]("n_events") === 3L)
    assert(stats(0).getAs[String]("top_events").nonEmpty)
    assert(stats(0).getAs[Long]("token_estimate") > 0)
  }

  test("forced-recovery chunking: trigger → StatusCode=14, completeness") {
    val ev2 = mk(Seq(
      (1L, "2025-01-01 00:00:00", "Noise", 10, Map.empty[String, String]),
      (2L, "2025-01-01 00:00:10", "CodeCoverage", 10,
        Map("Comment" -> "Manual recovery forced")),
      (3L, "2025-01-01 00:00:20", "Working", 10, Map.empty[String, String]),
      (4L, "2025-01-01 00:00:30", "MasterRecoveryState", 10,
        Map("StatusCode" -> "14")),
      (5L, "2025-01-01 00:00:40", "After", 10, Map.empty[String, String]),
      (6L, "2025-01-01 00:01:00", "CodeCoverage", 10,
        Map("Comment" -> "Manual recovery again")),
      (7L, "2025-01-01 00:01:10", "StillGoing", 10, Map.empty[String, String])))
    val trigger = col("event") === "CodeCoverage" &&
      lower(element_at(col("fields"), "Comment")).contains("manual recovery")
    val chunks = Chunker.forcedRecoveryChunks(ev2, trigger).collect()
    assert(chunks.length === 2)
    assert(chunks(0).getAs[Boolean]("complete") === true)
    assert(chunks(0).getAs[Long]("event_count") === 3L) // events 2,3,4
    assert(chunks(0).getAs[String]("start_comment") === "Manual recovery forced")
    assert(chunks(1).getAs[Boolean]("complete") === false)
    assert(chunks(1).getAs[Long]("event_count") === 2L) // events 6,7
  }

  test("normalized-JSON re-loader: objects AND stringified payloads") {
    val tmp = Files.createTempDirectory("graft-norm")
    val p = tmp.resolve("normalized.json")
    Files.writeString(p,
      """[
        |  {"event_id": 1, "ts": "2025-01-01T00:00:00Z", "severity": 10,
        |   "event": "A", "raw_json": {"Type": "A", "K": "1"},
        |   "fields_json": {"K": "1"}},
        |  {"event_id": 2, "ts": "2025-01-01T00:00:05", "severity": 20,
        |   "event": "B", "raw_json": "{\"Type\": \"B\"}",
        |   "fields_json": "{\"X\": \"9\"}"}
        |]""".stripMargin)
    val df = TraceReader.normalizedJson(spark, p.toString)
    assert(df.count() === 2)
    val byId = df.collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(byId(1L).getAs[Map[String, String]]("fields")("K") === "1")
    assert(byId(2L).getAs[Map[String, String]]("fields")("X") === "9")
    assert(byId(1L).getAs[Timestamp]("ts").toString.startsWith("2025-01-01 00:00:00"))
    assert(byId(2L).getAs[Timestamp]("ts").toString.startsWith("2025-01-01 00:00:05"))
  }
}
