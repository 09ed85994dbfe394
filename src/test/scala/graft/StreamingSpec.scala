package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.MetricPoint

/** Streaming twins produce the same results as their batch forms when fed
  * the same data through a MemoryStream. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming rollups match the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String, Double)]
    val metrics = input.toDF()
      .toDF("ts", "role", "metric_name", "metric_value")
    val q = StreamingOps.rollupStream(metrics, 60)
      .writeStream.format("memory").queryName("rollup_out")
      .outputMode(OutputMode.Complete).start()
    val rows = Seq(
      (ts("2025-01-01 00:00:10"), "SS", "VersionLag", 100.0),
      (ts("2025-01-01 00:00:50"), "SS", "VersionLag", 300.0),
      (ts("2025-01-01 00:01:10"), "SS", "VersionLag", 500.0),
      (ts("2025-01-01 00:00:20"), "TL", "QueueSize", 7.0))
    input.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("rollup_out")
      .select("window_start", "role", "metric_name", "n", "avg", "max")
      .collect().map(_.toSeq).toSet
    q.stop()

    val batch = rows.toDF("ts", "role", "metric_name", "metric_value")
      .groupBy(window(col("ts"), "60 seconds").getField("start")
        .as("window_start"), col("role"), col("metric_name"))
      .agg(count(lit(1)).as("n"), avg(col("metric_value")).as("avg"),
        max(col("metric_value")).as("max"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.size === 3)
  }

  test("rollup stream finalizes windows in append mode via watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String, Double)]
    val metrics = input.toDF().toDF("ts", "role", "metric_name", "metric_value")
    val q = StreamingOps.rollupStream(metrics, 60, watermark = "2 minutes")
      .writeStream.format("memory").queryName("rollup_append")
      .outputMode(OutputMode.Append).start()
    input.addData((ts("2025-01-01 00:00:10"), "SS", "Lag", 100.0))
    q.processAllAvailable()
    // window not finalized yet — watermark hasn't passed its end
    assert(spark.table("rollup_append").count() === 0)
    // an event 10 minutes later advances the watermark past the window
    input.addData((ts("2025-01-01 00:10:00"), "SS", "Lag", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("rollup_append").collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n") === 1L)
    assert(out(0).getAs[Timestamp]("window_start").toString
      .startsWith("2025-01-01 00:00:00"))
  }

  test("session windows cluster by gap like the batch sessionizer") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Int)]
    val events = input.toDF().toDF("ts", "proc", "severity")
    val q = StreamingOps.sessionStream(events, "proc", gapSeconds = 60)
      .writeStream.format("memory").queryName("session_out")
      .outputMode(OutputMode.Complete).start()
    input.addData(
      (ts("2025-01-01 00:00:00"), "p1", 10),
      (ts("2025-01-01 00:00:30"), "p1", 40),  // same session (gap 30 < 60)
      (ts("2025-01-01 00:10:00"), "p1", 20),  // new session
      (ts("2025-01-01 00:00:10"), "p2", 10))
    q.processAllAvailable()
    val out = spark.table("session_out").collect()
    q.stop()
    assert(out.length === 3)
    val p1 = out.filter(_.getAs[String]("proc") == "p1")
      .sortBy(_.getAs[Timestamp]("start").getTime)
    assert(p1(0).getAs[Long]("n_events") === 2L)
    assert(p1(0).getAs[Int]("max_severity") === 40)
    assert(p1(1).getAs[Long]("n_events") === 1L)
  }

  test("running anomaly gate flags spikes against prior state only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MetricPoint]
    val q = StreamingOps.runningAnomalyGate(input.toDS(), zThreshold = 3.0)
      .writeStream.format("memory").queryName("gate_out")
      .outputMode(OutputMode.Append).start()
    // batch 1: establish a stable baseline
    input.addData((1 to 20).map(i =>
      MetricPoint("lag", ts(f"2025-01-01 00:00:${i}%02d"), 100.0 + (i % 3))))
    q.processAllAvailable()
    assert(spark.table("gate_out").count() === 0)
    // batch 2: a spike arrives — state from batch 1 flags it
    input.addData(MetricPoint("lag", ts("2025-01-01 00:01:00"), 10000.0))
    q.processAllAvailable()
    val flagged = spark.table("gate_out").as[StreamingOps.Flagged].collect()
    q.stop()
    assert(flagged.length === 1)
    assert(flagged(0).value === 10000.0)
    assert(flagged(0).zscore > 3.0)
  }

  test("streaming dedup passes first occurrence, drops later duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingOps.dedupStream(docs, watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    input.addData(
      (ts("2025-01-01 00:00:01"), 1L, "alpha beta"),
      (ts("2025-01-01 00:00:02"), 2L, "  Alpha   BETA "), // normalized dup
      (ts("2025-01-01 00:00:03"), 3L, "gamma delta"))
    q.processAllAvailable()
    // a duplicate in a LATER batch is caught by carried state
    input.addData((ts("2025-01-01 00:00:10"), 4L, "gamma delta"))
    q.processAllAvailable()
    val out = spark.table("dedup_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    assert(out === Set(1L, 3L))
  }
}
