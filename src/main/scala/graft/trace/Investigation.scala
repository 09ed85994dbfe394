package graft.trace

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Local deep-dive + hotspot-selection tools
  * (tools/investigation_tools/{context_analyzer,hotspot_selector,
  * helpers}.py) and the remaining scan/filter shapes of SURVEY.md §2.2.
  */
object Investigation {

  /** F1: conjunctive optional-predicate filter builder
    * (helpers.py:83-117). `eventType` uses LIKE iff it contains '%'. */
  case class EventFilter(
      startTime: Option[Timestamp] = None,
      endTime: Option[Timestamp] = None,
      severityMin: Option[Int] = None,
      severityMax: Option[Int] = None,
      eventType: Option[String] = None,
      role: Option[String] = None) {

    def condition: Column = {
      val cs = Seq(
        startTime.map(t => col("ts") >= lit(t)),
        endTime.map(t => col("ts") <= lit(t)),
        severityMin.map(s => col("severity") >= s),
        severityMax.map(s => col("severity") <= s),
        eventType.map(e =>
          if (e.contains("%")) col("event").like(e) else col("event") === e),
        role.map(r => col("role") === r)
      ).flatten
      cs.reduceOption(_ && _).getOrElse(lit(true))
    }

    def apply(events: DataFrame): DataFrame = events.filter(condition)
  }

  /** F5: events within ±windowSeconds of an anchor, time-ordered, limited
    * (context_analyzer.py:16-28). */
  def contextWindow(events: DataFrame, around: Timestamp,
      windowSeconds: Int = 30, limit: Int = 200): DataFrame =
    events
      .filter(col("ts").between(
        lit(around) - expr(s"INTERVAL $windowSeconds SECONDS"),
        lit(around) + expr(s"INTERVAL $windowSeconds SECONDS")))
      .orderBy(col("ts").asc, col("event_id").asc)
      .limit(limit)

  /** F4: most recent events whose name contains the type
    * (context_analyzer.py:30-48). */
  def similarEvents(events: DataFrame, eventType: String,
      limit: Int = 10): DataFrame =
    events
      .filter(col("event").like(s"%$eventType%"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(limit)

  /** A9: buckets whose max severity crosses the floor
    * (hotspot_selector.py:15-36). */
  def highSeverityBuckets(events: DataFrame, minSeverity: Int = 20,
      bucketSeconds: Int = 600, limit: Int = 20): DataFrame =
    events.filter(col("ts").isNotNull)
      .groupBy(GlobalScanner.bucket(col("ts"), bucketSeconds).as("bucket"))
      .agg(max(col("severity")).as("max_severity"), count(lit(1)).as("n"))
      .filter(col("max_severity") >= minSeverity)
      .orderBy(col("max_severity").desc, col("bucket"))
      .limit(limit)

  /** A10: high-severity buckets not yet inspected — NOT IN as an anti
    * join so the inspected set can itself be a DataFrame at scale
    * (hotspot_selector.py:38-65). */
  def uncoveredBuckets(events: DataFrame, inspected: DataFrame,
      minSeverity: Int = 20, bucketSeconds: Int = 600): DataFrame =
    highSeverityBuckets(events, minSeverity, bucketSeconds, Int.MaxValue)
      .join(inspected.select(col(inspected.columns.head).as("bucket")),
        Seq("bucket"), "left_anti")
      .orderBy(col("max_severity").desc, col("bucket"))

  /** W12: LLM display priority — severity≥40 first (by severity desc),
    * then chronological (investigation_agent.py:612-621). */
  def priorityOrder(events: DataFrame): DataFrame =
    events.orderBy(
      when(col("severity") >= 40, col("severity")).otherwise(0).desc,
      col("ts").asc, col("event_id").asc)

  /** A13: per-interval chunk statistics — count, token estimate, top event
    * types (cli_wrapper/main.py:385-432). */
  def chunkStats(events: DataFrame, intervalSeconds: Int = 300,
      topTypes: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("type_n").desc, col("event"))
    val typed = events.filter(col("ts").isNotNull)
      .groupBy(GlobalScanner.bucket(col("ts"), intervalSeconds).as("bucket"),
        col("event"))
      .agg(count(lit(1)).as("type_n"))
      .withColumn("rk", row_number().over(w))
    val tops = typed.filter(col("rk") <= topTypes)
      .groupBy("bucket")
      // collect_list order is unspecified — sort by rank before joining
      // so top_events is deterministic and count-descending
      .agg(concat_ws(",", transform(
        array_sort(collect_list(struct(col("rk"), col("event")))),
        s => s.getField("event"))).as("top_events"))
    events.filter(col("ts").isNotNull)
      .groupBy(GlobalScanner.bucket(col("ts"), intervalSeconds).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(ceil(length(to_json(col("fields"))) / 4).cast("long"))
          .as("token_estimate"))
      .join(tops, Seq("bucket"), "left")
      .orderBy("bucket")
  }
}
