package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout for the event store at scale.
  *
  * The reference leans on DuckDB indexes over ts/event/severity
  * (tools/database.py:22-24); the Spark equivalent is layout: partition
  * the events table by event date (directory-level pruning for time-range
  * predicates) and sort within partitions by ts so Parquet row-group
  * min/max stats skip pages for narrow windows. Every time-bounded query
  * (context windows, episode analysis, rollups over a day) then touches
  * only the matching partitions.
  */
object Store {

  /** Write events partitioned by event_date, sorted by ts within each
    * file — the 100 TB layout. */
  def writeEvents(events: DataFrame, dir: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      // leading event_date satisfies the partitioned-write's required
      // ordering directly — otherwise Spark inserts its own sort on
      // event_date alone, which need not preserve the ts order
      .repartition(col("event_date"))
      .sortWithinPartitions("event_date", "ts")
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(dir)

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** True iff a time-range filter on this store prunes partitions —
    * checked from the executed plan's partition filters. */
  def prunes(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString()
    plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []")
  }

  // ---- bucketed layout: co-located joins without a shuffle ---------------

  /** Persist a table bucketed (and sorted) by its join key. Two tables
    * bucketed the same way join with NO exchange on either side — the
    * shuffle is paid once at write time and amortized over every
    * subsequent join, the decisive layout for repeated fact⋈fact joins
    * at 100 TB (e.g. events ⋈ event_metrics on event_id, lineitem ⋈
    * orders on the order key). */
  def writeBucketed(df: DataFrame, table: String,
      key: String, buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Count shuffle exchanges in the executed plan — 0 for a join of two
    * same-bucketed tables. Under AQE the plan string repeats as
    * "== Initial Plan =="; only the final section is counted. */
  def shuffleExchanges(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    "Exchange (hash|range)partitioning".r.findAllIn(plan).length
  }
}
