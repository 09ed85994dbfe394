package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
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
    * file — the 100 TB layout. `mode` is "overwrite" for batch rebuilds,
    * "append" for the streaming ingest's per-micro-batch adds (same
    * layout, same reader). */
  def writeEvents(events: DataFrame, dir: String,
      mode: String = "overwrite"): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      // leading event_date satisfies the partitioned-write's required
      // ordering directly — otherwise Spark inserts its own sort on
      // event_date alone, which need not preserve the ts order
      .repartition(col("event_date"))
      .sortWithinPartitions("event_date", "ts")
      .write.mode(mode)
      .partitionBy("event_date")
      .parquet(dir)

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Compact the store's small files — the operational companion to
    * `StreamingOps.ingestToStore`, whose per-micro-batch appends leave
    * one file per batch per open day: at continuous-ingest scale a day's
    * partition accumulates thousands of tiny parquet files and scan
    * planning (file listing + one row group per file) degrades long
    * before data volume does. Rewrites the WHOLE store through the exact
    * batch writer (one ts-sorted file set per event_date partition, same
    * layout, same readers) via an atomic-rename swap: write to a temp
    * sibling, swap directories, delete the old. Readers between the two
    * renames see the store briefly missing — on a real deployment the
    * swap is a metastore partition repoint or a view flip (per-partition
    * selective compaction composes from the same pieces); the local form
    * keeps the test surface honest without a metastore.
    *
    * Returns (filesBefore, filesAfter) parquet data-file counts. */
  def compactEvents(spark: SparkSession, dir: String): (Int, Int) = {
    def dataFiles(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isFile).filter(_.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(dataFiles)
    }
    val dirFile = new java.io.File(dir)
    val before = dataFiles(dirFile).size
    val tmp = new java.io.File(dirFile.getParentFile,
      dirFile.getName + ".__compact_tmp")
    val old = new java.io.File(dirFile.getParentFile,
      dirFile.getName + ".__compact_old")
    // event_date is re-derived from ts by writeEvents, so read the data
    // columns only (the partition column would collide with the derive)
    val events = readEvents(spark, dir).drop("event_date")
    writeEvents(events, tmp.getAbsolutePath)
    if (!dirFile.renameTo(old) || !tmp.renameTo(dirFile))
      throw new java.io.IOException(s"compaction swap failed for $dir")
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete()
    }
    rmTree(old)
    (before, dataFiles(dirFile).size)
  }

  /** Walk the physical plan STRUCTURALLY, descending through the AQE
    * wrappers (`AdaptiveSparkPlanExec` re-plans under its own node,
    * `QueryStageExec` hides the materialized exchange subtree, reused
    * exchanges alias an earlier one) — the plan-string rendering of the
    * same information is format-fragile across Spark versions. */
  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val below = plan match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case s: QueryStageExec => allNodes(s.plan)
      case r: ReusedExchangeExec => allNodes(r.child)
      case p => p.children.flatMap(allNodes)
    }
    plan +: below
  }

  /** True iff a time-range filter on this store prunes partitions:
    * the plan scans at least one partitioned relation and EVERY such
    * scan carries a non-empty `partitionFilters`. Read off the executed
    * plan's nodes, not its string form, so a plan-format change can't
    * silently disable the driver-enforced pruning gate. */
  def prunes(df: DataFrame): Boolean = {
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec
          if s.relation.partitionSchema.nonEmpty => s
    }
    scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty)
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

  /** Count shuffle exchanges in the executed (post-AQE) plan — 0 for a
    * join of two same-bucketed tables. Structural: distinct
    * `ShuffleExchangeExec` nodes (a `ReusedExchangeExec` aliases an
    * already-counted one), matching the former plan-string count of
    * hash/range `Exchange` lines in the final AQE section. */
  def shuffleExchanges(df: DataFrame): Int = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[ShuffleExchangeExec, java.lang.Boolean]())
    // identity dedup, not case-class equality: a ReusedExchangeExec holds
    // the SAME node instance already counted at its original position,
    // while two structurally identical but independent exchanges (e.g. an
    // unreused self-join) are distinct instances and must both count
    allNodes(df.queryExecution.executedPlan).count {
      case e: ShuffleExchangeExec => seen.add(e)
      case _ => false
    }
  }
}
