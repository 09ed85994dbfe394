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

  private val compactCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Write events partitioned by event_date, sorted by ts within each
    * file — the 100 TB layout. `mode` is "overwrite" for batch rebuilds,
    * "append" for the streaming ingest's per-micro-batch adds (same
    * layout, same reader). Writes land in the store's CURRENT data root
    * (the version directory the `_current` pointer names once the store
    * has been compacted; the store dir itself before that), so appends
    * keep flowing to the live version across compactions. */
  def writeEvents(events: DataFrame, dir: String,
      mode: String = "overwrite"): Unit = {
    // Append-safety across compaction: an append racing a compaction
    // would land in the old `_v` dir, be silently dropped by the
    // pointer flip, and then garbage-collected — data loss with no
    // signal. The compactor holds `_writer.lock` for its whole window;
    // a writer that sees it (or sees the pointer move mid-write) fails
    // LOUDLY instead, so the single-writer discipline is enforced, not
    // merely documented. (On a cluster deployment this is the
    // metastore/table-format commit conflict.)
    val lock = lockFile(dir)
    if (lock.isFile)
      throw new java.io.IOException(
        s"store $dir is being compacted (${lock.getName} held); " +
          "refusing to append into a version the pointer flip would drop " +
          "— retry after the compaction finishes")
    val resolved = currentDataDir(dir)
    rawWriteEvents(events, resolved, mode)
    if (currentDataDir(dir) != resolved || lock.isFile)
      // The pre-check and the write are not one atomic step: a compaction
      // that started just after the pre-check may have READ this append
      // (and carried it into the new version) or missed it — we cannot
      // tell from here. Blind re-driving would duplicate the rows in the
      // first case, so the error demands verification, not a retry.
      throw new java.io.IOException(
        s"store $dir was compacted while this write was in flight; " +
          s"the rows written to $resolved MAY OR MAY NOT have been " +
          "carried into the new current version (the compactor read the " +
          "old version at an unknown point relative to this write). " +
          "Verify before re-driving: compare the new version's row count " +
          "against the expected total, and only re-append if the rows " +
          "are absent")
  }

  private def lockFile(dir: String): java.io.File =
    new java.io.File(dir, "_writer.lock")

  private def rawWriteEvents(events: DataFrame, dataDir: String,
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
      .parquet(dataDir)

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(currentDataDir(dir))

  /** The store's live data root: the version directory named by the
    * `_current` pointer file, or the store dir itself for a flat
    * (never-compacted) store. Both the pointer file and the `_v-*` /
    * `_tmp-*` version directories are underscore-prefixed, which Spark's
    * file index treats as hidden — a flat reader pointed at the store
    * dir can never pick them up as data. */
  def currentDataDir(dir: String): String = {
    val p = new java.io.File(dir, "_current")
    if (p.isFile)
      new java.io.File(dir,
        java.nio.file.Files.readString(p.toPath).trim).getAbsolutePath
    else dir
  }

  /** Compact the store's small files — the operational companion to
    * `StreamingOps.ingestToStore`, whose per-micro-batch appends leave
    * one file per batch per open day: at continuous-ingest scale a day's
    * partition accumulates thousands of tiny parquet files and scan
    * planning (file listing + one row group per file) degrades long
    * before data volume does. Rewrites the WHOLE store through the exact
    * batch writer (one ts-sorted file set per event_date partition, same
    * layout, same readers).
    *
    * READER-SAFE swap, the way real table formats do it: the compacted
    * data is written to a fresh `_v-<stamp>` version directory, then the
    * `_current` pointer file is flipped in ONE atomic file rename — no
    * window where the store is missing (the former two-directory-rename
    * swap had one, and no rollback if the second rename failed). The
    * PREVIOUS version is retained until the next compaction, so a reader
    * that resolved the old pointer finishes its scan against intact
    * files; versions older than that (and a flat store's legacy
    * partition dirs, two compactions on) are garbage-collected here.
    * Failure atomicity: a failed write or rename deletes its own
    * `_tmp-*` directory and leaves the pointer untouched — the store is
    * never degraded by a crashed compaction, and stale tmp dirs from
    * hard crashes are swept on the next run. Single-writer is ENFORCED,
    * not just documented: the compactor holds `_writer.lock` for its
    * whole window, [[writeEvents]] refuses to start under it and fails
    * loudly if the pointer moved mid-write — an append can no longer be
    * silently dropped by the flip (on a cluster deployment this pointer
    * flip is a metastore/table-format commit, which also serializes
    * writers).
    *
    * Returns (filesBefore, filesAfter) parquet data-file counts. */
  def compactEvents(spark: SparkSession, dir: String): (Int, Int) = {
    def dataFiles(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isFile).filter(_.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(dataFiles)
    }
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete()
    }
    val dirFile = new java.io.File(dir)
    // single-writer gate (see writeEvents): hold `_writer.lock` for the
    // whole read→rewrite→flip window; a concurrent compaction fails
    // here instead of racing the pointer, and a concurrent append fails
    // in writeEvents instead of vanishing. Stale locks from a hard
    // crash are operator-removed (the lock names its creation stamp).
    val lock = lockFile(dir)
    if (!lock.createNewFile())
      throw new java.io.IOException(
        s"store $dir already holds ${lock.getName} — another compaction " +
          "is in progress (or crashed; remove the lock after confirming)")
    try {
    java.nio.file.Files.writeString(lock.toPath,
      s"compaction started ${java.time.Instant.now()}")
    val cur = new java.io.File(currentDataDir(dir))
    val before = dataFiles(cur).size
    // millis + process-monotonic counter: two compactions in the same
    // millisecond (tests, back-to-back CLI runs) still get distinct dirs
    val stamp =
      f"${System.currentTimeMillis()}%013d-${compactCounter.incrementAndGet()}%04d"
    val tmp = new java.io.File(dirFile, s"_tmp-$stamp")
    val newDir = new java.io.File(dirFile, s"_v-$stamp")
    // event_date is re-derived from ts by the writer, so read the data
    // columns only (the partition column would collide with the derive)
    val events = readEvents(spark, dir).drop("event_date")
    try {
      rawWriteEvents(events, tmp.getAbsolutePath)
      if (!tmp.renameTo(newDir))
        throw new java.io.IOException(s"compaction rename failed for $tmp")
    } catch { case e: Throwable => rmTree(tmp); throw e }
    // atomic pointer flip: readers resolve the old version or the new
    // one, never an absent store
    val ptmp = new java.io.File(dirFile, s"_current-$stamp.tmp")
    try {
      java.nio.file.Files.writeString(ptmp.toPath, newDir.getName)
      java.nio.file.Files.move(ptmp.toPath,
        new java.io.File(dirFile, "_current").toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch { case e: Throwable => rmTree(newDir); ptmp.delete(); throw e }
    // retention: keep the new version and the immediately previous one;
    // sweep older versions, crashed tmp dirs, and (once the previous
    // version is itself a _v dir) the flat layout's legacy partitions
    val keep = Set(newDir.getName, cur.getName)
    Option(dirFile.listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      if ((n.startsWith("_v-") && !keep(n)) ||
          n.startsWith("_tmp-") ||
          (n.startsWith("_current-") && n.endsWith(".tmp")) ||
          (n.startsWith("event_date=") &&
            cur.getAbsolutePath != dirFile.getAbsolutePath))
        rmTree(f)
    }
    (before, dataFiles(newDir).size)
    } finally lock.delete()
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
