package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-order scans.
  *
  * `Window.orderBy(...)` with no partition spec moves the whole input to a
  * single partition — the dominant scale hazard in the reference's
  * sequential operators (version-drop carries, marker chunking, episode
  * sessionization; SURVEY.md §2.6, §7.5.2). These helpers compute the same
  * results distributed:
  *
  *  1. range-partition the input by the ordering key (parallel sort),
  *  2. run the window WITHIN each partition,
  *  3. fix partition boundaries with a per-partition aggregate (one row per
  *     partition) whose prefix-carry is broadcast-joined back.
  *
  * Everything is one logical plan branching from the same range exchange, so
  * Spark's exchange reuse guarantees both branches see identical partition
  * ids — no caching or determinism assumptions needed.
  *
  * Ordering is ascending, nulls first (Spark's default); make null sort keys
  * explicit upstream (e.g. coalesce to a sentinel) if you need nulls last.
  */
object ScanOps {

  private val PID = "__scan_pid"

  private def sortCols(order: Seq[String], desc: Boolean): Seq[Column] =
    order.map(c => if (desc) col(c).desc_nulls_last else col(c))

  /** ADAPTIVE fast path: when the caller didn't pin a partition count and
    * the optimizer's size estimate says the input fits in ONE file
    * partition's worth of data, a plain global window adds no funnel worth
    * avoiding — while the range-carry machinery would cost a sample job,
    * an exchange, a second aggregate branch and a broadcast join per scan,
    * pure overhead at that size. The gate reads `optimizedPlan.stats`
    * (pure planning — NOT `df.rdd`, which under AQE materializes every
    * upstream shuffle stage eagerly and then re-executes it on the real
    * action). Size-only estimation never shrinks below the scanned bytes
    * for narrow plans, and joins/aggs only inflate it — so a big input
    * can't sneak onto the single-window path, and an overestimate merely
    * takes the (always-correct) distributed path. Results are identical by
    * construction; ScanOpsSpec pins the distributed path with explicit
    * multi-partition inputs + numPartitions, and the single-partition
    * window it compares against IS this fast path.
    *
    * One class of plan defeats size-only estimation: row-expanding
    * operators. A Generate (explode/posexplode — e.g. Chunker.splitChunks
    * feeding rowNumber) reports its CHILD's size, so a small input can
    * fan out to a larger window input the estimate never sees. Instead of
    * banning the fast path outright (r4 — which cost doc_text_splitter
    * 2.5× for a KB-scale fixture), each Generate in the plan BILLS a
    * conservative byte multiplier: the estimate must fit the budget even
    * if every Generate fans bytes out `GenerateExpansion`-fold. A split +
    * explode roughly conserves payload bytes (pieces of the parent text,
    * ~1.25× with 100/400 overlap) plus repeated parent columns, so 16× is
    * a generous over-bill — a plan anywhere near the budget/16^n line
    * still forces the (always-correct) distributed path, proven by the
    * guard-trip case in ScanOpsSpec. */
  private[ops] val GenerateExpansion = 16L
  private def useGlobalWindow(df: DataFrame, numPartitions: Int): Boolean = {
    if (numPartitions != 0) return false
    val plan = df.queryExecution.optimizedPlan
    val nGen = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }.size
    plan.stats.sizeInBytes * BigInt(GenerateExpansion).pow(nGen) <=
      BigInt(df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
  }

  private def globalW(order: Seq[String], desc: Boolean = false) =
    Window.orderBy(sortCols(order, desc): _*)

  private def ranged(df: DataFrame, order: Seq[String], desc: Boolean,
      numPartitions: Int): DataFrame = {
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, sortCols(order, desc): _*)
      .withColumn(PID, spark_partition_id())
  }

  private def localW(order: Seq[String], desc: Boolean = false) =
    Window.partitionBy(PID).orderBy(sortCols(order, desc): _*)

  /** Window over the per-partition boundary aggregate — at most one row per
    * partition, so a single-partition window is the point, not a hazard.
    * The partition key is a non-foldable constant 0: it keeps the spec
    * non-empty (a plain literal gets constant-folded away and trips the
    * planner's "no partition defined" warning) while still collapsing the
    * tiny aggregate to one partition by design. */
  private def pidW = Window.partitionBy(pmod(col(PID), lit(1))).orderBy(col(PID))

  /** Running sum of `value` over the global `order`: exclusive (strictly
    * preceding rows) by default, inclusive with `inclusive = true`.
    * Null-safe: null contributes nothing; rows before any value get 0. */
  def runningSum(df: DataFrame, order: Seq[String], value: Column,
      out: String, inclusive: Boolean = false,
      numPartitions: Int = 0): DataFrame = {
    if (useGlobalWindow(df, numPartitions)) {
      val hi = if (inclusive) 0L else -1L
      return df.withColumn(out, coalesce(sum(value).over(
        globalW(order).rowsBetween(Window.unboundedPreceding, hi)), lit(0)))
    }
    val p = ranged(df, order, desc = false, numPartitions)
    val hi = if (inclusive) 0L else -1L
    val local = p.withColumn("__scan_local",
      coalesce(sum(value).over(
        localW(order).rowsBetween(Window.unboundedPreceding, hi)), lit(0)))
    val offsets = p.groupBy(col(PID)).agg(sum(value).as("__scan_total"))
      .withColumn("__scan_offset",
        coalesce(sum(col("__scan_total"))
          .over(pidW.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select(col(PID), col("__scan_offset"))
    local.join(broadcast(offsets), PID)
      .withColumn(out, col("__scan_local") + col("__scan_offset"))
      .drop(PID, "__scan_local", "__scan_offset")
  }

  /** Global 1-based row number over `order` without a single-partition
    * sort: local row_number plus the count of rows in preceding
    * partitions. */
  def rowNumber(df: DataFrame, order: Seq[String], out: String,
      numPartitions: Int = 0): DataFrame = {
    if (useGlobalWindow(df, numPartitions))
      return df.withColumn(out, row_number().over(globalW(order)).cast("long"))
    val p = ranged(df, order, desc = false, numPartitions)
    val local = p.withColumn("__scan_local",
      row_number().over(localW(order)).cast("long"))
    val offsets = p.groupBy(col(PID)).agg(count(lit(1)).as("__scan_total"))
      .withColumn("__scan_offset",
        coalesce(sum(col("__scan_total"))
          .over(pidW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(PID), col("__scan_offset"))
    local.join(broadcast(offsets), PID)
      .withColumn(out, col("__scan_local") + col("__scan_offset"))
      .drop(PID, "__scan_local", "__scan_offset")
  }

  /** For each (in, out) pair: the latest non-null `in` value on any row
    * strictly before this one in the global order — the carried-state scan
    * behind version-drop detection (W1-W3). Equivalent to
    * `last(in, ignoreNulls).over(Window.orderBy(order).rowsBetween(-inf, -1))`
    * but distributed. Boundary carry: each partition's latest non-null value
    * per column, prefix-carried across partitions, seeds rows whose local
    * look-back found nothing. */
  def prevNonNull(df: DataFrame, order: Seq[String],
      values: Seq[(String, String)], numPartitions: Int = 0): DataFrame = {
    if (useGlobalWindow(df, numPartitions)) {
      val gw = globalW(order).rowsBetween(Window.unboundedPreceding, -1)
      return values.foldLeft(df) { case (d, (in, out)) =>
        d.withColumn(out, last(col(in), ignoreNulls = true).over(gw))
      }
    }
    val p = ranged(df, order, desc = false, numPartitions)
    val w = localW(order).rowsBetween(Window.unboundedPreceding, -1)
    val local = values.foldLeft(p) { case (d, (in, out)) =>
      d.withColumn(out, last(col(in), ignoreNulls = true).over(w))
    }
    // latest non-null value per partition per column: max over structs
    // ordered exactly like the window sort (order cols first)
    val aggs = values.map { case (in, out) =>
      max(when(col(in).isNotNull,
        struct(order.map(col) :+ col(in).as("__scan_v"): _*))).as(out)
    }
    val seeds0 = p.groupBy(col(PID)).agg(aggs.head, aggs.tail: _*)
    val seeds = values.foldLeft(seeds0) { case (d, (_, out)) =>
      d.withColumn(out,
        last(col(out), ignoreNulls = true)
          .over(pidW.rowsBetween(Window.unboundedPreceding, -1))
          .getField("__scan_v"))
    }.select(col(PID) +:
      values.map { case (_, out) => col(out).as(s"__scan_seed_$out") }: _*)
    values.foldLeft(local.join(broadcast(seeds), PID)) { case (d, (_, out)) =>
      d.withColumn(out, coalesce(col(out), col(s"__scan_seed_$out")))
    }.drop(PID +: values.map(v => s"__scan_seed_${v._2}"): _*)
  }

  /** Global `lag(value, k)` over `order`. Rows whose predecessor lies in an
    * earlier partition are seeded from the trailing k rows of preceding
    * partitions (a ≤ k·partitions-row broadcast). */
  def lagK(df: DataFrame, order: Seq[String], value: String, out: String,
      k: Int = 1, numPartitions: Int = 0): DataFrame =
    shiftK(df, order, value, out, k, desc = false, numPartitions)

  /** Global `lead(value, k)` over `order` — the same scan run on the
    * reversed ordering. */
  def leadK(df: DataFrame, order: Seq[String], value: String, out: String,
      k: Int = 1, numPartitions: Int = 0): DataFrame =
    shiftK(df, order, value, out, k, desc = true, numPartitions)

  private def shiftK(df: DataFrame, order: Seq[String], value: String,
      out: String, k: Int, desc: Boolean, numPartitions: Int): DataFrame = {
    require(k >= 1, s"shift distance must be >= 1, got $k")
    if (useGlobalWindow(df, numPartitions))
      return df.withColumn(out, lag(col(value), k).over(globalW(order, desc)))
    val p = ranged(df, order, desc, numPartitions)
    val local = p
      .withColumn(out, lag(col(value), k).over(localW(order, desc)))
      .withColumn("__scan_rn", row_number().over(localW(order, desc)))
    // trailing k rows of each partition (in scan direction)
    val tail = p
      .withColumn("__scan_rd",
        row_number().over(Window.partitionBy(PID)
          .orderBy(sortCols(order, !desc): _*)))
      .filter(col("__scan_rd") <= k)
      .select(col(PID).as("__scan_src") +: col(value).as("__scan_v") +:
        order.map(col): _*)
    // for each partition: its k nearest predecessors across ALL earlier
    // partitions; predecessor at distance d back serves local row k+1-d
    val pids = p.select(col(PID)).distinct()
    val seeds = pids.join(broadcast(tail), col("__scan_src") < col(PID))
      .withColumn("__scan_rd",
        row_number().over(Window.partitionBy(PID)
          .orderBy(sortCols(order, !desc): _*)))
      .filter(col("__scan_rd") <= k)
      .select(col(PID), (lit(k) + 1 - col("__scan_rd")).as("__scan_rn"),
        col("__scan_v"))
    local.join(broadcast(seeds), Seq(PID, "__scan_rn"), "left")
      .withColumn(out,
        when(col("__scan_rn") > k, col(out)).otherwise(col("__scan_v")))
      .drop(PID, "__scan_rn", "__scan_v")
  }
}
