package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiler: per column, row count, null count and
  * distinct count — the data-audit report every ingest of a new corpus
  * starts with (schema drift, null explosions, key-cardinality checks
  * before a join is even written).
  *
  * [[profile]] is the EXACT form: a single aggregate carrying one
  * `count(col)` + one `count(distinct col)` pair per column. Spark
  * plans multi-distinct aggregates with an Expand (one scan, rows
  * multiplied by |columns|+1 before partial aggregation) — a
  * schema-scale constant factor on one pass, never a second scan per
  * column. [[profileApprox]] is the 100 TB form: HLL++
  * (`approx_count_distinct`) per column needs no Expand and carries
  * kilobytes of sketch state per column instead of per-distinct-value
  * hash state; its estimates are NOT cross-engine replayable (the
  * spec bounds it against the exact form instead). The replayable
  * bounded-state alternative is `graft_kmv`
  * ([[graft.functions.KmvAgg]]) — registered as `ev_profile_kmv` with
  * a full DuckDB oracle, estimates and all.
  */
object Profile {

  private def checked(df: DataFrame, columns: Seq[String]): Seq[String] = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"unknown columns: ${missing.mkString(", ")}")
    cols
  }

  /** Exact profile. Returns one row per column:
    * (col_name, n_rows, n_nulls, n_distinct). */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = checked(df, columns)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct")))
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Sketch-state profile: distinct counts via HLL++ at relative
    * standard deviation `rsd`. Same schema as [[profile]] with
    * `n_distinct_est` in place of `n_distinct`. */
  def profileApprox(df: DataFrame, columns: Seq[String] = Nil,
      rsd: Double = 0.05): DataFrame = {
    val cols = checked(df, columns)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      approx_count_distinct(col(c), rsd).as(s"__nd_$c")))
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map(c => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct_est")))
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
