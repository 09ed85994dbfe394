package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered query: a Spark implementation plus (optionally) an
  * equivalent DuckDB SQL oracle over the same parquet tables. The driver
  * hash-compares values after sorting columns by name, so:
  *   - alias every computed column identically on both sides;
  *   - make row order deterministic with the same ORDER BY on both sides;
  *   - keep float arithmetic bit-identical where possible (exact decimal
  *     sums cast to double) and round where it is not.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle.stripMargin.trim))

  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)

  // ---- cross-engine determinism helpers ------------------------------------
  // Float aggregates: accumulate as DECIMAL(18,2) (exact for the 2-dp
  // testdata) and cast the RESULT to double — both engines produce the
  // identical double, order-independently. The query suites inline
  // `c.cast("decimal(18,2)")` ↔ `CAST(x AS DECIMAL(18,2))`; keep any new
  // query on that same pattern. Stddev/z-scores: compute from exact power
  // sums (see EventAnalytics.stddevFromSums), never stddev_samp.

  /** Timestamp floored to whole epoch seconds as BIGINT. The events table
    * has nanosecond timestamps which Spark truncates to micros but DuckDB
    * keeps — comparing raw ts values would mismatch. DuckDB mirror:
    * CAST(date_part('epoch', date_trunc('second', ts)) AS BIGINT). */
  def epochSec(c: Column): Column = unix_timestamp(c)
}
