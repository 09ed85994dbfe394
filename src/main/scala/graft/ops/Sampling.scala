package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data mixes.
  *
  * A pre-training mix assigns each stratum (language, source domain, ...)
  * a TOKEN budget, not a row budget. `tokenBudgetSample` fills each
  * stratum's budget by walking its documents in salted-md5 order — a
  * uniform random permutation that is reproducible across runs, engines
  * and partitionings (the same property doc_train_split relies on) — and
  * keeps every doc that STARTS within budget, so the kept set is stable
  * under corpus growth of later-ordered docs.
  *
  * Scale shape: one window (sum over the hash order, partitioned by the
  * stratum) — a single shuffle keyed on the stratum column. Strata counts
  * are small (languages, domains) but individual strata can be huge; the
  * window is a running sum, which Spark executes streaming within each
  * partition without materializing the stratum in memory. For a truly
  * skewed mega-stratum, pre-aggregating per (stratum, hash-prefix) ranges
  * would shard the sum; not needed at the corpus shapes benchmarked.
  */
object Sampling {

  /** Adds `smp_hash` (the salted order key), `cum_tokens` (running token
    * total in hash order, inclusive of the current doc) and `kept`
    * (1 iff the doc's tokens START before the stratum budget is full). */
  def tokenBudgetSample(df: DataFrame, stratumCol: String,
      tokensCol: String, budget: Long, idCol: String = "doc_id",
      salt: String = ":sample:v1"): DataFrame = {
    val hash = md5(concat(col(idCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("smp_hash"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("smp_hash", hash)
      .withColumn("cum_tokens", sum(col(tokensCol).cast("long")).over(w))
      .withColumn("kept",
        when(col("cum_tokens") - col(tokensCol) < budget, 1).otherwise(0))
  }

  /** Weighted training mix: a DIFFERENT token budget per stratum (the
    * actual shape of a pre-training data recipe — "30B tokens of code,
    * 5B of forum text, ..."). `budgets` maps stratum value → budget;
    * strata absent from the map get `defaultBudget`. The map joins in as
    * a broadcast literal frame, so the plan stays the same single
    * stratum-keyed window shuffle as the uniform sampler. */
  def tokenBudgetMix(df: DataFrame, stratumCol: String, tokensCol: String,
      budgets: Map[String, Long], defaultBudget: Long = 0L,
      idCol: String = "doc_id", salt: String = ":sample:v1"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = budgets.toSeq.sortBy(_._1)
      .toDF(stratumCol, "stratum_budget")
    tokenBudgetSample(df, stratumCol, tokensCol, 0L, idCol, salt)
      .drop("kept")
      .join(broadcast(b), Seq(stratumCol), "left")
      .withColumn("stratum_budget",
        coalesce(col("stratum_budget"), lit(defaultBudget)))
      .withColumn("kept",
        when(col("cum_tokens") - col(tokensCol) < col("stratum_budget"), 1)
          .otherwise(0))
  }
}
