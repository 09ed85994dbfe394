package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-corpus cleaning pipeline: quality gate +
  * repetition gate + transitive near-dup dedup + benchmark
  * decontamination, evaluated as ONE Spark plan off a single cached
  * (doc_id, text, source, lang) projection. This is the library form
  * behind the registered `doc_clean_pipeline` / `doc_pipeline_report`
  * queries and the `Cli clean` subcommand.
  *
  * Scale shape (the 100 TB job): the four gates are independently
  * sub-linear — quality and repetition are map-side projections/
  * aggregations, dedup is MinHash banding + O(log²)-round connected
  * components, decontam is a broadcast hash probe — and they share one
  * corpus scan here via cache; on a real cluster the equivalent move is
  * staging the projection as a columnar intermediate table.
  */
object CleanPipeline {

  /** Gate thresholds. Defaults match the registered pipeline's
    * corpus-calibrated values (every gate actually drops documents on
    * the synthetic corpus). */
  final case class Config(
      minTokens: Int = 20,
      stopwords: Seq[String] = Seq("the", "a"),
      maxStopFrac: Double = 0.1,
      maxTopGramFrac: Double = 0.18,
      decontamN: Int = 8)

  /** Per-doc gate decisions for `train` against benchmark set `eval`:
    * (doc_id, source, lang, is_quality, not_repetitive, dedup_keep,
    * not_contaminated, keep). `train` needs columns doc_id, text,
    * source, lang. The train frame is cached for the four gates (the
    * caller owns unpersisting if it cares; Verify/Bench clear the cache
    * between queries). */
  def decisions(train: DataFrame, eval: DataFrame,
      cfg: Config = Config()): DataFrame = {
    val t = train.cache()
    val toks = split(col("text"), " ")
    val qual = t.select(col("doc_id"), col("source"), col("lang"),
      when(size(toks) >= cfg.minTokens &&
        size(filter(toks, x => x.isin(cfg.stopwords: _*))).cast("double") /
          size(toks) < cfg.maxStopFrac, 1).otherwise(0).as("is_quality"))
    val rep = TextAnalysis.repetitionSignals(t)
      .select(col("doc_id"),
        when(col("top2_frac") < cfg.maxTopGramFrac, 1).otherwise(0)
          .as("not_repetitive"))
    val comp = Dedup.nearDupComponents(t)
      .select(col("doc_id"),
        when(col("doc_id") === col("component"), 1).otherwise(0)
          .as("dedup_keep"))
    val cont = Decontam.contamination(t, eval, n = cfg.decontamN)
      .select(col("doc_id"),
        when(col("contaminated") === 0, 1).otherwise(0)
          .as("not_contaminated"))
    // one gate row per (doc, gate) unioned, pivoted by ONE groupBy —
    // each gate emits exactly one row per doc, so max() recovers its
    // column. The former shape joined the four frames pairwise on
    // doc_id: three corpus-wide join exchanges (plus their sorts) where
    // one aggregation exchange carries the same rows.
    val ns = lit(null).cast("string")
    val ni = lit(null).cast("int")
    val unioned = qual
      .select(col("doc_id"), col("source"), col("lang"),
        col("is_quality"), ni.as("not_repetitive"), ni.as("dedup_keep"),
        ni.as("not_contaminated"))
      .unionByName(rep.select(col("doc_id"), ns.as("source"),
        ns.as("lang"), ni.as("is_quality"), col("not_repetitive"),
        ni.as("dedup_keep"), ni.as("not_contaminated")))
      .unionByName(comp.select(col("doc_id"), ns.as("source"),
        ns.as("lang"), ni.as("is_quality"), ni.as("not_repetitive"),
        col("dedup_keep"), ni.as("not_contaminated")))
      .unionByName(cont.select(col("doc_id"), ns.as("source"),
        ns.as("lang"), ni.as("is_quality"), ni.as("not_repetitive"),
        ni.as("dedup_keep"), col("not_contaminated")))
    unioned.groupBy("doc_id")
      .agg(max(col("source")).as("source"), max(col("lang")).as("lang"),
        max(col("is_quality")).as("is_quality"),
        max(col("not_repetitive")).as("not_repetitive"),
        max(col("dedup_keep")).as("dedup_keep"),
        max(col("not_contaminated")).as("not_contaminated"))
      .withColumn("keep",
        when(col("is_quality") === 1 && col("not_repetitive") === 1 &&
          col("dedup_keep") === 1 && col("not_contaminated") === 1, 1)
          .otherwise(0))
  }

  /** Per-source attrition report over a `decisions` frame — what an
    * operator watches on the long-running job: a keep-rate shift in one
    * source is the standard signal of upstream corruption or a
    * miscalibrated gate. */
  def report(decisions: DataFrame): DataFrame =
    decisions
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("is_quality")).cast("long").as("n_quality"),
        sum(col("not_repetitive")).cast("long").as("n_not_repetitive"),
        sum(col("dedup_keep")).cast("long").as("n_dedup_keep"),
        sum(col("not_contaminated")).cast("long").as("n_not_contaminated"),
        sum(col("keep")).cast("long").as("n_kept"),
        (sum(col("keep")).cast("double") / count(lit(1))).as("keep_rate"))
}
