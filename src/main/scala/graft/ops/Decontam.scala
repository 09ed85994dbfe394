package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share long
  * word n-grams with an evaluation/benchmark set (the GPT-3 appendix-C /
  * PaLM style 8-gram overlap check).
  *
  * Shape at 100 TB: the eval side is a benchmark suite — thousands of
  * documents, i.e. tiny next to the corpus — so its distinct n-gram set
  * is BROADCAST and the whole check is a map-side hash probe over the
  * training corpus: one Generate (n-gram explode) + one broadcast
  * semi-ish join + one groupBy(doc_id) with map-side partial counts. No
  * big-side shuffle of text, no corpus self-join. If the eval suite ever
  * outgrew the broadcast budget the same code degrades to a shuffled
  * equi-join on the gram hash, still linear.
  *
  * Grams are compared via md5 of the joined words, so the probe set
  * carries 32-byte hashes rather than raw strings, and the computation is
  * engine-portable (DuckDB md5 is identical) and partitioning-independent.
  */
object Decontam {

  /** One row per (id, distinct n-gram hash). Documents shorter than n
    * words contribute a single gram of the whole text — a short eval doc
    * is still contamination if it appears verbatim. Tokenization matches
    * Dedup.shingles: single-space split (the corpus is pre-normalized;
    * swap in `\\s+` splitting upstream for raw text). */
  def ngramHashes(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(array_distinct(graft.functions.TextFunctions.gramMd5(
          col(textCol), n, clip = true))).as("gram"))

  /** Per-training-doc contamination report against `evalDocs`:
    * (doc_id, n_grams, n_contaminated, contaminated). n_grams counts the
    * doc's distinct n-grams, n_contaminated those also present in ANY
    * eval doc. The eval gram set is deduplicated then broadcast. */
  def contamination(trainDocs: DataFrame, evalDocs: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // ONE pass over the corpus grams: left-probe the broadcast eval set
    // and count total + hit grams in the same groupBy (count of a
    // non-null marker column = hits). The earlier two-branch shape ran
    // the corpus-side Generate+explode — the dominant cost at 100 TB —
    // twice, once per branch.
    val trainGrams = ngramHashes(trainDocs, n, idCol, textCol)
    val evalGrams = ngramHashes(evalDocs, n, idCol, textCol)
      .select(col("gram")).distinct()
      .withColumn("hit", lit(1))
    trainGrams
      .join(broadcast(evalGrams).hint("broadcast"), Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_contaminated"))
      .select(col("id").as(idCol),
        col("n_grams"),
        col("n_contaminated"),
        when(col("n_contaminated") > 0, 1).otherwise(0).as("contaminated"))
  }

  /** The REVERSE direction of `contamination` — the report a benchmark
    * owner reads: per EVAL doc, how much of it leaked into the training
    * corpus. (doc_id, n_grams, n_leaked_grams, n_train_docs): the eval
    * doc's distinct n-gram count, how many of those grams appear in ANY
    * training doc, and how many distinct training docs carry at least
    * one of them. Same 100 TB shape as the forward check: the eval
    * (id, gram) pairs broadcast, the corpus side is one Generate + a
    * broadcast hash probe + map-side-combinable distinct aggregation —
    * no big-side shuffle of text. */
  def contaminationReport(trainDocs: DataFrame, evalDocs: DataFrame,
      n: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val evalGrams = ngramHashes(evalDocs, n, idCol, textCol)
      .select(col("id").as("eval_id"), col("gram"))
    val trainGrams = ngramHashes(trainDocs, n, idCol, textCol)
    val leaks = trainGrams
      .join(broadcast(evalGrams).hint("broadcast"), Seq("gram"), "inner")
      .groupBy(col("eval_id"))
      .agg(countDistinct(col("gram")).as("n_leaked_grams"),
        countDistinct(col("id")).as("n_train_docs"))
    evalGrams
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_grams"))
      .join(leaks, Seq("eval_id"), "left")
      .select(col("eval_id").as(idCol),
        col("n_grams"),
        coalesce(col("n_leaked_grams"), lit(0L)).as("n_leaked_grams"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"))
  }
}
