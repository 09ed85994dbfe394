package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * arXiv:1508.07909) — merge training and encoding as Spark operators.
  *
  * The reference repo budgets tokens with a fixed ~4-chars/token estimate
  * (cli_wrapper/main.py:417-424) and this repo's `bpeishTokenCount` adds
  * the GPT-2 pre-tokenizer regex count; BOTH are stand-ins. A real
  * training-data pipeline learns a merge table from the corpus and
  * tokenizes with it. This operator does exactly that, shaped for scale:
  *
  *  - The ONLY corpus-scale pass is the word-frequency count (pre-tokenize
  *    + groupBy word) — map-side combinable, one shuffle of (word, n).
  *    Everything after runs on the word-frequency DICT, whose size is
  *    bounded by `dictCap` (count-desc/word-asc top-k, the same
  *    bounded-training-state move as IVF's trainCap): at 100 TB the
  *    corpus is huge but the dict the trainer iterates on is not.
  *  - Per merge iteration: adjacent-pair counts over the current dict
  *    segmentation (explode + groupBy — partial aggregation makes it
  *    map-side combinable), a ONE-ROW deterministic argmax pulled to the
  *    driver (count desc, then pair lexicographic — the only driver
  *    state is the merge table itself, numMerges rows), and the merge
  *    applied as one more column layer over the cached dict frame. One
  *    tiny Spark job per merge; the previous iteration's cache is
  *    dropped as soon as its successor is materialized.
  *  - Encoding never touches per-document text twice: the trained dict
  *    frame already HOLDS the final segmentation of every dict word, so
  *    encode is pre-tokenize → join against the bounded dict → per-doc
  *    aggregate. Per-document work is a hash join probe, not a merge
  *    replay. Encoding is TOTAL: words outside the capped dict segment
  *    by replaying the merge table over the corpus' distinct
  *    out-of-dict words ([[segmentWords]] — bounded per-word work,
  *    worst case ending at character symbols), so the cap bounds
  *    training state, never coverage.
  *
  * Determinism, cross-engine: the pre-tokenizer is lowercased `[a-z]+`
  * runs; a segmentation is a single-space-joined symbol string with a
  * leading space (`" l o w </w>"`); one merge (a, b) applies as a
  * left-to-right fold over the symbol list — textbook BPE semantics
  * including runs ("a a a a" + (a,a) → "aa aa"), expressed as
  * `aggregate()` here and `list_reduce()` in DuckDB so both engines
  * replay the identical merge sequence bit-for-bit. Ties in the pair
  * argmax break (count DESC, left ASC, right ASC) — ASCII-binary string
  * order in both engines.
  *
  * Precondition: `numMerges` must not exceed the corpus' merge capacity
  * (every word fully merged ⇒ no adjacent pairs left). The trainer fails
  * fast with the iteration number; the unrolled SQL oracle would
  * silently cascade empties instead, so registered queries keep a wide
  * margin (fixture corpora exhaust at ~105 merges; the registered
  * queries train 64).
  */
object Bpe {

  /** Pre-tokenizer: lowercased letter runs. Deliberately simple — the
    * point of the operator is the LEARNED merge table; the pre-tokenizer
    * only has to be identical across engines. */
  val WordPattern = "[a-z]+"

  /** Dict bound: training state is the top-`DefaultDictCap` words by
    * (count desc, word asc) — the IVF-trainCap move. Far above any
    * fixture vocabulary; at 100 TB it is what keeps the per-iteration
    * frame bounded. */
  val DefaultDictCap: Int = 100000

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** (word, cnt) — the one corpus-scale pass, capped at `dictCap`. */
  def wordDict(docs: DataFrame, textCol: String, dictCap: Int): DataFrame =
    docs
      .select(explode(
        regexp_extract_all(lower(col(textCol)), lit(WordPattern), lit(0)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      // deterministic bounded dict: top-k by (cnt desc, word asc) via
      // TakeOrdered — no global window, no full sort
      .orderBy(col("cnt").desc, col("word"))
      .limit(dictCap)

  /** `" l o w </w>"`: leading space, single-spaced symbols, `</w>`
    * terminal. The leading space makes the fold's token-boundary check
    * (`acc endsWith " " + left`) safe for the first symbol too. */
  private def initSeg(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "), lit("</w>"))

  /** Symbol list of a segmentation string (drops the leading-space
    * empty). */
  def symbols(seg: Column): Column =
    filter(split(seg, " "), x => x =!= "")

  /** Apply ONE merge (a, b) → ab to a segmentation string: left-to-right
    * fold over the symbol list — when the accumulated string ends with
    * the complete token `a` and the next symbol is `b`, replace that
    * trailing token with `ab`; the merged token cannot re-merge with a
    * following `b` (its text is `ab`, not `a`), which is exactly the
    * textbook non-overlapping rule. DuckDB twin: `list_reduce` with the
    * same lambda. */
  def applyMerge(seg: Column, a: String, b: String): Column =
    aggregate(
      symbols(seg),
      lit(""),
      (acc, x) =>
        when(acc.endsWith(lit(" " + a)) && (x === lit(b)),
          concat(acc.substr(lit(1), length(acc) - lit(a.length)), lit(a + b)))
          .otherwise(concat(acc, lit(" "), x)))

  /** Train `numMerges` merges over `docs(textCol)`. Returns the ordered
    * merge table (driver-bounded: numMerges rows) and the trained dict
    * frame (word, cnt, seg) with every word's FINAL segmentation, ready
    * for [[encode]].
    *
    * The plan is truncated with `localCheckpoint()` every
    * `checkpointEvery` merges, not `cache()` and not every iteration:
    * caching materializes the DATA but leaves the LOGICAL plan growing
    * one fold-lambda layer per merge, and re-analyzing a 64-deep
    * higher-order-function tree every iteration turns the driver into
    * the bottleneck long before any executor does (measured: the
    * 64-merge loop stalls in analysis). Checkpointing EVERY iteration
    * pays one extra materialization job per merge; a stride of 8 keeps
    * the unanalyzed tail ≤ 8 fold layers (re-executed per argmax over
    * the ≤ dictCap frame — trivial next to any shuffle) while cutting
    * the per-training job count by ~64. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      dictCap: Int = DefaultDictCap,
      checkpointEvery: Int = 8): (Seq[Merge], DataFrame) = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    var seg = wordDict(docs, textCol, dictCap)
      .withColumn("seg", initSeg(col("word")))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    (1 to numMerges).foreach { i =>
      // adjacent pairs of the current segmentation, weighted by word
      // count; fully-merged words (single symbol) drop out of pair
      // generation (a sequence() over an empty index range is avoided
      // by the size filter)
      val top = seg
        .select(col("cnt"), symbols(col("seg")).as("l"))
        .filter(size(col("l")) >= 2)
        .select(col("cnt"), col("l"),
          explode(sequence(lit(0), size(col("l")) - 2)).as("k"))
        .select(col("cnt"),
          element_at(col("l"), col("k") + 1).as("a"),
          element_at(col("l"), col("k") + 2).as("b"))
        .groupBy("a", "b").agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"BPE merge capacity exhausted at iteration $i of $numMerges — " +
          "every dict word is fully merged; lower numMerges")
      val m = Merge(i, top(0).getString(0), top(0).getString(1),
        top(0).getLong(2))
      merges += m
      seg = seg.withColumn("seg", applyMerge(col("seg"), m.left, m.right))
      if (i % checkpointEvery == 0 || i == numMerges)
        seg = seg.localCheckpoint()
    }
    (merges.toSeq, seg)
  }

  /** The merge table as a DataFrame: (rank, lft, rgt, merged, cnt) —
    * `merged = lft || rgt`, `cnt` the winning pair count at selection
    * time (non-increasing in rank: a merge can only create pairs whose
    * counts are bounded by pairs that were already available and not
    * chosen). */
  def mergeTable(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.left + m.right, m.count))
      .toDF("rank", "lft", "rgt", "merged", "cnt")
  }

  /** Segment arbitrary words by replaying the trained merge table: each
    * word starts at its character segmentation and folds through ALL
    * `merges` in rank order — textbook BPE inference for words the
    * bounded training dict never held. Per-word work is
    * |merges| × |symbols| (both bounded: ≤ numMerges fold layers over a
    * word-length list), fully distributed, no corpus-scale state — the
    * merge table itself is the only driver-held input (numMerges rows,
    * applied as literal column layers, never joined). The same
    * `checkpointEvery` plan-truncation stride as [[train]] keeps the
    * 64-layer fold tree out of the analyzer's way — but LAZILY
    * (`localCheckpoint(eager = false)`): the plan is truncated at
    * transform time, while nothing materializes until a downstream
    * action actually needs the segmentations. When the input word frame
    * is empty (every corpus word inside the trained dict — the
    * never-binding-cap encode path), the replay therefore costs ZERO
    * jobs instead of one anti-join materialization plus a no-op job per
    * checkpoint stride.
    *
    * Input: a frame with a `word` column (distinct words — callers
    * dedupe first so replay cost is per distinct word, not per
    * occurrence). Returns (word, seg). */
  def segmentWords(words: DataFrame, merges: Seq[Merge],
      checkpointEvery: Int = 8): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    var seg = words.select(col("word"))
      .withColumn("seg", initSeg(col("word")))
    merges.foreach { m =>
      seg = seg.withColumn("seg", applyMerge(col("seg"), m.left, m.right))
      if (m.rank % checkpointEvery == 0)
        seg = seg.localCheckpoint(eager = false)
    }
    seg
  }

  /** Encode `docs(idCol, textCol)` against a trained dict: per document,
    * the total pre-tokenized word count and the total BPE token count —
    * over 100 % of words. Dict words cost one hash-join probe against
    * the BOUNDED dict (whose `seg` column already carries the fully
    * merged segmentation — no per-document merge replay); words OUTSIDE
    * the capped dict (the tail vocabulary a token-count operator exists
    * to price at 100 TB) segment by [[segmentWords]] merge-table replay
    * over the corpus' DISTINCT out-of-dict words — bounded per-word
    * work, then the same hash-join probe. A real tokenizer is total;
    * the dict cap bounds TRAINING state, never coverage.
    * Returns (idCol, n_words, n_tokens) — exactly [[encodeWithOov]]
    * minus its observability column (one definition of the word
    * stream / dict-OOV union / probe join, not two; Catalyst prunes
    * the unused `n_oov` aggregate from this projection). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      trainedDict: DataFrame, merges: Seq[Merge],
      checkpointEvery: Int = 8): DataFrame =
    encodeWithOov(docs, idCol, textCol, trainedDict, merges,
      checkpointEvery).drop("n_oov")

  /** [[encode]] plus an `n_oov` column (words priced via merge-table
    * replay rather than the trained dict) — the observability column for
    * corpora where the dict cap binds. Returns (idCol, n_words,
    * n_tokens, n_oov). */
  def encodeWithOov(docs: DataFrame, idCol: String, textCol: String,
      trainedDict: DataFrame, merges: Seq[Merge],
      checkpointEvery: Int = 8): DataFrame = {
    val wordStream = docs
      .select(col(idCol), explode(
        regexp_extract_all(lower(col(textCol)), lit(WordPattern), lit(0)))
        .as("word"))
    val dictTokens = trainedDict
      .select(col("word"), size(symbols(col("seg"))).as("n_toks"),
        lit(false).as("is_oov"))
    val oovWords = wordStream.select("word").distinct()
      .join(trainedDict.select("word"), Seq("word"), "left_anti")
    val oovTokens = segmentWords(oovWords, merges, checkpointEvery)
      .select(col("word"), size(symbols(col("seg"))).as("n_toks"),
        lit(true).as("is_oov"))
    wordStream
      .join(dictTokens.unionByName(oovTokens), "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("is_oov"), 1L).otherwise(0L)).as("n_oov"))
  }
}
