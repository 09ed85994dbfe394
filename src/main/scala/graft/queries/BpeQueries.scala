package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Bpe
import QueryDef._

/** Learned-BPE registry entries: merge-table training, corpus encoding,
  * and the cap-binding out-of-vocabulary variant — each with a FULL
  * DuckDB replay oracle.
  *
  * The oracle replays the exact training loop with the merge iterations
  * UNROLLED as generated CTE triples (pair counts → one-row argmax →
  * fold-applied segmentation): the loop is inherently sequential and the
  * iteration count is a compile-time constant of the registered query,
  * so unrolling — the same move as the embedded-hyperplane-literal LSH
  * oracles — turns "iterate N times" into plain ANSI-ish SQL DuckDB
  * executes directly. Merge application is `list_reduce` with the
  * identical fold lambda as the Spark `aggregate()` (textbook
  * left-to-right non-overlapping semantics, runs included), and the
  * argmax tiebreak (count DESC, pair ASC) is ASCII-binary in both
  * engines, so the two sides select the SAME merge at every rank and
  * every downstream segmentation string is bit-identical. OOV inference
  * unrolls the same way: one fold CTE per merge over the out-of-dict
  * word set (Bpe.segmentWords' replay, merge by merge).
  *
  * numMerges = 64 leaves a wide margin under the fixture corpora's
  * ~105-merge capacity (all SFs share one 31-word synthetic vocabulary;
  * exhaustion would cascade empty CTEs through the unrolled oracle —
  * the Spark trainer fails fast instead, see Bpe.train). The OOV query
  * trains a dictCap-12 tokenizer (the cap BINDS: 19 of the 31 fixture
  * words are out-of-dict) with 16 merges — 12 short words exhaust well
  * under 64.
  */
object BpeQueries {

  /** Merge-table length of the registered full-dict queries. */
  val NumMerges = 64

  /** The cap-binding OOV query's parameters: dictCap far under the
    * fixture's 31-word vocabulary, merges far under 12 short words'
    * exhaustion point. */
  val OovDictCap = 12
  val OovNumMerges = 16

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  // Registry-level training memo — the clean-pipeline move for the one
  // genuinely shareable expensive artifact: doc_bpe_vocab and
  // doc_bpe_encode run the IDENTICAL 64-merge training (16+ s of a bench
  // pass when billed twice). The memo holds (merges, trained dict) keyed
  // by (session, sfDir, params); the dict frame is a driver-local
  // relation (Bpe.train's bounded-dict collect), so it survives
  // `spark.catalog.clearCache()` trivially. Verify semantics are
  // unchanged — a memo hit returns the exact frame a fresh training
  // would — and Bench evicts the memo at the START of each timed pass, so
  // each pass bills exactly one training (on its alphabetically-first
  // consumer) instead of one per consumer.
  private val trainMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int, Int), (Seq[Bpe.Merge], DataFrame)]

  /** Train-or-reuse for the registered queries. */
  def trainedFor(s: SparkSession, dir: String, numMerges: Int,
      dictCap: Int): (Seq[Bpe.Merge], DataFrame) =
    trainMemo.getOrElseUpdate((s, dir, numMerges, dictCap),
      Bpe.train(docs(s, dir), "text", numMerges, dictCap))

  /** Drop all memoized trainings (Bench calls this per timed pass;
    * long-lived sessions call it when done with a corpus). */
  def evictTrainMemo(): Unit = trainMemo.clear()

  /** One fold application of the CURRENT row's b CTE merge (b.a, b.b)
    * to `seg` — the DuckDB twin of Bpe.applyMerge. */
  private def foldSql: String =
    "list_reduce(list_prepend('', list_filter(string_split(seg,' '), " +
      "x -> x <> '')), (acc, x) -> " +
      "CASE WHEN ends_with(acc, ' ' || b.a) AND x = b.b " +
      "THEN acc[1:len(acc)-len(b.a)] || b.a || b.b " +
      "ELSE acc || ' ' || x END)"

  /** The shared training CTE chain: w (bounded dict), s0 (initial char
    * segmentation) and for each i ∈ [1, n]: p{i} pair counts, b{i}
    * one-row argmax, s{i} merged segmentation.
    *
    * Every CTE is AS MATERIALIZED: s{i} is referenced twice (by p{i+1}
    * and s{i+1}) and b{i} twice (by s{i} and the vocab UNION), so
    * inlining would expand the 64-deep chain exponentially — DuckDB's
    * planner then re-opens the parquet leaf per expansion and dies on
    * file handles long before it runs out of CPU. Materialization makes
    * the oracle compute each (dict-sized) stage exactly once, same as
    * the Spark trainer's per-iteration localCheckpoint. */
  private def trainCtes(n: Int, dictCap: Int): String = {
    val head = Seq(
      s"""w0 AS MATERIALIZED (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(regexp_extract_all(lower(text),
         |      '${Bpe.WordPattern}')) AS word
         |    FROM documents) GROUP BY word
         |)""".stripMargin,
      s"""w AS MATERIALIZED (
         |  SELECT word, cnt FROM (
         |    SELECT word, cnt,
         |      ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rk FROM w0)
         |  WHERE rk <= $dictCap
         |)""".stripMargin,
      """s0 AS MATERIALIZED (
        |  SELECT word, cnt,
        |    ' ' || regexp_replace(word, '(.)', '\1 ', 'g') || '</w>' AS seg
        |  FROM w
        |)""".stripMargin)
    val iters = (1 to n).flatMap { i =>
      Seq(
        s"p$i AS MATERIALIZED (SELECT l[k] AS a, l[k+1] AS b, SUM(cnt) AS c FROM (" +
          s"SELECT cnt, l, unnest(range(1, len(l))) AS k FROM (" +
          s"SELECT cnt, list_filter(string_split(seg,' '), x -> x <> '') " +
          s"AS l FROM s${i - 1})) GROUP BY a, b)",
        s"b$i AS MATERIALIZED (SELECT a, b, CAST(c AS BIGINT) AS c FROM p$i " +
          s"ORDER BY c DESC, a, b LIMIT 1)",
        s"s$i AS MATERIALIZED (SELECT word, cnt, $foldSql AS seg FROM s${i - 1}, b$i b)")
    }
    (head ++ iters).mkString(",\n")
  }

  /** The OOV inference CTE chain (append after [[trainCtes]] and a `dw`
    * word-stream CTE): ov0 = distinct out-of-dict words at their char
    * segmentation, then one fold CTE per trained merge — the unrolled
    * twin of Bpe.segmentWords. */
  private def oovCtes(n: Int): String = {
    val head =
      """ov0 AS MATERIALIZED (
        |  SELECT word,
        |    ' ' || regexp_replace(word, '(.)', '\1 ', 'g') || '</w>' AS seg
        |  FROM (SELECT DISTINCT word FROM dw)
        |  WHERE word NOT IN (SELECT word FROM w)
        |)""".stripMargin
    val iters = (1 to n).map { i =>
      s"ov$i AS MATERIALIZED (SELECT word, $foldSql AS seg FROM ov${i - 1}, b$i b)"
    }
    (head +: iters).mkString(",\n")
  }

  private val dwCte =
    s"""dw AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text),
       |    '${Bpe.WordPattern}')) AS word
       |  FROM documents
       |)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ---- learned merge table ---------------------------------------------
    sql("doc_bpe_vocab", {
      val union = (1 to NumMerges)
        .map(i => s"SELECT $i AS rank, a AS lft, b AS rgt, " +
          s"a || b AS merged, c AS cnt FROM b$i")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH ${trainCtes(NumMerges, Bpe.DefaultDictCap)}
         |SELECT rank, lft, rgt, merged, cnt FROM (
         |  $union
         |) ORDER BY rank""".stripMargin
    }) { (s, dir) =>
      val (merges, _) = trainedFor(s, dir, NumMerges, Bpe.DefaultDictCap)
      Bpe.mergeTable(s, merges).orderBy("rank")
    },

    // ---- corpus encoding against the learned merges ----------------------
    // Per doc: word count + total BPE tokens, over 100 % of words. The
    // Spark side joins the pre-tokenized word stream against the trained
    // dict's FINAL segmentations (bounded hash probe per word, no per-doc
    // replay), with out-of-dict words priced by merge-table replay
    // (Bpe.encode is total); here dictCap = 100k never binds on the
    // 31-word fixture vocabulary — the replay branch is provably empty —
    // so the oracle reads every segmentation straight out of s{N}. The
    // cap-BINDING regime, where the replay branch carries real words, is
    // doc_bpe_encode_oov below.
    sql("doc_bpe_encode",
      s"""WITH ${trainCtes(NumMerges, Bpe.DefaultDictCap)},
         |$dwCte,
         |et AS (
         |  SELECT word, len(list_filter(string_split(seg,' '),
         |    x -> x <> '')) AS n_toks
         |  FROM s$NumMerges
         |)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens
         |FROM dw JOIN et USING (word)
         |GROUP BY doc_id
         |ORDER BY doc_id""") { (s, dir) =>
      val (merges, dict) = trainedFor(s, dir, NumMerges, Bpe.DefaultDictCap)
      Bpe.encode(docs(s, dir), "doc_id", "text", dict, merges)
        .orderBy("doc_id")
    },

    // ---- total encoding where the dict cap BINDS: OOV merge replay -------
    // dictCap 12 on the 31-word fixture vocabulary leaves 19 words
    // out-of-dict; each segments by replaying the 16 trained merges from
    // its character segmentation (bounded per-word work — the tail
    // vocabulary is exactly what a token-count operator exists to price
    // at 100 TB). n_words/n_tokens cover 100 % of words; n_oov counts the
    // replay-priced ones. The oracle unrolls the SAME replay: one fold
    // CTE per merge over the out-of-dict word set, so both engines carry
    // bit-identical segmentations for every word, in or out of dict.
    // ---- tokenizer fertility by language ----------------------------------
    // The tokenizer-efficiency audit: per language, tokens-per-word
    // (fertility) and chars-per-token (compression) under the learned
    // merges — the report that tells you which languages the trained
    // vocabulary serves poorly (high fertility = more sequence length
    // per unit text = higher training cost for that slice). All sums
    // are exact BIGINTs off the shared encode derivation (training
    // memoized — one per session/bench pass); the two ratios divide
    // identical exact integers in both engines.
    sql("doc_bpe_fertility",
      s"""WITH ${trainCtes(NumMerges, Bpe.DefaultDictCap)},
         |$dwCte,
         |et AS (
         |  SELECT word, len(list_filter(string_split(seg,' '),
         |    x -> x <> '')) AS n_toks
         |  FROM s$NumMerges
         |),
         |enc AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens
         |  FROM dw JOIN et USING (word)
         |  GROUP BY doc_id
         |)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_words) AS BIGINT) AS n_words,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  ROUND(CAST(CAST(SUM(n_tokens) AS BIGINT) AS DOUBLE)
         |    / CAST(SUM(n_words) AS BIGINT), 6) AS tokens_per_word,
         |  ROUND(CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE)
         |    / CAST(SUM(n_tokens) AS BIGINT), 6) AS chars_per_token
         |FROM documents JOIN enc USING (doc_id)
         |GROUP BY lang
         |ORDER BY lang""") { (s, dir) =>
      import org.apache.spark.sql.functions.{round => sqlRound}
      val (merges, dict) = trainedFor(s, dir, NumMerges, Bpe.DefaultDictCap)
      val enc = Bpe.encode(docs(s, dir), "doc_id", "text", dict, merges)
      docs(s, dir).select("doc_id", "lang", "n_chars")
        .join(enc, "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_chars")).as("__chars"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
          sqlRound(col("n_tokens").cast("double") / col("n_words"), 6)
            .as("tokens_per_word"),
          sqlRound(col("__chars").cast("double") / col("n_tokens"), 6)
            .as("chars_per_token"))
        .orderBy("lang")
    },

    sql("doc_bpe_encode_oov",
      s"""WITH ${trainCtes(OovNumMerges, OovDictCap)},
         |$dwCte,
         |${oovCtes(OovNumMerges)},
         |et AS (
         |  SELECT word, len(list_filter(string_split(seg,' '),
         |    x -> x <> '')) AS n_toks, FALSE AS is_oov
         |  FROM s$OovNumMerges
         |  UNION ALL
         |  SELECT word, len(list_filter(string_split(seg,' '),
         |    x -> x <> '')) AS n_toks, TRUE AS is_oov
         |  FROM ov$OovNumMerges
         |)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN is_oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |FROM dw JOIN et USING (word)
         |GROUP BY doc_id
         |ORDER BY doc_id""") { (s, dir) =>
      val (merges, dict) = trainedFor(s, dir, OovNumMerges, OovDictCap)
      Bpe.encodeWithOov(docs(s, dir), "doc_id", "text", dict, merges)
        .orderBy("doc_id")
    }
  )
}
