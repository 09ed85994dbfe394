package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Bpe
import QueryDef._

/** Learned-BPE registry entries: merge-table training and corpus
  * encoding, each with a FULL DuckDB replay oracle.
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
  * every downstream segmentation string is bit-identical.
  *
  * numMerges = 64 leaves a wide margin under the fixture corpora's
  * ~105-merge capacity (all SFs share one 31-word synthetic vocabulary;
  * exhaustion would cascade empty CTEs through the unrolled oracle —
  * the Spark trainer fails fast instead, see Bpe.train).
  */
object BpeQueries {

  /** Merge-table length of the registered queries. */
  val NumMerges = 64

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

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
  private def trainCtes(n: Int): String = {
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
         |  WHERE rk <= ${Bpe.DefaultDictCap}
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

  val all: Seq[QueryDef] = Seq(

    // ---- learned merge table ---------------------------------------------
    sql("doc_bpe_vocab", {
      val union = (1 to NumMerges)
        .map(i => s"SELECT $i AS rank, a AS lft, b AS rgt, " +
          s"a || b AS merged, c AS cnt FROM b$i")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH ${trainCtes(NumMerges)}
         |SELECT rank, lft, rgt, merged, cnt FROM (
         |  $union
         |) ORDER BY rank""".stripMargin
    }) { (s, dir) =>
      val (merges, dict) =
        Bpe.train(docs(s, dir), "text", NumMerges, Bpe.DefaultDictCap)
      Bpe.mergeTable(s, merges).orderBy("rank")
    },

    // ---- corpus encoding against the learned merges ----------------------
    // Per doc: dict words found + total BPE tokens. The Spark side joins
    // the pre-tokenized word stream against the trained dict's FINAL
    // segmentations (bounded hash probe per word, no per-doc replay);
    // the oracle reads the same segmentations straight out of s{N}.
    sql("doc_bpe_encode",
      s"""WITH ${trainCtes(NumMerges)},
         |dw AS (
         |  SELECT doc_id, unnest(regexp_extract_all(lower(text),
         |    '${Bpe.WordPattern}')) AS word
         |  FROM documents
         |),
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
      val (_, dict) =
        Bpe.train(docs(s, dir), "text", NumMerges, Bpe.DefaultDictCap)
      Bpe.encode(docs(s, dir), "doc_id", "text", dict)
        .orderBy("doc_id")
    }
  )
}
