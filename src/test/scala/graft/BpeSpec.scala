package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** Learned-BPE trainer/encoder vs a naive single-machine reference
  * implementation (textbook Sennrich BPE with the operator's tiebreak:
  * count DESC, then pair lexicographic). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Naive in-memory BPE: word counts, per-iteration overlapping pair
    * counts, argmax with the deterministic tiebreak, left-to-right
    * non-overlapping merge application. */
  private def naiveTrain(texts: Seq[String], numMerges: Int)
      : (Seq[(Int, String, String, Long)], Map[String, List[String]]) = {
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      Bpe.WordPattern.r.findAllIn(t.toLowerCase).foreach { w =>
        wc(w) = wc.getOrElse(w, 0L) + 1L
      }
    }
    var segs: Map[String, List[String]] =
      wc.keys.map(w => w -> (w.toList.map(_.toString) :+ "</w>")).toMap
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    (1 to numMerges).foreach { it =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      wc.foreach { case (w, c) =>
        segs(w).sliding(2).foreach {
          case List(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      assert(pc.nonEmpty, s"naive trainer exhausted at $it")
      val ((a, b), c) = pc.minBy { case ((x, y), n) => (-n, x, y) }
      merges += ((it, a, b, c))
      segs = segs.map { case (w, l) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        l.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b)
            out(out.size - 1) = a + b
          else out += x
        }
        w -> out.toList
      }
    }
    (merges.toSeq, segs)
  }

  private val corpus = Seq(
    "the low lower lowest newest newer new widest wide",
    "low low lower newest new new the the the widest",
    // runs of a repeated symbol: merge (a,a) on 'aaaa' must produce
    // [aa, aa], not [aa, a, a] — the fold semantics both engines share
    "aaaa baaa the lowest newest")

  test("train == naive single-machine trainer (merges and segmentations)") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (got, dict) = Bpe.train(df, "text", numMerges = 12)
    val (want, wantSegs) = naiveTrain(corpus, 12)
    assert(got.map(m => (m.rank, m.left, m.right, m.count)) === want,
      "merge sequence must equal the naive trainer's")
    val gotSegs = dict.select(col("word"), Bpe.symbols(col("seg")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(gotSegs === wantSegs,
      "final dict segmentations must equal the naive trainer's")
    // concatenating a word's tokens reproduces the word (+ terminal)
    gotSegs.foreach { case (w, toks) =>
      assert(toks.mkString("") === w + "</w>",
        s"tokens of '$w' must concatenate back to the word")
    }
  }

  test("encode: per-doc token counts match a naive replay") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (_, dict) = Bpe.train(df, "text", numMerges = 12)
    val got = Bpe.encode(df, "doc_id", "text", dict)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val (_, segs) = naiveTrain(corpus, 12)
    val want = corpus.zipWithIndex.map { case (t, i) =>
      val words = Bpe.WordPattern.r.findAllIn(t.toLowerCase).toSeq
      (i.toLong, words.size.toLong,
        words.map(w => segs(w).size.toLong).sum)
    }
    assert(got.toSeq === want,
      "per-doc (n_words, n_tokens) must match the naive replay")
  }

  test("merge-capacity exhaustion fails fast with the iteration number") {
    val df = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    // 'ab' exhausts after 2 merges (a,b → ab; ab,</w> → ab</w>)
    val e = intercept[IllegalArgumentException] {
      Bpe.train(df, "text", numMerges = 10)
    }
    assert(e.getMessage.contains("exhausted at iteration 3"),
      s"expected fail-fast at iteration 3, got: ${e.getMessage}")
  }

  test("dictCap keeps the top-k words by (count desc, word asc)") {
    val df = Seq((0L, "bbb bbb bbb aaa aaa ccc ccc zzz"))
      .toDF("doc_id", "text")
    val dict = Bpe.wordDict(df, "text", dictCap = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    // bbb (3) first; aaa and ccc tie at 2 → aaa wins the word-asc break
    assert(dict.toSeq === Seq(("aaa", 2L), ("bbb", 3L)),
      s"got ${dict.toSeq}")
  }

  test("vocab invariant: pair counts are non-increasing in rank") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (merges, dict) = Bpe.train(df, "text", numMerges = 12)
    merges.sliding(2).foreach {
      case Seq(m1, m2) =>
        assert(m2.count <= m1.count,
          s"rank ${m2.rank} count ${m2.count} > rank ${m1.rank} ${m1.count}")
      case _ =>
    }
  }
}
