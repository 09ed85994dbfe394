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
    val (merges, dict) = Bpe.train(df, "text", numMerges = 12)
    val got = Bpe.encode(df, "doc_id", "text", dict, merges)
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

  /** Naive replay of a trained merge table over ANY word — textbook BPE
    * inference (char segmentation folded through the merges in order). */
  private def naiveSegment(w: String, merges: Seq[Bpe.Merge]): List[String] = {
    var l = w.toList.map(_.toString) :+ "</w>"
    merges.foreach { m =>
      val out = scala.collection.mutable.ListBuffer.empty[String]
      l.foreach { x =>
        if (out.nonEmpty && out.last == m.left && x == m.right)
          out(out.size - 1) = m.left + m.right
        else out += x
      }
      l = out.toList
    }
    l
  }

  test("OOV encoding: merge replay prices 100% of words; dict pricing unchanged") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // dictCap 5 BINDS on this corpus' 11 distinct words
    val (merges, dict) = Bpe.train(df, "text", numMerges = 8, dictCap = 5)
    val dictSegs = dict.select(col("word"), Bpe.symbols(col("seg")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val dictWords = dictSegs.keySet
    assert(dictWords.size == 5, "cap must bind")
    val allWords = corpus
      .flatMap(t => Bpe.WordPattern.r.findAllIn(t.toLowerCase)).toSeq
    val oov = allWords.toSet -- dictWords
    assert(oov.nonEmpty, "test needs out-of-dict words")
    // segmentWords == the naive replay; every OOV seg reconcatenates
    val got = Bpe.segmentWords(oov.toSeq.toDF("word"), merges)
      .select(col("word"), Bpe.symbols(col("seg")))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    oov.foreach { w =>
      assert(got(w) === naiveSegment(w, merges), s"replay mismatch for '$w'")
      assert(got(w).mkString("") === w + "</w>",
        s"tokens of OOV '$w' must concatenate back to the word")
    }
    // total encode: n_words covers EVERY word; dict words still price via
    // the trained dict (unchanged), OOV words via the replay; n_oov counts
    // the replay-priced occurrences
    val enc = Bpe.encodeWithOov(df, "doc_id", "text", dict, merges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val want = corpus.zipWithIndex.map { case (t, i) =>
      val words = Bpe.WordPattern.r.findAllIn(t.toLowerCase).toSeq
      (i.toLong, words.size.toLong,
        words.map(w =>
          dictSegs.getOrElse(w, naiveSegment(w, merges)).size.toLong).sum,
        words.count(w => !dictWords(w)).toLong)
    }
    assert(enc.toSeq === want,
      "total encode must price dict words via the dict and OOV via replay")
    // and the 3-column encode agrees with it minus the n_oov column
    val enc3 = Bpe.encode(df, "doc_id", "text", dict, merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(enc3.toSeq === want.map(t => (t._1, t._2, t._3)))
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

  test("fertility report == manual rollup of encode over languages") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.Registry.all
      .find(_.name == "doc_bpe_fertility").get
    val got = q.run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // independent rollup straight off the op outputs
    val docs = Tables(spark, dir, "documents")
    val (merges, dict) = graft.queries.BpeQueries.trainedFor(spark, dir,
      graft.queries.BpeQueries.NumMerges, graft.ops.Bpe.DefaultDictCap)
    val enc = graft.ops.Bpe.encode(docs, "doc_id", "text", dict, merges)
    val manual = docs.select("doc_id", "lang", "n_chars").join(enc, "doc_id")
      .groupBy("lang").agg(count(lit(1)).as("d"), sum("n_words").as("w"),
        sum("n_tokens").as("t"), sum("n_chars").as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(manual.nonEmpty && manual.length === got.size)
    manual.foreach { case (lang, d, w, t, c) =>
      val (gd, gw, gt, tpw, cpt) = got(lang)
      assert((gd, gw, gt) === ((d, w, t)), s"lang $lang counts")
      // the registered query rounds to 6 decimals
      assert(math.abs(tpw - t.toDouble / w) <= 5e-7, s"lang $lang fertility")
      assert(math.abs(cpt - c.toDouble / t) <= 5e-7, s"lang $lang compression")
      // fertility is a per-word average: must be >= 1 (a word is never
      // fewer than one token)
      assert(tpw >= 1.0)
    }
  }
}
