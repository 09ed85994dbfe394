package graft

import org.apache.spark.sql.functions._

import graft.functions.AnyGramInSet

/** functions/AnyGramInSet — the streaming decontam gate's bounded-cost
  * eval-set probe. Pins: exact equivalence with the arrays_overlap form
  * it replaced, the packed-set round trip, and the scale claim — per-doc
  * cost independent of |eval| (binary search, not a linear array scan),
  * exercised at a 600k-gram eval set. */
class GramSetSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("probe == arrays_overlap on random doc/eval gram sets") {
    val rnd = new scala.util.Random(7)
    val evalGrams = (0 until 500).map(i => md5hex(s"eval-$i"))
    val packed = AnyGramInSet.pack(evalGrams)
    val docs = (0 until 300).map { i =>
      // ~half the docs get one planted eval gram among noise
      val noise = Seq.fill(20)(md5hex(s"noise-$i-${rnd.nextInt(10000)}"))
      val grams =
        if (i % 2 == 0) rnd.shuffle(noise :+ evalGrams(rnd.nextInt(500)))
        else noise
      (i.toLong, grams)
    }.toDF("doc_id", "grams")
    val got = docs
      .withColumn("hit", AnyGramInSet.anyGramInSet(col("grams"), packed))
      .orderBy("doc_id").select("hit").collect().map(r => r.getBoolean(0))
    val want = docs
      .withColumn("hit",
        arrays_overlap(col("grams"), lit(evalGrams.toArray)))
      .orderBy("doc_id").select("hit").collect().map(r => r.getBoolean(0))
    assert(got.toSeq == want.toSeq)
    assert(got.count(identity) == 150, "every planted gram must hit")
  }

  test("pack/probe round trip and edge cases") {
    val packed = AnyGramInSet.pack(Seq(md5hex("a"), md5hex("b")))
    assert(packed.length == 4)
    val df = Seq(
      (1L, Seq(md5hex("a"))),           // member
      (2L, Seq(md5hex("zzz"))),         // non-member
      (3L, Seq.empty[String]),          // no grams
      (4L, Seq("not-a-hex-digest!!"))   // malformed gram: never matches
    ).toDF("doc_id", "grams")
    val hits = df
      .withColumn("hit", AnyGramInSet.anyGramInSet(col("grams"), packed))
      .orderBy("doc_id").select("hit").collect().map(_.getBoolean(0))
    assert(hits.toSeq == Seq(true, false, false, false))
    intercept[IllegalArgumentException] {
      AnyGramInSet.pack(Seq("short"))
    }
  }

  test("32-char NON-hex gram never matches, even against an all-FF digest") {
    // regression pin: a length-32 gram with non-hex chars used to parse
    // through an in-band -1L sentinel, which is bit-identical to an
    // all-FF digest half — such a gram could false-match an eval entry
    // of ffff…ff. The probe must validate hex and skip the search.
    val allFf = "f" * 32
    val packed = AnyGramInSet.pack(Seq(allFf, md5hex("x")))
    val df = Seq(
      (1L, Seq("z" * 32)),               // right length, not hex
      (2L, Seq("g" * 16 + "f" * 16)),    // half-malformed
      (3L, Seq(allFf)),                  // genuine all-FF member
      (4L, Seq("F" * 32))                // uppercase hex of the member
    ).toDF("doc_id", "grams")
    val hits = df
      .withColumn("hit", AnyGramInSet.anyGramInSet(col("grams"), packed))
      .orderBy("doc_id").select("hit").collect().map(_.getBoolean(0))
    assert(hits.toSeq == Seq(false, false, true, true))
  }

  test("cleanStream fails fast past the eval-gram pack bound") {
    import java.sql.Timestamp
    val docs = Seq((new Timestamp(0L), 1L, "a b c"))
      .toDF("ts", "doc_id", "text")
    val corpusBands = Seq.empty[(Long, Int, String)]
      .toDF("doc_id", "band", "bh")
    val corpusHashes = Seq.empty[String].toDF("content_hash")
    val evalGrams = (0 until 5).map(i => md5hex(s"g$i")).toDF("gram")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingOps.cleanStream(docs, corpusBands,
        corpusHashes, evalGrams, maxEvalGrams = 2L)
    }
    assert(e.getMessage.contains("5 distinct grams"))
    // at the documented default the same suite packs fine
    graft.streaming.StreamingOps.cleanStream(docs, corpusBands,
      corpusHashes, evalGrams)
  }

  test("per-doc cost is independent of |eval|: 600k-gram set probes like 1k") {
    // Same 20k docs x 30 grams probed against a 1k-gram and a 600k-gram
    // eval set. A linear arrays_overlap scan would be ~600x slower on
    // the big set; binary search adds only log2(600k)/log2(1k) = 2x
    // compares. Assert a generous 10x bound so CI noise can't flake it
    // while an O(|eval|) regression (600x) still fails loudly.
    val evalSmall = AnyGramInSet.pack((0 until 1000).map(i => md5hex(s"e-$i")))
    val evalBig = AnyGramInSet.pack((0 until 600000).map(i => md5hex(s"e-$i")))
    val docs = spark.range(20000)
      .select(col("id"), expr(
        "transform(sequence(1, 30), j -> md5(concat('d-', id, '-', j)))")
        .as("grams"))
      .cache()
    docs.count() // materialize once so timing covers only the probe
    def time(packed: Array[Long]): Double = {
      val t0 = System.nanoTime()
      docs.withColumn("hit", AnyGramInSet.anyGramInSet(col("grams"), packed))
        .filter(col("hit")).count()
      (System.nanoTime() - t0) / 1e9
    }
    time(evalSmall) // JIT/codegen warm-up
    val tSmall = (1 to 3).map(_ => time(evalSmall)).min
    val tBig = (1 to 3).map(_ => time(evalBig)).min
    docs.unpersist()
    info(f"1k grams: $tSmall%.3f s; 600k grams: $tBig%.3f s")
    assert(tBig <= tSmall * 10 + 0.5,
      f"600k-gram probe took $tBig%.3f s vs $tSmall%.3f s at 1k — " +
        "per-doc cost must not scale with |eval|")
  }
}
