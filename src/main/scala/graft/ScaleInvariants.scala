package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Algebraic-identity 100× gate for the registry entries whose DuckDB
  * oracle replay is compute-infeasible at 500k docs / 200k vectors
  * (recursive-CTE transitive closures, per-row greedy folds, Lloyd
  * re-derivations that OOM one DuckDB node). Their OPERATORS all run
  * Spark-side at 100×; what was missing is a 100× VALUE check. This
  * main supplies it without a cross-engine replay: each query's output
  * is audited against invariants that must hold exactly if — and
  * generally only if — the operator computed the right thing:
  *
  *  - connected components: label well-formedness (component id = the
  *    member minimum), bucket-connectivity (every LSH bucket is a
  *    clique in the candidate graph, so its members MUST share one
  *    component — the full-data form of the star-vs-clique spec), and
  *    idempotence (re-deduping the kept representatives removes
  *    nothing: reps of different components never shared a bucket, or
  *    they would be one component).
  *  - clean pipeline: keep == AND of the four gates, and idempotence
  *    (re-running the pipeline over its own kept set keeps everything:
  *    the per-row gates are pure, and kept docs are cluster minima, so
  *    no two can collide). Report == an independent re-aggregation.
  *  - text splitter: overlap-stitched chunks reassemble the original
  *    text byte-for-byte, and multi-word chunks respect the size bound.
  *  - greedy packing: the full greedy characterization — every doc
  *    placed exactly once in its id-mod bucket; bins feasible (sum ≤
  *    budget unless a single oversized doc); bin ids contiguous and
  *    non-decreasing in id order; every bin OPENER would have
  *    overflowed the previous bin; `fill` equals the running sum.
  *    Feasibility + opener-necessity + monotonicity uniquely replay
  *    the sequential fold, so this is complete, not just necessary.
  *  - SimHash pairs: full precision (recomputed Hamming distance of
  *    every reported pair matches and respects the bound) plus
  *    sampled-bucket completeness (all qualifying cross-sig pairs in
  *    the sampled byte-band buckets are reported).
  *  - LSH near-dup pairs: full precision (recomputed cosine of every
  *    reported pair matches the reported value and the threshold) and
  *    provenance (every pair genuinely collides in ≥1 hyperplane
  *    bucket). Recall is anchored by the exact all-pairs twin at 10×.
  *  - IVF ANN: reported cosines recomputed from raw vectors; ranks
  *    re-derived; every neighbor a member of its query's probed cells;
  *    sampled k-means assignment optimality (the assigned cell
  *    maximizes the centroid dot product, re-derived through an
  *    independent explode/argmax plan, not the operator's fold).
  *  - SemDeDup: cell assignment equality against clusterAssign,
  *    sampled drop-justification (every sampled dropped vector has a
  *    lower-id same-cell mate at cosine ≥ threshold — the operator's
  *    drops are one-sided exact, so this must hold for ALL drops) and
  *    sampled keep-justification (no sampled kept vector has a
  *    lower-id same-cell mate above the quantized-collapse over-keep
  *    bound cos(acos t − acos B), B = √((1+t)/2)).
  *
  * Usage: runMain graft.ScaleInvariants <sfDir> [check1,check2,...]
  * Prints one OK/FAIL line per check and a JSON summary; exits 1 on
  * any failure. NOT part of the shipped engine — a verification main,
  * like Verify.
  */
object ScaleInvariants {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only: Option[Set[String]] =
      args.lift(1).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.build("graft-invariants")
    graft.functions.GraftFunctions.register(spark)
    def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)
    def docs: DataFrame = Tables(spark, sfDir, "documents")
    def vectors: DataFrame = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))

    val checks: Seq[(String, SparkSession => String)] = Seq(
      "cc_wellformed" -> (s => ccWellformed(s, q("doc_dedup_components"), docs)),
      "cc_bucket_connected" -> (s => ccBucketConnected(s, q("doc_dedup_components"), docs)),
      "cc_idempotent" -> (s => ccIdempotent(s, q("doc_dedup_components"), docs)),
      "pipeline_gates" -> (s => pipelineGates(s, q("doc_clean_pipeline"), docs)),
      "pipeline_idempotent" -> (s => pipelineIdempotent(s, q("doc_clean_pipeline"), docs)),
      "report_consistent" -> (s => reportConsistent(s, q("doc_clean_pipeline"),
        q("doc_pipeline_report"), docs)),
      "splitter_reassembly" -> (s => splitterReassembly(s, q("doc_text_splitter"), docs)),
      "pack_greedy" -> (s => packGreedy(s, q("doc_seq_pack"), docs)),
      "pack_examples" -> (s => packExamples(s, q("doc_pack_examples"), docs)),
      "simhash_pairs" -> (s => simhashPairs(s, q("doc_simhash_pairs"), docs)),
      "neardup_lsh" -> (s => neardupLsh(s, q("emb_neardup_lsh"),
        q("emb_neardup_lsh_auto"), vectors)),
      "ivf_auto" -> (s => ivfAuto(s, q("emb_ann_ivf_auto"), vectors)),
      "semdedup" -> (s => semDedup(s, q("emb_semdedup"), vectors)),
      "pq_adc" -> (s => pqAdc(s, q("emb_ann_pq"), vectors)),
      "ivfpq_res" -> (s => ivfPqRes(s, q("emb_ann_ivfpq_res"), vectors)),
      "kmv_profile" -> (s => kmvProfile(s, q("ev_profile_kmv"),
        Tables(s, sfDir, "events")))
    )
    var failed = 0
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    checks.foreach { case (name, f) =>
      if (only.forall(_.contains(name))) {
        ran += name
        val t0 = System.nanoTime()
        try {
          val detail = f(spark)
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"OK   $name ($dt%.1f s): $detail")
        } catch {
          case e: Throwable =>
            failed += 1
            val dt = (System.nanoTime() - t0) / 1e9
            println(f"FAIL $name ($dt%.1f s): ${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    }
    println(s"""{"metric":"invariants","sf":"$sfDir","ran":${ran.size},""" +
      s""""failed":$failed}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }

  // ---- connected components ----------------------------------------------

  private def ccWellformed(s: SparkSession, out: DataFrame,
      docs: DataFrame): String = {
    val o = out.cache()
    try {
      val n = docs.count()
      require(o.count() == n, s"row count != $n docs")
      require(o.select("doc_id").distinct().count() == n, "duplicate doc rows")
      val badMin = o.groupBy("component").agg(min("doc_id").as("m"))
        .filter(col("m") =!= col("component")).count()
      require(badMin == 0, s"$badMin components whose id is not the member min")
      val badKeep = o.filter(
        (col("doc_id") === col("component")) =!= (col("keep") === 1)).count()
      require(badKeep == 0, s"$badKeep keep flags contradict representative rule")
      val badSize = o.groupBy("component")
        .agg(count(lit(1)).as("n2"), max("csize").as("cs"), min("csize").as("cs2"))
        .filter(col("cs") =!= col("n2") || col("cs2") =!= col("n2")).count()
      require(badSize == 0, s"$badSize components with inconsistent csize")
      s"$n docs, component ids are member minima, keep/csize consistent"
    } finally { o.unpersist(); () }
  }

  private def ccBucketConnected(s: SparkSession, out: DataFrame,
      docs: DataFrame): String = {
    import graft.ops.Dedup
    // every LSH band bucket is a clique in the candidate graph — all its
    // members MUST carry one component label (full-data star-vs-clique)
    val bands = Dedup.bands(Dedup.minhashSignatures(Dedup.shingles(docs)))
    val labeled = bands.join(out.select("doc_id", "component"), "doc_id")
    val buckets = labeled.groupBy("band", "bh")
      .agg(countDistinct("component").as("nc"), count(lit(1)).as("sz"))
    val viol = buckets.filter(col("nc") > 1).count()
    val total = buckets.count()
    require(viol == 0, s"$viol of $total buckets span multiple components")
    s"all $total band buckets single-component"
  }

  private def ccIdempotent(s: SparkSession, out: DataFrame,
      docs: DataFrame): String = {
    import graft.ops.Dedup
    val reps = docs.join(out.filter(col("keep") === 1).select("doc_id"), "doc_id")
    val nReps = reps.count()
    val moved = Dedup.nearDupComponents(reps)
      .filter(col("doc_id") =!= col("component")).count()
    require(moved == 0, s"re-dedup of the kept set moved $moved reps")
    s"re-dedup of $nReps kept reps removed nothing"
  }

  // ---- clean pipeline ----------------------------------------------------

  private def pipelineGates(s: SparkSession, dec: DataFrame,
      docs: DataFrame): String = {
    val d = dec.cache()
    try {
      val nTrain = docs.filter(col("doc_id") % 7 =!= 0).count()
      require(d.count() == nTrain, s"decision rows != $nTrain train docs")
      val bad = d.filter(col("keep") =!= col("is_quality") *
        col("not_repetitive") * col("dedup_keep") * col("not_contaminated"))
        .count()
      require(bad == 0, s"$bad rows where keep != AND of the gates")
      s"$nTrain decisions, keep == AND(gates)"
    } finally { d.unpersist(); () }
  }

  private def pipelineIdempotent(s: SparkSession, dec: DataFrame,
      docs: DataFrame): String = {
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val eval = docs.filter(col("doc_id") % 7 === 0)
    val kept = train.join(dec.filter(col("keep") === 1).select("doc_id"), "doc_id")
    val nKept = kept.count()
    val again = graft.ops.CleanPipeline.decisions(kept, eval)
    val dropped = again.filter(col("keep") =!= 1).count()
    require(dropped == 0, s"re-running the pipeline dropped $dropped kept docs")
    s"pipeline is idempotent over its $nKept kept docs"
  }

  private def reportConsistent(s: SparkSession, dec: DataFrame,
      report: DataFrame, docs: DataFrame): String = {
    // independent re-aggregation (plain groupBy over the decisions
    // joined to source, not CleanPipeline.report)
    val expect = dec.join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("is_quality").cast("long").as("n_quality"),
        sum("not_repetitive").cast("long").as("n_not_repetitive"),
        sum("dedup_keep").cast("long").as("n_dedup_keep"),
        sum("not_contaminated").cast("long").as("n_not_contaminated"),
        sum("keep").cast("long").as("n_kept"),
        (sum("keep").cast("double") / count(lit(1))).as("keep_rate"))
    val cols = expect.columns.map(col)
    val diff = report.select(cols: _*).exceptAll(expect).count() +
      expect.exceptAll(report.select(cols: _*)).count()
    require(diff == 0, s"report and re-aggregation differ in $diff rows")
    s"report equals independent re-aggregation (${expect.count()} sources)"
  }

  // ---- text splitter -----------------------------------------------------

  private def splitterReassembly(s: SparkSession, chunks: DataFrame,
      docs: DataFrame): String = {
    import s.implicits._
    // size bound: a multi-word chunk respects the 500-char budget
    val oversize = chunks.filter(
      length(col("content")) > 500 && col("content").contains(" ")).count()
    require(oversize == 0, s"$oversize multi-word chunks exceed 500 chars")
    // stitch: drop each chunk's overlap prefix (the longest prefix that
    // is a suffix of the text so far; 0 ⇒ the splitter broke at an
    // oversized word and the joining space lives in neither chunk)
    val stitched = chunks
      .select(col("doc_id").cast("long"), col("piece_index").cast("int"),
        col("content"))
      .as[(Long, Int, String)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val cs = it.toArray.sortBy(_._2).map(_._3)
        val sb = new StringBuilder(cs.head)
        cs.tail.foreach { c =>
          var k = math.min(math.min(sb.length, c.length), 600)
          while (k > 0 && !sb.endsWith(c.substring(0, k))) k -= 1
          if (k == 0) sb.append(' ')
          sb.append(c.substring(k))
        }
        (id, sb.toString)
      }
      .toDF("doc_id", "stitched")
    val texts = docs.filter(col("text").isNotNull && col("text") =!= "")
      .select(col("doc_id"), col("text"))
    val joined = stitched.join(texts, "doc_id").cache()
    try {
      val n = texts.count()
      require(joined.count() == n, "chunked docs != non-empty docs")
      val bad = joined.filter(col("stitched") =!= col("text")).count()
      require(bad == 0, s"$bad docs fail overlap-stitched reassembly")
      s"all $n docs reassemble byte-for-byte from their chunks"
    } finally { joined.unpersist(); () }
  }

  // ---- greedy packing ----------------------------------------------------

  /** Full greedy characterization over a (doc_id, bucket, bin, fill)
    * pack of `d` (doc_id, n_tokens): see the object scaladoc. */
  private def greedyCharacterization(pack: DataFrame, d: DataFrame,
      budget: Int, buckets: Int): String = {
    val toks = d.select(col("doc_id"), col("n_tokens"))
    val j = pack.join(toks, "doc_id").cache()
    try {
      val n = d.count()
      require(j.count() == n, s"pack rows != $n docs")
      require(pack.select("doc_id").distinct().count() == n, "doc packed twice")
      require(j.filter(col("bucket") =!= col("doc_id") % buckets).count() == 0,
        "bucket != doc_id % buckets")
      val bins = j.groupBy("bucket", "bin").agg(
        sum("n_tokens").as("tot"), count(lit(1)).as("nd"),
        min("doc_id").as("first_doc")).cache()
      try {
        val infeasible = bins.filter(col("tot") > budget && col("nd") > 1).count()
        require(infeasible == 0, s"$infeasible bins overflow $budget with >1 doc")
        // openers: the first doc of bin b>0 must NOT have fit in bin b-1
        val firstToks = toks.withColumnRenamed("doc_id", "opener_doc")
          .withColumnRenamed("n_tokens", "first_tokens")
        val lazyOpen = bins.alias("cur")
          .join(bins.alias("prev"),
            col("cur.bucket") === col("prev.bucket") &&
              col("cur.bin") === col("prev.bin") + 1)
          .join(firstToks, col("cur.first_doc") === col("opener_doc"))
          .filter(col("prev.tot") + col("first_tokens") <= budget).count()
        require(lazyOpen == 0, s"$lazyOpen bins opened although the doc fit")
        // sequential shape: bins start at 0, never skip, never go back
        val w = Window.partitionBy("bucket").orderBy("doc_id")
        val seq = j.withColumn("prev_bin", lag("bin", 1).over(w))
        require(seq.filter(col("prev_bin").isNull && col("bin") =!= 0)
          .count() == 0, "a bucket's first doc is not in bin 0")
        require(seq.filter(col("prev_bin").isNotNull &&
          (col("bin") < col("prev_bin") || col("bin") > col("prev_bin") + 1))
          .count() == 0, "bin ids skip or regress in id order")
        // fill == running in-bin sum
        val w2 = Window.partitionBy("bucket", "bin").orderBy("doc_id")
        val badFill = j.withColumn("run", sum("n_tokens").over(w2))
          .filter(col("fill") =!= col("run")).count()
        require(badFill == 0, s"$badFill rows where fill != running sum")
        val nBins = bins.count()
        s"$n docs in $nBins bins: feasible, openers necessary, fills exact"
      } finally { bins.unpersist(); () }
    } finally { j.unpersist(); () }
  }

  private def tokenized(docs: DataFrame): DataFrame =
    docs.withColumn("n_tokens",
      size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long"))

  private def packGreedy(s: SparkSession, pack: DataFrame,
      docs: DataFrame): String =
    greedyCharacterization(pack.select("doc_id", "bucket", "bin", "fill"),
      tokenized(docs), budget = 512, buckets = 8)

  private def packExamples(s: SparkSession, ex: DataFrame,
      docs: DataFrame): String = {
    // the examples' pack is over the doc_id<1500 subset (its own greedy
    // fold) — characterize THAT pack, then require the example frame to
    // equal an independent re-aggregation of it joined to the texts
    val d = tokenized(docs).filter(col("doc_id") < 1500)
    val pack = graft.ops.Packing.packGreedy(d, idCol = "doc_id",
      tokensCol = "n_tokens", budget = 512, buckets = 8)
    val charDetail = greedyCharacterization(
      pack.select("doc_id", "bucket", "bin", "fill"), d, 512, 8)
    val expect = pack.join(d.select("doc_id", "text", "n_tokens"), "doc_id")
      .groupBy("bucket", "bin").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("total_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id")))),
          x => x.getField("doc_id").cast("string")), "|").as("doc_ids"),
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text")), "\n\n").as("example_text"))
    val cols = expect.columns.map(col)
    val diff = ex.select(cols: _*).exceptAll(expect).count() +
      expect.exceptAll(ex.select(cols: _*)).count()
    require(diff == 0, s"example frame differs from re-aggregation in $diff rows")
    s"examples equal independent re-aggregation; subset pack: $charDetail"
  }

  // ---- SimHash pairs -----------------------------------------------------

  private def simhashPairs(s: SparkSession, pairs: DataFrame,
      docs: DataFrame): String = {
    val sigs = docs.select(col("doc_id"),
      graft.functions.TextFunctions.simhash32(col("text")).as("sig")).cache()
    try {
      val p = pairs.cache()
      try {
        // FULL precision: every reported pair's recomputed Hamming
        // distance matches and respects the bound; orientation canonical
        val withSigs = p
          .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa")), "doc_a")
          .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb")), "doc_b")
        val bad = withSigs.filter(
          bit_count(col("sa").bitwiseXOR(col("sb"))) =!= col("hamming") ||
            col("hamming") > 3 || col("doc_a") >= col("doc_b")).count()
        require(bad == 0, s"$bad reported pairs fail recomputed Hamming")
        // SAMPLED-bucket completeness: for byte values 0..3 of each of
        // the 4 bands, every qualifying cross-sig pair must be reported
        val ds = sigs.select("sig").distinct()
        val banded = ds.select(col("sig"), explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sig"), 8 * b).bitwiseAND(lit(255L))
              .as("byte"))
        }: _*)).as("bb"))
          .select(col("sig"), col("bb.band").as("band"), col("bb.byte").as("byte"))
          .filter(col("byte") < 4)
        val cand = banded.alias("x").join(banded.alias("y"),
            col("x.band") === col("y.band") && col("x.byte") === col("y.byte") &&
              col("x.sig") < col("y.sig"))
          .select(col("x.sig").as("sa"), col("y.sig").as("sb")).distinct()
          .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
        val reportedSigPairs = withSigs
          .select(least(col("sa"), col("sb")).as("sa"),
            greatest(col("sa"), col("sb")).as("sb")).distinct()
        val missing = cand.join(reportedSigPairs, Seq("sa", "sb"), "left_anti")
          .count()
        require(missing == 0, s"$missing sampled-bucket sig pairs unreported")
        val np = p.count()
        s"$np pairs precision-exact; sampled buckets complete"
      } finally { p.unpersist(); () }
    } finally { sigs.unpersist(); () }
  }

  // ---- embedding LSH near-dup pairs --------------------------------------

  private def neardupLsh(s: SparkSession, fixturePairs: => DataFrame,
      autoPairs: => DataFrame, vectors: DataFrame): String = {
    import graft.ops.VectorSearch
    // The fixture-regime registered query (threshold 0.45, fixed 3
    // bits) is output-quadratic BY DESIGN — at 200k vectors the
    // candidate volume before dedup is ~6·10^10 pairs, beyond any
    // single node's spill budget (measured disk-full even on the bare
    // count). So: at ≤10× volume audit emb_neardup_lsh itself; at
    // 100× audit emb_neardup_lsh_auto — the REGISTERED production
    // regime (same 0.45 threshold, AUTO bits: buckets scale with the
    // corpus, the shape a 100 TB job runs), whose candidate list is
    // sub-linear. Both audits are the same invariants:
    // recomputed-cosine precision + bucket provenance (recall at 100×
    // is the banding trade, not an invariant).
    val nVec = vectors.count()
    val production = nVec > 30000L
    val (threshold, bits, tables) =
      if (production) (0.45, VectorSearch.autoBits(nVec), 6)
      else (0.45, 3, 12)
    val pairs0 = if (production) autoPairs else fixturePairs
    val nPairs = pairs0.count()
    val every = math.max(1L, nPairs / 1000000L)
    val pairs = pairs0.filter(
      pmod(xxhash64(col("vec_a"), col("vec_b")), lit(every)) === 0)
    val v = vectors.withColumn("nrm",
      sqrt(graft.functions.GraftFunctions.dotProduct(col("e"), col("e"))))
      .select(col("vec_id"), col("e"), col("nrm")).cache()
    try {
      val joined = pairs
        .join(v.select(col("vec_id").as("vec_a"), col("e").as("ea"),
          col("nrm").as("na")), "vec_a")
        .join(v.select(col("vec_id").as("vec_b"), col("e").as("eb"),
          col("nrm").as("nb")), "vec_b")
        .withColumn("truecos",
          graft.functions.GraftFunctions.dotProduct(col("ea"), col("eb")) /
            (col("na") * col("nb"))).cache()
      try {
        val bad = joined.filter(
          round(col("truecos"), 6) =!= col("cosine") ||
            col("truecos") < threshold || col("vec_a") >= col("vec_b")).count()
        require(bad == 0, s"$bad pairs fail recomputed cosine/threshold")
        // provenance: each pair collides in >=1 of the tables' hyperplane
        // buckets (recomputed for pair members only)
        def codeCols(side: String) = (0 until tables).map { t =>
          val planes =
            VectorSearch.hyperplanes(64, bits, VectorSearch.DefaultSeed + t)
          planes.zipWithIndex.map { case (pl, i) =>
            when(graft.functions.GraftFunctions.dotProduct(col(s"e$side"),
              array(pl.map(lit(_)): _*)) >= 0, lit(1 << i)).otherwise(lit(0))
          }.reduce(_ + _).as(s"c$side$t")
        }
        val coded = joined.select(
          (Seq(col("vec_a"), col("vec_b")) ++ codeCols("a") ++ codeCols("b")): _*)
        val collides = (0 until tables)
          .map(t => col(s"ca$t") === col(s"cb$t")).reduce(_ || _)
        val orphans = coded.filter(!collides).count()
        require(orphans == 0, s"$orphans pairs collide in no table")
        val np = joined.count()
        val regime = if (production) s"production(0.45, autoBits=$bits)"
          else "fixture(0.45, 3 bits)"
        s"$regime: $np of $nPairs pairs (1/$every sample) " +
          "precision-exact, all bucket-provenanced"
      } finally { joined.unpersist(); () }
    } finally { v.unpersist(); () }
  }

  // ---- IVF auto ANN ------------------------------------------------------

  private def ivfAuto(s: SparkSession, out: DataFrame,
      vectors: DataFrame): String = {
    import graft.ops.VectorSearch
    val v = vectors.select(col("vec_id"), col("e")).cache()
    try {
      val n = v.count()
      val cells = VectorSearch.autoCells(n)
      val cap = VectorSearch.DefaultTrainCap
      val cents = VectorSearch.kmeansCentroids(v, "vec_id", "e", cells, 2, cap)
      // reported cosine == true cosine; ranks re-derived independently
      val withN = v.withColumn("nrm",
        sqrt(graft.functions.GraftFunctions.dotProduct(col("e"), col("e"))))
      val joined = out
        .join(withN.select(col("vec_id").as("query_id"), col("e").as("qe"),
          col("nrm").as("qn")), "query_id")
        .join(withN.select(col("vec_id").as("neighbor_id"), col("e").as("ne"),
          col("nrm").as("nn")), "neighbor_id")
        .withColumn("truecos",
          graft.functions.GraftFunctions.dotProduct(col("qe"), col("ne")) /
            (col("qn") * col("nn")))
      val badCos = joined
        .filter(round(col("truecos"), 6) =!= col("cosine")).count()
      require(badCos == 0, s"$badCos reported cosines differ from recompute")
      val w = Window.partitionBy("query_id")
        .orderBy(col("truecos").desc, col("neighbor_id"))
      val badRank = joined.withColumn("rk", row_number().over(w))
        .filter(col("rk") =!= col("rank")).count()
      require(badRank == 0, s"$badRank ranks out of order")
      // assignment via the operator; optimality re-derived via an
      // independent explode/argmax plan on a deterministic sample
      val assigned = VectorSearch.clusterAssign(v, "vec_id", "e",
        k = cells, iters = 2, trainCap = cap)
        .select(col("vec_id"), col("cid")).cache()
      try {
        import s.implicits._
        val centDf = cents.toSeq.toDF("cid2", "c")
        val sample = v.filter(col("vec_id") % 199 === 0)
        val best = sample.crossJoin(broadcast(centDf))
          .withColumn("d",
            graft.functions.GraftFunctions.dotProduct(col("e"), col("c")))
          .withColumn("rk", row_number().over(Window.partitionBy("vec_id")
            .orderBy(col("d").desc, col("cid2"))))
          .filter(col("rk") === 1).select(col("vec_id"), col("cid2"))
        val badAssign = best.join(assigned, "vec_id")
          .filter(col("cid") =!= col("cid2")).count()
        val nSample = best.count()
        require(badAssign == 0,
          s"$badAssign of $nSample sampled assignments not argmax-optimal")
        // every neighbor is a member of one of its query's nprobe cells
        val queries = out.select("query_id").distinct()
          .join(v.withColumnRenamed("vec_id", "query_id"), "query_id")
        val qProbe = queries.crossJoin(broadcast(centDf))
          .withColumn("d",
            graft.functions.GraftFunctions.dotProduct(col("e"), col("c")))
          .withColumn("rk", row_number().over(Window.partitionBy("query_id")
            .orderBy(col("d").desc, col("cid2"))))
          // probe width from the shared constant the registered query uses
          // — a query change cannot silently weaken this audit
          .filter(col("rk") <= VectorSearch.AutoNprobe)
          .select(col("query_id"), col("cid2"))
        val outside = out.select("query_id", "neighbor_id")
          .join(assigned.withColumnRenamed("vec_id", "neighbor_id"),
            "neighbor_id")
          .join(qProbe, Seq("query_id"), "left")
          .groupBy("query_id", "neighbor_id")
          .agg(max(when(col("cid") === col("cid2"), 1).otherwise(0)).as("inP"))
          .filter(col("inP") === 0).count()
        require(outside == 0, s"$outside neighbors outside their probed cells")
        s"$n vectors, $cells cells: cosines exact, ranks exact, " +
          s"$nSample sampled assignments argmax-optimal, neighbors in-probe"
      } finally { assigned.unpersist(); () }
    } finally { v.unpersist(); () }
  }

  // ---- SemDeDup ----------------------------------------------------------

  private def semDedup(s: SparkSession, out: DataFrame,
      vectors: DataFrame): String = {
    import graft.ops.VectorSearch
    val t = 0.45
    val v = vectors.select(col("vec_id"), col("e")).cache()
    try {
      val n = v.count()
      val o = out.cache()
      try {
        require(o.count() == n &&
          o.select("vec_id").distinct().count() == n, "not one row per vector")
        // cell equality vs the clustering operator (same deterministic
        // derivation semDedup routes through)
        val cells = VectorSearch.autoCells(n)
        val assigned = VectorSearch.clusterAssign(v, "vec_id", "e",
          k = cells, iters = 2, trainCap = VectorSearch.DefaultTrainCap)
          .select(col("vec_id"), col("cid").as("cid2"))
        val badCell = o.join(assigned, "vec_id")
          .filter(col("cid") =!= col("cid2")).count()
        require(badCell == 0, s"$badCell cell labels differ from clusterAssign")
        // per-vector decision audits on deterministic samples, each row
        // joined to its FULL cell (cells are ~sqrt(N), so sample × cell
        // is bounded)
        val withN = v.withColumn("nrm",
          sqrt(graft.functions.GraftFunctions.dotProduct(col("e"), col("e"))))
        val members = o.select(col("vec_id"), col("cid"))
          .join(withN, "vec_id")
        def mates(sample: DataFrame, minCos: Double): DataFrame =
          sample.join(members.select(col("cid"),
              col("vec_id").as("mate_id"), col("e").as("me"),
              col("nrm").as("mn")), "cid")
            .filter(col("mate_id") < col("vec_id"))
            .withColumn("cos",
              graft.functions.GraftFunctions.dotProduct(col("e"), col("me")) /
                (col("nrm") * col("mn")))
            .filter(col("cos") >= minCos)
        // drops are one-sided exact: EVERY dropped vector must have a
        // lower-id same-cell mate at cosine >= threshold
        val droppedSample = members
          .join(o.filter(col("keep") === 0).select("vec_id"), "vec_id")
          .filter(col("vec_id") % 97 === 0).cache()
        val nd = droppedSample.count()
        val justified = mates(droppedSample, t)
          .select("vec_id").distinct().count()
        require(justified == nd,
          s"${nd - justified} of $nd sampled drops have no justifying mate")
        // keeps may over-keep only inside the quantized-collapse margin:
        // no kept vector has a lower-id mate above cos(acos t − acos B)
        val b = math.sqrt((1.0 + t) / 2.0)
        val keepBound = t * b + math.sqrt(1 - t * t) * math.sqrt(1 - b * b)
        val keptSample = members
          .join(o.filter(col("keep") === 1).select("vec_id"), "vec_id")
          .filter(col("vec_id") % 97 === 0).cache()
        val nk = keptSample.count()
        val overKept = mates(keptSample, keepBound)
          .select("vec_id").distinct().count()
        require(overKept == 0,
          s"$overKept of $nk sampled keeps have a mate above $keepBound")
        droppedSample.unpersist(); keptSample.unpersist()
        s"$n vectors, cells equal clusterAssign; $nd sampled drops " +
          f"justified, $nk sampled keeps clean below ${keepBound}%.4f"
      } finally { o.unpersist(); () }
    } finally { v.unpersist(); () }
  }

  // ---- Product quantization ------------------------------------------------

  /** PQ-ADC audit (for the volumes where the DuckDB replay's keyed
    * Lloyd joins exceed memory): the codebooks re-derive with the
    * deterministic trainer (replay, not trust), then three independent
    * plans assert (a) sampled per-subspace code OPTIMALITY — each stored
    * code maximizes the sub-centroid dot (explode/argmax, ties to the
    * lowest cid); (b) every REPORTED (query, neighbor) adc_fp equals an
    * integer-LUT recomputation built by melt + join — the oracle's SQL
    * shape, in-engine; (c) reported adc_cosine and rank re-derive from
    * adc_fp and independently-recomputed reconstruction norms. PQ is
    * lossy BY DESIGN — there is no claim about WHICH neighbors surface
    * (the fixture-scale brute twin anchors recall), only exactness of
    * everything computed about them. */
  private def pqAdc(s: SparkSession, out0: DataFrame, v0: DataFrame): String = {
    import s.implicits._
    val (dim, m, k) = (64, 4, 16) // the registered emb_ann_pq parameters
    val dsub = dim / m
    val v = v0.select(col("vec_id"), col("e")).cache()
    try {
      val out = out0.cache() // query_id, neighbor_id, rank, adc_fp, adc_cosine
      val n = v.count()
      val books = graft.ops.VectorSearch.pqCodebooks(v, "vec_id", "e", dim, m, k)
      val enc = graft.ops.VectorSearch.pqEncode(v, "e", dim, books)
        .select(col("vec_id") +: (0 until m).map(i => col(s"code_$i")): _*)
        .cache()
      try {
        // melt: (vec_id, sub, code); sub-centroids: (sub, cid2, c)
        val codes = enc.select(col("vec_id"),
          posexplode(array((0 until m).map(i => col(s"code_$i")): _*))
            .as(Seq("sub", "code")))
        val subCent = books.zipWithIndex.flatMap { case (b, sub) =>
          b.map { case (cid, c) => (sub, cid, c.toSeq) }
        }.toSeq.toDF("sub", "cid2", "c")
        // (a) sampled code optimality via explode/argmax
        val sample = codes.filter(col("vec_id") % 199 === 0)
          .join(v, "vec_id")
        val best = sample.join(broadcast(subCent), "sub")
          .withColumn("d", graft.functions.GraftFunctions.dotProduct(
            slice(col("e"), col("sub") * dsub + 1, lit(dsub)), col("c")))
          .withColumn("rk", row_number().over(
            Window.partitionBy("vec_id", "sub")
              .orderBy(col("d").desc, col("cid2"))))
          .filter(col("rk") === 1)
        val badCode = best.filter(col("code") =!= col("cid2")).count()
        val nSample = best.count()
        require(badCode == 0,
          s"$badCode of $nSample sampled sub-codes not argmax-optimal")
        // (b) reported adc_fp == melt/join LUT recomputation
        val qe = out.select("query_id").distinct()
          .join(v.withColumnRenamed("vec_id", "query_id"), "query_id")
          .withColumnRenamed("e", "qe")
        val lut = qe.crossJoin(broadcast(subCent))
          .withColumn("d_fp", round(graft.functions.GraftFunctions.dotProduct(
            slice(col("qe"), col("sub") * dsub + 1, lit(dsub)), col("c"))
            * 1e6, 0).cast("bigint"))
          .select(col("query_id"), col("sub"), col("cid2"), col("d_fp"))
        val expect = out.select(col("query_id"), col("neighbor_id"),
            col("adc_fp"))
          .join(codes.withColumnRenamed("vec_id", "neighbor_id"),
            Seq("neighbor_id"))
          .join(lut.withColumnRenamed("cid2", "code"),
            Seq("query_id", "sub", "code"))
          .groupBy("query_id", "neighbor_id", "adc_fp")
          .agg(sum(col("d_fp")).as("recomputed"))
        val badFp = expect.filter(col("adc_fp") =!= col("recomputed")).count()
        require(badFp == 0, s"$badFp reported adc_fp differ from the recompute")
        // (c) cosine + rank re-derivation from independent norms
        val n2 = subCent.withColumn("n2", round(
            graft.functions.GraftFunctions.dotProduct(col("c"), col("c"))
              * 1e6, 0).cast("bigint"))
          .select(col("sub"), col("cid2").as("code"), col("n2"))
        val rn = codes.join(broadcast(n2), Seq("sub", "code"))
          .groupBy("vec_id").agg(sum(col("n2")).as("rn2"))
        val qn = qe.withColumn("qnrm", sqrt(
          graft.functions.GraftFunctions.dotProduct(col("qe"), col("qe"))))
          .select(col("query_id"), col("qnrm"))
        val scored = out
          .join(rn.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
          .join(qn, "query_id")
          .withColumn("truecos", col("adc_fp").cast("double") / 1e6 /
            (col("qnrm") * sqrt(col("rn2").cast("double") / 1e6)))
        val badCos = scored
          .filter(round(col("truecos"), 6) =!= col("adc_cosine")).count()
        require(badCos == 0, s"$badCos reported adc_cosine differ")
        val badRank = scored.withColumn("rk", row_number().over(
            Window.partitionBy("query_id")
              .orderBy(col("truecos").desc, col("neighbor_id"))))
          .filter(col("rk") =!= col("rank")).count()
        require(badRank == 0, s"$badRank ranks out of order")
        s"$n vectors: $nSample sampled sub-codes argmax-optimal, " +
          "reported adc_fp/cosine/rank all recompute exactly"
      } finally { enc.unpersist(); out.unpersist(); () }
    } finally { v.unpersist(); () }
  }

  /** Residual-IVFADC audit (emb_ann_ivfpq_res at volumes where the
    * two-stage DuckDB replay is infeasible): the coarse quantizer,
    * residuals and residual codebooks re-derive with the deterministic
    * trainers (replay, not trust), then independent plans assert
    * (a) PROBE MEMBERSHIP — every reported neighbor's coarse cell is in
    * its query's nprobe nearest cells, re-derived by explode/argmax;
    * (b) every reported adc_fp equals micro dot(q, c_cell) + the
    * melt/join LUT recomputation over the residual codes — the score
    * decomposition dot(q, c + r̂) checked end to end; (c) adc_cosine and
    * rank re-derive from adc_fp and reconstruction norms recomputed
    * IN-ENGINE from |c|² + Σ (2·dot(c_sub, cw) + |cw|²) — which also
    * cross-checks the driver-side microFp literals against the engine's
    * round(). Lossiness caveats as pqAdc. */
  private def ivfPqRes(s: SparkSession, out0: DataFrame, v0: DataFrame): String = {
    import s.implicits._
    val (dim, nCells, nprobe, m, k) = (64, 16, 4, 4, 16)
    val dsub = dim / m
    val v = v0.select(col("vec_id"), col("e")).cache()
    try {
      val out = out0.cache() // query_id, neighbor_id, rank, adc_fp, adc_cosine
      val n = v.count()
      val cents = graft.ops.VectorSearch.kmeansCentroids(v, "vec_id", "e",
        nCells, 2, 0)
      val centDf = cents.map { case (cid, c) => (cid, c.toSeq) }
        .toSeq.toDF("cell", "cc")
      val cellDf = graft.ops.VectorSearch.clusterAssign(v, "vec_id", "e",
          nCells, 2, 0)
        .select(col("vec_id"), col("cid").as("cell"))
      val rv = v.join(cellDf, "vec_id").join(broadcast(centDf), "cell")
        .withColumn("rv", zip_with(col("e"), col("cc"), (x, c) => x - c))
        .select(col("vec_id"), col("cell"), col("rv"))
        .cache()
      val books = graft.ops.VectorSearch.pqCodebooks(rv, "vec_id", "rv",
        dim, m, k)
      val enc = graft.ops.VectorSearch.pqEncode(rv, "rv", dim, books)
        .select(col("vec_id") +: col("cell") +:
          (0 until m).map(i => col(s"code_$i")): _*)
        .cache()
      try {
        val codes = enc.select(col("vec_id"), col("cell"),
          posexplode(array((0 until m).map(i => col(s"code_$i")): _*))
            .as(Seq("sub", "code")))
        val subCent = books.zipWithIndex.flatMap { case (b, sub) =>
          b.map { case (cid, c) => (sub, cid, c.toSeq) }
        }.toSeq.toDF("sub", "cid2", "c")
        val qe = out.select("query_id").distinct()
          .join(v.withColumnRenamed("vec_id", "query_id"), "query_id")
          .withColumnRenamed("e", "qe").cache()
        // (a) probe membership: nprobe nearest cells by explode/argmax
        val probes = qe.crossJoin(broadcast(centDf))
          .withColumn("d", graft.functions.GraftFunctions.dotProduct(
            col("qe"), col("cc")))
          .withColumn("rk", row_number().over(
            Window.partitionBy("query_id").orderBy(col("d").desc, col("cell"))))
          .filter(col("rk") <= nprobe)
          .select(col("query_id"), col("cell"))
        val outCells = out.select(col("query_id"), col("neighbor_id"))
          .join(enc.select(col("vec_id").as("neighbor_id"), col("cell")),
            "neighbor_id")
        val badProbe = outCells.join(probes, Seq("query_id", "cell"),
          "left_anti").count()
        require(badProbe == 0,
          s"$badProbe reported neighbors outside their query's probed cells")
        // (b) adc_fp == micro dot(q, c_cell) + melt/join LUT recompute
        val qc = qe.crossJoin(broadcast(centDf))
          .withColumn("qc_fp", round(graft.functions.GraftFunctions
            .dotProduct(col("qe"), col("cc")) * 1e6, 0).cast("bigint"))
          .select(col("query_id"), col("cell"), col("qc_fp"))
        val lut = qe.crossJoin(broadcast(subCent))
          .withColumn("d_fp", round(graft.functions.GraftFunctions.dotProduct(
            slice(col("qe"), col("sub") * dsub + 1, lit(dsub)), col("c"))
            * 1e6, 0).cast("bigint"))
          .select(col("query_id"), col("sub"), col("cid2"), col("d_fp"))
        val expect = out.select(col("query_id"), col("neighbor_id"),
            col("adc_fp"))
          .join(codes.withColumnRenamed("vec_id", "neighbor_id"),
            Seq("neighbor_id"))
          .join(lut.withColumnRenamed("cid2", "code"),
            Seq("query_id", "sub", "code"))
          .groupBy("query_id", "neighbor_id", "adc_fp", "cell")
          .agg(sum(col("d_fp")).as("lut_sum"))
          .join(qc, Seq("query_id", "cell"))
          .withColumn("recomputed", col("qc_fp") + col("lut_sum"))
        val badFp = expect.filter(col("adc_fp") =!= col("recomputed")).count()
        require(badFp == 0, s"$badFp reported adc_fp differ from the recompute")
        // (c) cosine + rank from in-engine reconstruction norms:
        // |c + r̂|² = |c|² + Σ_sub (2·dot(c_sub, cw) + |cw|²), each term
        // micro-rounded in-engine (cross-checks the operator's microFp)
        val base = centDf.withColumn("b", round(
            graft.functions.GraftFunctions.dotProduct(col("cc"), col("cc"))
              * 1e6, 0).cast("bigint"))
          .select(col("cell"), col("b"))
        val cross = centDf.crossJoin(broadcast(subCent))
          .withColumn("t", round((graft.functions.GraftFunctions.dotProduct(
              slice(col("cc"), col("sub") * dsub + 1, lit(dsub)), col("c"))
              * 2.0 + graft.functions.GraftFunctions.dotProduct(
              col("c"), col("c"))) * 1e6, 0).cast("bigint"))
          .select(col("cell"), col("sub"), col("cid2").as("code"), col("t"))
        val rn = codes.join(broadcast(cross), Seq("cell", "sub", "code"))
          .groupBy("vec_id", "cell").agg(sum(col("t")).as("tsum"))
          .join(broadcast(base), "cell")
          .select(col("vec_id"), (col("b") + col("tsum")).as("rn2"))
        val qn = qe.withColumn("qnrm", sqrt(
          graft.functions.GraftFunctions.dotProduct(col("qe"), col("qe"))))
          .select(col("query_id"), col("qnrm"))
        val scored = out
          .join(rn.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
          .join(qn, "query_id")
          .withColumn("truecos", col("adc_fp").cast("double") / 1e6 /
            (col("qnrm") * sqrt(col("rn2").cast("double") / 1e6)))
        val badCos = scored
          .filter(round(col("truecos"), 6) =!= col("adc_cosine")).count()
        require(badCos == 0, s"$badCos reported adc_cosine differ")
        val badRank = scored.withColumn("rk", row_number().over(
            Window.partitionBy("query_id")
              .orderBy(col("truecos").desc, col("neighbor_id"))))
          .filter(col("rk") =!= col("rank")).count()
        require(badRank == 0, s"$badRank ranks out of order")
        val nOut = out.count()
        s"$n vectors, $nOut reported pairs: probe membership, residual " +
          "adc_fp decomposition, cosine and rank all recompute exactly"
      } finally { enc.unpersist(); rv.unpersist(); out.unpersist(); () }
    } finally { v.unpersist(); () }
  }

  /** KMV profile: every registered column's sketch output re-derived
    * IN-ENGINE from the declarative replay (distinct md5 → sort →
    * k smallest → the same two IEEE ops on the k-th digest's leading
    * 60 bits), plus exactness checks — under-capacity estimates must
    * EQUAL count(distinct), over-capacity estimates must sit within
    * 5.5 rse (≈35 % at k=256) of the true cardinality, and n_rows /
    * n_nulls must equal their exact counts. At 10×/100× the estimator
    * branch is live for the high-cardinality columns (event_id crosses
    * k=256 at every sf), so this check exercises the regime the sketch
    * exists for, not just the exact fallback. */
  private def kmvProfile(s: SparkSession, out0: DataFrame,
      ev: DataFrame): String = {
    val k = 256
    val cols = Seq("event_id", "user_id", "event_type", "props")
    val out = out0.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    require(out.keySet == cols.toSet,
      s"registered columns drifted: ${out.keySet}")
    val nRows = ev.count()
    var estimatorCols = 0
    val details = cols.map { c =>
      val nonNull = ev.filter(col(c).isNotNull)
      val hs = nonNull.select(md5(col(c).cast("string")).as("d"))
        .distinct().orderBy("d").limit(k).collect().map(_.getString(0))
      val replay =
        if (hs.length < k) hs.length.toDouble
        else {
          val h60 = java.lang.Long.parseLong(hs.last.substring(0, 15), 16)
          (k - 1).toDouble * math.pow(2.0, 60) / h60.toDouble
        }
      val (nr, nn, est) = out(c)
      require(est == replay, s"$c: registered est $est != replay $replay")
      require(nr == nRows, s"$c: n_rows $nr != $nRows")
      val exactNulls = ev.filter(col(c).isNull).count()
      require(nn == exactNulls, s"$c: n_nulls $nn != $exactNulls")
      if (hs.length < k) {
        val exact = nonNull.select(countDistinct(col(c))).first().getLong(0)
        require(est == exact.toDouble,
          s"$c: under-capacity est $est != exact $exact")
        f"$c exact=$est%.0f"
      } else {
        estimatorCols += 1
        val exact = nonNull.select(countDistinct(col(c))).first().getLong(0)
        require(math.abs(est - exact) <= 0.35 * exact,
          f"$c: est $est%.0f outside 5.5 rse of exact $exact")
        f"$c est=$est%.0f/exact=$exact (${est / exact}%.3f)"
      }
    }
    require(estimatorCols >= 1,
      "no column crossed the sketch capacity — the estimator branch is " +
        "untested at this corpus; raise the scale factor")
    details.mkString("; ")
  }
}
