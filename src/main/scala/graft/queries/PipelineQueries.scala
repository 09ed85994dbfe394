package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.ops.{Multimodal, TextAnalysis, VectorSearch}
import QueryDef._

/** Training-data pipeline surface: fingerprinting, token accounting,
  * SimHash near-dup candidates, language ID, LSH approximate NN, and the
  * multimodal (binary column) pipeline. */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  val all: Seq[QueryDef] = Seq(

    // ---- rolling-hash fingerprints (codegen expression), full oracle -----
    sql("doc_fingerprints",
      """SELECT doc_id,
        |  CASE WHEN len(text) = 0 THEN 0 ELSE
        |    list_reduce(list_transform(string_split(text, ''),
        |                               c -> CAST(unicode(c) AS BIGINT)),
        |                (a, b) -> (a*31 + b) % 1000000007) END AS fingerprint
        |FROM documents
        |WHERE doc_id < 200
        |ORDER BY doc_id""") { (s, dir) =>
      TextFunctions.register(s)
      docs(s, dir)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TextFunctions.rollingHash(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    },

    // ---- BPE-ish token accounting per source, full oracle ----------------
    sql("doc_bpe_tokens",
      // NB: DuckDB single-quoted literals do not process backslash escapes
      // — the pattern goes in verbatim, exactly as Spark's regex sees it.
      s"""SELECT source,
        |  CAST(SUM(len(regexp_extract_all(text, '${TextAnalysis.BpeishPattern}'))) AS BIGINT) AS total_bpeish_tokens,
        |  CAST(SUM(CAST(ceil(len(text) / 4.0) AS BIGINT)) AS BIGINT) AS total_estimate
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .groupBy("source")
        .agg(
          sum(TextAnalysis.bpeishTokenCount(col("text")).cast("long"))
            .as("total_bpeish_tokens"),
          sum(ceil(length(col("text")) / 4.0).cast("long"))
            .as("total_estimate"))
        .orderBy("source")
    },

    // ---- SimHash near-dup candidates (Hamming ≤ 3 of 32 bits) ------------
    // Signature pairs come from Dedup.simhashSigPairs — the byte-banded
    // equi-join (Hamming ≤3 ⇒ ≥1 of 4 bytes equal), no crossJoin of the
    // signature space (asserted by spec against the physical plan).
    // Full oracle: the entire SimHash (bigram features → first-4-md5-bytes
    // per-bit votes → majority sign) re-derived in DuckDB SQL, then the
    // same Hamming pairing — verifies signatures AND pairing end to end.
    sql("doc_simhash_pairs",
      """WITH tk AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), p -> p <> '') AS t
        |  FROM documents
        |), feats AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) < 2 THEN t
        |         ELSE list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) END AS fs
        |  FROM tk
        |), fb AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(unnest(fs)), 1, 8) AS BIGINT) AS h
        |  FROM feats
        |), votes AS (
        |  SELECT doc_id, b.b AS bit,
        |    COUNT(*) FILTER ((h >> b.b) & 1 = 1) AS ones, COUNT(*) AS n
        |  FROM fb, (SELECT unnest(range(32)) AS b) b
        |  GROUP BY doc_id, b.b
        |), sigs0 AS (
        |  SELECT doc_id,
        |    CAST(COALESCE(SUM(CASE WHEN 2*ones > n THEN 1::BIGINT << bit END), 0) AS BIGINT) AS sig
        |  FROM votes GROUP BY doc_id
        |), sigs AS (
        |  SELECT d.doc_id, COALESCE(s.sig, 0) AS sig
        |  FROM documents d LEFT JOIN sigs0 s USING (doc_id)
        |), near AS (
        |  SELECT a.sig AS sig_a, b.sig AS sig_b,
        |    CAST(bit_count(CAST(xor(a.sig, b.sig) AS BIGINT)) AS INTEGER) AS hamming
        |  FROM (SELECT DISTINCT sig FROM sigs) a JOIN (SELECT DISTINCT sig FROM sigs) b
        |    ON a.sig <= b.sig
        |  WHERE bit_count(CAST(xor(a.sig, b.sig) AS BIGINT)) <= 3
        |)
        |SELECT DISTINCT least(da.doc_id, db.doc_id) AS doc_a,
        |  greatest(da.doc_id, db.doc_id) AS doc_b, n.hamming
        |FROM near n
        |JOIN sigs da ON da.sig = n.sig_a
        |JOIN sigs db ON db.sig = n.sig_b
        |WHERE da.doc_id <> db.doc_id
        |ORDER BY doc_a, doc_b""") { (s, dir) =>
      val sigs = docs(s, dir)
        .select(col("doc_id"), TextFunctions.simhash32(col("text")).as("sig"))
      val a = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      val nearSigs = graft.ops.Dedup.simhashSigPairs(sigs)
      // docs attach to either signature side — normalize pair orientation
      // with least/greatest so id order never fights signature order
      a.join(nearSigs, "sig_a").join(b, "sig_b")
        .filter(col("doc_a") =!= col("doc_b"))
        .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"),
          col("hamming"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    },

    // ---- language identification distribution, full oracle ---------------
    // The whole heuristic — CJK script-ratio routing, stopword-profile
    // scores with tripled special-character hits, (score, lang) max
    // tie-break — re-derived in DuckDB from LangId.Profiles itself, so the
    // oracle can't drift from the Scala table. (RE2's \p{Han}/Hiragana/
    // Katakana/L classes mirror Character.UnicodeScript for BMP text;
    // len() vs Java's UTF-16 .length only differs on astral chars, which
    // only matters inside the CJK ratio branch.)
    sql("doc_langid", {
      val structs = TextAnalysis.LangId.Profiles.toSeq.sortBy(_._1)
        .map { case (lang, (stops, chars)) =>
          val stopIn = stops.toSeq.sorted.map(w => s"'$w'").mkString(",")
          val hit = s"len(list_filter(toks, x -> x IN ($stopIn)))" +
            (if (chars.isEmpty) ""
             else s" + 3 * (len(text) - len(regexp_replace(text, '[$chars${chars.toUpperCase}]', '', 'g')))")
          s"{'s': $hit, 'l': '$lang'}"
        }.mkString("[", ", ", "]")
      s"""WITH base AS (
        |  SELECT text,
        |    len(regexp_extract_all(text, '\\p{Han}')) AS han,
        |    len(regexp_extract_all(text, '[\\p{Hiragana}\\p{Katakana}]')) AS kana,
        |    len(text) AS n,
        |    list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), x -> x <> '') AS toks
        |  FROM documents
        |), scored AS (
        |  SELECT CASE
        |    WHEN text IS NULL OR text = '' THEN 'unknown'
        |    WHEN kana > 0 AND (han + kana) * 4 >= n THEN 'ja'
        |    WHEN han * 4 >= n THEN 'zh'
        |    WHEN len(toks) = 0 THEN 'unknown'
        |    ELSE (CASE WHEN list_max($structs).s = 0 THEN 'unknown'
        |          ELSE list_max($structs).l END)
        |  END AS predicted_lang
        |  FROM base
        |)
        |SELECT predicted_lang, COUNT(*) AS n FROM scored
        |GROUP BY 1 ORDER BY 1"""
    }) { (s, dir) =>
      docs(s, dir)
        .withColumn("predicted_lang",
          TextAnalysis.detectLanguage(col("text")))
        .groupBy("predicted_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("predicted_lang")
    },

    // ---- quality-signal gate over the full corpus, full oracle -----------
    // The whole signal battery (token/punct/upper/stopword ratios + gate)
    // re-derived in DuckDB; means via exact decimal accumulation (see
    // DerivedTables.exactMean) so grouping order can't shift them.
    sql("doc_quality_gate", {
      def mean(v: String) =
        s"""CASE WHEN MAX(ABS($v)) < 1e18
           | THEN CAST(SUM(CASE WHEN ABS($v) < 1e18 THEN CAST($v AS DECIMAL(30,10)) END) AS DOUBLE) / COUNT($v)
           | ELSE AVG($v) END""".stripMargin
      s"""WITH toks AS (
        |  SELECT text, regexp_split_to_array(text, '\\s+') AS tk,
        |    len(text) AS nc
        |  FROM documents
        |), sig AS (
        |  SELECT len(tk) AS n_tokens,
        |    CAST(nc AS DOUBLE) / greatest(len(tk), 1) AS avg_token_len,
        |    CAST(nc - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / greatest(nc, 1) AS punct_ratio,
        |    CAST(nc - len(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) / greatest(nc, 1) AS upper_ratio,
        |    CAST(len(list_filter(tk, x -> lower(x) IN ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
        |      / greatest(len(tk), 1) AS stopword_ratio
        |  FROM toks
        |), flagged AS (
        |  SELECT *, (n_tokens >= 20 AND avg_token_len BETWEEN 2 AND 12
        |             AND punct_ratio < 0.3 AND upper_ratio < 0.3) AS is_quality
        |  FROM sig
        |)
        |SELECT is_quality, COUNT(*) AS n_docs,
        |  ${mean("stopword_ratio")} AS avg_stopword_ratio,
        |  ${mean("punct_ratio")} AS avg_punct_ratio
        |FROM flagged
        |GROUP BY is_quality
        |ORDER BY is_quality"""
    }) { (s, dir) =>
      import graft.trace.DerivedTables.exactMean
      TextAnalysis.qualitySignals(docs(s, dir))
        .groupBy("is_quality")
        .agg(count(lit(1)).as("n_docs"),
          exactMean(col("stopword_ratio")).as("avg_stopword_ratio"),
          exactMean(col("punct_ratio")).as("avg_punct_ratio"))
        .orderBy("is_quality")
    },

    // ---- LSH approximate NN vs exact (the at-scale ANN path) -------------
    // Full oracle: the ENTIRE LSH pipeline — sign-bit bucketing against
    // the very hyperplanes Spark uses (embedded as exact round-trip
    // double literals from VectorSearch.hyperplanes), bucket-join
    // candidate generation, exact cosine re-rank — re-derived in DuckDB.
    // Sign parity holds because both engines fold the dot product
    // left-to-right over bit-identical doubles.
    sql("emb_ann_lsh", {
      val (tables, bits, dim, seed, k) = (8, 6, 64, 42L, 10)
      def bucketExpr(t: Int): String =
        VectorSearch.hyperplanes(dim, bits, seed + t).zipWithIndex
          .map { case (p, i) =>
            val arr = p.map(_.toString).mkString("[", ",", "]")
            s"(CASE WHEN list_dot_product(e, $arr) >= 0 THEN ${1 << i} ELSE 0 END)"
          }.mkString("(", " + ", ")")
      val bucketCase = "CASE t.tbl " + (0 until tables)
        .map(t => s"WHEN $t THEN ${bucketExpr(t)}").mkString(" ") + " END"
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), vn AS (
        |  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
        |), b AS (
        |  SELECT vec_id, CAST($bucketCase AS BIGINT) AS bucket, t.tbl
        |  FROM vn, (SELECT unnest(range($tables)) AS tbl) t
        |), q AS (SELECT * FROM b WHERE vec_id < 5),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM b c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket
        |    AND c.vec_id <> q.vec_id
        |), scored AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    list_dot_product(qv.e, cv.e) / (qv.nrm * cv.nrm) AS cosine
        |  FROM cand JOIN vn qv ON qv.vec_id = cand.query_id
        |            JOIN vn cv ON cv.vec_id = cand.neighbor_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, rank, ROUND(cosine, 6) AS cosine
        |FROM ranked WHERE rank <= $k
        |ORDER BY query_id, rank""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.annCosine(v, v.filter(col("vec_id") < 5), "vec_id", "e",
        dim = 64, k = 10, bits = 6, tables = 8)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    // ---- IVF ANN: coarse-quantizer cells + nprobe re-rank, full oracle ---
    // The ENTIRE IVF pipeline re-derived in DuckDB: md5-ordered seed
    // sample, two Lloyd steps (assignment = lowest-cid argmax dot product,
    // exactly the strict-> fold tie-break; centroid update = exact
    // DECIMAL(38,18) mean per dimension), nprobe cell probing with the
    // same (dot desc, cid) order, exact cosine re-rank. Cross-engine
    // equality holds because every dot product folds left-to-right over
    // bit-identical doubles and every mean is an exact decimal sum.
    sql("emb_ann_ivf", {
      val (nCells, nprobe, k) = (16, 4, 10)
      // nearest-centroid assignment of frame `src(id, e, ...)` against
      // centroid frame `cf(cid, c)` — one row per vector, lowest cid wins
      // dot-product ties (the Scala fold's strict `>`)
      def assignSql(src: String, cf: String): String =
        s"""SELECT * EXCLUDE (rk) FROM (
           |  SELECT s.*, $cf.cid AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY s.vec_id
           |      ORDER BY list_dot_product(s.e, $cf.c) DESC, $cf.cid) AS rk
           |  FROM $src s CROSS JOIN $cf) WHERE rk = 1""".stripMargin
      def lloydSql(assigned: String): String =
        s"""SELECT cid, list(m ORDER BY pos) AS c FROM (
           |  SELECT cid, pos,
           |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
           |  FROM (SELECT cid, unnest(e) AS x,
           |          unnest(range(1, len(e) + 1)) AS pos FROM $assigned)
           |  GROUP BY cid, pos) GROUP BY cid""".stripMargin
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), c0 AS (
        |  SELECT cid, e AS c FROM (
        |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, e
        |    FROM v) WHERE cid < $nCells
        |), a0 AS (${assignSql("v", "c0")}),
        |c1 AS (${lloydSql("a0")}),
        |a1 AS (${assignSql("v", "c1")}),
        |c2 AS (${lloydSql("a1")}),
        |idx AS (
        |  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm, cid
        |  FROM (${assignSql("v", "c2")})
        |), q AS (
        |  SELECT vec_id AS query_id, e AS qe,
        |    sqrt(list_dot_product(e, e)) AS qnrm
        |  FROM v WHERE vec_id < 5
        |), probe AS (
        |  SELECT query_id, qe, qnrm, cid FROM (
        |    SELECT q.query_id, q.qe, q.qnrm, c2.cid,
        |      ROW_NUMBER() OVER (PARTITION BY q.query_id
        |        ORDER BY list_dot_product(q.qe, c2.c) DESC, c2.cid) AS rk
        |    FROM q CROSS JOIN c2) WHERE rk <= $nprobe
        |), scored AS (
        |  SELECT p.query_id, i.vec_id AS neighbor_id,
        |    list_dot_product(p.qe, i.e) / (p.qnrm * i.nrm) AS cosine
        |  FROM probe p JOIN idx i USING (cid)
        |  WHERE i.vec_id <> p.query_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, rank, ROUND(cosine, 6) AS cosine
        |FROM ranked WHERE rank <= $k
        |ORDER BY query_id, rank""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.ivfCosine(v, v.filter(col("vec_id") < 5), "vec_id", "e",
        k = 10, nCells = 16, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    // ---- product quantization ADC top-k (Jégou et al., TPAMI 2011) -------
    // The vector splits into m=4 subspaces of 16 dims; each gets its own
    // deterministic k-means codebook (md5-seeded init, exact-decimal Lloyd
    // means — the emb_ann_ivf recipe PER SUBSPACE, re-derived keyed by
    // `sub` below). The persisted index is m code bytes a vector (64×
    // smaller than float32 at dim 64); search is asymmetric distance
    // computation — each query builds m integer LUTs once, scoring a
    // corpus vector is m lookups + an integer sum. Every LUT entry and
    // reconstruction norm is micro-rounded BEFORE summation, so the sums
    // are order-free BIGINTs and the ranking doubles are bit-identical in
    // both engines (no float accumulation order anywhere past the
    // already-decimal-exact centroids).
    sql("emb_ann_pq", {
      val (m, k, topK, dsub) = (4, 16, 10, 16)
      // keyed-by-subspace nearest-sub-centroid assignment: src(vec_id,
      // sub, se) × cf(sub, cid, c), lowest cid wins dot ties
      def assignSql(src: String, cf: String): String =
        s"""SELECT * EXCLUDE (rk) FROM (
           |  SELECT s.*, f.cid AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
           |      ORDER BY list_dot_product(s.se, f.c) DESC, f.cid) AS rk
           |  FROM $src s JOIN $cf f ON s.sub = f.sub) WHERE rk = 1""".stripMargin
      def lloydSql(assigned: String): String =
        s"""SELECT sub, cid, list(mm ORDER BY pos) AS c FROM (
           |  SELECT sub, cid, pos,
           |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS mm
           |  FROM (SELECT sub, cid, unnest(se) AS x,
           |          unnest(range(1, len(se) + 1)) AS pos FROM $assigned)
           |  GROUP BY sub, cid, pos) GROUP BY sub, cid""".stripMargin
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), sv AS (
        |  SELECT vec_id, sub,
        |    list_slice(e, sub * $dsub + 1, sub * $dsub + $dsub) AS se
        |  FROM v CROSS JOIN (SELECT unnest(range($m)) AS sub)
        |), c0 AS (
        |  SELECT sub, cid, se AS c FROM (
        |    SELECT sub, ROW_NUMBER() OVER (PARTITION BY sub
        |      ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, se
        |    FROM sv) WHERE cid < $k
        |), a0 AS (${assignSql("sv", "c0")}),
        |c1 AS (${lloydSql("a0")}),
        |a1 AS (${assignSql("sv", "c1")}),
        |c2 AS (${lloydSql("a1")}),
        |af AS (${assignSql("sv", "c2")}),
        |cn AS (
        |  SELECT sub, cid,
        |    CAST(ROUND(1e6 * list_dot_product(c, c)) AS BIGINT) AS n2
        |  FROM c2
        |), rn AS (
        |  SELECT a.vec_id, CAST(SUM(n.n2) AS BIGINT) AS recon_n2_fp
        |  FROM af a JOIN cn n ON a.sub = n.sub AND a.cid = n.cid
        |  GROUP BY a.vec_id
        |), q AS (
        |  SELECT vec_id AS query_id, e AS qe,
        |    sqrt(list_dot_product(e, e)) AS qnrm
        |  FROM v WHERE vec_id < 5
        |), lut AS (
        |  SELECT q.query_id, f.sub, f.cid,
        |    CAST(ROUND(1e6 * list_dot_product(
        |      list_slice(q.qe, f.sub * $dsub + 1, f.sub * $dsub + $dsub),
        |      f.c)) AS BIGINT) AS d
        |  FROM q CROSS JOIN c2 f
        |), scored AS (
        |  SELECT l.query_id, a.vec_id AS neighbor_id,
        |    CAST(SUM(l.d) AS BIGINT) AS adc_fp
        |  FROM af a JOIN lut l ON a.sub = l.sub AND a.cid = l.cid
        |  WHERE a.vec_id <> l.query_id
        |  GROUP BY l.query_id, a.vec_id
        |), ranked AS (
        |  SELECT s.query_id, s.neighbor_id, s.adc_fp,
        |    CAST(s.adc_fp AS DOUBLE) / 1e6
        |      / (q.qnrm * sqrt(CAST(r.recon_n2_fp AS DOUBLE) / 1e6)) AS ac,
        |    ROW_NUMBER() OVER (PARTITION BY s.query_id
        |      ORDER BY CAST(s.adc_fp AS DOUBLE) / 1e6
        |        / (q.qnrm * sqrt(CAST(r.recon_n2_fp AS DOUBLE) / 1e6)) DESC,
        |        s.neighbor_id) AS rank
        |  FROM scored s
        |  JOIN rn r ON s.neighbor_id = r.vec_id
        |  JOIN q ON s.query_id = q.query_id
        |)
        |SELECT query_id, neighbor_id, rank, adc_fp,
        |  ROUND(ac, 6) AS adc_cosine
        |FROM ranked WHERE rank <= $topK
        |ORDER BY query_id, rank""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.pqTopK(v, v.filter(col("vec_id") < 5), "vec_id", "e",
        dim = 64, m = 4, k = 16, iters = 2, topK = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("adc_fp"), round(col("adc_cosine"), 6).as("adc_cosine"))
        .orderBy("query_id", "rank")
    },

    // ---- IVF + PQ: cell-pruned candidates, byte-code ADC scoring ----------
    // The IVFADC architecture (Jégou et al. 2011 §V) minus the residual
    // step: the emb_ann_ivf coarse quantizer routes each query to 4 cells
    // (candidates by EQUI-JOIN on cid — probe-bounded scan work), and
    // scoring is emb_ann_pq's integer-LUT ADC over m=4 code bytes. The
    // oracle re-derives BOTH trainings — the full-vector coarse k-means
    // and the keyed-by-subspace PQ codebooks — from the same md5 seeds.
    sql("emb_ann_ivfpq", {
      val (nCells, nprobe, m, k, topK, dsub) = (16, 4, 4, 16, 10, 16)
      def assignVecSql(src: String, cf: String): String =
        s"""SELECT * EXCLUDE (rk) FROM (
           |  SELECT s.*, $cf.cid AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY s.vec_id
           |      ORDER BY list_dot_product(s.e, $cf.c) DESC, $cf.cid) AS rk
           |  FROM $src s CROSS JOIN $cf) WHERE rk = 1""".stripMargin
      def lloydVecSql(assigned: String): String =
        s"""SELECT cid, list(m ORDER BY pos) AS c FROM (
           |  SELECT cid, pos,
           |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
           |  FROM (SELECT cid, unnest(e) AS x,
           |          unnest(range(1, len(e) + 1)) AS pos FROM $assigned)
           |  GROUP BY cid, pos) GROUP BY cid""".stripMargin
      def assignSubSql(src: String, cf: String): String =
        s"""SELECT * EXCLUDE (rk) FROM (
           |  SELECT s.*, f.cid AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
           |      ORDER BY list_dot_product(s.se, f.c) DESC, f.cid) AS rk
           |  FROM $src s JOIN $cf f ON s.sub = f.sub) WHERE rk = 1""".stripMargin
      def lloydSubSql(assigned: String): String =
        s"""SELECT sub, cid, list(mm ORDER BY pos) AS c FROM (
           |  SELECT sub, cid, pos,
           |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS mm
           |  FROM (SELECT sub, cid, unnest(se) AS x,
           |          unnest(range(1, len(se) + 1)) AS pos FROM $assigned)
           |  GROUP BY sub, cid, pos) GROUP BY sub, cid""".stripMargin
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), k0 AS (
        |  SELECT cid, e AS c FROM (
        |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, e
        |    FROM v) WHERE cid < $nCells
        |), ka0 AS (${assignVecSql("v", "k0")}),
        |k1 AS (${lloydVecSql("ka0")}),
        |ka1 AS (${assignVecSql("v", "k1")}),
        |k2 AS (${lloydVecSql("ka1")}),
        |kaf AS (SELECT vec_id, cid FROM (${assignVecSql("v", "k2")})),
        |sv AS (
        |  SELECT vec_id, sub,
        |    list_slice(e, sub * $dsub + 1, sub * $dsub + $dsub) AS se
        |  FROM v CROSS JOIN (SELECT unnest(range($m)) AS sub)
        |), c0 AS (
        |  SELECT sub, cid, se AS c FROM (
        |    SELECT sub, ROW_NUMBER() OVER (PARTITION BY sub
        |      ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, se
        |    FROM sv) WHERE cid < $k
        |), a0 AS (${assignSubSql("sv", "c0")}),
        |c1 AS (${lloydSubSql("a0")}),
        |a1 AS (${assignSubSql("sv", "c1")}),
        |c2 AS (${lloydSubSql("a1")}),
        |af AS (${assignSubSql("sv", "c2")}),
        |cn AS (
        |  SELECT sub, cid,
        |    CAST(ROUND(1e6 * list_dot_product(c, c)) AS BIGINT) AS n2
        |  FROM c2
        |), rn AS (
        |  SELECT a.vec_id, CAST(SUM(n.n2) AS BIGINT) AS recon_n2_fp
        |  FROM af a JOIN cn n ON a.sub = n.sub AND a.cid = n.cid
        |  GROUP BY a.vec_id
        |), q AS (
        |  SELECT vec_id AS query_id, e AS qe,
        |    sqrt(list_dot_product(e, e)) AS qnrm
        |  FROM v WHERE vec_id < 5
        |), probe AS (
        |  SELECT query_id, cid FROM (
        |    SELECT q.query_id, k2.cid,
        |      ROW_NUMBER() OVER (PARTITION BY q.query_id
        |        ORDER BY list_dot_product(q.qe, k2.c) DESC, k2.cid) AS rk
        |    FROM q CROSS JOIN k2) WHERE rk <= $nprobe
        |), lut AS (
        |  SELECT q.query_id, f.sub, f.cid,
        |    CAST(ROUND(1e6 * list_dot_product(
        |      list_slice(q.qe, f.sub * $dsub + 1, f.sub * $dsub + $dsub),
        |      f.c)) AS BIGINT) AS d
        |  FROM q CROSS JOIN c2 f
        |), cand AS (
        |  SELECT p.query_id, i.vec_id
        |  FROM probe p JOIN kaf i USING (cid)
        |  WHERE i.vec_id <> p.query_id
        |), scored AS (
        |  SELECT c.query_id, c.vec_id AS neighbor_id,
        |    CAST(SUM(l.d) AS BIGINT) AS adc_fp
        |  FROM cand c
        |  JOIN af a ON a.vec_id = c.vec_id
        |  JOIN lut l ON l.query_id = c.query_id
        |    AND l.sub = a.sub AND l.cid = a.cid
        |  GROUP BY c.query_id, c.vec_id
        |), ranked AS (
        |  SELECT s.query_id, s.neighbor_id, s.adc_fp,
        |    CAST(s.adc_fp AS DOUBLE) / 1e6
        |      / (q.qnrm * sqrt(CAST(r.recon_n2_fp AS DOUBLE) / 1e6)) AS ac,
        |    ROW_NUMBER() OVER (PARTITION BY s.query_id
        |      ORDER BY CAST(s.adc_fp AS DOUBLE) / 1e6
        |        / (q.qnrm * sqrt(CAST(r.recon_n2_fp AS DOUBLE) / 1e6)) DESC,
        |        s.neighbor_id) AS rank
        |  FROM scored s
        |  JOIN rn r ON s.neighbor_id = r.vec_id
        |  JOIN q ON s.query_id = q.query_id
        |)
        |SELECT query_id, neighbor_id, rank, adc_fp,
        |  ROUND(ac, 6) AS adc_cosine
        |FROM ranked WHERE rank <= $topK
        |ORDER BY query_id, rank""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.ivfPqTopK(v, v.filter(col("vec_id") < 5), "vec_id", "e",
        dim = 64, nCells = 16, nprobe = 4, m = 4, k = 16, iters = 2,
        topK = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("adc_fp"), round(col("adc_cosine"), 6).as("adc_cosine"))
        .orderBy("query_id", "rank")
    },

    // ---- IVFADC complete: residual encoding (Jégou et al. 2011 §V) --------
    // emb_ann_ivfpq with the residual step: codes quantize r = x − c(cell)
    // so the sub-codebooks resolve the residual distribution instead of
    // the whole space. The cosine-to-reconstruction score decomposes
    // exactly — dot(q, c + r̂) = dot(q, c) + Σ lut[code] (LUTs still on
    // the RAW query, one set per query; the per-probe extra is a single
    // micro dot(q, c)) and |c + r̂|² = |c|² + Σ (2·dot(c_sub, cw) + |cw|²)
    // (a per-(cell, sub, code) integer constant table). Every term is
    // micro-rounded before order-free BIGINT sums, so the oracle — which
    // re-derives the coarse k-means, the residuals, AND the
    // residual-trained sub-codebooks from the same md5 seeds — ranks
    // bit-identically.
    sql("emb_ann_ivfpq_res", {
      val (nCells, nprobe, m, k, topK, dsub, dim) = (16, 4, 4, 16, 10, 16, 64)
      def assignVecSql(src: String, cf: String): String =
        s"""SELECT * EXCLUDE (rk) FROM (
           |  SELECT s.*, $cf.cid AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY s.vec_id
           |      ORDER BY list_dot_product(s.e, $cf.c) DESC, $cf.cid) AS rk
           |  FROM $src s CROSS JOIN $cf) WHERE rk = 1""".stripMargin
      def lloydVecSql(assigned: String): String =
        s"""SELECT cid, list(m ORDER BY pos) AS c FROM (
           |  SELECT cid, pos,
           |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
           |  FROM (SELECT cid, unnest(e) AS x,
           |          unnest(range(1, len(e) + 1)) AS pos FROM $assigned)
           |  GROUP BY cid, pos) GROUP BY cid""".stripMargin
      def assignSubSql(src: String, cf: String): String =
        s"""SELECT * EXCLUDE (rk) FROM (
           |  SELECT s.*, f.cid AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
           |      ORDER BY list_dot_product(s.se, f.c) DESC, f.cid) AS rk
           |  FROM $src s JOIN $cf f ON s.sub = f.sub) WHERE rk = 1""".stripMargin
      def lloydSubSql(assigned: String): String =
        s"""SELECT sub, cid, list(mm ORDER BY pos) AS c FROM (
           |  SELECT sub, cid, pos,
           |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS mm
           |  FROM (SELECT sub, cid, unnest(se) AS x,
           |          unnest(range(1, len(se) + 1)) AS pos FROM $assigned)
           |  GROUP BY sub, cid, pos) GROUP BY sub, cid""".stripMargin
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), k0 AS (
        |  SELECT cid, e AS c FROM (
        |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, e
        |    FROM v) WHERE cid < $nCells
        |), ka0 AS (${assignVecSql("v", "k0")}),
        |k1 AS (${lloydVecSql("ka0")}),
        |ka1 AS (${assignVecSql("v", "k1")}),
        |k2 AS (${lloydVecSql("ka1")}),
        |kaf AS (SELECT vec_id, cid FROM (${assignVecSql("v", "k2")})),
        |rv AS (
        |  SELECT v.vec_id,
        |    list_transform(range(1, ${dim + 1}), j -> v.e[j] - k2.c[j]) AS e
        |  FROM v JOIN kaf USING (vec_id) JOIN k2 USING (cid)
        |), sv AS (
        |  SELECT vec_id, sub,
        |    list_slice(e, sub * $dsub + 1, sub * $dsub + $dsub) AS se
        |  FROM rv CROSS JOIN (SELECT unnest(range($m)) AS sub)
        |), c0 AS (
        |  SELECT sub, cid, se AS c FROM (
        |    SELECT sub, ROW_NUMBER() OVER (PARTITION BY sub
        |      ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, se
        |    FROM sv) WHERE cid < $k
        |), a0 AS (${assignSubSql("sv", "c0")}),
        |c1 AS (${lloydSubSql("a0")}),
        |a1 AS (${assignSubSql("sv", "c1")}),
        |c2 AS (${lloydSubSql("a1")}),
        |af AS (${assignSubSql("sv", "c2")}),
        |cb AS (
        |  SELECT cid, CAST(ROUND(1e6 * list_dot_product(c, c)) AS BIGINT) AS b
        |  FROM k2
        |), ct AS (
        |  SELECT k2.cid AS cell, c2.sub AS sub, c2.cid AS code,
        |    CAST(ROUND(1e6 * (2 * list_dot_product(
        |      list_slice(k2.c, c2.sub * $dsub + 1, c2.sub * $dsub + $dsub),
        |      c2.c) + list_dot_product(c2.c, c2.c))) AS BIGINT) AS t
        |  FROM k2 CROSS JOIN c2
        |), rn AS (
        |  SELECT a.vec_id, CAST(cb.b + SUM(ct.t) AS BIGINT) AS recon_n2_fp
        |  FROM af a
        |  JOIN kaf ON kaf.vec_id = a.vec_id
        |  JOIN cb ON cb.cid = kaf.cid
        |  JOIN ct ON ct.cell = kaf.cid AND ct.sub = a.sub AND ct.code = a.cid
        |  GROUP BY a.vec_id, cb.b
        |), q AS (
        |  SELECT vec_id AS query_id, e AS qe,
        |    sqrt(list_dot_product(e, e)) AS qnrm
        |  FROM v WHERE vec_id < 5
        |), probe AS (
        |  SELECT query_id, cid FROM (
        |    SELECT q.query_id, k2.cid,
        |      ROW_NUMBER() OVER (PARTITION BY q.query_id
        |        ORDER BY list_dot_product(q.qe, k2.c) DESC, k2.cid) AS rk
        |    FROM q CROSS JOIN k2) WHERE rk <= $nprobe
        |), lut AS (
        |  SELECT q.query_id, f.sub, f.cid,
        |    CAST(ROUND(1e6 * list_dot_product(
        |      list_slice(q.qe, f.sub * $dsub + 1, f.sub * $dsub + $dsub),
        |      f.c)) AS BIGINT) AS d
        |  FROM q CROSS JOIN c2 f
        |), qc AS (
        |  SELECT p.query_id, p.cid,
        |    CAST(ROUND(1e6 * list_dot_product(q.qe, k2.c)) AS BIGINT) AS qc
        |  FROM probe p JOIN q USING (query_id) JOIN k2 USING (cid)
        |), cand AS (
        |  SELECT p.query_id, p.cid, i.vec_id
        |  FROM probe p JOIN kaf i USING (cid)
        |  WHERE i.vec_id <> p.query_id
        |), scored AS (
        |  SELECT c.query_id, c.vec_id AS neighbor_id,
        |    CAST(qc.qc + SUM(l.d) AS BIGINT) AS adc_fp
        |  FROM cand c
        |  JOIN af a ON a.vec_id = c.vec_id
        |  JOIN lut l ON l.query_id = c.query_id
        |    AND l.sub = a.sub AND l.cid = a.cid
        |  JOIN qc ON qc.query_id = c.query_id AND qc.cid = c.cid
        |  GROUP BY c.query_id, c.vec_id, qc.qc
        |), ranked AS (
        |  SELECT s.query_id, s.neighbor_id, s.adc_fp,
        |    CAST(s.adc_fp AS DOUBLE) / 1e6
        |      / (q.qnrm * sqrt(CAST(r.recon_n2_fp AS DOUBLE) / 1e6)) AS ac,
        |    ROW_NUMBER() OVER (PARTITION BY s.query_id
        |      ORDER BY CAST(s.adc_fp AS DOUBLE) / 1e6
        |        / (q.qnrm * sqrt(CAST(r.recon_n2_fp AS DOUBLE) / 1e6)) DESC,
        |        s.neighbor_id) AS rank
        |  FROM scored s
        |  JOIN rn r ON s.neighbor_id = r.vec_id
        |  JOIN q ON s.query_id = q.query_id
        |)
        |SELECT query_id, neighbor_id, rank, adc_fp,
        |  ROUND(ac, 6) AS adc_cosine
        |FROM ranked WHERE rank <= $topK
        |ORDER BY query_id, rank""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.ivfPqResTopK(v, v.filter(col("vec_id") < 5), "vec_id",
        "e", dim = 64, nCells = 16, nprobe = 4, m = 4, k = 16, iters = 2,
        topK = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("adc_fp"), round(col("adc_cosine"), 6).as("adc_cosine"))
        .orderBy("query_id", "rank")
    },

    // ---- k-means cluster composition report ------------------------------
    // The IVF coarse quantizer exposed as a clustering operator: every
    // vector assigned to its deterministic-k-means cell (md5-seeded init,
    // 2 exact-decimal Lloyd steps — the emb_ann_ivf recipe, fully
    // re-derived below), then a per-cluster composition audit: size,
    // distinct labels, majority label + share. Both aggregations are
    // map-side-combinable (argmax = max(struct(cnt, -label)), no
    // per-cluster window), so cluster skew cannot straggle a task.
    sql("emb_kmeans_stats", {
      val nCells = 16
      def assignSql(src: String, cf: String): String =
        s"""SELECT * EXCLUDE (rk) FROM (
           |  SELECT s.*, $cf.cid AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY s.vec_id
           |      ORDER BY list_dot_product(s.e, $cf.c) DESC, $cf.cid) AS rk
           |  FROM $src s CROSS JOIN $cf) WHERE rk = 1""".stripMargin
      def lloydSql(assigned: String): String =
        s"""SELECT cid, list(m ORDER BY pos) AS c FROM (
           |  SELECT cid, pos,
           |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
           |  FROM (SELECT cid, unnest(e) AS x,
           |          unnest(range(1, len(e) + 1)) AS pos FROM $assigned)
           |  GROUP BY cid, pos) GROUP BY cid""".stripMargin
      s"""WITH v AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), c0 AS (
        |  SELECT cid, e AS c FROM (
        |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, e
        |    FROM v) WHERE cid < $nCells
        |), a0 AS (${assignSql("v", "c0")}),
        |c1 AS (${lloydSql("a0")}),
        |a1 AS (${assignSql("v", "c1")}),
        |c2 AS (${lloydSql("a1")}),
        |af AS (${assignSql("v", "c2")}),
        |cl AS (
        |  SELECT cid, label, COUNT(*) AS cnt FROM af GROUP BY cid, label
        |), top AS (
        |  SELECT cid, label AS top_label, cnt AS top_label_cnt FROM (
        |    SELECT cid, label, cnt,
        |      ROW_NUMBER() OVER (PARTITION BY cid
        |        ORDER BY cnt DESC, label) AS rk
        |    FROM cl) WHERE rk = 1
        |)
        |SELECT c.cid, CAST(SUM(c.cnt) AS BIGINT) AS n_vectors,
        |  CAST(COUNT(*) AS BIGINT) AS n_labels,
        |  t.top_label, t.top_label_cnt,
        |  ROUND(CAST(t.top_label_cnt AS DOUBLE)
        |    / CAST(SUM(c.cnt) AS DOUBLE), 6) AS label_share
        |FROM cl c JOIN top t USING (cid)
        |GROUP BY c.cid, t.top_label, t.top_label_cnt
        |ORDER BY cid""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.clusterStats(v, "vec_id", "e", "label", k = 16)
        .orderBy("cid")
    },

    // ---- SemDeDup: semantic dedup inside k-means cells --------------------
    // Abbas et al. 2023 (arXiv:2303.09540): cluster the embeddings with
    // the deterministic k-means quantizer, compare pairs ONLY within a
    // cluster, drop every vector with a lower-id cluster-mate at cosine
    // ≥ 0.45 (the fixture's near-dup regime). Pairwise work is an
    // equi-join on cid — Σ|cluster|², never N² — and cells ≈ √N
    // (autoCells + trainCap, the emb_ann_ivf_auto recipe re-derived
    // below), so per-cluster pair volume grows ~√N with the corpus.
    // Cross-cluster near-dups are invisible BY DESIGN (the paper's
    // recall trade); emb_neardup_lsh is the pair-complete path.
    // ORACLE EXACTNESS: this DuckDB twin computes the exact all-pairs
    // within-cell rule — and so does the Spark operator on every corpus
    // this oracle can run on, because the tier-2 quantized collapse (the
    // mass-near-duplication guard, one-sided over-keep inside its
    // quantization margin) only engages when a cell holds more than
    // SemDedupTier2CellBound tier-1 reps. A balanced autoCells corpus
    // stays under the bound at any verifiable scale, so both engines
    // compute the same function by construction, not by fixture luck.
    sql("emb_semdedup", {
      val threshold = 0.45
      val trainCap = graft.ops.VectorSearch.DefaultTrainCap
      def assignSql(src: String, cf: String): String =
        s"""SELECT * EXCLUDE (rk) FROM (
           |  SELECT s.*, $cf.cid AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY s.vec_id
           |      ORDER BY list_dot_product(s.e, $cf.c) DESC, $cf.cid) AS rk
           |  FROM $src s CROSS JOIN $cf) WHERE rk = 1""".stripMargin
      def lloydSql(assigned: String): String =
        s"""SELECT cid, list(m ORDER BY pos) AS c FROM (
           |  SELECT cid, pos,
           |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
           |  FROM (SELECT cid, unnest(e) AS x,
           |          unnest(range(1, len(e) + 1)) AS pos FROM $assigned)
           |  GROUP BY cid, pos) GROUP BY cid""".stripMargin
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), prm AS (
        |  SELECT LEAST(4096, GREATEST(16,
        |    CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) AS cells
        |  FROM v
        |), c0 AS (
        |  SELECT cid, e AS c FROM (
        |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, e
        |    FROM v) WHERE cid < (SELECT cells FROM prm)
        |), tr AS (
        |  SELECT vec_id, e FROM (
        |    SELECT vec_id, e,
        |      ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS trk
        |    FROM v) WHERE trk <= $trainCap
        |), a0 AS (${assignSql("tr", "c0")}),
        |c1 AS (${lloydSql("a0")}),
        |a1 AS (${assignSql("tr", "c1")}),
        |c2 AS (${lloydSql("a1")}),
        |an AS (
        |  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm, cid
        |  FROM (${assignSql("v", "c2")})
        |), d AS (
        |  SELECT DISTINCT hi.vec_id
        |  FROM an hi JOIN an lo ON hi.cid = lo.cid AND lo.vec_id < hi.vec_id
        |  WHERE list_dot_product(hi.e, lo.e) / (hi.nrm * lo.nrm) >= $threshold
        |)
        |SELECT an.vec_id, an.cid,
        |  CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS keep
        |FROM an LEFT JOIN d USING (vec_id)
        |ORDER BY an.vec_id""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.semDedup(v, "vec_id", "e", threshold = 0.45)
        .orderBy("vec_id")
    },

    // ---- IVF ANN, 100 TB regime: cells ≈ √N + native NearestCells --------
    // The auto mode (nCells = 0) is the scale path: cell count grows as
    // √corpus so per-query candidate volume stays ~√N, and past 32 cells
    // the assignment/probing switches from the folded-literal expression
    // to the native NearestCells codegen loop. The oracle derives the
    // SAME cell count from COUNT(*) (LEAST(4096, GREATEST(16,
    // ceil(sqrt(N))))), so at sf0.1 (2000 vectors → 45 cells) the DRIVER
    // hash-verifies the native expression path, while sf0.001/0.01
    // (500 → 23 cells) verify the literal path — both against the full
    // Lloyd re-derivation in DuckDB.
    sql("emb_ann_ivf_auto", {
      val (nprobe, k) = (VectorSearch.AutoNprobe, 10)
      val trainCap = VectorSearch.DefaultTrainCap
      def assignSql(src: String, cf: String): String =
        s"""SELECT * EXCLUDE (rk) FROM (
           |  SELECT s.*, $cf.cid AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY s.vec_id
           |      ORDER BY list_dot_product(s.e, $cf.c) DESC, $cf.cid) AS rk
           |  FROM $src s CROSS JOIN $cf) WHERE rk = 1""".stripMargin
      def lloydSql(assigned: String): String =
        s"""SELECT cid, list(m ORDER BY pos) AS c FROM (
           |  SELECT cid, pos,
           |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
           |  FROM (SELECT cid, unnest(e) AS x,
           |          unnest(range(1, len(e) + 1)) AS pos FROM $assigned)
           |  GROUP BY cid, pos) GROUP BY cid""".stripMargin
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), prm AS (
        |  SELECT LEAST(4096, GREATEST(16,
        |    CAST(ceil(sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) AS cells
        |  FROM v
        |), c0 AS (
        |  SELECT cid, e AS c FROM (
        |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, e
        |    FROM v) WHERE cid < (SELECT cells FROM prm)
        |), tr AS (
        |  -- Lloyd trains on the $trainCap smallest-md5 vectors, the SAME
        |  -- bounded sample VectorSearch.ivfCosine uses (trainCap) — only
        |  -- the final idx assignment scans the full corpus
        |  SELECT vec_id, e FROM (
        |    SELECT vec_id, e,
        |      ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS trk
        |    FROM v) WHERE trk <= $trainCap
        |), a0 AS (${assignSql("tr", "c0")}),
        |c1 AS (${lloydSql("a0")}),
        |a1 AS (${assignSql("tr", "c1")}),
        |c2 AS (${lloydSql("a1")}),
        |idx AS (
        |  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm, cid
        |  FROM (${assignSql("v", "c2")})
        |), q AS (
        |  SELECT vec_id AS query_id, e AS qe,
        |    sqrt(list_dot_product(e, e)) AS qnrm
        |  FROM v WHERE vec_id < 5
        |), probe AS (
        |  SELECT query_id, qe, qnrm, cid FROM (
        |    SELECT q.query_id, q.qe, q.qnrm, c2.cid,
        |      ROW_NUMBER() OVER (PARTITION BY q.query_id
        |        ORDER BY list_dot_product(q.qe, c2.c) DESC, c2.cid) AS rk
        |    FROM q CROSS JOIN c2) WHERE rk <= $nprobe
        |), scored AS (
        |  SELECT p.query_id, i.vec_id AS neighbor_id,
        |    list_dot_product(p.qe, i.e) / (p.qnrm * i.nrm) AS cosine
        |  FROM probe p JOIN idx i USING (cid)
        |  WHERE i.vec_id <> p.query_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, rank, ROUND(cosine, 6) AS cosine
        |FROM ranked WHERE rank <= $k
        |ORDER BY query_id, rank""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.ivfCosine(v, v.filter(col("vec_id") < 5), "vec_id", "e",
        k = 10, nCells = 0, nprobe = VectorSearch.AutoNprobe)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    // ---- IVF + int8: float coarse quantizer, int8 resident index ---------
    // The memory-bounded 100 TB shape: cells route queries exactly as
    // emb_ann_ivf (float centroids, same Lloyd derivation), but the
    // per-cell resident vectors are int8 (4× smaller index) and the
    // re-rank is exact integer dots rescaled to approximate cosine —
    // bit-deterministic scoring, so the oracle needs no float-sum
    // tolerance anywhere past the (already-decimal-exact) centroids.
    sql("emb_ivf_int8", {
      val (nCells, nprobe, k) = (16, 4, 10)
      def assignSql(src: String, cf: String): String =
        s"""SELECT * EXCLUDE (rk) FROM (
           |  SELECT s.*, $cf.cid AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY s.vec_id
           |      ORDER BY list_dot_product(s.e, $cf.c) DESC, $cf.cid) AS rk
           |  FROM $src s CROSS JOIN $cf) WHERE rk = 1""".stripMargin
      def lloydSql(assigned: String): String =
        s"""SELECT cid, list(m ORDER BY pos) AS c FROM (
           |  SELECT cid, pos,
           |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
           |  FROM (SELECT cid, unnest(e) AS x,
           |          unnest(range(1, len(e) + 1)) AS pos FROM $assigned)
           |  GROUP BY cid, pos) GROUP BY cid""".stripMargin
      val quantize =
        """list_transform(e, x -> CASE WHEN scale = 0.0 THEN 0
          |                            ELSE CAST(round(x / scale) AS INT) END)""".stripMargin
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), c0 AS (
        |  SELECT cid, e AS c FROM (
        |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid, e
        |    FROM v) WHERE cid < $nCells
        |), a0 AS (${assignSql("v", "c0")}),
        |c1 AS (${lloydSql("a0")}),
        |a1 AS (${assignSql("v", "c1")}),
        |c2 AS (${lloydSql("a1")}),
        |idx AS (
        |  SELECT vec_id, cid, sqrt(list_dot_product(e, e)) AS nrm,
        |    scale, $quantize AS q
        |  FROM (SELECT *, list_aggregate(list_transform(e, x -> abs(x)), 'max') / 127.0 AS scale
        |        FROM (${assignSql("v", "c2")}))
        |), q AS (
        |  SELECT vec_id AS query_id, e AS qe,
        |    sqrt(list_dot_product(e, e)) AS qnrm,
        |    scale AS qscale, $quantize AS qq
        |  FROM (SELECT *, list_aggregate(list_transform(e, x -> abs(x)), 'max') / 127.0 AS scale
        |        FROM v)
        |  WHERE vec_id < 5
        |), probe AS (
        |  SELECT query_id, qq, qscale, qnrm, cid FROM (
        |    SELECT q.query_id, q.qq, q.qscale, q.qnrm, c2.cid,
        |      ROW_NUMBER() OVER (PARTITION BY q.query_id
        |        ORDER BY list_dot_product(q.qe, c2.c) DESC, c2.cid) AS rk
        |    FROM q CROSS JOIN c2) WHERE rk <= $nprobe
        |), scored AS (
        |  SELECT query_id, neighbor_id, dot_q,
        |    CAST(dot_q AS DOUBLE) * qscale * scale / (qnrm * nrm) AS qcos_raw
        |  FROM (
        |    SELECT p.query_id, i.vec_id AS neighbor_id,
        |      CAST(list_dot_product(
        |        list_transform(p.qq, x -> CAST(x AS DOUBLE)),
        |        list_transform(i.q, x -> CAST(x AS DOUBLE))) AS BIGINT) AS dot_q,
        |      p.qscale, i.scale AS scale, p.qnrm, i.nrm AS nrm
        |    FROM probe p JOIN idx i USING (cid)
        |    WHERE i.vec_id <> p.query_id)
        |), ranked AS (
        |  SELECT query_id, neighbor_id, dot_q, qcos_raw,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY qcos_raw DESC, neighbor_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, rank, dot_q, ROUND(qcos_raw, 6) AS qcos
        |FROM ranked WHERE rank <= $k
        |ORDER BY query_id, rank""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.ivfCosineInt8(v, v.filter(col("vec_id") < 5), "vec_id",
        "e", k = 10, nCells = 16, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          col("dot_q"), round(col("qcos"), 6).as("qcos"))
        .orderBy("query_id", "rank")
    },

    // ---- LSH ANN, 100 TB regime: corpus-sized signature width ------------
    // bits = 0 is the linear scale path: signature width derives from the
    // corpus count (autoBits — expected bucket size pinned at bucketTarget,
    // candidate volume ~ tables · N · bucketTarget instead of quadratic).
    // The oracle re-derives the SAME width from COUNT(*)
    // (GREATEST(3, length(bin(N // target))) = 64 - numberOfLeadingZeros)
    // and buckets with the first `b` of 16 embedded hyperplane rows — the
    // prefix is exact because hyperplanes() fills rows sequentially from
    // one seeded RNG. sf0.1 (2000 vecs → 5 bits) and sf0.001/0.01
    // (500 → floor 3) hash-verify two different derived widths; the 10×
    // generated tables (20k vecs → 9 bits) found the old maxBits=8 row
    // budget silently clamping the ORACLE below the engine's width — the
    // engine was right, the oracle ran out of rows. 16 embedded rows keep
    // the oracle exact to N = target · 2^16 ≈ 4M vectors; past that the
    // derivation-side must grow again (the engine itself is unbounded).
    sql("emb_ann_lsh_auto", {
      val (tables, maxBits, dim, seed, k, target) = (8, 16, 64, 42L, 10, 64)
      def bucketExpr(t: Int): String =
        VectorSearch.hyperplanes(dim, maxBits, seed + t).zipWithIndex
          .map { case (p, i) =>
            val arr = p.map(_.toString).mkString("[", ",", "]")
            s"(CASE WHEN $i < prm.b AND list_dot_product(e, $arr) >= 0 THEN ${1 << i} ELSE 0 END)"
          }.mkString("(", " + ", ")")
      val bucketCase = "CASE t.tbl " + (0 until tables)
        .map(t => s"WHEN $t THEN ${bucketExpr(t)}").mkString(" ") + " END"
      s"""WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings
        |), prm AS (
        |  SELECT GREATEST(3, CASE WHEN x = 0 THEN 0 ELSE length(bin(x)) END) AS b
        |  FROM (SELECT CAST(COUNT(*) // $target AS BIGINT) AS x FROM v)
        |), vn AS (
        |  SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
        |), bk AS (
        |  SELECT vec_id, CAST($bucketCase AS BIGINT) AS bucket, t.tbl
        |  FROM vn, (SELECT unnest(range($tables)) AS tbl) t, prm
        |), q AS (SELECT * FROM bk WHERE vec_id < 5),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM bk c JOIN q ON c.tbl = q.tbl AND c.bucket = q.bucket
        |    AND c.vec_id <> q.vec_id
        |), scored AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    list_dot_product(qv.e, cv.e) / (qv.nrm * cv.nrm) AS cosine
        |  FROM cand JOIN vn qv ON qv.vec_id = cand.query_id
        |            JOIN vn cv ON cv.vec_id = cand.neighbor_id
        |), ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, rank, ROUND(cosine, 6) AS cosine
        |FROM ranked WHERE rank <= $k
        |ORDER BY query_id, rank""".stripMargin
    }) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.annCosine(v, v.filter(col("vec_id") < 5), "vec_id", "e",
        dim = 64, k = 10, bits = 0, tables = 8, bucketTarget = 64)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    },

    // ---- multimodal metadata (stubbed decode), full oracle on plumbing ---
    sql("mm_media_meta",
      """SELECT kind, COUNT(*) AS n_media,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes, MAX(n_bytes) AS max_bytes
        |FROM (
        |  SELECT (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |    octet_length(encode(text)) AS n_bytes
        |  FROM documents)
        |GROUP BY kind
        |ORDER BY kind""") { (s, dir) =>
      Multimodal.decode(Multimodal.syntheticMedia(s, dir)).toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("total_bytes"),
          max(col("n_bytes")).as("max_bytes"))
        .orderBy("kind")
    },

    // ---- multimodal REAL image decode (javax.imageio), full oracle -------
    // The one non-stub codec this environment ships: the JDK's own PNG
    // reader. Fixtures are synthetic PNGs whose dimensions follow a known
    // arithmetic progression; the oracle re-derives those dimensions from
    // the same arithmetic — so a hash match proves an actual pixel decode
    // ran on the executors (the encoder's byte output never enters the
    // comparison; only what the DECODER read back does). Audio/video keep
    // the documented stub boundary — no JDK codec exists for them.
    sql("mm_png_decode",
      """SELECT i AS media_id, 'png' AS format,
        |  CAST(16 + (i * 7) % 97 AS INTEGER) AS width,
        |  CAST(12 + (i * 5) % 71 AS INTEGER) AS height
        |FROM (SELECT unnest(range(20)) AS i)
        |ORDER BY media_id""") { (s, _) =>
      import s.implicits._
      val recs = (0 until 20).map { i =>
        Multimodal.MediaRecord(i.toLong, "image",
          Multimodal.syntheticPng(16 + (i * 7) % 97, 12 + (i * 5) % 71,
            i.toLong), "synthetic")
      }
      Multimodal.decodeReal(s.createDataset(recs).repartition(4))
        .toDF()
        .select(col("media_id"), col("format"), col("width"), col("height"))
        .orderBy("media_id")
    },

    // ---- multimodal REAL image resize (integer nearest-neighbor) ---------
    // The thumbnail normalization every multimodal pipeline needs, made
    // oracle-provable: pixels are decoded by the JDK codec and resampled
    // with PURE INTEGER index math (srcX = x·w div outW — never
    // Graphics2D interpolation, whose rounding is implementation-
    // defined). The fixture PNGs plant rgb(x,y) = (x·31+y·17+seed) mod
    // 0xFFFFFF, so the position-weighted checksum Σ (y·outW+x+1)·rgb of
    // the 32×24 resample is closed-form — a hash match proves the real
    // decode ran AND every output pixel came from exactly the right
    // source coordinate (a flip/transpose/stride bug cannot match).
    sql("mm_resize",
      """WITH imgs AS (
        |  SELECT i, 16 + (i * 7) % 97 AS w, 12 + (i * 5) % 71 AS h
        |  FROM (SELECT unnest(range(20)) AS i)
        |), px AS (
        |  SELECT i, w, h,
        |    CAST(SUM((y * 32 + x + 1) *
        |      ((((x * w) // 32) * 31 + ((y * h) // 24) * 17 + i) % 16777215))
        |      AS BIGINT) AS cs
        |  FROM imgs,
        |    (SELECT unnest(range(24)) AS y) ys,
        |    (SELECT unnest(range(32)) AS x) xs
        |  GROUP BY i, w, h
        |)
        |SELECT i AS media_id, 'png' AS format,
        |  CAST(w AS INTEGER) AS src_width, CAST(h AS INTEGER) AS src_height,
        |  CAST(32 AS INTEGER) AS out_width, CAST(24 AS INTEGER) AS out_height,
        |  cs AS pix_checksum
        |FROM px
        |ORDER BY media_id""") { (s, _) =>
      import s.implicits._
      val recs = (0 until 20).map { i =>
        Multimodal.MediaRecord(i.toLong, "image",
          Multimodal.syntheticPng(16 + (i * 7) % 97, 12 + (i * 5) % 71,
            i.toLong), "synthetic")
      }
      Multimodal.resizeImages(s.createDataset(recs).repartition(4), 32, 24)
        .toDF()
        .orderBy("media_id")
    },

    // ---- multimodal REAL perceptual hash (average-hash, all-integer) ------
    // The image near-dup fingerprint: 8×8 nearest-neighbor raster (the
    // mm_resize index math), integer gray = (r+g+b) div 3, integer mean,
    // bit per cell. No float/DCT/resampler — the oracle re-derives every
    // bit closed-form from the planted gradient. The 64-bit hash ships as
    // two 32-bit halves (DuckDB's SUM promotes to 128-bit, so a sign-bit
    // set at position 63 would not round-trip a BIGINT compare).
    sql("mm_image_ahash",
      """WITH imgs AS (
        |  SELECT i, 16 + (i * 7) % 97 AS w, 12 + (i * 5) % 71 AS h
        |  FROM (SELECT unnest(range(20)) AS i)
        |), gr AS (
        |  SELECT i, w, h, y * 8 + x AS idx,
        |    ((v // 65536) % 256 + (v // 256) % 256 + v % 256) // 3 AS gray
        |  FROM (
        |    SELECT i, w, h, x, y,
        |      (((x * w) // 8) * 31 + ((y * h) // 8) * 17 + i) % 16777215 AS v
        |    FROM imgs,
        |      (SELECT unnest(range(8)) AS y) ys,
        |      (SELECT unnest(range(8)) AS x) xs)
        |), m AS (
        |  SELECT i, CAST(SUM(gray) // 64 AS BIGINT) AS mean FROM gr GROUP BY i
        |)
        |SELECT gr.i AS media_id,
        |  CAST(MAX(gr.w) AS INTEGER) AS width,
        |  CAST(MAX(gr.h) AS INTEGER) AS height,
        |  CAST(SUM(CASE WHEN gray > mean AND idx < 32
        |    THEN CAST(1 AS BIGINT) << CAST(idx AS INTEGER) ELSE 0 END)
        |    AS BIGINT) AS ahash_lo,
        |  CAST(SUM(CASE WHEN gray > mean AND idx >= 32
        |    THEN CAST(1 AS BIGINT) << CAST(idx - 32 AS INTEGER) ELSE 0 END)
        |    AS BIGINT) AS ahash_hi,
        |  CAST(SUM(CASE WHEN gray > mean THEN 1 ELSE 0 END) AS INTEGER)
        |    AS bits_set
        |FROM gr JOIN m ON m.i = gr.i
        |GROUP BY gr.i
        |ORDER BY media_id""") { (s, _) =>
      import s.implicits._
      val recs = (0 until 20).map { i =>
        Multimodal.MediaRecord(i.toLong, "image",
          Multimodal.syntheticPng(16 + (i * 7) % 97, 12 + (i * 5) % 71,
            i.toLong), "synthetic")
      }
      Multimodal.imageAHash(s.createDataset(recs).repartition(4), 8)
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("ahash").bitwiseAND(lit(0xFFFFFFFFL)).as("ahash_lo"),
          shiftrightunsigned(col("ahash"), 32).as("ahash_hi"),
          col("bits_set"))
        .orderBy("media_id")
    },

    // ---- image near-dup pairs: banded aHash join + exact popcount --------
    // The consumer the perceptual hash exists for — the multimodal
    // analogue of doc_minhash_lsh: 4 × 16-bit bands over the 64-bit
    // aHash, candidates share ≥1 band (equi-join, never corpus²), exact
    // XOR-popcount verification at Hamming ≤ 3. Pigeonhole makes the
    // banding EXACT (3 differing bits cannot hit all 4 bands), so the
    // oracle is the clean declarative form — all pairs with popcount ≤ 3
    // over the closed-form hashes — which verifies the banded plan lost
    // nothing. Fixture: 60 synthetic gradients in 3 groups of 20; group
    // 1 shifts group 0's seed by +1 (near-identical pixels → tiny
    // Hamming distance), group 2 by +1000 (far); popcounts run per
    // 32-bit half in the oracle because DuckDB's SUM promotion would
    // otherwise need a sign-unsafe 2^63 reassembly.
    sql("mm_neardup_images",
      """WITH imgs AS (
        |  SELECT i,
        |    16 + ((i % 20) * 7) % 97 AS w, 12 + ((i % 20) * 5) % 71 AS h,
        |    i % 20 + CASE i // 20 WHEN 1 THEN 1 WHEN 2 THEN 1000
        |      ELSE 0 END AS seed
        |  FROM (SELECT unnest(range(60)) AS i)
        |), gr AS (
        |  SELECT i, y * 8 + x AS idx,
        |    ((v // 65536) % 256 + (v // 256) % 256 + v % 256) // 3 AS gray
        |  FROM (
        |    SELECT i, x, y,
        |      (((x * w) // 8) * 31 + ((y * h) // 8) * 17 + seed) % 16777215 AS v
        |    FROM imgs,
        |      (SELECT unnest(range(8)) AS y) ys,
        |      (SELECT unnest(range(8)) AS x) xs)
        |), m AS (
        |  SELECT i, CAST(SUM(gray) // 64 AS BIGINT) AS mean FROM gr GROUP BY i
        |), hsh AS (
        |  SELECT gr.i,
        |    CAST(SUM(CASE WHEN gray > mean AND idx < 32
        |      THEN CAST(1 AS BIGINT) << CAST(idx AS INTEGER) ELSE 0 END)
        |      AS BIGINT) AS lo,
        |    CAST(SUM(CASE WHEN gray > mean AND idx >= 32
        |      THEN CAST(1 AS BIGINT) << CAST(idx - 32 AS INTEGER) ELSE 0 END)
        |      AS BIGINT) AS hi
        |  FROM gr JOIN m ON m.i = gr.i
        |  GROUP BY gr.i
        |)
        |SELECT a.i AS media_a, b.i AS media_b,
        |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
        |    AS INTEGER) AS hamming
        |FROM hsh a JOIN hsh b ON a.i < b.i
        |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
        |ORDER BY media_a, media_b""") { (s, _) =>
      import s.implicits._
      val recs = (0 until 60).map { i =>
        val base = i % 20
        val seed = base + (i / 20 match {
          case 1 => 1; case 2 => 1000; case _ => 0 })
        Multimodal.MediaRecord(i.toLong, "image",
          Multimodal.syntheticPng(16 + (base * 7) % 97, 12 + (base * 5) % 71,
            seed.toLong), "synthetic")
      }
      Multimodal.imageNearDupPairs(
        Multimodal.imageAHash(s.createDataset(recs).repartition(4), 8).toDF())
        .orderBy("media_a", "media_b")
    },

    // ---- multimodal REAL audio decode (javax.sound.sampled), full oracle -
    // Same move as mm_png_decode for the other JDK-shipped codec: WAV/PCM
    // fixtures whose sample rate / channels / frame count follow known
    // arithmetic; the engine decodes every frame through the audio system
    // (reads the stream to exhaustion, counts what came out) and the
    // oracle re-derives the metadata from the same closed-form arithmetic.
    // duration_ms = frames * 1000 // rate — integer floor in both engines.
    // Video remains the one documented stub (no JDK codec).
    sql("mm_wav_decode",
      """SELECT i AS media_id, 'wave' AS format,
        |  ([8000,11025,16000,22050,44100])[CAST(i % 5 + 1 AS INTEGER)] AS sample_rate,
        |  CAST(1 + i % 2 AS INTEGER) AS channels,
        |  CAST(1000 + i * 37 AS BIGINT) AS n_frames,
        |  CAST((1000 + i * 37) * 1000 //
        |    ([8000,11025,16000,22050,44100])[CAST(i % 5 + 1 AS INTEGER)] AS BIGINT) AS duration_ms
        |FROM (SELECT unnest(range(20)) AS i)
        |ORDER BY media_id""") { (s, _) =>
      import s.implicits._
      val rates = Seq(8000, 11025, 16000, 22050, 44100)
      val recs = (0 until 20).map { i =>
        Multimodal.MediaRecord(i.toLong, "audio",
          Multimodal.syntheticWav(rates(i % 5), 1 + i % 2, 1000 + i * 37,
            i.toLong), "synthetic")
      }
      Multimodal.decodeWav(s.createDataset(recs).repartition(4))
        .toDF()
        .select(col("media_id"), col("format"), col("sample_rate"),
          col("channels"), col("n_frames"), col("duration_ms"))
        .orderBy("media_id")
    },

    // ---- multimodal REAL audio decimation (the audio frame-sample) -------
    // Every 4th frame kept by pure integer frame indexing (no resampling
    // filter — coefficients would be implementation-defined), with a
    // position-weighted checksum over the kept 16-bit samples. The
    // fixture WAVs plant sample(idx) = (idx·257 + seed·131) mod 65536 −
    // 32768, so the checksum is closed-form — a hash match proves the
    // full PCM decode ran AND exactly the right frames/channels were
    // kept (an off-by-one stride or channel swap cannot match).
    sql("mm_wav_decimate",
      """WITH p AS (
        |  SELECT i, 1 + i % 2 AS ch, 1000 + i * 37 AS nf,
        |    ([8000,11025,16000,22050,44100])[CAST(i % 5 + 1 AS INTEGER)] AS rate
        |  FROM (SELECT unnest(range(20)) AS i)
        |), cs AS (
        |  SELECT i, CAST(SUM((kk * ch + c + 1) *
        |      (((4 * kk * ch + c) * 257 + i * 131) % 65536 - 32768))
        |    AS BIGINT) AS s
        |  FROM p,
        |    unnest(range((nf + 3) // 4)) AS tk(kk),
        |    unnest(range(ch)) AS tc(c)
        |  GROUP BY i
        |)
        |SELECT p.i AS media_id, CAST(p.rate AS INTEGER) AS sample_rate,
        |  CAST(p.ch AS INTEGER) AS channels,
        |  CAST(p.nf AS BIGINT) AS n_frames_in,
        |  CAST((p.nf + 3) // 4 AS BIGINT) AS n_frames_kept,
        |  cs.s AS pcm_checksum
        |FROM p JOIN cs ON cs.i = p.i
        |ORDER BY media_id""") { (s, _) =>
      import s.implicits._
      val rates = Seq(8000, 11025, 16000, 22050, 44100)
      val recs = (0 until 20).map { i =>
        Multimodal.MediaRecord(i.toLong, "audio",
          Multimodal.syntheticWav(rates(i % 5), 1 + i % 2, 1000 + i * 37,
            i.toLong), "synthetic")
      }
      Multimodal.decimateWav(s.createDataset(recs).repartition(4), everyN = 4)
        .toDF()
        .orderBy("media_id")
    },

    // ---- multimodal REAL audio frame features (energy / ZCR / peak) ------
    // The feature-extraction step before audio quality gating: per
    // 256-frame analysis window, exact-integer Σ s² (energy), strict
    // sign-flip count per channel (zero-crossing rate's numerator), and
    // max |s| (clipping probe). The fixture sample arithmetic is
    // closed-form (interleaved index j: s = (j·257 + seed·131) mod 65536
    // − 32768), so the oracle replays every window WITHOUT a LAG — the
    // predecessor sample is just the formula at j − ch. A hash match
    // proves the real decode ran and the window/channel indexing is
    // exactly right.
    sql("mm_wav_features",
      """WITH p AS (
        |  SELECT i, 1 + i % 2 AS ch, 1000 + i * 37 AS nf
        |  FROM (SELECT unnest(range(20)) AS i)
        |), sm AS (
        |  SELECT i, (j // ch) // 256 AS w, j // ch AS f, (j // ch) % 256 AS fo,
        |    (j * 257 + i * 131) % 65536 - 32768 AS s,
        |    ((j - ch) * 257 + i * 131) % 65536 - 32768 AS sp
        |  FROM p, unnest(range(nf * ch)) AS tj(j)
        |)
        |SELECT i AS media_id, CAST(w AS BIGINT) AS frame_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(s * s) AS BIGINT) AS energy_sq,
        |  CAST(SUM(CASE WHEN fo > 0 AND sp * s < 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS zero_crossings,
        |  CAST(MAX(ABS(s)) AS BIGINT) AS peak_abs
        |FROM sm GROUP BY i, w
        |ORDER BY media_id, frame_idx""") { (s, _) =>
      import s.implicits._
      val rates = Seq(8000, 11025, 16000, 22050, 44100)
      val recs = (0 until 20).map { i =>
        Multimodal.MediaRecord(i.toLong, "audio",
          Multimodal.syntheticWav(rates(i % 5), 1 + i % 2, 1000 + i * 37,
            i.toLong), "synthetic")
      }
      Multimodal.wavFrameFeatures(s.createDataset(recs).repartition(4),
          windowLen = 256)
        .toDF()
        .orderBy("media_id", "frame_idx")
    },

    // ---- multimodal REAL motion decode (multi-frame GIF), full oracle ----
    // The one motion format with an in-JDK codec: animated GIF via
    // javax.imageio's sequence reader. Fixtures are synthetic multi-frame
    // GIFs whose frame counts and dimensions follow known arithmetic; the
    // engine decodes EVERY frame's pixels (reader.read(i) over an exact
    // getNumImages(true) scan) and the oracle re-derives the metadata
    // closed-form — a hash match proves the frame-by-frame decode ran.
    // True video containers (mp4 etc.) remain the documented stub.
    sql("mm_gif_frames",
      """SELECT i AS media_id, 'gif' AS format,
        |  CAST(1 + i % 6 AS INTEGER) AS n_frames,
        |  CAST(8 + (i * 5) % 40 AS INTEGER) AS width,
        |  CAST(6 + (i * 3) % 28 AS INTEGER) AS height
        |FROM (SELECT unnest(range(18)) AS i)
        |ORDER BY media_id""") { (s, _) =>
      import s.implicits._
      val recs = (0 until 18).map { i =>
        Multimodal.MediaRecord(i.toLong, "video",
          Multimodal.syntheticGif(8 + (i * 5) % 40, 6 + (i * 3) % 28,
            1 + i % 6, i.toLong), "synthetic")
      }
      Multimodal.decodeGif(s.createDataset(recs).repartition(4))
        .toDF()
        .select(col("media_id"), col("format"), col("n_frames"),
          col("width"), col("height"))
        .orderBy("media_id")
    },

    // ---- multimodal MJPEG FRAME decode (true video frames, pure JVM) -----
    // Back-to-back baseline JPEGs (the MJPEG wire form) split by a
    // segment-aware marker walker and pixel-decoded frame by frame with
    // the JDK's JPEG codec. Fixtures are solid-gray frames at quality
    // 1.0 (all-ones quant tables → the uniform block's DC survives
    // exactly; spec-pinned bit round trip), so the position-weighted
    // pixel checksum is CLOSED-FORM: g · n(n+1)/2, n = w·h — an
    // off-by-one frame split, wrong frame order, or a decode that
    // didn't run cannot reproduce it.
    sql("mm_mjpeg_frames",
      """SELECT i AS media_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST(8 + (i * 5) % 40 AS INTEGER) AS width,
        |  CAST(6 + (i * 3) % 28 AS INTEGER) AS height,
        |  CAST((29 + i * 7 + f * 13) % 256 AS BIGINT)
        |    * ((8 + (i * 5) % 40) * (6 + (i * 3) % 28))
        |    * ((8 + (i * 5) % 40) * (6 + (i * 3) % 28) + 1) // 2 AS checksum
        |FROM (SELECT i, unnest(range(1 + i % 6)) AS f
        |      FROM (SELECT unnest(range(18)) AS i))
        |ORDER BY media_id, frame_idx""") { (s, _) =>
      import s.implicits._
      val recs = (0 until 18).map { i =>
        Multimodal.MediaRecord(i.toLong, "video",
          Multimodal.syntheticMjpeg(8 + (i * 5) % 40, 6 + (i * 3) % 28,
            1 + i % 6, i.toLong), "synthetic")
      }
      Multimodal.decodeMjpeg(s.createDataset(recs).repartition(4))
        .toDF()
        .select(col("media_id"), col("frame_idx"), col("width"),
          col("height"), col("checksum"))
        .orderBy("media_id", "frame_idx")
    },

    // ---- multimodal AVI (RIFF) frame decode ------------------------------
    // MJPEG as it actually arrives: RIFF/AVI chunks, not raw
    // concatenated JPEGs. decodeAviFrames walks the little-endian chunk
    // tree (LIST hdrl skipped, odd-size JUNK pad rule exercised, frames
    // pulled from LIST movi's 00dc chunks) and pixel-decodes each frame
    // through the same JDK JPEG path as mm_mjpeg_frames — so the oracle
    // is the same closed form, over a DIFFERENT fixture arithmetic:
    // g · n(n+1)/2 with g = (29 + i·7 + f·13) % 256, n = w·h.
    sql("mm_avi_frames",
      """SELECT i AS media_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST(8 + (i * 7) % 40 AS INTEGER) AS width,
        |  CAST(6 + (i * 5) % 28 AS INTEGER) AS height,
        |  CAST((29 + i * 7 + f * 13) % 256 AS BIGINT)
        |    * ((8 + (i * 7) % 40) * (6 + (i * 5) % 28))
        |    * ((8 + (i * 7) % 40) * (6 + (i * 5) % 28) + 1) // 2 AS checksum
        |FROM (SELECT i, unnest(range(1 + i % 5)) AS f
        |      FROM (SELECT unnest(range(18)) AS i))
        |ORDER BY media_id, frame_idx""") { (s, _) =>
      import s.implicits._
      val recs = (0 until 18).map { i =>
        Multimodal.MediaRecord(i.toLong, "video",
          Multimodal.syntheticAvi(8 + (i * 7) % 40, 6 + (i * 5) % 28,
            1 + i % 5, i.toLong), "synthetic")
      }
      Multimodal.decodeAvi(s.createDataset(recs).repartition(4))
        .toDF()
        .select(col("media_id"), col("frame_idx"), col("width"),
          col("height"), col("checksum"))
        .orderBy("media_id", "frame_idx")
    },

    // ---- multimodal mp4 CONTAINER metadata (pure-JVM box parser) ---------
    // The former "video stub" boundary, retired for metadata: no JDK
    // codec decodes mp4 FRAMES, but the ISO-BMFF container needs none —
    // decodeMp4Meta walks ftyp/moov/mvhd/trak/tkhd/stsd (32/64-bit box
    // sizes, version 0 AND 1 layouts — fixtures alternate) and the
    // oracle re-derives duration/width/height/codec closed-form from the
    // fixture arithmetic. duration_ms survives the double integer floor
    // (ms → timescale ticks → ms), replicated exactly via DuckDB's //.
    // Only true SAMPLE decode (pixels/audio of mp4 tracks) remains
    // stubbed, the one thing that genuinely needs a native codec.
    sql("mm_mp4_meta",
      """SELECT i AS media_id, 'mp4' AS format,
        |  (((2000 + i * 333) * ([600,1000,90000])[CAST(i % 3 + 1 AS INTEGER)] // 1000)
        |    * 1000 // ([600,1000,90000])[CAST(i % 3 + 1 AS INTEGER)]) AS duration_ms,
        |  CAST(160 + (i * 16) % 480 AS INTEGER) AS width,
        |  CAST(120 + (i * 8) % 360 AS INTEGER) AS height,
        |  (['avc1','hev1','mp4v'])[CAST(i % 3 + 1 AS INTEGER)] AS codec
        |FROM (SELECT unnest(range(18)) AS i)
        |ORDER BY media_id""") { (s, _) =>
      import s.implicits._
      val timescales = Seq(600L, 1000L, 90000L)
      val codecs = Seq("avc1", "hev1", "mp4v")
      val recs = (0 until 18).map { i =>
        Multimodal.MediaRecord(i.toLong, "video",
          Multimodal.syntheticMp4(160 + (i * 16) % 480, 120 + (i * 8) % 360,
            2000L + i * 333L, timescales(i % 3), codecs(i % 3),
            version = i % 2, seed = i.toLong), "synthetic")
      }
      Multimodal.decodeMp4(s.createDataset(recs).repartition(4))
        .toDF()
        .select(col("media_id"), col("format"), col("duration_ms"),
          col("width"), col("height"), col("codec"))
        .orderBy("media_id")
    },

    // ---- multimodal feature extraction, full oracle ----------------------
    // The md5-seeded feature stub is re-derived end to end in DuckDB:
    // payload md5 (the payload IS the text's UTF-8 bytes, so md5(text) in
    // DuckDB = md5 of the payload) stretched into a 64-hex-char pool
    // (ph ‖ md5('1|'‖ph)), 4-hex-char slices % 1000 on [-1,1) cast
    // through FLOAT exactly like the Scala stub, then per-record norms
    // (left-to-right dot product) and an exact decimal mean per kind.
    // Verifies the distributed feature plumbing's values, not just its
    // shape — with 2 digests per record, not 17 (the r3 bench note).
    sql("mm_feature_stats",
      """WITH m AS (
        |  SELECT (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |    md5(text) AS ph
        |  FROM documents
        |), p AS (
        |  SELECT kind, ph || md5('1|' || ph) AS pool FROM m
        |), f AS (
        |  SELECT kind,
        |    list_transform(range(16), i ->
        |      CAST(CAST(CAST(CAST('0x' || substr(pool, CAST(i * 4 + 1 AS INTEGER), 4) AS BIGINT) % 1000 AS DOUBLE)
        |        / 500.0 - 1.0 AS FLOAT) AS DOUBLE)) AS fe
        |  FROM p
        |), n AS (
        |  SELECT kind, sqrt(list_dot_product(fe, fe)) AS nrm FROM f
        |)
        |SELECT kind, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(nrm AS DECIMAL(30,10))) AS DOUBLE) / COUNT(nrm), 6) AS avg_norm
        |FROM n
        |GROUP BY kind
        |ORDER BY kind""") { (s, dir) =>
      import graft.trace.DerivedTables.exactMean
      Multimodal.features(Multimodal.syntheticMedia(s, dir)).toDF()
        .select(col("kind"),
          sqrt(aggregate(transform(col("feature"),
            x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)).as("nrm"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          round(exactMean(col("nrm")), 6).as("avg_norm"))
        .orderBy("kind")
    },

    // ---- video frame-sampling stub, full oracle --------------------------
    // The 1024-byte/every-4th slice rule collapses to closed-form
    // arithmetic on payload byte length — the oracle checks the exploded
    // frame shape's counts exactly.
    sql("mm_frame_samples",
      """WITH v AS (
        |  SELECT doc_id AS media_id, octet_length(encode(text)) AS l
        |  FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
        |), c AS (
        |  SELECT media_id, l, CAST(ceil(l / 1024.0) AS BIGINT) AS nc FROM v
        |)
        |SELECT media_id, CAST((nc + 3) // 4 AS BIGINT) AS n_frames,
        |  CAST(((nc + 3) // 4 - 1) * 1024 +
        |    CASE WHEN 4 * ((nc + 3) // 4 - 1) = nc - 1
        |         THEN l - 1024 * (nc - 1) ELSE 1024 END AS BIGINT) AS sampled_bytes
        |FROM c ORDER BY media_id""") { (s, dir) =>
      Multimodal.sampleFrames(Multimodal.syntheticMedia(s, dir))
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame_bytes"))).as("sampled_bytes"))
        .orderBy("media_id")
    }
  )
}
