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
    noOracle("doc_simhash_pairs") { (s, dir) =>
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

    // ---- language identification distribution ----------------------------
    noOracle("doc_langid") { (s, dir) =>
      docs(s, dir)
        .withColumn("predicted_lang",
          TextAnalysis.detectLanguage(col("text")))
        .groupBy("predicted_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("predicted_lang")
    },

    // ---- quality-signal gate over the full corpus ------------------------
    noOracle("doc_quality_gate") { (s, dir) =>
      TextAnalysis.qualitySignals(docs(s, dir))
        .groupBy("is_quality")
        .agg(count(lit(1)).as("n_docs"),
          avg(col("stopword_ratio")).as("avg_stopword_ratio"),
          avg(col("punct_ratio")).as("avg_punct_ratio"))
        .orderBy("is_quality")
    },

    // ---- LSH approximate NN vs exact (the at-scale ANN path) -------------
    noOracle("emb_ann_lsh") { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.annCosine(v, v.filter(col("vec_id") < 5), "vec_id", "e",
        dim = 64, k = 10, bits = 6, tables = 8)
        .orderBy("query_id", "rank")
    },

    // ---- IVF ANN: coarse-quantizer cells + nprobe re-rank ----------------
    noOracle("emb_ann_ivf") { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      VectorSearch.ivfCosine(v, v.filter(col("vec_id") < 5), "vec_id", "e",
        k = 10, nCells = 16, nprobe = 4)
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

    // ---- multimodal feature extraction + frame sampling ------------------
    noOracle("mm_feature_stats") { (s, dir) =>
      import s.implicits._
      Multimodal.features(Multimodal.syntheticMedia(s, dir)).toDF()
        .select(col("kind"),
          sqrt(aggregate(transform(col("feature"),
            x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, x) => acc + x)).as("nrm"))
        .groupBy("kind")
        .agg(count(lit(1)).as("n"), avg(col("nrm")).as("avg_norm"))
        .orderBy("kind")
    },

    noOracle("mm_frame_samples") { (s, dir) =>
      Multimodal.sampleFrames(Multimodal.syntheticMedia(s, dir))
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame_bytes"))).as("sampled_bytes"))
        .orderBy("media_id")
    }
  )
}
