package graft.trace

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.ScanOps

/** RAG chunking (tools/chunker.py): split the ordered event stream into
  * chunks that each END at a MasterRecoveryState marker (inclusive), with
  * trailing events as a final chunk; then character-split chunk text with
  * overlap. Marker chunking is a running count of markers over the ordered
  * stream — the marker row closes its own chunk.
  */
object Chunker {

  /** One row per chunk: ids, bounds, and the newline-joined content
    * (chunker.py:18-44). contentCol controls what each event renders as. */
  def chunkByMarker(events: DataFrame,
      markerEvent: String = "MasterRecoveryState",
      contentCol: Column = null): DataFrame = {
    val content =
      if (contentCol != null) contentCol
      else to_json(struct(col("event_id"), col("ts"), col("severity"),
        col("event"), col("fields")))
    // markers strictly BEFORE this row = the chunk this row belongs to
    // (so each marker row closes chunk N and the next row opens N+1);
    // a distributed running count — the stream never hits one partition
    val marked = ScanOps.runningSum(
      events
        .withColumn("line", content)
        .withColumn("is_marker",
          when(col("event") === markerEvent, 1).otherwise(0)),
      Seq("event_id"), col("is_marker"), "chunk_id")
    marked
      .groupBy("chunk_id")
      .agg(
        min(col("event_id")).as("start_event_id"),
        max(col("event_id")).as("end_event_id"),
        count(lit(1)).as("n_events"),
        max(col("is_marker")).as("has_marker"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("event_id"), col("line")))),
          s => s.getField("line"))).as("chunk_content"))
      .withColumn("chunk_type",
        when(col("has_marker") === 1, "pre-recovery").otherwise("final_chunk"))
      .drop("has_marker")
      .orderBy("chunk_id")
  }

  /** Recursive character splitting, 500 chars / 100 overlap, separator
    * preference ["\n\n", "\n", " ", ""] (chunker.py:8-16 — langchain's
    * RecursiveCharacterTextSplitter algorithm re-implemented; same
    * greedy merge-with-overlap behavior). Pure function → usable in a UDF. */
  def splitText(text: String, chunkSize: Int = 500,
      overlap: Int = 100): Seq[String] = {
    val seps = Seq("\n\n", "\n", " ", "")

    def split(text: String, sepIdx: Int): Seq[String] = {
      if (text.length <= chunkSize) return Seq(text).filter(_.nonEmpty)
      val sep = seps(sepIdx)
      val parts: Seq[String] =
        if (sep.isEmpty) text.grouped(chunkSize).toSeq
        else text.split(java.util.regex.Pattern.quote(sep), -1).toSeq
      // recurse into any part still too large (with the next separator)
      val pieces = parts.flatMap { p =>
        if (p.length > chunkSize && sepIdx < seps.length - 1)
          split(p, sepIdx + 1)
        else Seq(p)
      }.filter(_.nonEmpty)
      merge(pieces, sep)
    }

    def merge(pieces: Seq[String], sep: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      var curLen = 0
      def sepLen = if (cur.isEmpty) 0 else sep.length
      for (p <- pieces) {
        if (curLen + sepLen + p.length > chunkSize && cur.nonEmpty) {
          out += cur.mkString(sep)
          // keep a tail of pieces as overlap
          while (curLen > overlap ||
            (curLen + sep.length + p.length > chunkSize && curLen > 0)) {
            curLen -= cur.head.length + (if (cur.size > 1) sep.length else 0)
            cur.remove(0)
          }
        }
        cur += p
        curLen = cur.map(_.length).sum + sep.length * (cur.size - 1)
      }
      if (cur.nonEmpty) out += cur.mkString(sep)
      out.toSeq
    }

    split(text, 0)
  }

  /** Forced-recovery chunking (forced_recovery/chunk_logs.py:26-69): each
    * chunk runs from a trigger event to the first MasterRecoveryState
    * StatusCode=14 (fully_recovered) after it, flagged complete/incomplete,
    * carrying the trigger's Comment. Events before the first trigger are
    * outside any chunk. */
  def forcedRecoveryChunks(events: DataFrame,
      isTrigger: Column): DataFrame = {
    val isEnd = col("event") === "MasterRecoveryState" &&
      element_at(col("fields"), "StatusCode") === "14"
    val grouped = ScanOps.runningSum(
      events.withColumn("is_trigger", when(isTrigger, 1).otherwise(0)),
      Seq("event_id"), col("is_trigger"), "chunk_id", inclusive = true)
      .filter(col("chunk_id") >= 1)
      .withColumn("end_id",
        min(when(isEnd, col("event_id")))
          .over(Window.partitionBy("chunk_id")))
      .filter(col("end_id").isNull || col("event_id") <= col("end_id"))
    grouped
      .groupBy("chunk_id")
      .agg(
        min(col("ts")).as("start_time"),
        max(col("ts")).as("end_time"),
        count(lit(1)).as("event_count"),
        max(col("end_id")).isNotNull.as("complete"),
        max(when(col("is_trigger") === 1,
          element_at(col("fields"), "Comment"))).as("start_comment"))
      .orderBy("chunk_id")
  }

  // graft_split_text: native codegen since round 8 (the former ScalaUDF
  // blocked whole-stage codegen of the split projection)

  /** Explode chunk rows into ≤chunkSize character sub-chunks with overlap,
    * a per-parent piece index, and the reference's GLOBAL chunk_index over
    * the full split output (chunker.py:46-56). */
  def splitChunks(chunks: DataFrame, chunkSize: Int = 500,
      overlap: Int = 100): DataFrame = {
    // chunk_index is the global 0-based piece number ordered by
    // (chunk_id, piece_index). A row_number over the EXPLODED frame would
    // range-shuffle every piece; instead derive it arithmetically — an
    // exclusive prefix sum of per-chunk piece counts (one tiny row per
    // chunk) broadcast back onto the pieces, which then never shuffle.
    // The split itself is persisted (spill-safe) so BOTH consumers — the
    // piece explode and the count prefix-sum — bill the recursive
    // splitter ONCE per row instead of twice; within one action the two
    // plan branches read the same in-memory relation, and the harness's
    // between-query cache eviction keeps per-query accounting honest.
    val split = chunks
      .select(col("chunk_id"), col("start_event_id"), col("end_event_id"),
        col("chunk_type"),
        graft.functions.TextFunctions
          .splitText(col("chunk_content"), chunkSize, overlap)
          .as("pieces_arr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pieces = split
      .select(col("chunk_id"), col("start_event_id"), col("end_event_id"),
        col("chunk_type"),
        posexplode(col("pieces_arr")).as(Seq("piece_index", "content")))
      .withColumn("chunk_uid",
        concat(col("chunk_id"), lit("-"), col("piece_index")))
    val offsets = ScanOps.runningSum(
      split.select(col("chunk_id"), size(col("pieces_arr")).as("n_pieces")),
      Seq("chunk_id"), col("n_pieces"), "piece_offset")
      .select(col("chunk_id"), col("piece_offset"))
    pieces.join(broadcast(offsets), Seq("chunk_id"))
      .withColumn("chunk_index", col("piece_offset") + col("piece_index"))
      .drop("piece_offset")
  }
}
