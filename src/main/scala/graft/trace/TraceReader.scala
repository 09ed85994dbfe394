package graft.trace

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources for FDB TraceEvent logs (SURVEY.md §2.1, S1-S6).
  *
  * All parsing is line-oriented SQL over `spark.read.text` — fully
  * distributed, codegen'd, and robust against truncated rollover files
  * (a malformed tail line yields one bad record, not a failed file, unlike
  * the reference's ET.iterparse which raises: tools/parser.py:30-40 vs the
  * regex route its own log_analysis/processing_script.py:7-16 uses).
  *
  * The parsed form is an attribute bag `attrs: map<string,string>` plus
  * file/line provenance; `TraceEvents.normalize` turns bags into the typed
  * envelope + payload schema.
  */
object TraceReader {

  /** `Key="value"` XML attribute extraction — keys may contain dots
    * (`P99.9`). Two parallel regexp_extract_all calls zipped into a map;
    * both run the same pattern so ordinals align. */
  private val attrPattern = """([\w.]+)="([^"]*)""""

  /** Provenance: file + a read-order id. monotonically_increasing_id on a
    * fresh text scan ascends with (partition, row); within a single split
    * that is line order. NOTE Spark packs splits by size (descending), not
    * by file name — so read_order alone is only file-ordered for
    * single-split files; cross-file ordering must come from (src_file,
    * event time), which normalize() uses for stable ids. */
  private def withProvenance(lines: DataFrame): DataFrame =
    lines
      .withColumn("src_file", input_file_name())
      .withColumn("read_order", monotonically_increasing_id())

  /** XML TraceEvent scan (S1): one `<Event .../>` element per line. */
  def xml(spark: SparkSession, path: String): DataFrame =
    xmlMany(spark, Seq(path))

  /** Multi-path XML scan — one distributed text read over all files;
    * provenance (src_file) comes from input_file_name as usual. */
  def xmlMany(spark: SparkSession, paths: Seq[String]): DataFrame =
    withProvenance(spark.read.textFile(paths: _*).toDF("line"))
      .filter(col("line").contains("<Event "))
      .withColumn("attrs", map_from_arrays(
        regexp_extract_all(col("line"), lit(attrPattern), lit(1)),
        regexp_extract_all(col("line"), lit(attrPattern), lit(2))))
      .select("src_file", "read_order", "attrs")

  /** JSON-lines scan with plaintext fallback (S2+S3): blank lines are
    * skipped; a line that fails JSON parse degrades to `key=value` regex
    * pairs (tools/parser.py:16-21,42-56). */
  def jsonLines(spark: SparkSession, path: String): DataFrame =
    jsonLinesMany(spark, Seq(path))

  def jsonLinesMany(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val mapType = MapType(StringType, StringType)
    withProvenance(spark.read.textFile(paths: _*).toDF("line"))
      .filter(trim(col("line")) =!= "")
      .withColumn("parsed", from_json(trim(col("line")), mapType))
      .withColumn("attrs", coalesce(col("parsed"), map_from_arrays(
        regexp_extract_all(col("line"), lit("""(\w+)=([^\s]+)"""), lit(1)),
        regexp_extract_all(col("line"), lit("""(\w+)=([^\s]+)"""), lit(2)))))
      .select("src_file", "read_order", "attrs")
  }

  /** Format dispatch (S4): `.xml` suffix → XML, else JSON/plaintext.
    * Case-insensitive, matching discover()'s suffix acceptance — a
    * discovered `A.XML` must route to the XML parser, not the fallback. */
  def read(spark: SparkSession, path: String): DataFrame =
    if (path.toLowerCase.endsWith(".xml")) xml(spark, path)
    else jsonLines(spark, path)

  /** Mixed-suffix dispatch over many files: at most TWO distributed reads
    * (one per parser), unioned as attr bags. */
  def readMany(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "readMany requires at least one path")
    val (xmls, others) = paths.partition(_.toLowerCase.endsWith(".xml"))
    val parts = Seq(
      if (xmls.nonEmpty) Some(xmlMany(spark, xmls)) else None,
      if (others.nonEmpty) Some(jsonLinesMany(spark, others)) else None).flatten
    parts.reduce(_ unionByName _)
  }

  /** Normalized-EventModel re-loader (S5, tools/parser.py:91-126): a JSON
    * array of already-normalized events with ISO timestamps and
    * raw_json/fields_json as either nested objects or stringified JSON —
    * a StringType schema captures both forms (objects arrive as their
    * JSON text), then from_json rebuilds the maps. */
  def normalizedJson(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", StringType),
      StructField("severity", IntegerType), StructField("event", StringType),
      StructField("process", StringType), StructField("role", StringType),
      StructField("pid", IntegerType), StructField("machine_id", StringType),
      StructField("address", StringType), StructField("trace_file", StringType),
      StructField("src_line", IntegerType), StructField("raw_json", StringType),
      StructField("fields_json", StringType)))
    val mapType = MapType(StringType, StringType)
    spark.read.schema(schema).option("multiLine", "true").json(path)
      .withColumn("ts",
        to_timestamp(regexp_replace(col("ts"), "Z$", "")))
      .withColumn("fields",
        coalesce(from_json(col("fields_json"), mapType), map()))
      .withColumn("raw",
        coalesce(from_json(col("raw_json"), mapType), map()))
      .drop("raw_json", "fields_json")
  }
}

/** Normalization of attribute bags into the typed event schema
  * (tools/parser.py:73-89, data_transfer_object/event_dto.py:10-31). */
object TraceEvents {

  /** Envelope keys excluded from the dynamic payload. */
  val MandatoryFields: Seq[String] = Seq(
    "Severity", "Time", "DateTime", "Type", "Process", "Role",
    "PID", "Machine", "MachineId", "Address", "LogGroup", "File", "Line")

  private def attr(k: String): Column = element_at(col("attrs"), k)

  /** Lenient integer parse: non-numeric → null (the reference's
    * int(obj[...]) raises and aborts the event; we degrade to null per
    * FIXTURES.md §7 — documented divergence in favor of robustness).
    * Length-bounded so an overlong digit string can't overflow the
    * ANSI cast (9 digits < Int.MaxValue). */
  private def toInt(c: Column): Column =
    when(c.rlike("^[+-]?\\d{1,9}$"), c.cast("int")).otherwise(lit(null))

  /** attrs bag → typed envelope + `fields` payload map + original bag.
    *
    * event_id assignment:
    *  - `stableIds=false` (default): read_order as-is — unique, no
    *    shuffle, line-ordered within each split: the 100 TB path where
    *    ids only need uniqueness (ties broken by ts downstream).
    *  - `stableIds=true`: contiguous 1-based ids like the reference
    *    (tools/storage.py:88) via one global sort on (src_file, intra-file
    *    Time, read_order). File name ordering matches FDB rollover naming
    *    (zero-padded sequence parts); the fractional-seconds Time attr
    *    orders lines within a file even when Spark's size-sorted split
    *    packing scatters a file across partitions. */
  def normalize(bags: DataFrame, stableIds: Boolean = false): DataFrame = {
    val withId =
      if (stableIds)
        graft.ops.ScanOps.rowNumber(
          bags.withColumn("__sort_time",
            // numeric-guarded: a torn Time token must not abort the load
            // under ANSI-default CAST — it just sorts last in its file
            // (null → +Inf sentinel = nulls-last)
            coalesce(
              when(element_at(col("attrs"), "Time")
                  .rlike("^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"),
                element_at(col("attrs"), "Time").cast("double")),
              lit(Double.PositiveInfinity))),
          Seq("src_file", "__sort_time", "read_order"), "event_id")
          .drop("__sort_time")
      else bags.withColumn("event_id", col("read_order"))
    withId.select(
      col("event_id"),
      to_timestamp(attr("DateTime"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("ts"),
      toInt(attr("Severity")).as("severity"),
      attr("Type").as("event"),
      attr("Processes").as("process"),
      attr("Roles").as("role"),
      toInt(attr("PID")).as("pid"),
      coalesce(attr("Machine"), attr("MachineId")).as("machine_id"),
      attr("Address").as("address"),
      attr("File").as("trace_file"),
      toInt(attr("Line")).as("src_line"),
      map_filter(col("attrs"), (k, _) =>
        !k.isin(MandatoryFields.map(lit): _*)).as("fields"),
      col("attrs").as("raw"),
      col("src_file"))
  }

  /** One-call ingest: path → normalized typed events. */
  def load(spark: SparkSession, path: String, stableIds: Boolean = false): DataFrame =
    normalize(TraceReader.read(spark, path), stableIds)

  /** Suffixes the reference CLI accepts (cli_wrapper/main.py:705-708). */
  val SupportedSuffixes: Set[String] = Set(".json", ".xml", ".log", ".txt")

  /** Recursive discovery of supported log files under `root`, sorted by
    * path (the reference's sorted rglob walk, cli_wrapper/main.py:574-581;
    * its `--all` sorted glob at :259-275 is the non-recursive special
    * case). Listing runs driver-side — it's directory metadata, not data;
    * the actual reads stay distributed. */
  def discover(root: String, recursive: Boolean = true): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
          .flatMap(c => if (c.isDirectory && !recursive) Nil else walk(c))
      else Seq(f)
    walk(new java.io.File(root))
      .filter(f => SupportedSuffixes.exists(s => f.getName.toLowerCase.endsWith(s)))
      .map(_.getPath).sorted
  }

  /** Multi-file ingest with per-suffix format dispatch (S6): ≤2
    * distributed reads, stable ids continue across files via the
    * (src_file, time, read_order) global order in normalize(). */
  def loadAll(spark: SparkSession, paths: Seq[String],
      stableIds: Boolean = false): DataFrame =
    normalize(TraceReader.readMany(spark, paths), stableIds)
}
