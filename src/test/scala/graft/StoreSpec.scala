package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Store

/** Partitioned layout: date-range predicates prune partitions at the
  * scan (the Spark stand-in for the reference's ts index). */
class StoreSpec extends SparkSpec {

  import spark.implicits._

  test("events store partition-prunes time-range queries") {
    val dir = Files.createTempDirectory("graft-store").toString + "/events"
    val events = Tables(spark, sf(""), "events")
    Store.writeEvents(events, dir)

    val stored = Store.readEvents(spark, dir)
    assert(stored.count() === events.count())

    val ranged = stored.filter(
      col("event_date") === "2024-01-05")
    ranged.collect()
    assert(Store.prunes(ranged), "date filter should reach PartitionFilters")
    // pruned read touches a strict subset of files
    val allFiles = stored.select(input_file_name()).distinct().count()
    val rangedFiles = ranged.select(input_file_name()).distinct().count()
    assert(rangedFiles < allFiles)

    // ts predicates still work (row-group stats within partitions)
    val narrow = stored.filter(col("ts") >= "2024-01-05 00:00:00" &&
      col("ts") < "2024-01-05 06:00:00")
    assert(narrow.count() > 0)
    assert(narrow.count() < ranged.count())
  }

  test("driver contract: entry returns rows; every query has a runner") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries.nonEmpty)
    // every oracle key corresponds to a registered query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("langid: CJK routing") {
    import graft.ops.TextAnalysis
    assert(TextAnalysis.LangId.detect("今天天气很好我们去公园散步吧") === "zh")
    assert(TextAnalysis.LangId.detect("the weather is nice today") === "en")
  }
}
