object ProfLoad {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.build("prof-load")
    def time[T](l: String)(f: => T): T = { val t0=System.nanoTime; val r=f; println(f"[prof] $l ${(System.nanoTime-t0)/1e9}%.2f s"); r }
    val fx = graft.queries.TraceQueries.XmlFixture
    graft.Cli.run(Array("--db", "/tmp/prof_store_w", "load", fx, "--stable-ids"), Some(spark)) // warm
    val ev = spark.read.parquet("/tmp/prof_store_w/events")
    val ch = time("chunkByMarker cache+count")({ val c = graft.trace.Chunker.chunkByMarker(ev).cache(); c.count(); c })
    time("write chunks")(ch.write.mode("overwrite").parquet("/tmp/prof_ch/chunks"))
    val sp = time("splitChunks plan+write")(graft.trace.Chunker.splitChunks(ch).write.mode("overwrite").parquet("/tmp/prof_ch/pieces"))
    time("show")(ch.select("chunk_id","n_events").show(5))
    // second pass now everything warm
    val ch2 = time("2nd chunkByMarker cache+count")({ val c = graft.trace.Chunker.chunkByMarker(ev).cache(); c.count(); c })
    time("2nd write chunks")(ch2.write.mode("overwrite").parquet("/tmp/prof_ch/chunks"))
    time("2nd splitChunks write")(graft.trace.Chunker.splitChunks(ch2).write.mode("overwrite").parquet("/tmp/prof_ch/pieces"))
    spark.stop()
  }
}
