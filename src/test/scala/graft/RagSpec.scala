package graft

import org.apache.spark.sql.functions._

import graft.ops.Rag

/** RAG data path: stub embedding determinism and retrieval ranking. */
class RagSpec extends SparkSpec {

  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private val chunks = Seq(
    (1L, "storage server queue bytes rising durability lag"),
    (2L, "master recovery state reading coordinated state"),
    (3L, "ratekeeper throttling transaction rate limit")).toDF(
    "chunk_id", "chunk_content")

  test("embedStub: deterministic, dim-sized, partitioning-independent") {
    val idx1 = Rag.index(chunks).collect().sortBy(_.getLong(0))
    val idx2 = Rag.index(chunks.repartition(7)).collect().sortBy(_.getLong(0))
    assert(idx1.forall(_.getSeq[Double](2).length === 16))
    assert(idx1.map(_.getSeq[Double](2)).toSeq ===
      idx2.map(_.getSeq[Double](2)).toSeq)
  }

  test("retrieve: identical text ranks first with cosine 1") {
    val idx = Rag.index(chunks)
    val q = Seq((1L, "master recovery state reading coordinated state"))
      .toDF("query_id", "query_text")
    val top = Rag.retrieve(idx, q, k = 3).orderBy("rank").collect()
    assert(top.length === 3)
    assert(top.head.getAs[Long]("chunk_id") === 2L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-9)
    // ranks are dense 1..k
    assert(top.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
  }

  test("retrieve: query id colliding with a chunk id still sees that chunk") {
    val idx = Rag.index(chunks)
    val q = Seq((3L, "ratekeeper throttling transaction rate limit"))
      .toDF("query_id", "query_text")
    val top = Rag.retrieve(idx, q, k = 1).collect()
    assert(top.head.getAs[Long]("chunk_id") === 3L)
  }
}
