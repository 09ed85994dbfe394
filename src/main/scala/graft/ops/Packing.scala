package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data preparation: concatenate
  * documents into fixed token-budget training examples ("bins") with as
  * little padding as possible. The packing discipline is greedy
  * sequential — documents are taken in ascending id order and a document
  * that would overflow the current bin starts a new one — which is the
  * streaming-friendly policy production pipelines use (deterministic,
  * single pass, no cross-document reordering).
  *
  * Distribution contract: a global greedy pack is a sequential fold, so
  * at corpus scale the corpus is sharded into `buckets` independent
  * streams (bucket = id mod buckets) and each bucket packs
  * independently; bin identity is the PAIR (bucket, bin). Each bucket is
  * one shuffle group processed with a sorted group iterator
  * (flatMapSortedGroups) — state per task is one counter pair,
  * memory O(1), and the bucket count is the parallelism knob (set it to
  * ~2-3× the cluster's cores at 100 TB; bucket skew is bounded because
  * id mod buckets spreads uniformly).
  */
object Packing {

  final case class PackIn(id: Long, tokens: Long, bucket: Long)
  final case class PackOut(doc_id: Long, bucket: Long, bin: Long, fill: Long)

  /** Pack `df` rows into (bucket, bin) training examples of at most
    * `budget` tokens. A document larger than the whole budget gets a bin
    * of its own (never split, never dropped — splitting is the text
    * splitter's job upstream). Returns one row per document:
    * (doc_id, bucket, bin, fill) where fill is the bin's token total
    * AFTER this document was placed.
    */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, buckets: Int): DataFrame = {
    require(budget > 0 && buckets > 0, "budget and buckets must be positive")
    val src = df.select(
      col(idCol).cast("long").as("id"),
      col(tokensCol).cast("long").as("tokens"),
      pmod(col(idCol).cast("long"), lit(buckets.toLong)).as("bucket"))
      .as(Encoders.product[PackIn])
    src.groupByKey(_.bucket)(Encoders.scalaLong)
      .flatMapSortedGroups(col("id")) { (bucket: Long, rows: Iterator[PackIn]) =>
        var bin = -1L
        var fill = 0L
        rows.map { r =>
          if (bin < 0 || fill + r.tokens > budget) { bin += 1; fill = r.tokens }
          else fill += r.tokens
          PackOut(r.id, bucket, bin, fill)
        }
      }(Encoders.product[PackOut])
      .toDF()
  }
}
