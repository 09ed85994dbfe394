package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (backward) join.
  *
  * For each left row, attach the payload of the LATEST right row whose
  * ordering value is <= the left row's, within the same key group — the
  * time-series join behind "state at event time" lookups (latest config
  * before each request, last checkpoint before each failure). Neither
  * the reference nor stock Spark has the operator; DuckDB's ASOF JOIN
  * defines the semantics our oracle checks.
  *
  * Implementation: no per-row probing and no broadcast requirement.
  * Both sides are tagged and unioned, the union is sorted WITHIN key
  * groups by (ord, side) — right rows first at equal ord, giving <=
  * semantics — and every left row picks up the running last-non-null
  * right payload. One shuffle on the key columns; scales with the key
  * cardinality like any keyed window.
  */
object AsOfJoin {

  /** Backward as-of join. `payloadCols` are right-side columns delivered
    * to each left row as `prefix + name`; the matched right ordering
    * value always arrives as `prefix + ordCol`. `tolerance` (same units
    * as ordCol, which must be numeric for it) nulls matches older than
    * `left.ord - tolerance`.
    *
    * The right side must be unique per (key, ord) — pre-aggregate
    * otherwise, or the payload among tied right rows is unspecified. */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      ordCol: String, payloadCols: Seq[String], prefix: String = "asof_",
      tolerance: Option[Long] = None): DataFrame = {
    require(!payloadCols.contains(ordCol),
      s"$ordCol is always delivered; list only extra payload columns")
    // the whole right payload travels as ONE struct so a right row with a
    // NULL payload column still supersedes older rows — per-column
    // carries would pair the newest ord with a stale non-null payload
    val rTagged = right
      .select((keyCols :+ ordCol).map(col) :+
        struct((ordCol +: payloadCols).map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    val lTagged = left.withColumn("__side", lit(1))
    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = (ordCol +: payloadCols).foldLeft(
      u.withColumn("__pc", last(col("__p"), ignoreNulls = true).over(w))) {
      (d, c) => d.withColumn(prefix + c, col("__pc").getField(c))
    }
    val inRange: Column = tolerance match {
      case Some(t) =>
        col(prefix + ordCol).isNotNull &&
          (col(ordCol) - col(prefix + ordCol)) <= t
      case None => col(prefix + ordCol).isNotNull
    }
    // outside tolerance (or no match) → all delivered columns null
    (ordCol +: payloadCols).foldLeft(
      carried.filter(col("__side") === 1)) { (d, c) =>
      d.withColumn(prefix + c, when(inRange, col(prefix + c)))
    }.drop("__side", "__p", "__pc")
  }
}
