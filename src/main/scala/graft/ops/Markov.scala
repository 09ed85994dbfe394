package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov analysis of a keyed event stream: the transition
  * matrix (see `ev_markov_transitions`) and its STATIONARY distribution —
  * the steady-state behavioral mix ("what fraction of a long session is
  * spent in each state"), the one-number-per-state summary bot/anomaly
  * monitors track over time.
  *
  * All arithmetic is micro fixed-point so any engine replays it
  * bit-for-bit: transition probabilities are the integral
  * `n·10⁶ div row_total` of the matrix query, and each power-iteration
  * step computes xₖ₊₁(s') = (Σ_s xₖ(s)·p(s,s') ) div 10⁶ in exact
  * integers (floor AFTER the sum), then restores Σx = 10⁶ exactly by
  * LARGEST-REMAINDER apportionment (Hamilton's method): every state
  * gets `deficit div |S|`, and the `deficit mod |S|` states whose sums
  * lost the most to the floor (remainder DESC, state ASC on ties) get
  * one extra micro — an unbiased deterministic renormalization, unlike
  * dumping the whole deficit (up to ~2|S| micro per iteration from
  * sub-stochastic p_micro rows plus the div floor) on one fixed state.
  * The uniform start apportions its `10⁶ mod |S|` remainder the same
  * way (all remainders tie, so the first `rem` states in state order
  * each take one micro). A state with no outgoing transitions gets a
  * self-loop (p = 10⁶), the standard absorbing patch that conserves
  * mass.
  *
  * Scale shape: the only corpus-scale work is the per-key LAG window +
  * the map-side-combinable pair count (the matrix query's plan); the
  * iteration runs on the DRIVER over the collected |states|² matrix —
  * the same bounded-state move as k-means centroids (|event types| is a
  * schema-scale constant, never corpus-scale). */
object Markov {

  /** (prev_type, next_type, n, p_micro) — the transition matrix. */
  def transitions(events: DataFrame, keyCol: String = "user_id",
      typeCol: String = "event_type", orderCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    events
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol), col(orderCol), col(typeCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_micro", expr(
        "CAST((n * 1000000) div (SUM(n) OVER (PARTITION BY prev_type)) AS BIGINT)"))
  }

  /** Stationary distribution after `iters` fixed-point power-iteration
    * steps from the uniform start (10⁶ div |S|, remainder apportioned
    * one micro each to the first `10⁶ mod |S|` states in state order).
    * Returns (state, pi_micro), Σ pi_micro = 10⁶. */
  def stationary(spark: SparkSession, events: DataFrame,
      keyCol: String = "user_id", typeCol: String = "event_type",
      orderCol: String = "event_id", iters: Int = 16): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // bounded collect: |types|² rows (schema-scale, like k-means centroids)
    val rows = transitions(events, keyCol, typeCol, orderCol)
      .select("prev_type", "next_type", "p_micro").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    require(states.nonEmpty,
      "stationary distribution needs at least one transition " +
        "(no key has two ordered events)")
    val outgoing = rows.map(_._1).toSet
    val p: Map[(String, String), Long] =
      rows.map(t => (t._1, t._2) -> t._3).toMap ++
        states.filterNot(outgoing).map(s => (s, s) -> 1000000L)
    val nS = states.size
    var x: Map[String, Long] = {
      val base = 1000000L / nS
      val rem = (1000000L % nS).toInt
      states.zipWithIndex
        .map { case (s, i) => s -> (base + (if (i < rem) 1L else 0L)) }
        .toMap
    }
    (1 to iters).foreach { _ =>
      // exact integer sums; floor AFTER the sum, then largest-remainder
      val num = states.map { s2 =>
        s2 -> states.map(s => x(s) * p.getOrElse((s, s2), 0L)).sum
      }.toMap
      val yf = num.map { case (s, v) => s -> v / 1000000L }
      val deficit = 1000000L - yf.values.sum // >= 0: floors only lose mass
      val base = deficit / nS
      val extra = (deficit % nS).toInt
      val bumped = states.sortBy(s => (-(num(s) % 1000000L), s))
        .take(extra).toSet
      x = states
        .map(s => s -> (yf(s) + base + (if (bumped(s)) 1L else 0L))).toMap
    }
    import spark.implicits._
    states.map(s => (s, x(s))).toSeq.toDF("state", "pi_micro")
  }
}
