package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Regression net for the scale audit: every registered query must plan
  * WITHOUT a Cartesian product. The only exceptions are the two
  * deliberately-all-pairs exact verification twins, which are
  * input-size-guarded in code (Dedup.jaccardPairs, EmbeddingOps'
  * emb_neardup_pairs) and exist to anchor the bucketed production paths.
  * BroadcastNestedLoopJoin is allowed — its broadcast side is a bounded
  * 1-row stats frame or a small query set by construction everywhere it
  * appears; CartesianProductExec (both sides partitioned, full product
  * shuffle) is the plan shape that cannot survive scale.
  */
class PlanGuardSpec extends SparkSpec {

  private val allowedProducts = Set("emb_neardup_pairs", "doc_neardup_jaccard")

  // The RCA loop queries execute their bounded driver-side orchestration
  // at DataFrame-construction time (RcaLoopSpec covers them); planning
  // them here would re-run the whole loop for no added plan coverage.
  private val skip = Set("trace_rca_loop", "trace_rca_final")

  test("no registered query plans a Cartesian product") {
    graft.queries.Registry.all
      .filterNot(q => skip(q.name) || allowedProducts(q.name))
      .foreach { q =>
        val plan = q.run(spark, sf("")).queryExecution.sparkPlan
        val products = plan.collect { case c: CartesianProductExec => c }
        assert(products.isEmpty,
          s"${q.name} plans a CartesianProduct — not scale-safe:\n$plan")
      }
  }
}
