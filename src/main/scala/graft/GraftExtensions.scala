package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{Ewma, GraftFunctions, RollingHash}

/** Session-extension entry point: registers the engine's native Catalyst
  * expressions at session build time, so a cluster deployment gets them
  * everywhere via `--conf spark.sql.extensions=graft.GraftExtensions`
  * (no per-session register() calls). Builders are shared with the
  * per-session registration helpers so the two paths cannot diverge.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot"), GraftFunctions.dotBuilder))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash"), (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"rolling_hash expects (text), got ${exprs.length} arguments")
        RollingHash(exprs.head)
      }))
    ext.injectFunction((FunctionIdentifier("graft_ewma"),
      info("graft_ewma"), Ewma.builder))
    ext.injectFunction((FunctionIdentifier("graft_nearest_cells"),
      info("graft_nearest_cells"), GraftFunctions.nearestBuilder))
    ext.injectFunction((FunctionIdentifier("graft_md5_seeds"),
      info("graft_md5_seeds"), graft.functions.TextFunctions.md5SeedsBuilder))
    ext.injectFunction((FunctionIdentifier("simhash32"),
      info("simhash32"), graft.functions.TextFunctions.simhashBuilder))
    ext.injectFunction((FunctionIdentifier("graft_langid"),
      info("graft_langid"), graft.functions.TextFunctions.langIdBuilder))
    ext.injectFunction((FunctionIdentifier("graft_char_entropy"),
      info("graft_char_entropy"),
      graft.functions.TextFunctions.charEntropyBuilder))
    ext.injectFunction((FunctionIdentifier("graft_split_text"),
      info("graft_split_text"), graft.functions.TextFunctions.splitTextBuilder))
    ext.injectFunction((FunctionIdentifier("graft_repetition_stats"),
      info("graft_repetition_stats"),
      graft.functions.TextFunctions.repetitionStatsBuilder))
    ext.injectFunction((FunctionIdentifier("graft_gram_hashes"),
      info("graft_gram_hashes"),
      graft.functions.TextFunctions.gramHashesBuilder))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash"), graft.functions.MinHashAgg.builder))
    ext.injectFunction((FunctionIdentifier("graft_hll"),
      info("graft_hll"), graft.functions.HllAgg.builder))
    ext.injectFunction((FunctionIdentifier("graft_hll_regs"),
      info("graft_hll_regs"), graft.functions.HllAgg.regsBuilder))
    ext.injectFunction((FunctionIdentifier("graft_pct_sample"),
      info("graft_pct_sample"), graft.functions.PctSampleAgg.builder))
    ext.injectFunction((FunctionIdentifier("graft_kmv"),
      info("graft_kmv"), graft.functions.KmvAgg.builder))
    ext.injectFunction((FunctionIdentifier("graft_any_gram_in_set"),
      info("graft_any_gram_in_set"), graft.functions.AnyGramInSet.builder))
    graft.functions.PyNum.Names.foreach { case (mode, name) =>
      ext.injectFunction((FunctionIdentifier(name),
        info(name), graft.functions.PyNum.builder(mode)))
    }
  }
}
