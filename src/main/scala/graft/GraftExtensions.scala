package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.functions.{CosineSimilarity, DeflateSize, HllAgg, MinHashAgg}

/** Session-extension entry point: registers the engine's native
  * expressions into the Catalyst function registry at session build.
  *
  * Usage: .config("spark.sql.extensions", "graft.GraftExtensions")
  * (Verify/Bench/tests do this; the objects' ensureRegistered is the
  * runtime fallback for foreign sessions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier(CosineSimilarity.name),
      CosineSimilarity.info, CosineSimilarity.builder))
    ext.injectFunction((FunctionIdentifier(MinHashAgg.name),
      MinHashAgg.info, MinHashAgg.builder))
    ext.injectFunction((FunctionIdentifier(HllAgg.name),
      HllAgg.info, HllAgg.builder))
    ext.injectFunction((FunctionIdentifier(DeflateSize.name),
      DeflateSize.info, DeflateSize.builder))
    // Whole-operator tier: the native as-of join plan node (guide
    // preference (c)). AsOfJoinApi.asof also self-registers through
    // spark.experimental.extraStrategies for driver-built sessions
    // that never saw this extension class.
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graft.AsOfJoinStrategy)
    // Rule tier: flag-gated COUNT(DISTINCT) -> HLL-sketch rewrite
    // (no-op unless spark.graft.approx.countDistinct=true).
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
  }
}
