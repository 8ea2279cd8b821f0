package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType
import graft.functions.HllAgg

/** Approximate-query-processing mode as a Catalyst optimizer rule
  * (SparkSessionExtensions.injectOptimizerRule — the rule-injection
  * extension tier): when `spark.graft.approx.countDistinct=true`,
  * every single-column unfiltered `COUNT(DISTINCT x)` in the plan is
  * transparently rewritten to the native HLL sketch aggregate
  * (`hll_distinct(xxhash64(x))`, q85's kernel — ±1.6% rse).
  *
  * Why at the optimizer layer: users and downstream tools keep writing
  * plain `countDistinct`, and one session flag flips the whole
  * workload from the exact plan (an Expand + double aggregate whose
  * partial state is the value set — every distinct value crosses the
  * wire) to fixed 4 KiB-per-group register state merged by elementwise
  * max. That is the difference between a 100 TB dashboard refresh
  * shuffling terabytes and one shuffling kilobytes, chosen per session
  * — the BlinkDB-style accuracy/latency trade, without query rewrites.
  *
  * Semantics preserved: result exprIds (references stay valid), Long
  * type, and null handling — `xxhash64` folds NULL into the running
  * hash rather than returning NULL, so the rewrite nullifies hashes of
  * NULL inputs explicitly; like COUNT(DISTINCT), NULLs count nothing.
  * Multi-arg or FILTERed distinct counts are left exact. The rule runs
  * in the operator-optimization batch, before Spark's own
  * RewriteDistinctAggregates expands the exact form.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val Flag = "spark.graft.approx.countDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(Flag, "false") != "true") return plan
    plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(c)), _, true, None, _)
              if c.deterministic =>
            val hashed = If(IsNull(c), Literal.create(null, LongType),
              new XxHash64(Seq(c)))
            ae.copy(aggregateFunction = HllAgg(hashed), isDistinct = false)
        }
    }
  }

  /** Runtime injection for sessions built without GraftExtensions
    * (idempotent; extraOptimizations run after the main optimizer
    * batches, which is still before physical planning — the rewrite
    * sees the same logical Aggregate shapes).
    */
  def ensureInjected(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(ApproxDistinctRewrite)) {
      spark.experimental.extraOptimizations = cur :+ ApproxDistinctRewrite
    }
  }
}
