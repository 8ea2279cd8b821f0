package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import graft.functions.HllAgg
import graft.plans.ApproxDistinctRewrite

/** plans/ApproxDistinctRewrite: the flag-gated COUNT(DISTINCT)→HLL
  * optimizer rewrite — plan shape under both flag states, estimate
  * accuracy, null semantics, and flag isolation across session clones.
  */
class ApproxRewriteSpec extends SparkSpec {

  private def session(flag: Boolean) = {
    val sc = spark.newSession()
    ApproxDistinctRewrite.ensureInjected(sc)
    sc.conf.set(ApproxDistinctRewrite.Flag, flag.toString)
    sc
  }

  private def hllCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect { case h: HllAgg => h })
    }.flatten.size

  private def distinctCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case ae: AggregateExpression if ae.isDistinct => ae })
    }.flatten.size

  test("flag on: the distinct count optimizes to HllAgg; flag off: stays exact") {
    val on = session(true)
    val dfOn = Tables.load(on, sfDir, "lineitem")
      .agg(countDistinct(col("l_partkey")).as("d"))
    assert(hllCount(dfOn) === 1)
    assert(distinctCount(dfOn) === 0)

    val off = session(false)
    val dfOff = Tables.load(off, sfDir, "lineitem")
      .agg(countDistinct(col("l_partkey")).as("d"))
    assert(hllCount(dfOff) === 0)
    assert(distinctCount(dfOff) === 1)
  }

  test("estimates stay within 5% of exact, globally and per group") {
    val on = session(true)
    val approx = Tables.load(on, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex <= 0.05,
        s"group $k: approx ${approx(k)} vs exact $ex")
    }
  }

  test("NULLs count nothing, matching COUNT(DISTINCT)") {
    import spark.implicits._
    val on = session(true)
    val src = Seq(Option(1L), None, None, Option(2L), Option(1L)).toDF("x")
    // re-create the frame inside the flagged clone
    val flagged = on.createDataFrame(src.collectAsList(), src.schema)
    val est = flagged.agg(countDistinct(col("x"))).head().getLong(0)
    assert(est === 2L) // HLL is exact at tiny cardinality; a NULL bucket would read 3
  }

  test("the flag is scoped to the clone: the shared session stays exact") {
    session(true) // build and drop a flagged clone
    val df = Tables.load(spark, sfDir, "lineitem")
      .agg(countDistinct(col("l_partkey")).as("d"))
    assert(hllCount(df) === 0)
    assert(distinctCount(df) === 1)
  }

  test("q175 returns one row per return flag with plausible estimates") {
    val rows = Registry.byName("q175_approx_autorewrite").fn(spark, sfDir)
      .collect()
    assert(rows.length === 3) // A, N, R
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(1) <= r.getLong(2),
        s"estimate ${r.getLong(1)} vs rows ${r.getLong(2)}")
    }
  }
}
