package graft

import org.apache.spark.sql.functions._
import graft.functions.HllAgg

/** HyperLogLog sketch invariants: accuracy against exact distinct,
  * and merge-order (partitioning) invariance — the property that makes
  * the fixed-size sketch safe to distribute.
  */
class HllAggSpec extends SparkSpec {

  private def estimate(df: org.apache.spark.sql.DataFrame, c: String): Long = {
    HllAgg.ensureRegistered(spark)
    df.agg(expr(s"hll_distinct(xxhash64($c))")).collect().head.getLong(0)
  }

  test("estimate within 5% of exact cardinality on fixture keys") {
    val li = Tables.load(spark, sfDir, "lineitem")
    for (c <- Seq("l_partkey", "l_orderkey", "l_suppkey")) {
      val exact = li.agg(countDistinct(col(c))).collect().head.getLong(0)
      val approx = estimate(li, c)
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.05, s"$c: exact=$exact approx=$approx err=$err")
    }
  }

  test("linear-counting range is near-exact at tiny cardinality") {
    import spark.implicits._
    val small = (1L to 100L).toDF("k")
    val approx = estimate(small, "k")
    assert(math.abs(approx - 100L) <= 2, s"approx=$approx")
  }

  test("estimate is invariant to partitioning (merge order)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val base = estimate(li, "l_partkey")
    for (n <- Seq(1, 13)) {
      assert(estimate(li.repartition(n), "l_partkey") === base,
        s"estimate changed under repartition($n)")
    }
  }

  test("registered q85 pins the estimate against the exact count") {
    val row = Registry.byName("q85_approx_distinct").fn(spark, sfDir)
      .collect().head
    assert(row.getLong(1) > 0) // exact
    assert(row.getDouble(2) <= 0.05, s"rel_err=${row.getDouble(2)}")
  }
}
