package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.RangeRank

/** The distributed two-pass global ranking must be value-identical to
  * the single-partition `Window.orderBy` it replaces — including on
  * nullable sort keys (nulls first) and skewed distributions (the
  * equi-depth auto variant).
  */
class RangeRankSpec extends SparkSpec {

  private lazy val cust = Tables.load(spark, sfDir, "customer")
    .select(col("c_custkey"), col("c_acctbal"))

  private def windowRanked(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    df.withColumn("global_rn", row_number().over(w).cast("long"))
      .select(col("c_custkey"), col("global_rn"))
  }

  test("fixed-width bucketing equals Window.orderBy exactly") {
    val got = RangeRank.withGlobalRowNumber(
      cust, floor(col("c_acctbal") / 100), Seq(col("c_acctbal"), col("c_custkey")))
      .select(col("c_custkey"), col("global_rn"))
    assert(got.exceptAll(windowRanked(cust)).count() === 0)
    assert(windowRanked(cust).exceptAll(got).count() === 0)
  }

  test("equi-depth auto bucketing equals Window.orderBy, nulls first") {
    // null out a deterministic slice of the sort key: Window.orderBy
    // ranks those rows first (asc_nulls_first); so must RangeRank
    val withNulls = cust.withColumn("c_acctbal",
      when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal")))
    val got = RangeRank.withGlobalRowNumberAuto(
      withNulls, col("c_acctbal"), Seq(col("c_custkey")), buckets = 16)
      .select(col("c_custkey"), col("global_rn"))
    assert(got.exceptAll(windowRanked(withNulls)).count() === 0)
    assert(windowRanked(withNulls).exceptAll(got).count() === 0)
  }

  test("auto bucketing survives heavy skew (constant-majority key)") {
    // 90% of rows share one value: equi-depth boundaries collapse onto
    // it, many buckets become empty, ranking must stay exact
    val skewed = cust.withColumn("c_acctbal",
      when(col("c_custkey") % 10 =!= 0, lit(42.0)).otherwise(col("c_acctbal")))
    val got = RangeRank.withGlobalRowNumberAuto(
      skewed, col("c_acctbal"), Seq(col("c_custkey")), buckets = 16)
      .select(col("c_custkey"), col("global_rn"))
    assert(got.exceptAll(windowRanked(skewed)).count() === 0)
    assert(windowRanked(skewed).exceptAll(got).count() === 0)
  }

  test("helper-name collisions are refused, not silently corrupted") {
    val poisoned = cust.withColumn("__bucket", lit(1))
    intercept[IllegalArgumentException] {
      RangeRank.withGlobalRowNumber(
        poisoned, floor(col("c_acctbal")), Seq(col("c_acctbal"), col("c_custkey")))
    }
  }

  test("grouped ranking equals a per-group window exactly (incl. null group/key)") {
    // group customers by nation-ish slices, null a deterministic set of
    // both the GROUP key and the SORT key — the grouped two-pass must
    // reproduce Window.partitionBy(group).orderBy(...) row for row,
    // including percent_rank reconstructed from (rn, n)
    val df = cust
      .withColumn("g", when(col("c_custkey") % 11 === 0, lit(null))
        .otherwise((col("c_custkey") % 5).cast("string")))
      .withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal")))
    val w = Window.partitionBy(col("g")).orderBy(col("c_acctbal"), col("c_custkey"))
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("pr", round(percent_rank().over(w), 6))
      .select(col("c_custkey"), col("rn"), col("pr"))
    val ranked = RangeRank.withGroupedRowNumber(
      df, Seq("g"), floor(col("c_acctbal") / 250), Seq(col("c_acctbal"), col("c_custkey")),
      rnName = "rn", nName = "n")
    val got = ranked
      .withColumn("pr", round(
        when(col("n") === 1, lit(0.0))
          .otherwise((col("rn") - 1).cast("double") / (col("n") - 1)), 6))
      .select(col("c_custkey"), col("rn"), col("pr"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }
}
