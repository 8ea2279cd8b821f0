package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global ranking: an unpartitioned `Window.orderBy(...)`
  * moves the ENTIRE table into one task — fine on a 1500-row fixture,
  * fatal on a 100 TB dimension. This helper computes the identical
  * exact global row_number in two distributed passes:
  *
  *  1. bucket rows by a coarse range expression over the leading sort
  *     key (value-contiguous, so bucket order == global order), and
  *     rank WITHIN buckets — one hash shuffle, every bucket a normal
  *     task;
  *  2. add per-bucket offsets from the cumulative counts of preceding
  *     buckets — a broadcast join against a table with one row per
  *     bucket (the only single-partition window runs over THAT tiny
  *     table, O(buckets) rows, never the data).
  *
  * The result is exact and partitioning-invariant for any total
  * ordering (callers pass a unique tiebreak column, as they already
  * must for deterministic ranking). Bucket boundaries only affect task
  * sizing, never values. At 100 TB the bucket expression would be
  * derived from `approx_percentile` over the sort key (equi-depth
  * boundaries) instead of a fixed value width; the two-pass shape is
  * unchanged.
  */
object RangeRank {

  /** Adds `rnName` (global row_number, 1-based) and `nName` (total row
    * count) columns. `bucket` MUST be monotone non-decreasing in the
    * leading sort key (e.g. `floor(col("x") / width)` when sorting by
    * `x`), and `sortCols` must be a total order. A null bucket (null
    * leading sort key) is handled: the bucket join is null-safe and a
    * null bucket sorts first, matching `Window.orderBy`'s default
    * asc-nulls-first placement.
    */
  def withGlobalRowNumber(df: DataFrame, bucket: Column, sortCols: Seq[Column],
      rnName: String = "global_rn", nName: String = "global_n"): DataFrame = {
    // withColumn silently REPLACES an existing column — a collision with
    // the internal helper names would corrupt the ranking, so refuse.
    val reserved = Set("__bucket", "__obucket", "__local_rn", "__offset", rnName, nName)
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"RangeRank: input columns collide with internal/output names: ${clash.mkString(", ")}")

    val withB = df.withColumn("__bucket", bucket)
    val wLocal = Window.partitionBy(col("__bucket")).orderBy(sortCols: _*)
    val local = withB.withColumn("__local_rn", row_number().over(wLocal))

    // one row per bucket; these windows single-partition O(buckets)
    // rows, not the data
    val wPrev = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = withB.groupBy(col("__bucket")).agg(count(lit(1)).as("__bn"))
      .select(col("__bucket").as("__obucket"),
        coalesce(sum(col("__bn")).over(wPrev), lit(0L)).as("__offset"),
        sum(col("__bn")).over(wAll).as(nName))

    // null-safe equality: a plain equi-join would silently DROP rows in
    // the null bucket, where Window.orderBy would rank them (first).
    local.join(broadcast(offsets), col("__bucket") <=> col("__obucket"))
      .withColumn(rnName, col("__offset") + col("__local_rn"))
      .drop("__bucket", "__obucket", "__local_rn", "__offset")
  }

  /** PER-GROUP exact global row_number — `withGlobalRowNumber`
    * generalized so that every group (e.g. a language) gets its own
    * independent total order, WITHOUT a per-group `Window.partitionBy
    * (group).orderBy(...)` over the data: at corpus scale one dominant
    * group (half the web is English) lands in a single window task
    * sorting billions of rows. Here the data-level window partitions by
    * (group, bucket) — the bucket dial splits the dominant group into
    * as many tasks as needed — and the only per-group-ordered window
    * runs over the per-(group, bucket) COUNT table (O(groups·buckets)
    * rows, hash-partitioned by group). Adds `rnName` (1-based rank
    * within the row's group) and `nName` (the group's total count);
    * exact and partitioning-invariant for any total `sortCols` order.
    * `bucket` must be monotone non-decreasing in the leading sort key,
    * exactly as in `withGlobalRowNumber`.
    */
  def withGroupedRowNumber(df: DataFrame, groupCols: Seq[String],
      bucket: Column, sortCols: Seq[Column],
      rnName: String = "group_rn", nName: String = "group_n"): DataFrame = {
    val helper = groupCols.map(n => s"__g_$n")
    val reserved = Set("__bucket", "__obucket", "__local_rn", "__offset",
      "__bn", rnName, nName) ++ helper
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"RangeRank: input columns collide with internal/output names: ${clash.mkString(", ")}")

    val gcols = groupCols.map(col)
    val withB = df.withColumn("__bucket", bucket)
    val wLocal = Window.partitionBy((gcols :+ col("__bucket")): _*)
      .orderBy(sortCols: _*)
    val local = withB.withColumn("__local_rn", row_number().over(wLocal))

    // one row per (group, bucket); the per-group cumulative windows run
    // over THIS table only — tiny, hash-partitioned on the group key
    val counts = withB.groupBy((gcols :+ col("__bucket")): _*)
      .agg(count(lit(1)).as("__bn"))
      .select(groupCols.map(n => col(n).as(s"__g_$n")) ++
        Seq(col("__bucket").as("__obucket"), col("__bn")): _*)
    val gHelper = helper.map(col)
    val wPrev = Window.partitionBy(gHelper: _*).orderBy(col("__obucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(gHelper: _*).orderBy(col("__obucket"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts.select(gHelper ++ Seq(col("__obucket"),
      coalesce(sum(col("__bn")).over(wPrev), lit(0L)).as("__offset"),
      sum(col("__bn")).over(wAll).as(nName)): _*)

    // null-safe on every key: null groups and null buckets must rank,
    // not drop (Window.partitionBy keeps them)
    val cond = (groupCols.zip(helper).map { case (n, h) => col(n) <=> col(h) } :+
      (col("__bucket") <=> col("__obucket"))).reduce(_ && _)
    local.join(broadcast(offsets), cond)
      .withColumn(rnName, col("__offset") + col("__local_rn"))
      .drop(helper ++ Seq("__bucket", "__obucket", "__local_rn", "__offset"): _*)
  }

  /** The self-tuning form: derives equi-depth bucket boundaries for
    * `sortCol` from `approx_percentile` (one tiny broadcast aggregate),
    * then ranks exactly as `withGlobalRowNumber`. This is the variant
    * the fixed-width callers graduate to at 100 TB — boundaries adapt
    * to ANY value distribution (skew included: equal-depth buckets mean
    * equal task sizes), while the data still makes exactly two passes.
    *
    * Correctness does not depend on percentile accuracy: boundaries
    * only place rows in buckets, and `count(boundaries <= x)` is
    * monotone in `x`, so bucket order always equals value order. Null
    * sort keys take bucket 0 and sort first inside it — identical to
    * `Window.orderBy`'s asc-nulls-first.
    */
  def withGlobalRowNumberAuto(df: DataFrame, sortCol: Column,
      tieBreaks: Seq[Column], buckets: Int = 64,
      rnName: String = "global_rn", nName: String = "global_n"): DataFrame = {
    // Same refusal as withGlobalRowNumber, for this variant's own helper:
    // a pre-existing __bounds column would make the crossJoin ambiguous.
    require(!df.columns.contains("__bounds"),
      "RangeRank: input column __bounds collides with an internal helper name")
    val probs = array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*)
    val bounds = df.agg(
      percentile_approx(sortCol, probs, lit(10000)).as("__bounds"))
    val withBounds = df.crossJoin(broadcast(bounds))
    val bucket = aggregate(col("__bounds"), lit(0),
      (acc, b) => acc + when(sortCol >= b, 1).otherwise(0))
    withGlobalRowNumber(withBounds, bucket, sortCol +: tieBreaks, rnName, nName)
      .drop("__bounds")
  }

  /** SQL-standard ntile from a global row_number: the first `n mod k`
    * tiles get `floor(n/k)+1` rows, the rest `floor(n/k)` — identical
    * to `ntile(k)` over the same total order.
    */
  def ntileOf(rn: Column, n: Column, k: Int): Column = {
    val base = floor(n / k)
    val rem = n % k
    val cut = rem * (base + 1)
    when(rn <= cut, ceil(rn.cast("double") / (base + 1)))
      .otherwise(rem + ceil((rn - cut).cast("double") / base))
      .cast("int")
  }
}
