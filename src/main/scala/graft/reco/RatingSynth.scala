package graft.reco

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** F6: seeded weighted-choice rating synthesis, the reference's
  * IMDbRatingsConverter lifted into native Spark expressions
  * (reference utils/imb_rating.py:99–127; tier table README.md:126–130).
  *
  * The reference draws per-row random stars with tier-dependent
  * weights from an item's aggregate rating. Here the "aggregate
  * rating" analog is derived from the lineitem fixture (6 + 4·avg
  * discount-complement per part, landing in the reference's 6–10
  * band), and the weighted choice is a seeded `rand(42)` against the
  * tier's cumulative weights — fully distributed, no driver loop
  * (the reference does this row-by-row in Python).
  */
object RatingSynth {

  /** (userId, itemId, rating) interactions: users = customers, items =
    * parts, one interaction per lineitem row (sampled
    * deterministically by orderkey to bound training cost at bench SF).
    */
  def synthRatings(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 3 === 0) // deterministic sample, not rand
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_discount"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val inter = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey").as("userId"), col("l_partkey").as("itemId"),
        col("l_orderkey"), col("l_linenumber"), col("l_discount"))

    // Aggregate item score in the reference's ~5.5–8.5 rating band,
    // from popularity quartiles (the reference's numVotes analog) so
    // all four tier branches are exercised. Quartiling uses the
    // range-bucketed two-pass ranking (ext.RangeRank) — bucketing on
    // `pop` itself (the leading sort key, a small-int count domain) —
    // so even this dimension-side ranking never funnels the table into
    // a single-partition Window.orderBy.
    val pops = inter.groupBy(col("itemId")).agg(count(lit(1)).as("pop"))
    val ranked = graft.ext.RangeRank.withGlobalRowNumber(
      pops, col("pop"), Seq(col("pop"), col("itemId")))
    val itemScore = ranked
      .withColumn("q", graft.ext.RangeRank.ntileOf(col("global_rn"), col("global_n"), 4))
      .select(col("itemId"),
        (lit(5.0) + col("q") * 0.9).as("agg_rating"))

    // Reference tier table via the shared mapping (RatingsConverter
    // .tierStar). The uniform draw is materialized ONCE per row ("u")
    // and derived from the row's keys via hashUniform, not rand(seed):
    // rand seeds per *partition*, so after the shuffle join its values
    // depend on partition assignment — hash-of-keys is invariant under
    // any partitioning, keeping the synthesis byte-stable across runs.
    val star = graft.app.RatingsConverter.tierStar(col("agg_rating"), col("u"))

    // (userId, itemId, l_orderkey) is NOT row-unique — one order can
    // carry the same part on several lineitems — so the draw is keyed on
    // l_linenumber too, making it per-row unique.
    inter.join(itemScore, Seq("itemId"))
      .withColumn("u", graft.app.RatingsConverter.hashUniform(
        42, col("userId"), col("itemId"), col("l_orderkey"), col("l_linenumber")))
      .select(col("userId"), col("itemId"),
        star.cast("float").as("rating"))
  }
}
