package graft.app

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's IMDbRatingsConverter (utils/imb_rating.py:59–127)
  * made distributed: the reference loops users in driver Python,
  * sampling 24–56 suitable titles each and drawing tier-weighted
  * stars row-by-row; here the whole synthesis is one declarative plan
  * — genre matching via array overlap, per-user sampling via a
  * seeded-hash row_number window, and the uniform draw derived from
  * xxhash64 so results are reproducible under any partitioning.
  *
  * Scale: the candidate pool is top-500 titles (imb_rating.py:55) —
  * broadcast side of the users×pool genre match; users stream.
  */
object RatingsConverter {

  /** Reference tier table (imb_rating.py:116–124, README.md:126–130):
    * star drawn against cumulative weights from a uniform `u` ∈ [0,1).
    */
  def tierStar(aggRating: Column, u: Column): Column =
    when(aggRating >= 8.0,
      when(u < 0.10, 3).when(u < 0.50, 4).otherwise(5))
      .when(aggRating >= 7.0,
        when(u < 0.05, 2).when(u < 0.40, 3).when(u < 0.85, 4).otherwise(5))
      .when(aggRating >= 6.0,
        when(u < 0.05, 1).when(u < 0.35, 2).when(u < 0.75, 3).otherwise(4))
      .otherwise(when(u < 0.40, 1).when(u < 0.80, 2).otherwise(3))

  /** Deterministic uniform in [0,1) from key columns — replaces the
    * reference's seedless `random` so the oracle/tests are stable.
    */
  def hashUniform(seed: Long, keys: Column*): Column =
    pmod(xxhash64((keys :+ lit(seed)): _*), lit(1000000L)).cast("double") / 1000000.0

  /** Synthesize user_ratings:
    * users(userId, preferredGenres array<string>) ×
    * pool(tconst, averageRating, genres) →
    * (userId, tconst, rating float).
    *
    * Per reference: a user's suitable titles are those sharing any
    * preferred genre (normalized strip+lower, imb_rating.py:107);
    * empty preferences fall back to the whole pool; each user rates
    * 24–56 titles (or all suitable ones if fewer).
    */
  def synthesize(users: DataFrame, pool: DataFrame, seed: Long = 42): DataFrame = {
    val p = broadcast(pool.select(col("tconst"), col("averageRating"),
      MovieQueries.normalizedGenres(col("genres")).as("pg")))
    val u = users.select(col("userId"),
      transform(col("preferredGenres"), g => lower(trim(g))).as("ug"))

    val suitable = u.join(p,
      size(col("ug")) === 0 || arrays_overlap(col("ug"), col("pg")))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("userId"))
      .orderBy(hashUniform(seed, col("userId"), col("tconst")), col("tconst"))
    val target = (lit(24) + pmod(xxhash64(col("userId"), lit(seed)), lit(33L))).cast("int")

    suitable
      .withColumn("rn", row_number().over(w))
      .withColumn("target", target)
      .filter(col("rn") <= col("target"))
      .withColumn("u", hashUniform(seed + 1, col("userId"), col("tconst")))
      .select(col("userId"), col("tconst"),
        tierStar(col("averageRating"), col("u")).cast("float").as("rating"))
  }
}
