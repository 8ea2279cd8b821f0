package graft.users

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.{Schemas, TsvIngest}

/** User/ratings CRUD surface: the reference's User class
  * (utils/user.py:74–179) over parquet tables instead of Postgres.
  *
  * The reference's nondeterminism sources — driver-side uuid4() and
  * datetime.now() (user.py:146–147,163, SURVEY §2.8 F7) — are
  * injectable here so tests and oracles stay deterministic: pass an
  * `ids`/`clock` provider, or use the defaults for production
  * behavior.
  */
class UserService(
    spark: SparkSession,
    baseDir: String,
    ids: () => String = () => java.util.UUID.randomUUID().toString,
    clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {

  private def usersPath = s"$baseDir/users.parquet"
  private def ratingsPath = s"$baseDir/user_ratings.parquet"

  /** Username validation (user.py:130–143): non-empty, 3–50 chars,
    * [a-zA-Z0-9_.-] only.
    */
  def validUsername(u: String): Boolean =
    u != null && u.length >= 3 && u.length <= 50 && u.matches("^[a-zA-Z0-9_.-]+$")

  private def readOrEmpty(path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    try spark.read.schema(schema).parquet(path)
    catch { case _: Throwable => spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema) }

  def users: DataFrame = readOrEmpty(usersPath, Schemas.users)
  def ratings: DataFrame = readOrEmpty(ratingsPath, Schemas.userRatings)

  /** S5 local-rows source + S7 append sink (user.py:144–152). Returns
    * the new userId, or None when validation or uniqueness fails
    * (duplicate check = set-based anti probe, not a collect).
    */
  def createUser(username: String, email: String): Option[String] = {
    if (!validUsername(username)) return None
    val exists = !users.filter(col("username") === username).isEmpty
    if (exists) return None
    val id = ids()
    val row = Row(id, username, email, clock(), true)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(row), Schemas.users)
    TsvIngest.appendParquet(df, usersPath)
    Some(id)
  }

  /** Rating upsert-as-append (user.py:154–166). */
  def addRating(userId: String, tconst: String, rating: Float): Unit = {
    val row = Row(userId, tconst, rating, clock())
    val df = spark.createDataFrame(
      java.util.Arrays.asList(row), Schemas.userRatings)
    TsvIngest.appendParquet(df, ratingsPath)
  }

  /** A4+A1 user stats (app.py:110–136 SQL twin): count + avg rating. */
  def userStats(userId: String): DataFrame =
    ratings.filter(col("userId") === userId)
      .agg(count(lit(1)).as("n_ratings"),
        round(avg(col("rating")), 4).as("avg_rating"))

  /** T3 recent-5 ratings by timestamp (app.py:122–129). */
  def recentRatings(userId: String, n: Int = 5): DataFrame =
    ratings.filter(col("userId") === userId)
      .orderBy(col("ratedAt").desc, col("tconst"))
      .limit(n)
}
