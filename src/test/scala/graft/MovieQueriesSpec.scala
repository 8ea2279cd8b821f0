package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.app.MovieQueries
import graft.ingest.Schemas

/** Reference-shaped fixtures (FIXTURES.md §B) pinning the serving
  * layer's exact semantics: every filter boundary of the
  * popular-movies query, `\N`/null genre guards, and the pandas-step
  * equivalents (vocabulary, anti-membership).
  */
class MovieQueriesSpec extends SparkSpec {

  private def basics = {
    val rows = Seq(
      // tconst, type, primary, original, isAdult, startYear, endYear, runtime, genres
      Row("tt01", "movie", "In: all bounds met exactly", "o", 0, "1980", null, "92", "Action,Thriller"),
      Row("tt02", "movie", "Out: year 1979", "o", 0, "1979", null, "92", "Drama"),
      Row("tt03", "movie", "Out: non-numeric year", "o", 0, "19XX", null, "101", "Action"),
      Row("tt04", "movie", "Out: null year", "o", 0, null, null, "101", "Action"),
      Row("tt05", "tvSeries", "Out: wrong type", "o", 0, "1999", null, "45", "Drama"),
      Row("tt06", "movie", "Out: adult", "o", 1, "1999", null, "93", "Horror"),
      Row("tt07", "movie", "In: comfortable margins", "o", 0, "2005", null, "120", " Sci-Fi ,Drama"),
      Row("tt08", "movie", "Genre is \\N sentinel", "o", 0, "2001", null, "99", "\\N"),
      Row("tt09", "movie", "Genre null", "o", 0, "2002", null, "99", null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.titleBasics)
  }

  private def ratings = {
    val rows = Seq(
      Row("tt01", 6.5f, 25000), // exactly on both inclusive bounds
      Row("tt02", 9.0f, 990000),
      Row("tt03", 9.0f, 990000),
      Row("tt04", 9.0f, 990000),
      Row("tt05", 9.0f, 990000),
      Row("tt06", 9.0f, 990000),
      Row("tt07", 7.2f, 50000),
      Row("tt08", 8.0f, 30000),
      Row("tt09", 8.0f, 29000),
      Row("tt10", 6.49f, 999999), // rating just under
      Row("tt11", 9.9f, 24999))   // votes just under
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.titleRatings)
  }

  test("popular movies: every boundary behaves like the reference (app.py:229–236)") {
    val got = MovieQueries.popularMovies(basics, ratings)
      .select("tconst").collect().map(_.getString(0)).toSet
    assert(got === Set("tt01", "tt07", "tt08", "tt09"))
  }

  test("ordering is votes desc and output schema matches the serving contract") {
    val rows = MovieQueries.popularMovies(basics, ratings).collect()
    assert(rows.map(_.getAs[Int]("votes")).toSeq ===
      rows.map(_.getAs[Int]("votes")).sortBy(-_).toSeq)
    assert(rows.head.schema.fieldNames.toSeq ===
      Seq("tconst", "title", "genres", "year", "imdb_rating", "votes"))
  }

  test("genre vocabulary skips null and \\N, trims entries (app.py:352–355)") {
    val vocab = MovieQueries.genreVocabulary(basics)
      .collect().map(_.getString(0)).toSet
    assert(vocab === Set("Action", "Thriller", "Drama", "Horror", "Sci-Fi"))
  }

  test("normalizedGenres matches imb_rating.py:107 incl. null guard") {
    val df = basics.select(col("tconst"),
      MovieQueries.normalizedGenres(col("genres")).as("g"))
    val byId = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(byId("tt07") === Seq("sci-fi", "drama"))
    assert(byId("tt09") === Seq("")) // null genres → [""] like ("" or "").split(",")
  }

  test("excludeRated is the pandas anti-membership (app.py:342–344)") {
    import spark.implicits._
    val rated = Seq("tt01").toDF("tconst")
    val got = MovieQueries.excludeRated(
      MovieQueries.popularMovies(basics, ratings), rated)
      .select("tconst").collect().map(_.getString(0)).toSet
    assert(got === Set("tt07", "tt08", "tt09"))
  }

  test("candidate pool: vote floor + top-N by votes (imb_rating.py:44–56)") {
    val pool = MovieQueries.candidatePool(basics, ratings, minVotes = 29000, limit = 3)
      .collect()
    assert(pool.map(_.getAs[String]("tconst")).toSeq.take(2) === Seq("tt02", "tt03"))
    assert(pool.length === 3)
  }

  test("user stats + recent ratings over reference-shaped user_ratings") {
    val ur = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("u1", "tt01", 4.0f, Timestamp.valueOf("2026-01-03 00:00:00")),
      Row("u1", "tt07", 5.0f, Timestamp.valueOf("2026-01-05 00:00:00")),
      Row("u2", "tt01", 1.0f, Timestamp.valueOf("2026-01-04 00:00:00")))),
      Schemas.userRatings)
    val stats = MovieQueries.userStats(ur, "u1").collect().head
    assert(stats.getAs[Long]("n_ratings") === 2)
    assert(stats.getAs[Double]("avg_rating") === 4.5)
    val recent = MovieQueries.recentRatings(ur, basics, "u1").collect()
    assert(recent.head.getAs[String]("title") === "In: comfortable margins")
  }
}
