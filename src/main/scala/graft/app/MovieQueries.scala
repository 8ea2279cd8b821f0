package graft.app

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference application's serving layer (its Streamlit app's
  * four queries plus the synthesis candidate pool), re-expressed as
  * engine functions over reference-shaped DataFrames. Semantics are
  * pinned to the reference line-by-line — including the quirks:
  * string-regex year validation before the cast, inclusive filter
  * boundaries, and the `\N`-aware genre handling.
  *
  * A user of the reference can point these at IMDb-shaped tables
  * (ingested via graft.ingest) and get the app's exact result sets —
  * with the driver-side pandas steps (anti-membership, genre
  * vocabulary, contains-filter) lifted into distributed operators.
  */
object MovieQueries {

  /** Popular-movies serving query (reference app.py:218–236):
    * type=movie, non-adult, digits-only startYear >= minYear,
    * votes >= minVotes, rating >= minRating, by votes desc.
    * tconst added as deterministic tiebreak (the reference's bare
    * ORDER BY numVotes is ambiguous under ties).
    */
  def popularMovies(basics: DataFrame, ratings: DataFrame,
      minYear: Int = 1980, minVotes: Int = 25000, minRating: Double = 6.5,
      limit: Int = 100): DataFrame =
    basics.join(ratings, Seq("tconst"))
      .filter(col("titleType") === "movie" &&
        col("isAdult") === 0 &&
        col("startYear").rlike("^[0-9]+$") &&
        col("startYear").cast("int") >= minYear &&
        col("numVotes") >= minVotes &&
        col("averageRating") >= minRating)
      .select(col("tconst"), col("primaryTitle").as("title"), col("genres"),
        col("startYear").cast("int").as("year"),
        col("averageRating").as("imdb_rating"), col("numVotes").as("votes"))
      .orderBy(col("votes").desc, col("tconst"))
      .limit(limit)

  /** Synthesis candidate pool (reference imb_rating.py:44–56): top-N
    * titles by votes above a vote floor.
    */
  def candidatePool(basics: DataFrame, ratings: DataFrame,
      minVotes: Int = 10000, limit: Int = 500): DataFrame =
    ratings.join(basics, Seq("tconst"))
      .filter(col("numVotes") >= minVotes)
      .select(col("tconst"), col("primaryTitle").as("title"),
        col("averageRating"), col("numVotes"), col("genres"))
      .orderBy(col("numVotes").desc, col("tconst"))
      .limit(limit)

  /** Genre vocabulary (reference app.py:352–355, lifted from pandas):
    * drop null/`\N` genre strings, split on comma, trim, distinct.
    */
  def genreVocabulary(basics: DataFrame): DataFrame =
    basics
      .filter(col("genres").isNotNull && col("genres") =!= "\\N")
      .select(explode(split(col("genres"), ",")).as("genre"))
      .select(trim(col("genre")).as("genre"))
      .filter(col("genre") =!= "")
      .distinct()
      .orderBy(col("genre"))

  /** Genre membership the reference checks in two places with two
    * normalizations: app.py:363–366 (case-insensitive contains) —
    * used here; imb_rating.py:107's strip+lower set handling is the
    * `normalizedGenres` column below.
    */
  def filterByGenre(movies: DataFrame, genre: String): DataFrame =
    movies.filter(lower(col("genres")).contains(genre.toLowerCase))

  /** imb_rating.py:107: `[(g or "").strip().lower() for g in
    * (genres or "").split(",")]` as a native column.
    */
  def normalizedGenres(genres: Column): Column =
    transform(split(coalesce(genres, lit("")), ","), g => lower(trim(g)))

  /** Anti-membership of already-rated titles (reference app.py:342–344
    * pandas `~isin`), as a left-anti join that scales set-based.
    */
  def excludeRated(movies: DataFrame, ratedTconsts: DataFrame): DataFrame =
    movies.join(ratedTconsts.select("tconst"), Seq("tconst"), "left_anti")

  /** Saved-recommendations view (reference app.py:138–155):
    * recommendations enriched with titles, by predicted desc.
    */
  def savedRecommendations(recs: DataFrame, basics: DataFrame,
      userId: String, limit: Int = 50): DataFrame =
    recs.filter(col("userId") === userId)
      .join(basics.select(col("tconst"), col("primaryTitle").as("title"),
        col("genres")), Seq("tconst"), "left")
      .orderBy(col("predictedRating").desc, col("tconst"))
      .limit(limit)

  /** User stats (reference app.py:110–136): rating count + average. */
  def userStats(userRatings: DataFrame, userId: String): DataFrame =
    userRatings.filter(col("userId") === userId)
      .agg(count(lit(1)).as("n_ratings"),
        round(avg(col("rating")), 4).as("avg_rating"))

  /** Recent ratings (reference app.py:122–129): latest 5, enriched. */
  def recentRatings(userRatings: DataFrame, basics: DataFrame,
      userId: String, limit: Int = 5): DataFrame =
    userRatings.filter(col("userId") === userId)
      .join(basics.select(col("tconst"), col("primaryTitle").as("title")),
        Seq("tconst"), "left")
      .orderBy(col("ratedAt").desc, col("tconst"))
      .limit(limit)
}
