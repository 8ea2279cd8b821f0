package graft.ingest

import org.apache.spark.sql.types._

/** Explicit StructTypes for the reference's data model (SURVEY.md §1;
  * reference utils/data_loader.py:39–103, utils/user.py:44–72). Kept
  * verbatim-compatible so a user of the reference can ingest the same
  * IMDb TSV dumps through this engine.
  */
object Schemas {

  val titleBasics: StructType = StructType(Seq(
    StructField("tconst", StringType),
    StructField("titleType", StringType),
    StructField("primaryTitle", StringType),
    StructField("originalTitle", StringType),
    StructField("isAdult", IntegerType),
    StructField("startYear", StringType),
    StructField("endYear", StringType),
    StructField("runtimeMinutes", StringType),
    StructField("genres", StringType)))

  val titleRatings: StructType = StructType(Seq(
    StructField("tconst", StringType),
    StructField("averageRating", FloatType),
    StructField("numVotes", IntegerType)))

  val titleAkas: StructType = StructType(Seq(
    StructField("titleId", StringType),
    StructField("ordering", IntegerType),
    StructField("title", StringType),
    StructField("region", StringType),
    StructField("language", StringType),
    StructField("types", StringType),
    StructField("attributes", StringType),
    StructField("isOriginalTitle", IntegerType)))

  val titlePrincipals: StructType = StructType(Seq(
    StructField("tconst", StringType),
    StructField("ordering", IntegerType),
    StructField("nconst", StringType),
    StructField("category", StringType),
    StructField("job", StringType),
    StructField("characters", StringType)))

  val titleEpisode: StructType = StructType(Seq(
    StructField("tconst", StringType),
    StructField("parentTconst", StringType),
    StructField("seasonNumber", StringType),
    StructField("episodeNumber", StringType)))

  val titleCrew: StructType = StructType(Seq(
    StructField("tconst", StringType),
    StructField("directors", StringType),
    StructField("writers", StringType)))

  val nameBasics: StructType = StructType(Seq(
    StructField("nconst", StringType),
    StructField("primaryName", StringType),
    StructField("birthYear", StringType),
    StructField("deathYear", StringType),
    StructField("primaryProfession", StringType),
    StructField("knownForTitles", StringType)))

  val users: StructType = StructType(Seq(
    StructField("userId", StringType, nullable = false),
    StructField("username", StringType, nullable = false),
    StructField("email", StringType),
    StructField("createdAt", TimestampType),
    StructField("isActive", BooleanType)))

  val userRatings: StructType = StructType(Seq(
    StructField("userId", StringType, nullable = false),
    StructField("tconst", StringType, nullable = false),
    StructField("rating", FloatType, nullable = false),
    StructField("ratedAt", TimestampType)))

  val userRecommendations: StructType = StructType(Seq(
    StructField("userId", StringType),
    StructField("tconst", StringType),
    StructField("predictedRating", FloatType)))
}
