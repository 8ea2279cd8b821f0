package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.app.{MovieQueries, RatingsConverter}
import graft.reco.Recommender

/** The reference's full E2 lifecycle (recommender.py __main__ smoke:
  * synthesize → train → recommend → save → re-read, SURVEY §3), on
  * reference-shaped fixtures, end to end through parquet.
  */
class EndToEndSpec extends SparkSpec {

  private val poolSchema = StructType(Seq(
    StructField("tconst", StringType),
    StructField("averageRating", FloatType),
    StructField("genres", StringType)))

  private def pool = spark.createDataFrame(
    spark.sparkContext.parallelize((1 to 40).map { i =>
      val rating = 5.5f + (i % 8) * 0.5f // spans all four tiers
      val genres = i % 3 match {
        case 0 => "Action,Thriller"
        case 1 => "Drama"
        case 2 => "Comedy, Drama"
      }
      Row(f"tt$i%04d", rating, genres)
    }), poolSchema)

  private def users = {
    import spark.implicits._
    Seq(
      ("u1", Seq("Action")),
      ("u2", Seq("drama")), // case-insensitive per imb_rating.py:107
      ("u3", Seq.empty[String]), // no prefs → whole pool
      ("u4", Seq("Comedy", "Action"))).toDF("userId", "preferredGenres")
  }

  test("synthesis: per-user counts, genre suitability, tier-consistent stars") {
    val ur = RatingsConverter.synthesize(users, pool).cache()
    val counts = ur.groupBy("userId").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // u1: Action titles = i%3==0 → 13 of 40 suitable (fewer than target)
    assert(counts("u1") <= 14)
    // u3 has the whole pool; target is 24..56, pool is 40
    assert(counts("u3") >= 24)
    assert(ur.filter(col("rating") < 1 || col("rating") > 5).count() === 0)
    // stars must respect the tier of their title's aggregate rating
    val joined = ur.join(pool, Seq("tconst"))
    assert(joined.filter(col("averageRating") >= 8.0 && col("rating") < 3).count() === 0)
    assert(joined.filter(col("averageRating") < 6.0 && col("rating") > 3).count() === 0)
  }

  test("synthesis is deterministic under repartitioning") {
    val a = RatingsConverter.synthesize(users, pool)
      .collect().map(r => (r.getString(0), r.getString(1), r.getFloat(2))).toSet
    val b = RatingsConverter.synthesize(users.repartition(7), pool.repartition(5))
      .collect().map(r => (r.getString(0), r.getString(1), r.getFloat(2))).toSet
    assert(a === b)
  }

  test("full lifecycle: synthesize → train → recommend → save → serve") {
    val ur = RatingsConverter.synthesize(users, pool)
      .select(col("userId"), col("tconst").as("itemId"), col("rating"))
    val (model, rmseVal) = Recommender.train(ur.withColumnRenamed("itemId", "itemId"),
      Recommender.Config(rank = 4, maxIter = 5))
    assert(rmseVal < 2.0, s"rmse=$rmseVal")

    val recs = Recommender.recommendAll(model, 3)
      .select(col("userId"), col("itemId").as("tconst"),
        col("predicted").cast("float").as("predictedRating"))

    // S6 sink + re-read (recommender.py:184–197 → app.py:138–155)
    val out = Files.createTempDirectory("graft-e2e").toString + "/user_recommendations"
    recs.write.mode("overwrite").parquet(out)
    val basics = pool.select(col("tconst"),
      col("tconst").as("primaryTitle"), col("genres"))
      .withColumn("titleType", lit("movie"))
    val served = MovieQueries.savedRecommendations(
      spark.read.parquet(out), basics, "u1")
    val rows = served.collect()
    assert(rows.nonEmpty && rows.length <= 3)
    assert(rows.forall(_.getAs[String]("title") != null))
    // ordering: predicted desc
    val preds = rows.map(_.getAs[Float]("predictedRating"))
    assert(preds.zip(preds.tail).forall { case (x, y) => x >= y })
  }
}
