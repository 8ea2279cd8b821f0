package graft

import java.nio.file.Files
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._
import graft.reco.{RatingSynth, Recommender}

/** ALS core invariants (SURVEY §5.2: non-SQL ops get scalatest, not a
  * DuckDB oracle): seeded RMSE bound, top-k shape/order, nonnegative
  * factors, id round-trip through IndexToString, model persistence.
  */
class RecoSpec extends SparkSpec {

  private lazy val ratings = RatingSynth.synthRatings(spark, sfDir)
    .select(col("userId").cast("string").as("userId"),
      col("itemId").cast("string").as("itemId"), col("rating"))

  private lazy val (model, rmseVal) = Recommender.train(ratings)

  test("seeded holdout RMSE is below threshold (recommender.py:139–141 twin)") {
    assert(rmseVal > 0.0 && rmseVal < 1.5, s"rmse=$rmseVal")
  }

  test("recommendForAllUsers: <=k recs per user, ranks 1..k, ordered by predicted") {
    val recs = Recommender.recommendAll(model, 5).cache()
    val byUser = recs.groupBy("userId").agg(count(lit(1)).as("n")).collect()
    assert(byUser.forall(_.getAs[Long]("n") <= 5))
    val badOrder = recs.groupBy("userId")
      .agg(min(when(col("rank") === 1, col("predicted"))).as("p1"),
        max(when(col("rank") > 1, col("predicted"))).as("prest"))
      .filter(col("prest") > col("p1")).count()
    assert(badOrder === 0)
  }

  test("nonnegative factorization yields nonnegative predictions") {
    val recs = Recommender.recommendAll(model, 5)
    assert(recs.filter(col("predicted") < 0).count() === 0)
  }

  test("IndexToString round-trips original ids (U1, no UDFs)") {
    val recs = Recommender.recommendAll(model, 5)
    val users = ratings.select("userId").distinct()
      .collect().map(_.getString(0)).toSet
    val items = ratings.select("itemId").distinct()
      .collect().map(_.getString(0)).toSet
    val recUsers = recs.select("userId").distinct()
      .collect().map(_.getString(0)).toSet
    val recItems = recs.select("itemId").distinct()
      .collect().map(_.getString(0)).toSet
    assert(recUsers.subsetOf(users))
    assert(recItems.subsetOf(items))
  }

  test("cold-start rows are dropped, not NaN (coldStartStrategy=drop)") {
    val scored = model.transform(
      ratings.limit(20).withColumn("userId", lit("no-such-user")))
    // handleInvalid=skip drops unknown ids before ALS sees them
    assert(scored.filter(col("prediction").isNaN).count() === 0)
  }

  test("model persistence round-trip (S8, recommender.py:136/44)") {
    val dir = Files.createTempDirectory("graft-als").toString + "/model"
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val a = Recommender.recommendAll(model, 3).orderBy("userId", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val b = Recommender.recommendAll(loaded, 3).orderBy("userId", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(a.toSeq === b.toSeq)
  }

  test("reference hyperparameters train without OOM and beat the ratings stddev") {
    // recommender.py:106–123's exact point: rank 200 / maxIter 40 /
    // reg 0.4, 3-fold CV. The RMSE here is the recorded BASELINE.md run.
    val Array(tr, te) = ratings.randomSplit(Array(0.8, 0.2), 42L)
    val best = Recommender.trainCV(tr, Recommender.referenceConfig)
    val r = Recommender.rmse(best, te)
    info(f"reference-config holdout RMSE = $r%.4f")
    // predicting the global mean would score ~the rating stddev (~1.0
    // on the tier synthesis); the factorization must do better
    assert(r > 0.0 && r < 1.1, s"rmse=$r")
  }

  test("3-fold CrossValidator returns a usable best model (M4)") {
    val cfg = Recommender.Config(rank = 4, maxIter = 3, numFolds = 3)
    val best = Recommender.trainCV(ratings, cfg)
    val recs = Recommender.recommendAll(best, 3)
    assert(recs.count() > 0)
  }
}
