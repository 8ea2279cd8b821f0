package graft.reco

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{IndexToString, StringIndexer, StringIndexerModel}
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ALS collaborative-filtering core: the reference's Recommender
  * (utils/recommender.py:64–197) rebuilt M1–M6 with one deliberate
  * change — the per-row Python UDFs that map indexed ids back to
  * originals (recommender.py:164–174, SURVEY §2.10 U1) are replaced
  * by `IndexToString` transformers, keeping the whole enrichment path
  * inside codegen with no serialization barrier.
  *
  * Scale posture: ALS itself is MLlib's blocked factorization
  * (distributed normal-equation solves per user/item block); the
  * explode + back-map + join enrichment downstream is all native.
  */
object Recommender {

  /** Defaults mirror the reference grid (recommender.py:106–110) but
    * stay overridable: rank 200 / iter 40 is overparameterized for
    * fixtures (SURVEY §7 risks), so tests use small values.
    */
  final case class Config(
      rank: Int = 8,
      maxIter: Int = 5,
      regParam: Float = 0.1f,
      seed: Long = 42L,
      numFolds: Int = 3)

  /** The reference's exact training point (recommender.py:106–123):
    * rank 200, maxIter 40, regParam 0.4, 3-fold CV. Heavily
    * overparameterized for the synthetic fixtures (RecoSpec trains it
    * on sf0.001 in-suite; the recorded RMSE lives in BASELINE.md) but
    * runs in the default test-session memory — rank-200 factor blocks
    * on fixture-sized user/item sets are megabytes, not gigabytes. At
    * production scale the memory driver is (users+items)·rank·4 bytes
    * across executors, all executor-side: no driver-memory bump needed
    * beyond Spark defaults until recommendForAllUsers collects.
    *
    * REQUIREMENT at maxIter ≳ 20: `sc.setCheckpointDir(...)` must be
    * set (SparkSpec/GraftEngine callers do) — ALS truncates its factor
    * lineage by checkpointing every 10 iterations, and without a dir
    * the 40-iter lineage overflows the task-deserialization stack.
    */
  val referenceConfig: Config =
    Config(rank = 200, maxIter = 40, regParam = 0.4f, seed = 42L, numFolds = 3)

  /** M1+M3: StringIndexer×2 + ALS pipeline (recommender.py:70–82). */
  def pipeline(cfg: Config): Pipeline = {
    val userIdx = new StringIndexer().setInputCol("userId")
      .setOutputCol("userIndexed").setHandleInvalid("skip")
    val itemIdx = new StringIndexer().setInputCol("itemId")
      .setOutputCol("itemIndexed").setHandleInvalid("skip")
    val als = new ALS()
      .setUserCol("userIndexed").setItemCol("itemIndexed").setRatingCol("rating")
      .setRank(cfg.rank).setMaxIter(cfg.maxIter).setRegParam(cfg.regParam)
      .setNonnegative(true).setImplicitPrefs(false)
      .setColdStartStrategy("drop").setSeed(cfg.seed)
    new Pipeline().setStages(Array(userIdx, itemIdx, als))
  }

  /** M5+A6: RMSE of a fitted model on a holdout (recommender.py:139–141). */
  def rmse(model: PipelineModel, test: DataFrame): Double = {
    val eval = new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol("rating").setPredictionCol("prediction")
    eval.evaluate(model.transform(test))
  }

  /** Plain fit on an 80/20 split (recommender.py:104): returns
    * (model, rmse). Ratings schema: userId/itemId string, rating float.
    */
  def train(ratings: DataFrame, cfg: Config = Config()): (PipelineModel, Double) = {
    // Cache the (possibly expensive) ratings lineage: the two indexer
    // fits, the ALS fit, and the holdout scoring each traverse it.
    val cached = ratings.cache()
    try {
      val Array(train, test) = cached.randomSplit(Array(0.8, 0.2), cfg.seed)
      val model = pipeline(cfg).fit(train)
      (model, rmse(model, test))
    } finally cached.unpersist()
  }

  /** `train` without the holdout RMSE job — for serving callers that
    * only keep the model (the session memo, trainAndRecommend): the
    * tuple form scored the 20% holdout on every build and both callers
    * threw the number away (guide §1.2: don't compute what you
    * discard). IDENTICAL model: same cache, same seeded split (the fit
    * still trains on the 80% side), same pipeline fit.
    */
  def trainModel(ratings: DataFrame, cfg: Config = Config()): PipelineModel = {
    val cached = ratings.cache()
    try {
      val Array(train, _) = cached.randomSplit(Array(0.8, 0.2), cfg.seed)
      pipeline(cfg).fit(train)
    } finally cached.unpersist()
  }

  /** M4: 3-fold CrossValidator over the reference's single grid point
    * (recommender.py:112–127). Returns the best model.
    */
  def trainCV(ratings: DataFrame, cfg: Config = Config()): PipelineModel = {
    val eval = new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol("rating").setPredictionCol("prediction")
    val cv = new CrossValidator()
      .setEstimator(pipeline(cfg))
      .setEvaluator(eval)
      .setEstimatorParamMaps(new ParamGridBuilder().build())
      .setNumFolds(cfg.numFolds)
      .setSeed(cfg.seed)
    cv.fit(ratings).bestModel.asInstanceOf[PipelineModel]
  }

  /** M6 + U1: top-k per user, exploded and mapped back to original
    * ids with IndexToString (no UDFs — recommender.py:145–174 rebuilt).
    * Output: userId, itemId, rank (1-based), predicted float.
    *
    * `userLimit` bounds the scored user set (recommendForUserSubset on
    * the first N indexed users): recommendForAllUsers is a blocked
    * users×items cross product, so production at scale batches the
    * user side rather than scoring the full cross in one job.
    */
  def recommendAll(model: PipelineModel, k: Int,
      userLimit: Option[Int] = None): DataFrame = {
    val userIdx = model.stages(0).asInstanceOf[StringIndexerModel]
    val itemIdx = model.stages(1).asInstanceOf[StringIndexerModel]
    val als = model.stages(2).asInstanceOf[ALSModel]
    val recs = userLimit.map { n =>
      val subset = als.userFactors.select(col("id").cast("double").as("userIndexed"))
        .filter(col("userIndexed") < n)
      als.recommendForUserSubset(subset, k)
    }.getOrElse(als.recommendForAllUsers(k))
      .select(col("userIndexed"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("userIndexed").cast("double"),
        col("rec.itemIndexed").cast("double").as("itemIndexed"),
        (col("pos") + 1).as("rank"),
        col("rec.rating").as("predicted"))
    val backUser = new IndexToString().setInputCol("userIndexed")
      .setOutputCol("userId").setLabels(userIdx.labelsArray(0))
    val backItem = new IndexToString().setInputCol("itemIndexed")
      .setOutputCol("itemId").setLabels(itemIdx.labelsArray(0))
    backItem.transform(backUser.transform(recs))
      .select(col("userId"), col("itemId"), col("rank"), col("predicted"))
  }
}
