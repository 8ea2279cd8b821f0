package graft.reco

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.TextOps

/** Learned quality filter — the GPT-3/CCNet-style classifier pass a
  * large-scale curation pipeline runs alongside its rule cascade:
  * logistic regression over cheap per-row signals (length, alphabetic
  * ratio, stopword ratio, language flag — the same signal family the
  * rules read) PLUS a hashed bag-of-words block (the GPT-3 hashing
  * trick: fixed 2^12-dim sparse map, no vocabulary build; widen the
  * space when real vocabularies collide — the dial trades coefficient
  * size against collision noise, nothing else changes), trained to
  * reproduce a teacher verdict — here the shared q107 `funnelVerdict`,
  * so classifier and rule funnel can never drift apart on what "kept"
  * means. The real-world use is distillation: the teacher is expensive
  * or partial (human labels, an LM judge, a curated-reference contrast
  * set) and hard-edged; the student is a per-row linear scorer cheap
  * enough for every doc of a 100 TB crawl whose SOFT probability
  * feeds threshold tuning and head/middle/tail bucketing (q130).
  *
  * Scale posture: every feature is a stateless per-row map (no
  * vocabulary build, no shuffle); LBFGS aggregates gradients as
  * map-side partials (treeAggregate), so a fit epoch shuffles
  * O(numFeatures) per partition, never rows; the trained coefficient
  * vector broadcasts and scoring is map-only. The train/test split is
  * md5-deterministic (the q82 rule: pure function of doc_id —
  * partition- and rerun-invariant, no seeded RNG); one explicit
  * repartition on doc_id pins the fold layout so the fit is
  * reproducible run to run. Rows-only by contract (LBFGS float sums
  * aren't bit-stable across engines); QualityClassifierSpec pins the
  * invariants that matter: held-out AUC floor, probability bounds,
  * split disjointness, and per-source coverage.
  */
object QualityClassifier {

  /** The cheap per-row signal block (same family the rules read;
    * continuous, so the student yields a tunable soft score). Pure
    * column maps over `text`/`lang` — shared verbatim by the batch
    * trainer and the streaming scorer (`StreamOps.scoreStream`), the
    * funnelVerdict rule: one definition, so batch backfill and online
    * gate can never featurize differently.
    */
  def featurize(df: DataFrame): DataFrame = {
    val tk = split(col("text"), " ")
    df
      .withColumn("f_ntok", size(tk).cast("double"))
      .withColumn("f_alpha",
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
          / greatest(length(col("text")), lit(1)))
      .withColumn("f_stop", size(filter(tk, x =>
        x.isin("the", "a", "of", "and", "to", "in", "is", "it")))
        .cast("double") / greatest(size(tk), lit(1)))
      .withColumn("f_wlen",
        length(regexp_replace(col("text"), " ", "")).cast("double")
          / greatest(size(tk), lit(1)))
      .withColumn("f_en", when(col("lang") === "en", 1.0).otherwise(0.0))
  }

  /** Keep-probability of a scored row: P(label=1) out of the model's
    * probability vector. */
  def pKeep: org.apache.spark.sql.Column =
    element_at(vector_to_array(col("probability")), 2)

  private def withSplit(df: DataFrame): DataFrame =
    df.withColumn("split",
      when(pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 4),
        16, 10).cast("long"), lit(10)) < 8, "train").otherwise("test"))

  /** The labeled, split, fold-pinned training frame — ONE definition
    * shared by `train` and `run` so the corpus scan, featurization,
    * teacher labeling, and split rule can never drift between them.
    *
    * Partition count is data-proportional, not the session shuffle
    * default: LBFGS runs a treeAggregate per iteration, so a 60k-row
    * sf0.1 corpus split across 32 near-empty partitions pays 20×32
    * task launches of pure overhead (measured: 8.7 s on 32 cores vs
    * 3.3 s on 8 for the SAME fit). ~20k rows/partition keeps each
    * gradient partial worth its task; at real scale rows/20k exceeds
    * the configured shuffle width and the cap takes over, so the fix
    * costs nothing at 100 TB.
    */
  private def prepared(s: SparkSession, d: String): DataFrame = {
    val rows = Tables.load(s, d, "documents").count() // parquet metadata count
    val parts = math.max(1L, math.min(
      s.sessionState.conf.numShufflePartitions.toLong, rows / 20000L + 1L)).toInt
    withSplit(featurize(
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("text")))
      .withColumn("label",
        when(TextOps.funnelVerdict(col("text"), col("lang")) === "kept", 1.0)
          .otherwise(0.0)))
      // deterministic fold layout for LBFGS's treeAggregate partials
      .repartition(parts, col("doc_id"))
  }

  /** Fit the student pipeline on the md5-80% train split. The returned
    * PipelineModel is pure transformers (tokenize → hash → assemble →
    * linear score), so it applies unchanged to a batch backfill or a
    * streaming micro-batch. */
  def train(s: SparkSession, d: String): org.apache.spark.ml.PipelineModel =
    train(prepared(s, d))

  /** Fit on an already-`prepared` frame (run() shares its cached copy
    * instead of re-scanning and re-featurizing the corpus). */
  def train(docs: DataFrame): org.apache.spark.ml.PipelineModel = {
    val pipe = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol("text").setOutputCol("words")
        .setPattern("\\s+"),
      new HashingTF().setInputCol("words").setOutputCol("tf")
        .setNumFeatures(1 << 12),
      new VectorAssembler()
        .setInputCols(Array("f_ntok", "f_alpha", "f_stop", "f_wlen",
          "f_en", "tf"))
        .setOutputCol("features"),
      new LogisticRegression().setMaxIter(20).setRegParam(0.01)))
    pipe.fit(docs.filter(col("split") === "train"))
  }

  /** Train on the md5-80% split, score the held-out 20%, and report
    * the per-source table a curation owner reads: docs scored, the
    * teacher's kept share, the student's mean keep-probability and
    * predicted-keep share, and the global held-out AUC (same value on
    * every row — the one scalar that says whether the student is
    * usable).
    */
  def run(s: SparkSession, d: String): DataFrame = {
    // one prep, cached: the LBFGS fit and the held-out scoring both
    // read it (before this, run() and train() each planned the full
    // scan + featurize + label + repartition independently)
    val docs = prepared(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = train(docs)
    // scored is read twice (AUC, then the per-source rollup) — cache
    // it so the test-side transform runs once
    val scored = model.transform(docs.filter(col("split") === "test"))
      .withColumn("p_keep", pKeep)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val auc = new BinaryClassificationEvaluator()
      .setRawPredictionCol("rawPrediction").evaluate(scored)
    // materialize the per-source table (O(sources) rows), then drop
    // both caches — nothing leaks past the query
    val out = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_test_docs"),
        sum(col("label")).cast("long").as("n_kept_true"),
        round(avg(col("p_keep")), 6).as("avg_p_keep"),
        round(avg(when(col("p_keep") >= 0.5, 1.0).otherwise(0.0)), 6)
          .as("share_pred_keep"))
      .withColumn("auc_holdout", round(lit(auc), 6))
      .orderBy(col("source"))
      .localCheckpoint()
    scored.unpersist(blocking = false)
    docs.unpersist(blocking = false)
    out
  }
}
