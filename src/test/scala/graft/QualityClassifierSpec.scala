package graft

import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** q138 learned-quality-filter invariants: the student must actually
  * rank the teacher's verdict (held-out AUC floor), report calibrated
  * bounded probabilities, respect the md5 split, and be rerun-stable
  * (deterministic split + pinned fold layout → identical output).
  */
class QualityClassifierSpec extends SparkSpec {

  private lazy val out =
    Registry.byName("q138_quality_classifier").fn(spark, sfDir).collect()

  test("q138 held-out AUC clears the floor and is one global scalar") {
    val aucs = out.map(_.getAs[Double]("auc_holdout")).distinct
    assert(aucs.length === 1, "AUC must be the same scalar on every row")
    assert(aucs.head >= 0.9, s"held-out AUC ${aucs.head} below floor")
  }

  test("q138 probabilities and shares are bounded, sources covered") {
    assert(out.nonEmpty)
    out.foreach { r =>
      val p = r.getAs[Double]("avg_p_keep")
      val s = r.getAs[Double]("share_pred_keep")
      assert(p >= 0.0 && p <= 1.0, s"avg_p_keep $p out of bounds")
      assert(s >= 0.0 && s <= 1.0, s"share_pred_keep $s out of bounds")
      assert(r.getAs[Long]("n_test_docs") > 0)
    }
  }

  test("q138 teacher counts match an independent split+verdict recount") {
    val want = Tables.load(spark, sfDir, "documents")
      .withColumn("split",
        when(pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 4),
          16, 10).cast("long"), lit(10)) < 8, "train").otherwise("test"))
      .filter(col("split") === "test")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(TextOps.funnelVerdict(col("text"), col("lang")) === "kept",
          1L).otherwise(0L)).as("k"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Long]("k"))).toMap
    val got = out.map(r => r.getAs[String]("source") ->
      (r.getAs[Long]("n_test_docs"), r.getAs[Long]("n_kept_true"))).toMap
    assert(got === want)
  }

  test("q138 is rerun-stable (deterministic split and fold layout)") {
    val again =
      Registry.byName("q138_quality_classifier").fn(spark, sfDir).collect()
    assert(again.map(_.toString).sorted.toSeq ===
      out.map(_.toString).sorted.toSeq)
  }

  test("stream scoring with the batch-trained model matches batch exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val model = graft.reco.QualityClassifier.train(spark, sfDir)
    val rows = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id")).limit(25).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("text")))
    val input = MemoryStream[(Long, String, String)]
    val q = StreamOps.scoreStream(
      input.toDF().toDF("doc_id", "lang", "text"), model)
      .writeStream.format("memory").queryName("qc_stream")
      .outputMode("append").start()
    val got = try {
      input.addData(rows.toSeq: _*)
      q.processAllAvailable()
      spark.table("qc_stream").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("p_keep"), r.getAs[String]("gate"))).toMap
    } finally q.stop()
    val want = StreamOps.scoreStream(
      rows.toSeq.toDF("doc_id", "lang", "text"), model).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("p_keep"), r.getAs[String]("gate"))).toMap
    assert(got === want)
    assert(got.size === 25)
    assert(got.values.map(_._2).toSet.subsetOf(Set("kept", "filtered")))
  }

  test("the trained model round-trips through save/load with equal scores") {
    import graft.streaming.StreamOps
    val model = graft.reco.QualityClassifier.train(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("qc_model").toString
    model.write.overwrite().save(dir)
    val reloaded = org.apache.spark.ml.PipelineModel.load(dir)
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id")).limit(25)
    def scores(m: org.apache.spark.ml.PipelineModel) =
      StreamOps.scoreStream(docs, m).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("p_keep")).toMap
    assert(scores(reloaded) === scores(model))
  }
}
