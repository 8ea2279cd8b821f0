package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

/** The native codegen'd cosine expression must be bit-identical to the
  * HOF formulation (same promotion, same accumulation order) and
  * actually participate in whole-stage codegen.
  */
class CosineSimilaritySpec extends SparkSpec {

  test("native expression matches the HOF cosine bit-for-bit") {
    CosineSimilarity.ensureRegistered(spark)
    val e = Tables.load(spark, sfDir, "embeddings").limit(100)
    val a = e.select(col("vec_id"), col("embedding").as("x"))
    val b = e.select(col("vec_id").as("vid2"), col("embedding").as("y"))
    val pairs = a.join(b, col("vec_id") =!= col("vid2")).limit(2000)
      .withColumn("hof", Fns.cosine(col("x"), col("y")))
      .withColumn("native", expr("cosine_sim(x, y)"))
    assert(pairs.filter(col("hof") =!= col("native")).count() === 0)
  }

  test("native expression survives interpreted (non-codegen) eval too") {
    CosineSimilarity.ensureRegistered(spark)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val r = spark.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").collect()
      assert(math.abs(r.head.getDouble(0) - 1.0) < 1e-12)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("expression appears inside a WholeStageCodegen span") {
    CosineSimilarity.ensureRegistered(spark)
    val e = Tables.load(spark, sfDir, "embeddings")
    val df = e.select(expr("cosine_sim(embedding, embedding)").as("c"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, "cosine_sim fell out of whole-stage codegen")
    assert(spans.exists(_.toString.contains("cosine_sim")))
    assert(df.agg(min("c")).collect().head.getDouble(0) > 0.999999)
  }
}
