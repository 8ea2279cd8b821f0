package graft

import org.apache.spark.sql.functions._

/** Count-min-sketch invariants: the one-sided error guarantee, the
  * eps*N bound, and merge-order (partitioning) invariance — the three
  * properties that make the sketch trustworthy at 100 TB.
  */
class CmsSketchSpec extends SparkSpec {

  test("cms estimates over-count only, within eps*N, for every token") {
    graft.functions.CmsAgg.ensureRegistered(spark)
    graft.functions.CmsEstimate.ensureRegistered(spark)
    val tok = Tables.load(spark, sfDir, "documents")
      .select(explode(graft.Fns.toks(col("text"))).as("tok"))
      .select(col("tok"), xxhash64(col("tok")).as("tk"))
    val n = tok.count()
    val sketch = tok.agg(expr("cms_sketch(tk)").as("cms"))
    val rows = tok.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .select(col("tok"), col("exact"),
        expr("cms_estimate(cms, xxhash64(tok))").as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact")
      val est = r.getAs[Long]("est")
      assert(est >= exact, s"CMS under-counted ${r.getAs[String]("tok")}")
      assert(est <= exact + math.ceil(graft.functions.CmsAgg.Eps * n).toLong,
        s"CMS error above eps*N for ${r.getAs[String]("tok")}: est=$est exact=$exact")
    }
  }

  test("cms sketch is partitioning-invariant (merge order cannot change it)") {
    graft.functions.CmsAgg.ensureRegistered(spark)
    import spark.implicits._
    val data = (1L to 5000L).map(i => i % 97)
    def sketchOf(parts: Int): Array[Byte] =
      data.toDF("k").repartition(parts)
        .agg(expr("cms_sketch(k)")).collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(sketchOf(1), sketchOf(7)))
    assert(java.util.Arrays.equals(sketchOf(7), sketchOf(32)))
  }

  test("q90 output exposes only over-counts on the top tokens") {
    val rows = Registry.byName("q90_cms_freq").fn(spark, sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L)
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"))
    }
  }
}
