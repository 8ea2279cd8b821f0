package graft

import org.apache.spark.sql.functions._
import graft.functions.MinHashAgg

/** The one-pass native MinHash aggregate must produce signatures
  * bit-identical to the composed explode/groupBy/min formulation.
  */
class MinHashAggSpec extends SparkSpec {

  test("native aggregate equals the composed per-perm min") {
    MinHashAgg.ensureRegistered(spark)
    import spark.implicits._
    val sk = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("sk"))

    val native = sk.groupBy("doc_id")
      .agg(expr("minhash_sig(sk)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

    val prime = 2147483647L
    val aCol = array(MinHashAgg.A.map(lit): _*)
    val bCol = array(MinHashAgg.B.map(lit): _*)
    val composed = sk
      .withColumn("h0", pmod(col("sk"), lit(prime)))
      .select(col("doc_id"), col("h0"), explode(sequence(lit(0), lit(15))).as("p"))
      .withColumn("hv", pmod(
        element_at(aCol, col("p") + 1) * col("h0") + element_at(bCol, col("p") + 1),
        lit(prime)))
      .groupBy("doc_id", "p").agg(min("hv").as("mh"))
      .groupBy("doc_id").agg(array_sort(collect_list(struct(col("p"), col("mh")))).as("a"))
      .select(col("doc_id"), expr("transform(a, x -> x.mh)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

    assert(native.keySet === composed.keySet)
    native.keys.foreach { k => assert(native(k) === composed(k), s"doc $k") }
  }

  test("merge path: signature is partitioning-invariant") {
    MinHashAgg.ensureRegistered(spark)
    val sk = Tables.load(spark, sfDir, "documents").limit(50)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("sk"))
    def sig(parts: Int) = sk.repartition(parts).groupBy("doc_id")
      .agg(expr("minhash_sig(sk)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(sig(1) === sig(13))
  }
}
