package graft

import org.apache.spark.sql.functions._

/** Dedup / text-analysis invariants beyond the DuckDB oracle. */
class TextOpsSpec extends SparkSpec {

  test("MinHash-LSH recovers exactly the pairs exact Jaccard finds") {
    def pairs(name: String) = Registry.byName(name).fn(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet
    val exact = pairs("q41_jaccard_pairs")
    val lsh = pairs("q42_minhash_lsh_pairs")
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh === exact)
  }

  test("exact dedup groups duplicated texts together") {
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val dup = docs.limit(3).withColumn("doc_id", col("doc_id") + 100000L)
    val both = docs.unionAll(dup)
    val groups = both
      .withColumn("h", md5(lower(trim(col("text")))))
      .groupBy("h").agg(count(lit(1)).as("dup_cnt"))
    assert(groups.filter(col("dup_cnt") === 2).count() === 3)
    assert(groups.filter(col("dup_cnt") > 2).count() === 0)
  }

  test("fingerprint dedup is token-order-insensitive") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma alpha beta"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    val fp = df.withColumn("fp",
      md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")))
      .groupBy("fp").agg(count(lit(1)).as("n"))
      .collect().map(_.getAs[Long]("n")).sorted
    assert(fp.toSeq === Seq(1L, 2L))
  }

  test("quality score fields are well-formed ratios") {
    val q = Registry.byName("q46_quality_score").fn(spark, sfDir).collect()
    q.foreach { r =>
      assert(r.getAs[Int]("n_tokens") > 0)
      val sr = r.getAs[Double]("stop_ratio")
      val ar = r.getAs[Double]("alpha_ratio")
      assert(sr >= 0 && sr <= 1)
      assert(ar >= 0 && ar <= 1)
      assert(Set("high", "medium", "low").contains(r.getAs[String]("quality")))
    }
  }

  test("simhash of near-identical docs is close in hamming distance") {
    val sh = Registry.byName("q44_simhash").fn(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    // near-dup pairs from the exact-jaccard surface
    val nearDups = Registry.byName("q41_jaccard_pairs").fn(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    nearDups.foreach { case (a, b) =>
      assert(hamming(sh(a), sh(b)) <= 4,
        s"near-dup pair ($a,$b) has distant simhashes")
    }
  }

  test("corpus-assembly trio is invariant to input partitioning") {
    // The historical failure mode this guards (the q60 rand(42) lesson):
    // a draw seeded per PARTITION changes results when the scan layout
    // changes. The md5-bucket trio must select identical rows from a
    // 7-way repartitioned copy of the corpus.
    val names = Seq("q81_stratified_sample", "q82_split_assign",
      "q83_length_trim", "q84_corpus_mix")
    val expected = names.map(n => Registry.byName(n).fn(spark, sfDir).collect().toSeq)
    val tmp = java.nio.file.Files.createTempDirectory("graft-parts").toString
    Tables.load(spark, sfDir, "documents")
      .repartition(7).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    names.zip(expected).foreach { case (n, want) =>
      assert(Registry.byName(n).fn(spark, tmp).collect().toSeq === want, n)
    }
  }

  test("connectedLabels converges on a long-diameter path graph") {
    // the historical trap this pins: a fixed 32-round min-propagation
    // cap silently returned unconverged labels on graphs of diameter
    // >32 — the pointer-jumping step must make an 80-long chain (plus
    // a disjoint triangle) converge, loudly, to the component minima
    import spark.implicits._
    val chain = (0L until 80L).sliding(2).map(p => (p(0), p(1))).toSeq
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val dir = (chain ++ tri).toDF("src", "dst")
    val edges = dir.unionAll(dir.select(col("dst").as("src"), col("src").as("dst")))
    val labels = graft.queries.TextOps.connectedLabels(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.queries.TextOps.releaseCaches()
    assert((0L until 80L).forall(labels(_) == 0L), "chain not fully labeled 0")
    assert(Seq(100L, 101L, 102L).forall(labels(_) == 100L), "triangle not labeled 100")
  }
}
