package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-5 training-pipeline operators (q86–q89)
  * beyond their DuckDB oracle twins.
  */
class PipelineOpsSpec extends SparkSpec {

  test("bloom_might_contain has no false negatives and codegens as a filter") {
    import spark.implicits._
    graft.functions.BloomMightContain.ensureRegistered(spark)
    val keys = (0L until 2000L).map(_ * 2654435761L)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(2000, 0.01)
    keys.foreach(bloom.putLong)
    val bytes = graft.functions.BloomMightContain.toBytes(bloom)
    // repartition first: a Filter directly over a LocalRelation is
    // folded away on the driver (ConvertToLocalRelation), which would
    // leave no physical plan to prove codegen residency on
    val df = (keys ++ (1L to 1000L).map(_ * 7919L + 3L)).toDF("k").repartition(4)
    val kept = df.filter(call_function("bloom_might_contain", lit(bytes), col("k")))
    // every inserted key survives (no false negatives)...
    assert(kept.count() >= keys.size)
    // ...and the 1000 non-members are mostly pruned (fpp 1%, allow 10x)
    assert(kept.count() <= keys.size + 100)
    // the probe participates in whole-stage codegen (one virtual call
    // per row, no interpreted fallback on the corpus hot path).
    // staticPlan because AdaptiveSparkPlanExec hides its subtree from
    // collect() pre-execution; spark.range because a filter over local
    // rows is constant-folded on the driver and leaves no FilterExec
    staticPlan {
      val ranged = spark.range(10000).toDF("k")
        .filter(call_function("bloom_might_contain", lit(bytes), col("k")))
      val spans = ranged.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(spans.exists(_.toString.contains("bloom_might_contain")),
        "bloom_might_contain fell out of whole-stage codegen")
      ranged.count() // execute the codegen'd path, not just plan it
    }
  }

  test("bloom_might_contain survives interpreted (non-codegen) eval too") {
    import spark.implicits._
    graft.functions.BloomMightContain.ensureRegistered(spark)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    bloom.putLong(42L)
    val bytes = graft.functions.BloomMightContain.toBytes(bloom)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val got = Seq(42L, 43L).toDF("k")
        .filter(call_function("bloom_might_contain", lit(bytes), col("k")))
        .collect().map(_.getLong(0)).toSet
      assert(got.contains(42L))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("q86 bloom prune + exact verify equals the plain exact join") {
    val got = Registry.byName("q86_bloom_decontaminate").fn(spark, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
    val sh = docs.select(col("doc_id"), graft.Fns.toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(graft.Fns.shingles(col("tk"), 3))).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("sk"))
    val ev = sh.filter(col("doc_id") % 20 === 0).select("sk").distinct()
    val hits = sh.filter(col("doc_id") % 20 =!= 0)
      .join(ev, Seq("sk")).select("doc_id").distinct()
    val want = docs.filter(col("doc_id") % 20 =!= 0)
      .join(hits, Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_clean"), sum(col("n_chars")).as("clean_chars"))
    assert(got.collect().toSet === want.collect().toSet)
    graft.queries.TextOps.releaseCaches()
  }

  test("q87 flags exactly the docs sharing an 8-word passage") {
    val out = Registry.byName("q87_passage_dedup").fn(spark, sfDir).collect()
    // recompute duplicated docs grouping by the passage STRING (no
    // hashing) — hashed and string grouping must agree
    val p = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), graft.Fns.toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= 8)
      .select(col("doc_id"), expr("int(size(tk) div 8)").as("nw"), col("tk"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), col("nw") - 1),
        i => concat_ws(" ", slice(col("tk"), i * 8 + 1, lit(8))))).as("pg"))
    val dupDocs = p.join(
        p.groupBy("pg").agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") > 1), Seq("pg"))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(out.filter(_.getAs[Long]("n_dup") > 0).map(_.getAs[Long]("doc_id")).toSet
      === dupDocs)
    out.foreach { r =>
      val ratio = r.getAs[Double]("dup_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_passages") > 0)
    }
  }

  test("q88 LM scores are finite log-probabilities and repetitive text scores high") {
    val rows = Registry.byName("q88_bigram_lm").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("lm_score")
      // a smoothed probability is in (0,1) => its ln is strictly negative
      assert(s < 0.0 && !s.isNaN && !s.isInfinite)
      assert(r.getAs[Long]("n_bigrams") > 0)
    }
  }

  test("q92 clusters are closed over near-dup pairs with one survivor each") {
    val rows = Registry.byName("q92_dedup_clusters").fn(spark, sfDir).collect()
    val cluster = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val pairs = Registry.byName("q41_jaccard_pairs").fn(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    assert(pairs.nonEmpty)
    // membership = exactly the docs appearing in some near-dup pair
    assert(cluster.keySet === pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // near-dup pairs never straddle clusters (components are closed)
    pairs.foreach { case (a, b) => assert(cluster(a) === cluster(b)) }
    // canonical id is the min member; exactly one keep per cluster
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, members) =>
      assert(cid === members.map(_.getAs[Long]("doc_id")).min)
      assert(members.count(_.getAs[Boolean]("keep")) === 1)
      members.foreach(m => assert(m.getAs[Long]("cluster_size") === members.length))
    }
    graft.queries.TextOps.releaseCaches()
  }

  test("q89 packing conserves tokens and numbers chunks contiguously") {
    val chunks = Registry.byName("q89_pack_chunks").fn(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
    val totalTok = docs.select(sum(size(graft.Fns.toks(col("text")))).cast("long"))
      .collect().head.getLong(0)
    assert(chunks.map(_.getAs[Long]("chunk_tokens")).sum === totalTok)
    val ids = chunks.map(_.getAs[Long]("chunk_id")).sorted
    assert(ids.toSeq === (0L until ids.length).toSeq)
    // concat-and-chunk: a chunk holds at most 511 carried-over tokens
    // plus whole docs whose last token lands inside it
    val maxDoc = docs.select(max(size(graft.Fns.toks(col("text")))).cast("long"))
      .collect().head.getLong(0)
    chunks.foreach { r =>
      assert(r.getAs[Long]("chunk_tokens") < 512L + maxDoc)
    }
  }
}
