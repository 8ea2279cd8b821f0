package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-6 index/tokenizer/normalization operators
  * (q100–q105) beyond their DuckDB oracle twins: BPE pair-shape and
  * count conservation, posting-list ordering, novelty bounds, the
  * normalization fixed point, per-dim stat consistency, and the
  * salted join's equality with the plain join it must be invisible in.
  */
class Round6OpsSpec extends SparkSpec {

  test("q100 BPE pairs are 2-char, positive-count, and conserve mass") {
    val rows = Registry.byName("q100_bpe_pairs").fn(spark, sfDir).collect()
    assert(rows.length === 30)
    rows.foreach { r =>
      assert(r.getAs[String]("pair").length === 2)
      assert(r.getAs[Long]("n") > 0L)
    }
    // descending by count with pair tiebreak — the heap order is total
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // every adjacent pair of every word is counted exactly once: the
    // corpus-wide pair mass equals sum over words of (len - 1)
    val total = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .agg(sum(length(col("w")) - 1)).head.getLong(0)
    val allPairs = Registry.byName("q100_bpe_pairs").fn(spark, sfDir)
    // top-30 is a subset; re-derive the full mass through the same path
    val full = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .count()
    assert(full === total)
    assert(allPairs.count() === 30)
  }

  test("q101 posting lists are ascending, df-consistent, and per-doc distinct") {
    val rows = Registry.byName("q101_inverted_index").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val posts = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(posts.length === r.getAs[Long]("df"), "df != |postings|")
      assert(posts.zip(posts.tail).forall { case (a, b) => a < b },
        "postings not strictly ascending — a doc posted twice or sort leaked")
      assert(r.getAs[Long]("df") >= 10L)
    }
  }

  test("q102 novelty is a [0,1] ratio over every shingled doc") {
    val got = Registry.byName("q102_ngram_novelty").fn(spark, sfDir)
    val rows = got.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
      assert(r.getAs[Long]("n_shingles") > 0L)
    }
    // exactly the docs with >= 3 tokens participate
    val eligible = Tables.load(spark, sfDir, "documents")
      .filter(size(split(col("text"), " ")) >= 3).count()
    assert(rows.length.toLong === eligible)
    graft.queries.TextOps.releaseCaches()
  }

  test("q103 normalization dedup conserves docs and is a fixed point") {
    val rows = Registry.byName("q103_norm_dedup").fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.load(spark, sfDir, "documents").count())
    // canonical ids are distinct and each class keeps its minimum
    val canon = rows.map(_.getAs[Long]("canonical_id"))
    assert(canon.distinct.length === canon.length)
    // normalizing an already-normalized string changes nothing
    val norm = (c: org.apache.spark.sql.Column) =>
      trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))
    val twice = Tables.load(spark, sfDir, "documents")
      .select(norm(col("text")).as("n1"))
      .select(col("n1"), norm(col("n1")).as("n2"))
      .filter(col("n1") =!= col("n2")).count()
    assert(twice === 0L)
  }

  test("q104 per-dim stats cover all 64 dims with consistent bounds") {
    val rows = Registry.byName("q104_dim_stats").fn(spark, sfDir).collect()
    assert(rows.length === 64)
    val n0 = rows.head.getAs[Long]("n")
    rows.foreach { r =>
      assert(r.getAs[Long]("n") === n0, "ragged dimension counts")
      assert(r.getAs[Double]("sd") >= 0.0)
      assert(r.getAs[Double]("mn") <= r.getAs[Double]("mean") + 1e-4)
      assert(r.getAs[Double]("mean") <= r.getAs[Double]("mx") + 1e-4)
    }
    assert(n0 === Tables.load(spark, sfDir, "embeddings").count())
  }

  test("q106 outlier audit conserves vectors and bounds flags") {
    val rows = Registry.byName("q106_embedding_outliers").fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum ===
      Tables.load(spark, sfDir, "embeddings").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n_vecs"))
      assert(r.getAs[Double]("max_z") >= 0.0)
      // any flagged outlier forces the label's max beyond the threshold
      if (r.getAs[Long]("n_outliers") > 0) assert(r.getAs[Double]("max_z") >= 4.0)
    }
  }

  test("q107 funnel verdicts partition the corpus with one reason each") {
    val rows = Registry.byName("q107_filter_funnel").fn(spark, sfDir).collect()
    val legal = Set("too_short", "low_alpha", "high_stop", "non_english", "kept")
    assert(rows.map(_.getAs[String]("verdict")).forall(legal))
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.load(spark, sfDir, "documents").count())
    rows.foreach(r => assert(r.getAs[Double]("avg_tokens") > 0.0))
  }

  test("q108 DSIR weights cover every doc and favor the target slice") {
    val got = Registry.byName("q108_dsir_weights").fn(spark, sfDir)
    assert(got.count() === Tables.load(spark, sfDir, "documents").count())
    // the target LM memorizes its own sample (add-one smoothing only
    // dampens it), so the target slice must score higher on average
    val m = got.withColumn("tgt", col("doc_id") % 10 === 0)
      .groupBy(col("tgt")).agg(avg(col("dsir_w")).as("m"))
      .collect().map(r => r.getAs[Boolean]("tgt") -> r.getAs[Double]("m")).toMap
    assert(m(true) > m(false),
      s"target slice not upweighted: ${m(true)} vs ${m(false)}")
  }

  test("q111 confusion matrix conserves docs and row shares sum to 1") {
    val rows = Registry.byName("q111_lang_confusion").fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.load(spark, sfDir, "documents").count())
    assert(rows.map(_.getAs[String]("pred")).toSet
      .subsetOf(Set("en", "es", "fr", "de")))
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, cells) =>
      val share = cells.map(_.getAs[Double]("share")).sum
      assert(math.abs(share - 1.0) < 1e-4, s"lang $lang shares sum to $share")
    }
  }

  test("q112 dup rates bound correctly and cover every source") {
    val rows = Registry.byName("q112_dup_rate_by_source").fn(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(rows.length.toLong === docs.select("source").distinct().count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup") <= r.getAs[Long]("n_docs"))
      val rate = r.getAs[Double]("dup_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // total duplicated docs equals the q92 cluster membership count
    val clustered = Registry.byName("q92_dedup_clusters").fn(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_dup")).sum === clustered)
    graft.queries.TextOps.releaseCaches()
  }

  test("q113 temperature weights sum to 1 and boost favors small sources") {
    val rows = Registry.byName("q113_temperature_mix").fn(spark, sfDir).collect()
    assert(rows.length.toLong === Tables.load(spark, sfDir, "documents")
      .select("source").distinct().count())
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    // alpha<1 flattening: boost strictly decreases as source size grows
    val byN = rows.sortBy(_.getAs[Long]("n_docs")).map(_.getAs[Double]("boost"))
    byN.zip(byN.tail).foreach { case (small, big) => assert(small >= big) }
    // the weighted mean of boost under natural frequency is 1 (it is a
    // reweighting, not a corpus-size change)
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val mean = rows.map(r =>
      r.getAs[Long]("n_docs") / total * r.getAs[Double]("boost")).sum
    assert(math.abs(mean - 1.0) < 1e-3, s"natural-weighted boost mean $mean")
  }

  test("q114 leakage pairs partition the q41 pair set by split") {
    val rows = Registry.byName("q114_split_leakage").fn(spark, sfDir).collect()
    val totalPairs = Registry.byName("q41_jaccard_pairs").fn(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === totalPairs)
    rows.foreach { r =>
      assert(r.getAs[String]("split_a") <= r.getAs[String]("split_b"))
      assert(r.getAs[Long]("n_pairs") > 0L)
    }
  }

  test("q115 histogram conserves docs/tokens and its cum share hits 1") {
    val rows = Registry.byName("q115_length_histogram").fn(spark, sfDir)
      .orderBy(col("bucket_lo")).collect()
    val docs = Tables.load(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val tokTotal = docs.select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(sum(col("t"))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("bucket_tokens")).sum === tokTotal)
    val shares = rows.map(_.getAs[Double]("cum_token_share"))
    shares.zip(shares.tail).foreach { case (a, b) => assert(a <= b) }
    assert(math.abs(shares.last - 1.0) < 1e-6)
    rows.foreach(r => assert(r.getAs[Long]("bucket_lo") % 16 === 0L))
  }

  test("q110 elects the longest member of each q92 cluster") {
    val clusters = Registry.byName("q92_dedup_clusters").fn(spark, sfDir)
      .collect().groupBy(_.getAs[Long]("cluster_id"))
    val chars = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Registry.byName("q110_dedup_survivors").fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("cluster_id")).toSet === clusters.keySet)
    rows.foreach { r =>
      val members = clusters(r.getAs[Long]("cluster_id"))
        .map(_.getAs[Long]("doc_id"))
      val survivor = r.getAs[Long]("survivor_id")
      assert(members.contains(survivor), "survivor outside its cluster")
      assert(r.getAs[Long]("cluster_size") === members.length)
      val maxChars = members.map(chars).max
      assert(r.getAs[Long]("max_chars") === maxChars)
      assert(chars(survivor) === maxChars, "survivor is not the longest member")
    }
    graft.queries.TextOps.releaseCaches()
  }

  test("q105 salted join result equals the plain join exactly") {
    val salted = Registry.byName("q105_salted_join").fn(spark, sfDir)
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_suppkey"),
        Fns.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_c"))
    val plain = li.join(Tables.load(spark, sfDir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"), sum(col("rev_c")).as("revenue_cents"))
      .orderBy(col("s_name"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
