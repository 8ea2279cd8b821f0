package graft

import org.apache.spark.sql.functions._

/** q144 Gopher rule battery: the gate must be an honest conjunction of
  * its own reported metrics, the metrics must match an independent
  * plain-JVM recomputation, and the battery must COMPOSE with the C4
  * funnel (q107's rule order, recovered from the registered q46
  * metrics + the documents table) the way a real curation pipeline
  * chains them.
  */
class QualityFunnelSpec extends SparkSpec {

  private def battery() = Registry.byName("q144_gopher_rules").fn(spark, sfDir)

  test("gopher_pass is exactly the conjunction of the reported metrics") {
    val rows = battery().collect()
    assert(rows.nonEmpty)
    var pass = 0
    rows.foreach { r =>
      val want = r.getAs[Int]("n_words") >= 50 &&
        r.getAs[Int]("n_words") <= 100000 &&
        r.getAs[Double]("mean_word_len") >= 3.0 &&
        r.getAs[Double]("mean_word_len") <= 10.0 &&
        r.getAs[Double]("symbol_ratio") <= 0.1 &&
        r.getAs[Double]("alpha_word_ratio") >= 0.8 &&
        r.getAs[Int]("stop_hits") >= 2 &&
        r.getAs[Double]("bullet_share") <= 0.9 &&
        r.getAs[Double]("ellipsis_share") <= 0.3 &&
        r.getAs[Double]("dup_line_frac") <= 0.3
      assert(r.getAs[Boolean]("gopher_pass") === want,
        s"doc ${r.getAs[Long]("doc_id")}: gate disagrees with its metrics")
      if (want) pass += 1
    }
    assert(pass > 0 && pass < rows.length,
      s"battery should be discriminative on the fixture ($pass/${rows.length})")
  }

  test("metrics match a plain-JVM recomputation on sample docs") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").limit(20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = battery().collect()
      .filter(r => docs.contains(r.getAs[Long]("doc_id")))
    assert(got.length === docs.size)
    got.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val words = text.split(" ", -1)
      assert(r.getAs[Int]("n_words") === words.length)
      val meanLen = BigDecimal(
        words.map(_.length).sum.toDouble / words.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("mean_word_len") === meanLen)
      val dupFrac = BigDecimal(
        (words.length - words.distinct.length).toDouble / words.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("dup_word_frac") === dupFrac)
      val stopSet = Set("the", "a", "of", "and", "to", "in", "is", "it")
      assert(r.getAs[Int]("stop_hits") === words.distinct.count(stopSet))
    }
  }

  test("battery composes with the C4 funnel as a strict intersection") {
    // per-doc C4 verdict, recovered from registered surface only:
    // q46's rounded kernels + the documents table's lang — the same
    // rule order q107's rollup uses (too_short → low_alpha →
    // high_stop → non_english → kept)
    val q46 = Registry.byName("q46_quality_score").fn(spark, sfDir)
    val lang = Tables.load(spark, sfDir, "documents").select("doc_id", "lang")
    val c4 = q46.join(lang, "doc_id")
      .select(col("doc_id"),
        (col("n_tokens") >= 15 && col("alpha_ratio") >= 0.5 &&
          col("stop_ratio") <= 0.4 && col("lang") === "en").as("c4_kept"))
    val composed = battery().select(col("doc_id"), col("gopher_pass"))
      .join(c4, "doc_id")
    val nC4 = composed.filter(col("c4_kept")).count()
    val nGopher = composed.filter(col("gopher_pass")).count()
    val nBoth = composed.filter(col("c4_kept") && col("gopher_pass")).count()
    assert(nBoth <= math.min(nC4, nGopher))
    assert(nBoth > 0, "composed funnel should keep something")
    assert(nBoth < composed.count(), "composed funnel should drop something")
    // and the intersection is consistent with inclusion–exclusion
    val nEither = composed.filter(col("c4_kept") || col("gopher_pass")).count()
    assert(nEither === nC4 + nGopher - nBoth)
  }

  test("q145 top-n-gram fractions match a plain-JVM recomputation") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").limit(25).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def topFrac(text: String, n: Int): Double = {
      val words = text.split(" ", -1)
      if (words.length < n) return 0.0
      val chars = words.map(_.length).sum.toDouble
      // sliding over an Array yields Array windows, which compare by
      // reference — convert to List so groupBy counts equal grams
      val top = words.sliding(n).map(_.toList).toSeq
        .groupBy(identity).values
        .map(g => g.size.toLong * g.head.map(_.length).sum).max
      BigDecimal(top / chars)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val all = Registry.byName("q145_ngram_repetition").fn(spark, sfDir).collect()
    val got = all.filter(r => docs.contains(r.getAs[Long]("doc_id")))
    assert(got.length === docs.size)
    got.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val (t2, t3, t4) = (topFrac(text, 2), topFrac(text, 3), topFrac(text, 4))
      assert(r.getAs[Double]("top2_frac") === t2)
      assert(r.getAs[Double]("top3_frac") === t3)
      assert(r.getAs[Double]("top4_frac") === t4)
      assert(r.getAs[Boolean]("rep_pass") ===
        (t2 <= 0.20 && t3 <= 0.18 && t4 <= 0.16))
    }
    // the rule must bite on the fixture, not rubber-stamp it
    val nFail = all.count(!_.getAs[Boolean]("rep_pass"))
    assert(nFail > 0 && nFail < all.length,
      s"repetition gate should be discriminative ($nFail/${all.length})")
  }
}
