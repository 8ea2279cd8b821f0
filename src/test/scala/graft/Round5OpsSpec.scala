package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-5 curation/analytics operators (q93–q99)
  * beyond their DuckDB oracle twins: redaction completeness, sampling
  * determinism under repartition, PMI/spectrum internal consistency,
  * CDC chunk accounting, cohort closure, and the quantization error
  * bound that the int8 scheme guarantees by construction.
  */
class Round5OpsSpec extends SparkSpec {

  test("q93 redaction leaves no email/phone residue and masks every contact") {
    val rows = Registry.byName("q93_pii_redact").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sample = r.getAs[String]("sample_redacted")
      assert(!sample.contains("@"), s"unredacted email in: $sample")
      assert(!sample.matches(".*555-[0-9]{4}.*"), s"unredacted phone in: $sample")
      assert(sample.contains("[EMAIL]") && sample.contains("[PHONE]"))
      // every contact had exactly one email and one phone synthesized in
      assert(r.getAs[Long]("n_emails") === r.getAs[Long]("n_contacts"))
      assert(r.getAs[Long]("n_phones") === r.getAs[Long]("n_contacts"))
      assert(r.getAs[Long]("chars_masked") > 0L)
    }
    val total = rows.map(_.getAs[Long]("n_contacts")).sum
    assert(total === Tables.load(spark, sfDir, "customer").count())
  }

  test("q94 weighted sample is exact-k, key-ordered, and partition-invariant") {
    val q = Registry.byName("q94_weighted_sample")
    val got = q.fn(spark, sfDir).collect()
    assert(got.length === 20)
    val keys = got.map(_.getAs[Double]("samp_key"))
    assert(keys.zip(keys.tail).forall { case (a, b) => a <= b }, "keys not ascending")
    // determinism: the draw is a pure function of doc_id, so a different
    // physical partitioning must select the identical sample (the
    // RatingSynth regression: rand(seed) is partition-dependent)
    val docs = Tables.load(spark, sfDir, "documents").repartition(7)
    val u32 = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    val u = (u32.cast("double") + lit(0.5)) / lit(4294967296.0)
    val again = docs.withColumn("samp_key", round(-log(u) / col("n_chars"), 9))
      .orderBy(col("samp_key"), col("doc_id")).limit(20)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(again === got.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("q95 PMI rows respect the count floor and descend by pmi") {
    val rows = Registry.byName("q95_pmi_bigrams").fn(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pair") >= 5L)
      assert(r.getAs[Long]("n_first") >= r.getAs[Long]("n_pair"))
      assert(r.getAs[Long]("n_second") >= r.getAs[Long]("n_pair"))
    }
    val pmi = rows.map(_.getAs[Double]("pmi"))
    assert(pmi.zip(pmi.tail).forall { case (a, b) => a >= b }, "pmi not descending")
  }

  test("q96 spectrum buckets partition the vocabulary exactly") {
    val rows = Registry.byName("q96_zipf_spectrum").fn(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
    val vocab = docs.select(explode(split(col("text"), " ")).as("tok"))
      .select(countDistinct(col("tok"))).head.getLong(0)
    val toksTotal = docs.select(explode(split(col("text"), " "))).count()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === vocab)
    assert(rows.map(_.getAs[Long]("n_occurrences")).sum === toksTotal)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      val nt = r.getAs[Long]("n_tokens")
      val no = r.getAs[Long]("n_occurrences")
      // every token in bucket b has 2^b <= f < 2^(b+1)
      assert(no >= nt * (1L << b) && no < nt * (1L << (b + 1)))
    }
  }

  test("q97 CDC chunk stats account for every token") {
    val rows = Registry.byName("q97_cdc_chunks").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_chunks")
      assert(n >= 1L)
      assert(r.getAs[Long]("max_chunk") >= 1L)
      assert(r.getAs[Double]("avg_chunk") <= r.getAs[Long]("max_chunk").toDouble)
    }
    // chunk sizes per doc must sum back to the doc's token count:
    // n_chunks * avg_chunk == n_tokens (avg rounded to 4dp => tolerance)
    val tokCounts = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val got = r.getAs[Long]("n_chunks") * r.getAs[Double]("avg_chunk")
      val want = tokCounts(r.getAs[Long]("doc_id")).toDouble
      assert(math.abs(got - want) < 0.0001 * want + 0.001,
        s"doc ${r.getAs[Long]("doc_id")}: $got vs $want tokens")
    }
  }

  test("q98 cohort matrix closes: offset-0 cells cover every user once") {
    val rows = Registry.byName("q98_cohort_retention").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("week_offset") >= 0))
    // every user is active in their own first week, so the offset-0
    // diagonal sums to the total distinct-user count — and no later
    // cell can exceed its cohort's size
    val users = Tables.load(spark, sfDir, "events")
      .select(countDistinct(col("user_id"))).head.getLong(0)
    val diag = rows.filter(_.getAs[Int]("week_offset") == 0)
      .map(r => r.getAs[Int]("cohort_week") -> r.getAs[Long]("n_users")).toMap
    assert(diag.values.sum === users)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= diag(r.getAs[Int]("cohort_week")))
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("n_users"))
    }
  }

  test("q99 quantization error stays under the scheme's analytic bound") {
    val rows = Registry.byName("q99_quantize_embed").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per element |x - s*round(x/s)| <= s/2, so per 64-d vector
    // err <= 64 * (smax/2)^2 with smax the corpus's largest scale
    val smax = Tables.load(spark, sfDir, "embeddings")
      .select((array_max(transform(col("embedding"), x => abs(x))).cast("double") / 127.0)
        .as("s"))
      .agg(max(col("s"))).head.getDouble(0)
    val bound = 64.0 * math.pow(smax / 2.0, 2) + 1e-6
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_sq_err")
      val mx = r.getAs[Double]("max_sq_err")
      assert(avg > 0.0 && avg <= mx)
      assert(mx <= bound, s"max_sq_err $mx exceeds analytic bound $bound")
    }
  }
}
