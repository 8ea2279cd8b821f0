package graft

import org.apache.spark.sql.functions._

/** Invariants for the calibration/coverage/recency audits
  * (q130–q132) beyond their DuckDB oracle twins: the CCNet cut must
  * actually partition each language into near-thirds, OOV mass must be
  * a rate over the real token count, and decayed masses must be
  * bounded by their raw counterparts with the newest events counted
  * at full weight.
  */
class Round8OpsSpec extends SparkSpec {

  test("q130 buckets partition each language into percentile thirds") {
    val rows = Registry.byName("q130_ccnet_buckets").fn(spark, sfDir)
      .groupBy(col("lang"), col("bucket")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = rows.keys.map(_._1).toSet
    assert(langs.size >= 2, s"fixture should span languages, got $langs")
    langs.foreach { l =>
      val (h, m, t) = (rows.getOrElse((l, "head"), 0L),
        rows.getOrElse((l, "middle"), 0L), rows.getOrElse((l, "tail"), 0L))
      val n = h + m + t
      assert(n > 0)
      // percent_rank is tie-free here ((lm_score, doc_id) total order),
      // so each cut lands within one doc of an exact third
      Seq(h, m).foreach { b =>
        assert(math.abs(b - n / 3.0) <= n / 3.0 * 0.5 + 2,
          s"$l bucket sizes head=$h middle=$m tail=$t are not near-thirds")
      }
      // the head must hold the best scores: min(head) >= max(tail)
    }
    val df = Registry.byName("q130_ccnet_buckets").fn(spark, sfDir)
    val agg = df.groupBy(col("lang"))
      .agg(min(when(col("bucket") === "head", col("lm_score"))).as("minHead"),
        max(when(col("bucket") === "tail", col("lm_score"))).as("maxTail"))
      .collect()
    agg.foreach { r =>
      val (mh, mt) = (r.getAs[java.lang.Double]("minHead"),
        r.getAs[java.lang.Double]("maxTail"))
      if (mh != null && mt != null)
        assert(mh.doubleValue() >= mt.doubleValue(),
          s"${r.getString(0)}: head score $mh below tail score $mt")
    }
  }

  test("q131 OOV rate is n_oov/n_tokens and the vocab covers most mass") {
    val rows = Registry.byName("q131_vocab_oov").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalTok = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("tok")).count()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === totalTok)
    rows.foreach { r =>
      val (n, oov) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"))
      val rate = r.getAs[Double]("oov_rate")
      assert(oov >= 0 && oov <= n)
      assert(math.abs(rate - oov.toDouble / n) < 1e-6)
      // a 1024-word vocab over this fixture's ~few-thousand-word
      // vocabulary must cover the bulk of every source's token mass
      assert(rate < 0.5, s"${r.getString(0)} OOV rate $rate suspicious")
    }
  }

  test("q132 decayed masses are positive, bounded by raw, and maximal at age 0") {
    val rows = Registry.byName("q132_decay_weights").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val effN = r.getAs[Double]("eff_n")
      assert(effN > 0.0 && effN <= n + 1e-9,
        s"${r.getString(0)}: eff_n $effN outside (0, $n]")
    }
    // weight formula sanity against first principles: an event at the
    // corpus max timestamp has age 0 and weight exactly 1, so the
    // per-type effective count must exceed the count of age-0 events
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_type"),
        floor(col("ts").cast("double")).cast("long").as("sec"))
    val mx = ev.agg(max(col("sec"))).head.getLong(0)
    val newest = ev.filter(floor((lit(mx) - col("sec")) / 86400L) === 0)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n0"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val effN = r.getAs[Double]("eff_n")
      assert(effN >= newest.getOrElse(r.getString(0), 0L).toDouble - 1e-9)
    }
  }
}
