package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** Round-13 additions: tokenizer state export/import (verdict item 8)
  * and the exported-state oracle queries (q204/q205 feeding q199/q143's
  * DuckDB twins).
  */
class Round18OpsSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("unigram tokenizer: encode after reload ≡ encode in session (orc and json)") {
    val eng = new GraftEngine(spark, sfDir)
    try {
      val inSession = rows(eng.query("q199_unigram_encode"))
      Seq("orc", "json").foreach { fmt =>
        val dir = Files.createTempDirectory(s"graft-tok-uni-$fmt").toString
        eng.saveTokenizer(dir, kind = "unigram", rounds = 3, format = fmt)
        // the reloaded path must run WITHOUT the session memo: release
        // caches so a trainer re-run would be visible as drift (it
        // isn't — the state comes from disk)
        TextOps.releaseCaches()
        assert(rows(eng.encodeWithTokenizer(dir, kind = "unigram",
          format = fmt)) === inSession, s"format=$fmt")
      }
    } finally TextOps.releaseCaches()
  }

  test("bpe tokenizer: encode after reload ≡ encode in session") {
    val eng = new GraftEngine(spark, sfDir)
    try {
      val inSession = rows(eng.query("q136_bpe_encode"))
      val dir = Files.createTempDirectory("graft-tok-bpe").toString
      eng.saveTokenizer(dir, kind = "bpe", rounds = 10, format = "orc")
      TextOps.releaseCaches()
      assert(rows(eng.encodeWithTokenizer(dir, kind = "bpe",
        format = "orc")) === inSession)
    } finally TextOps.releaseCaches()
  }

  test("saved unigram state round-trips the segmentation losslessly") {
    val dir = Files.createTempDirectory("graft-tok-seg").toString
    try {
      TextOps.saveUnigramTokenizer(spark, sfDir, rounds = 3, path = dir)
      val (_, _, seg) = TextOps.unigramLoop(spark, sfDir, rounds = 3)
      val expect = seg.select(col("w"), col("freq"), col("ps"))
        .collect().map(_.toString).sorted.toSeq
      val got = TextOps.loadUnigramSegmentation(spark, dir)
        .select(col("w"), col("freq"), col("ps"))
        .collect().map(_.toString).sorted.toSeq
      assert(got === expect)
      // n_sym is consistent with the persisted pieces array
      val bad = TextOps.loadUnigramSegmentation(spark, dir)
        .filter(size(col("ps")) =!= col("n_sym")).count()
      assert(bad === 0L)
    } finally TextOps.releaseCaches()
  }

  test("q204 segmentation export matches the in-session trainer state") {
    try {
      val exported = Registry.byName("q204_unigram_segmentation")
        .fn(spark, sfDir)
      val (_, _, seg) = TextOps.unigramLoop(spark, sfDir, rounds = 3)
      assert(rows(exported) ===
        rows(seg.select(col("w"), col("freq"), size(col("ps")).as("n_sym"))
          .orderBy(col("w"))))
    } finally TextOps.releaseCaches()
  }

  test("q205 deflate export agrees with q143's rollup inputs") {
    val dz = Registry.byName("q205_deflate_sizes").fn(spark, sfDir)
    // re-derive q143 from the export and compare against the registered
    // query — the exact recomputation the DuckDB oracle performs
    val re = dz
      .withColumn("ratio",
        round(col("deflate_bytes").cast("double") / col("raw_bytes"), 6))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("ratio")), 6).as("avg_ratio"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"),
        sum(when(col("ratio") < 0.35, 1L).otherwise(0L)).as("n_repetitive"))
      .orderBy(col("source"))
    assert(rows(re) ===
      rows(Registry.byName("q143_compression_quality").fn(spark, sfDir)))
  }
}
