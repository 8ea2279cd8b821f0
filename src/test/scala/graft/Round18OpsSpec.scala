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

  test("bucketed co-located join plans ZERO exchanges; plain parquet pays two") {
    import graft.ingest.BucketedTables
    val base = Files.createTempDirectory("graft-bucketed-spec").toString
    val o = BucketedTables.materialize(spark,
      graft.Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_totalprice")),
      "graft_spec_orders_b", s"$base/o", "o_orderkey", 4)
    val l = BucketedTables.materialize(spark,
      graft.Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity")),
      "graft_spec_lineitem_b", s"$base/l", "l_orderkey", 4)
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
    // force the sort-merge path (a broadcast would also have zero
    // exchanges, vacuously) and freeze the plan (AQE hides children)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try staticPlan {
      val bucketed = o.join(l, o("o_orderkey") === l("l_orderkey"))
      assert(bucketed.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.nonEmpty, "bucketed join must be a sort-merge join under the forced conf")
      assert(exchanges(bucketed) === 0,
        "a join between same-key same-count bucketed tables must plan ZERO exchanges")
      val oP = spark.read.parquet(s"$base/o")
      val lP = spark.read.parquet(s"$base/l")
      val plain = oP.join(lP, oP("o_orderkey") === lP("l_orderkey"))
      assert(exchanges(plain) === 2,
        "the plain-parquet twin pays one exchange per side")
      // and the layouts agree on content
      assert(bucketed.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql(s"DROP TABLE IF EXISTS ${BucketedTables.scopedName("graft_spec_orders_b")}")
      spark.sql(s"DROP TABLE IF EXISTS ${BucketedTables.scopedName("graft_spec_lineitem_b")}")
    }
  }

  test("snapshot optimize: clustered rewrite prunes, preserves content, stays CDC-silent, vacuums clean") {
    import spark.implicits._
    import graft.ext.SnapshotLog
    val dir = Files.createTempDirectory("graft-opt-spec").toString
    SnapshotLog.reset(dir, checkpointInterval = 3)
    // two appends clustered on NOTHING price-like: k is the zone-map
    // column pre-optimize, v is what we want to prune on after
    val rows = (0L until 400L).map(k => (k, (k * 37) % 400))
    SnapshotLog.append(rows.take(200).toDF("k", "v"), dir, col("k"))
    SnapshotLog.append(rows.drop(200).toDF("k", "v"), dir, col("k"))
    val vOpt = SnapshotLog.optimize(spark, dir, col("v"),
      Seq(col("v"), col("k")), bucketBits = 2)
    // content identical, old version intact
    val got = SnapshotLog.readAsOf(spark, dir, vOpt)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === rows.sorted)
    assert(SnapshotLog.readAsOf(spark, dir, 1).count() === 400L)
    // v-range read prunes segments the aligned buckets exclude
    val (fr, scanned, total) =
      SnapshotLog.readAsOfFiltered(spark, dir, vOpt, col("v"), 0L, 50L)
    assert(fr.collect().map(_.getLong(1)).forall(_ <= 50L))
    assert(fr.count() === rows.count(_._2 <= 50L))
    assert(scanned < total, s"optimize must prune: scanned $scanned of $total")
    // the rewrite is dataChange=false: the feed across it is silent
    assert(SnapshotLog.readChanges(spark, dir, 1, vOpt).count() === 0L)
    // vacuum reclaims the pre-optimize segments
    val (segsGone, _) = SnapshotLog.vacuum(dir, vOpt)
    assert(segsGone === 2, "both pre-optimize segments must be reclaimed")
    assert(SnapshotLog.readAsOf(spark, dir, vOpt)
      .count() === 400L)
  }

  test("sidecar zone stats: configured columns prune, missing stats never skip, evolution is safe") {
    import spark.implicits._
    import graft.ext.SnapshotLog
    val dir = Files.createTempDirectory("graft-sidecar-spec").toString
    // table property: record v (the NON-primary column) per segment
    SnapshotLog.reset(dir, checkpointInterval = 3,
      statsCols = Seq("v" -> "v"))
    val rows = (0L until 300L).map(k => (k, k % 3))
    // three appends CLUSTERED on v (k interleaves) — the primary zone
    // map (k) cannot prune a v filter, the sidecar can
    (0L until 3L).foreach { m =>
      SnapshotLog.append(rows.filter(_._2 == m).toDF("k", "v"), dir, col("k"))
    }
    val (fr, scanned, total) =
      SnapshotLog.readAsOfFilteredOn(spark, dir, 2, "v", col("v"), 1L, 1L)
    assert(total === 3 && scanned === 1,
      s"sidecar must prune to the one v=1 segment, scanned $scanned/$total")
    assert(fr.collect().map(_.getLong(0)).sorted.toSeq ===
      rows.filter(_._2 == 1L).map(_._1).sorted)
    // a segment WITHOUT the stat (simulating a pre-config history):
    // remove one sidecar — the segment must be KEPT, never skipped
    val seg0 = SnapshotLog.segments(dir, 2).head.relPath
    Files.delete(java.nio.file.Paths.get(dir, seg0, "_zonestats"))
    val (_, scanned2, _) =
      SnapshotLog.readAsOfFilteredOn(spark, dir, 2, "v", col("v"), 1L, 1L)
    assert(scanned2 === 2, "a segment without recorded stats is always scanned")
    // schema evolution: an append carrying a NEW configured column
    // starts recording it; old segments simply have no entry
    val dir2 = Files.createTempDirectory("graft-sidecar-evo").toString
    SnapshotLog.reset(dir2, checkpointInterval = 3,
      statsCols = Seq("x" -> "x"))
    SnapshotLog.append(Seq(1L, 2L).toDF("k"), dir2, col("k"))
    SnapshotLog.append(Seq((3L, 30L), (4L, 40L)).toDF("k", "x"), dir2, col("k"))
    val (fr2, s2, t2) =
      SnapshotLog.readAsOfFilteredOn(spark, dir2, 1, "x", col("x"), 35L, 99L)
    assert(t2 === 2 && s2 === 2, "the statless old segment must be kept")
    assert(fr2.collect().map(_.getLong(0)).toSeq === Seq(4L))
  }

  test("facade: optimizeSnapshot / snapshotReadPruned / bucketize delegate to the real kernels") {
    import spark.implicits._
    import graft.ext.SnapshotLog
    val eng = new GraftEngine(spark, sfDir)
    val dir = Files.createTempDirectory("graft-facade-opt").toString
    SnapshotLog.reset(dir, checkpointInterval = 3,
      statsCols = Seq("v" -> "v"))
    val rows = (0L until 120L).map(k => (k, k % 4))
    SnapshotLog.append(rows.toDF("k", "v"), dir, col("k"))
    val vOpt = eng.optimizeSnapshot(dir, col("k"),
      Seq(col("v"), col("k")), bucketBits = 2)
    val pruned = eng.snapshotReadPruned(dir, vOpt, "v", col("v"), 2L, 2L)
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ===
      rows.filter(_._2 == 2L).map(_._1).sorted)
    val base = Files.createTempDirectory("graft-facade-bkt").toString
    val t = eng.bucketize(
      graft.Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey")), "graft_facade_b", s"$base/o",
      "o_orderkey", 4)
    try assert(t.count() ===
      graft.Tables.load(spark, sfDir, "orders").count())
    finally spark.sql("DROP TABLE IF EXISTS graft_facade_b")
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
