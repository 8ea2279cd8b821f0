package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.SnapshotLog
import graft.streaming.SnapshotSource

/** Round-15 surfaces: the SnapshotLog streaming SOURCE (checkpointed
  * micro-batch tail, q217), its insert-only/ignoreDeletes contract,
  * the log-to-log mirror, and the round-14 advice regressions
  * (legacy-log CDC DV-column leak, reserved __graft_dv_* namespace).
  */
class Round20OpsSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-r20-$tag").toString

  private def rows(n: Int, from: Int = 0) = {
    import spark.implicits._
    (from until from + n).map(k => (k.toLong, k.toLong % 7, s"r$k"))
      .toDF("k", "m", "s")
  }

  // == SnapshotSource: the checkpointed tail ==

  test("source tails append/compact/delete history exactly once through a crash") {
    val dir = tmp("src-log"); val ck = tmp("src-ck"); val sink = tmp("src-sink")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    def land(df: DataFrame, bid: Long): Unit =
      df.write.mode("overwrite").parquet(s"$sink/batch_id=$bid")
    SnapshotLog.append(rows(40), dir, col("k"))
    assert(SnapshotSource.run(spark, dir, ck)(land) === Seq(0L))
    // caught up: no batch, no offsets churn
    assert(SnapshotSource.run(spark, dir, ck)(land) === Seq.empty)
    SnapshotLog.append(rows(20, from = 40), dir, col("k"))
    SnapshotLog.compact(spark, dir, col("k"))
    // the crash: sink body runs, commit does not
    intercept[RuntimeException] {
      SnapshotSource.run(spark, dir, ck) { (df, bid) =>
        land(df, bid); throw new RuntimeException("crash")
      }
    }
    assert(SnapshotSource.lastPlanned(ck).map(_.batchId) === Some(1L))
    assert(SnapshotSource.lastCommitted(ck) === 0L)
    // restart replays batch 1 with the SAME id and range
    assert(SnapshotSource.run(spark, dir, ck)(land) === Seq(1L))
    SnapshotLog.deleteMor(spark, dir, col("m") === 3)
    assert(SnapshotSource.run(spark, dir, ck)(land) === Seq(2L))
    val out = spark.read.parquet(sink)
    // batch 0: the 40-row initial snapshot; batch 1: the 20-row append
    // once (compaction silent, replay not double-landed); batch 2: the
    // m==3 rows as deletes
    val byBatch = out.groupBy(col("batch_id"), col("_change_type"))
      .count().collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byBatch === Map(
      (0, "insert") -> 40L, (1, "insert") -> 20L,
      (2, "delete") -> rows(60).filter(col("m") === 3).count()))
    // versions tagged truthfully: the compacted v2 contributed nothing
    assert(out.filter(col("batch_id") === 1)
      .select(col("_commit_version")).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(1))
  }

  test("insert-only tail refuses delete-bearing ranges unless ignoreDeletes") {
    val dir = tmp("insonly-log"); val ck = tmp("insonly-ck")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append(rows(30), dir, col("k"))
    var seen = 0L
    SnapshotSource.run(spark, dir, ck, cdc = false) { (df, _) =>
      seen += df.count()
      assert(!df.columns.contains("_change_type"))
      assert(df.columns.contains("_commit_version"))
    }
    assert(seen === 30L)
    SnapshotLog.deleteMor(spark, dir, col("m") === 1)
    val e = intercept[IllegalArgumentException] {
      SnapshotSource.run(spark, dir, ck, cdc = false)((_, _) => ())
    }
    assert(e.getMessage.contains("ignoreDeletes"))
    // refusal leaves the batch uncommitted: ignoreDeletes then drains
    // the SAME planned range, delivering only inserts (none here)
    var n = 0L
    SnapshotSource.run(spark, dir, ck, cdc = false,
      ignoreDeletes = true)((df, _) => n += df.count())
    assert(n === 0L)
    assert(SnapshotSource.lastCommitted(ck) === 1L)
  }

  test("insert-only initial snapshot of a delete-bearing, vacuumed log is net state") {
    val dir = tmp("init-log"); val ck = tmp("init-ck")
    SnapshotLog.reset(dir, checkpointInterval = 1)
    SnapshotLog.append(rows(30), dir, col("k"))
    SnapshotLog.deleteMor(spark, dir, col("m") === 1)
    SnapshotLog.compact(spark, dir, col("k"))
    SnapshotLog.vacuum(dir, 2) // manifests v0/v1 are gone
    // the initial snapshot is NET state: historical deletes are already
    // absent (Delta's starting-snapshot semantics) — the insert-only
    // refusal must not fire, and no pre-horizon manifest may be opened
    var n = 0L
    SnapshotSource.run(spark, dir, ck, cdc = false)((df, _) => n += df.count())
    assert(n === 30L - rows(30).filter(col("m") === 1).count())
  }

  test("a tail lagging behind vacuum fails loudly instead of skipping data") {
    val dir = tmp("lag-log"); val ck = tmp("lag-ck")
    SnapshotLog.reset(dir, checkpointInterval = 1)
    SnapshotLog.append(rows(10), dir, col("k"))
    // the tail consumes v0, then falls behind while the log advances
    SnapshotSource.run(spark, dir, ck)((_, _) => ())
    (1 to 3).foreach(i => SnapshotLog.append(rows(10, from = i * 10),
      dir, col("k")))
    // retention overtakes the tail's offset: manifests v0/v1 drop
    SnapshotLog.vacuum(dir, 2)
    // the planned range (0, 3] needs v0's manifest — delivering a
    // partial feed would silently lose v1's rows, so the walk must
    // fail loudly (the Delta "files were deleted by retention" error;
    // retention policy coordinates with consumer lag, never the
    // reverse)
    val e = intercept[IllegalArgumentException] {
      SnapshotSource.run(spark, dir, ck)((_, _) => ())
    }
    assert(e.getMessage.contains("no snapshot"))
  }

  test("maxVersionsPerTrigger chunks a long catch-up into bounded batches") {
    val dir = tmp("rate-log"); val ck = tmp("rate-ck")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    (0 until 5).foreach(i => SnapshotLog.append(rows(10, from = i * 10),
      dir, col("k")))
    var ranges = Seq.empty[(Int, Int)]
    var n = 0L
    SnapshotSource.run(spark, dir, ck, maxVersionsPerTrigger = 2) {
      (df, _) =>
        n += df.count()
        val p = SnapshotSource.lastPlanned(ck).get
        ranges :+= (p.fromV, p.toV)
    }
    // 5 versions drain as (−1,1], (1,3], (3,4] — each batch ≤ 2
    // versions; the union is exactly-once over the full history
    assert(ranges === Seq((-1, 1), (1, 3), (3, 4)))
    assert(n === 50L)
    // caught up: nothing more, and the cap never replans a done range
    assert(SnapshotSource.run(spark, dir, ck,
      maxVersionsPerTrigger = 2)((_, _) => ()) === Seq.empty)
  }

  test("two tails racing one checkpoint fail loudly, not split-brain") {
    val dir = tmp("race-log"); val ck = tmp("race-ck")
    SnapshotLog.reset(dir)
    SnapshotLog.append(rows(10), dir, col("k"))
    // tail A plans batch 0 but has not committed; tail B (same ck dir)
    // must not plan a conflicting batch 0 offsets entry
    val planned = SnapshotSource.planNext(dir, ck)
    assert(planned.map(_.batchId) === Some(0L))
    // B's planNext sees the uncommitted WAL entry and replays it — the
    // single defined recovery path
    assert(SnapshotSource.planNext(dir, ck) === planned)
  }

  test("mirror: log-to-log tail is exactly-once end-to-end through a sink crash") {
    val src = tmp("mir-src"); val ck = tmp("mir-ck"); val dst = tmp("mir-dst")
    SnapshotLog.reset(src, checkpointInterval = 3)
    SnapshotLog.reset(dst, checkpointInterval = 3)
    SnapshotLog.append(rows(25), src, col("k"))
    assert(SnapshotSource.mirror(spark, src, ck, dst, "k") === Seq(0L))
    SnapshotLog.append(rows(25, from = 25), src, col("k"))
    // crash AFTER the dst commit, BEFORE the source checkpoint commit:
    // the worst case — the replayed batch must hit dst's batch-id gate
    intercept[RuntimeException] {
      SnapshotSource.run(spark, src, ck, cdc = false) { (df, bid) =>
        graft.streaming.StreamOps.snapshotCommitBatch(
          df.drop("_commit_version"), dst, "k", bid)
        throw new RuntimeException("crash after dst commit")
      }
    }
    assert(SnapshotSource.mirror(spark, src, ck, dst, "k") === Seq(1L))
    val srcRows = SnapshotLog.readAsOf(spark, src, SnapshotLog.version(src))
      .collect().map(_.toString).sorted.toSeq
    val dstRows = SnapshotLog.readAsOf(spark, dst, SnapshotLog.version(dst))
      .collect().map(_.toString).sorted.toSeq
    assert(dstRows === srcRows)
    // exactly one dst commit per source batch — no replay double-land
    assert(SnapshotLog.version(dst) === 1)
  }

  // == Incremental materialized-view maintenance (q221's kernel) ==

  test("maintainView recomputes only affected groups, survives crash-replay, retires vanished groups") {
    import spark.implicits._
    val src = tmp("ivm-src"); val ck = tmp("ivm-ck"); val view = tmp("ivm-view")
    SnapshotLog.reset(src, checkpointInterval = 3)
    SnapshotLog.reset(view, checkpointInterval = 3)
    def srcRows(ks: Range) = ks.map(k => (k.toLong, k.toLong % 10, k * 2L))
      .toDF("k", "g", "v")
    def viewOf(scoped: org.apache.spark.sql.DataFrame) =
      scoped.groupBy(col("g2")).agg(count(lit(1)).as("n"),
        sum(col("v")).as("v_sum"))
    def refresh() = SnapshotSource.maintainView(spark, src, ck, view,
      "g2", col("g"), col("n"))(viewOf)
    def viewContent(): Map[Long, (Long, Long)] =
      SnapshotLog.readAsOf(spark, view, SnapshotLog.version(view))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    def expect(pred: Long => Boolean, ks: Range*): Map[Long, (Long, Long)] = {
      val all = ks.flatMap(_.toSeq).filter(k => pred(k % 10))
      all.groupBy(_ % 10).map { case (g, s) =>
        g.toLong -> (s.size.toLong, s.map(_ * 2L).sum)
      }
    }
    SnapshotLog.append(srcRows(0 until 50), src, col("k"))
    refresh()
    assert(viewContent() === expect(_ => true, 0 until 50))
    // batch B touches groups 0..4 only — the refresh must merge
    // EXACTLY those 5 group images, not the view
    SnapshotLog.append(srcRows(50 until 55), src, col("k"))
    refresh()
    val vMerge = SnapshotLog.version(view)
    val cdc = SnapshotLog.readCdc(spark, view, vMerge - 1, vMerge)
    assert(cdc.filter(col("_change_type") === "insert").count() === 5L,
      "refresh must upsert only the 5 affected groups")
    assert(viewContent() === expect(_ => true, 0 until 55))
    // crash-replay: the source checkpoint's newest commit marker is
    // lost AFTER the view was updated — the replay recomputes from the
    // WAL-pinned toV and upserts byte-identical images
    val commits = java.nio.file.Paths.get(ck, "commits")
    val newest = Files.list(commits).toArray.map(_.toString)
      .map(java.nio.file.Paths.get(_))
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toInt)
    Files.delete(newest)
    refresh()
    assert(viewContent() === expect(_ => true, 0 until 55),
      "crash-replay must be idempotent by value")
    // a whole group vanishes from the source: the refresh retires it
    SnapshotLog.deleteMor(spark, src, col("g") === 7)
    refresh()
    assert(viewContent() === expect(_ != 7L, 0 until 55))
  }

  test("a scheduled optimizeIncremental converges: its own output is never re-selected") {
    val dir = tmp("incopt-conv")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append(rows(5), dir, col("k"))
    SnapshotLog.append(rows(5, from = 5), dir, col("k"))
    def run() = SnapshotLog.optimizeIncremental(spark, dir, col("k"),
      Seq(col("k")), bucketBits = 1, smallBytes = Long.MaxValue,
      minTombstoneRatio = 0.1)
    val v1 = run()
    assert(v1 === 2, "first run coalesces the two small ingest segments")
    // the rewrite's own output is tiny too — but it is #compacted, so
    // the size arm skips it and the maintenance loop terminates
    assert(run() === v1, "second run must select nothing and commit nothing")
    assert(SnapshotLog.readAsOf(spark, dir, v1).count() === 10L)
    // a tombstone re-opens the pool: the next run rewrites again
    SnapshotLog.deleteMor(spark, dir, col("m") === 1)
    assert(run() > v1 + 1)
  }

  test("maintainView refuses null group keys loudly") {
    import spark.implicits._
    val src = tmp("ivm-null-src"); val ck = tmp("ivm-null-ck")
    val view = tmp("ivm-null-view")
    SnapshotLog.reset(src, checkpointInterval = 3)
    SnapshotLog.reset(view, checkpointInterval = 3)
    SnapshotLog.append(
      Seq((1L, Some(1L), 2L), (2L, None, 4L)).toDF("k", "g", "v"),
      src, col("k"))
    // a null key never matches the equi semi-join or the vanish
    // predicate — silent divergence from a from-scratch recompute; the
    // contract demands a loud refusal instead
    val e = intercept[IllegalArgumentException] {
      SnapshotSource.maintainView(spark, src, ck, view, "g2", col("g"),
        col("n")) { scoped =>
        scoped.groupBy(col("g2")).agg(count(lit(1)).as("n"))
      }
    }
    assert(e.getMessage.contains("non-null"))
  }

  // == RESTORE (q222's kernel) ==

  private def content(dir: String, v: Int): Seq[String] =
    SnapshotLog.readAsOf(spark, dir, v)
      .collect().map(_.toString).sorted.toSeq

  test("restore across a MoR delete: content exact, tombstone images flow as inserts") {
    val dir = tmp("rst-mor")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append(rows(60), dir, col("k"))
    SnapshotLog.append(rows(40, from = 60), dir, col("k"))
    val before = content(dir, 1)
    val vBad = SnapshotLog.deleteMor(spark, dir, col("m") === 2)
    val vRst = SnapshotLog.restore(spark, dir, 1, col("k"))
    assert(content(dir, vRst) === before, "restored content must equal v1")
    // the bad version still time-travels
    assert(SnapshotLog.readAsOf(spark, dir, vBad).count() ===
      100L - rows(100).filter(col("m") === 2).count())
    // row-level CDC on the pure-MoR path: the reappearing rows are
    // EXACTLY the tombstone images, nothing disappears
    val cdc = SnapshotLog.readCdc(spark, dir, vBad, vRst)
    assert(cdc.filter(col("_change_type") === "delete").count() === 0L)
    assert(cdc.filter(col("_change_type") === "insert")
      .select(col("k")).collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until 100L).filter(_ % 7 == 2))
    // the restore composes forward: append + compact + read stay exact
    SnapshotLog.append(rows(10, from = 100), dir, col("k"))
    val vCpt = SnapshotLog.compact(spark, dir, col("k"))
    assert(SnapshotLog.readAsOf(spark, dir, vCpt).count() === 110L)
  }

  test("restore across schema evolution keeps the evolved (wider) schema") {
    import spark.implicits._
    val dir = tmp("rst-evo")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append((0L until 20L).toDF("k"), dir, col("k"))
    SnapshotLog.append((20L until 30L).map(k => (k, k * 7))
      .toDF("k", "x"), dir, col("k"))
    val vRst = SnapshotLog.restore(spark, dir, 0, col("k"))
    val df = SnapshotLog.readAsOf(spark, dir, vRst)
    // add-only evolution: restore never narrows a reader's schema —
    // v0's rows come back null-filled under the evolved shape
    assert(df.columns.toSeq === Seq("k", "x"))
    assert(df.count() === 20L)
    assert(df.filter(col("x").isNull).count() === 20L)
    // a wide append after the restore still gates correctly
    SnapshotLog.append(Seq((99L, 1L)).toDF("k", "x"), dir, col("k"))
    assert(SnapshotLog.readAsOf(spark, dir, vRst + 1).count() === 21L)
  }

  test("restore to the head is a no-op; vacuum reclaims the rolled-back files") {
    val dir = tmp("rst-vac")
    SnapshotLog.reset(dir, checkpointInterval = 1)
    SnapshotLog.append(rows(30), dir, col("k"))
    val vBad = SnapshotLog.delete(spark, dir, col("m") === 1, col("k"))
    assert(SnapshotLog.restore(spark, dir, vBad, col("k")) === vBad)
    val vRst = SnapshotLog.restore(spark, dir, 0, col("k"))
    assert(content(dir, vRst) === content(dir, 0))
    // retention applies normally: pre-restore versions drop, the
    // restored head keeps reading
    SnapshotLog.vacuum(dir, vRst)
    assert(SnapshotLog.readAsOf(spark, dir, vRst).count() === 30L)
    intercept[Exception] {
      SnapshotLog.readAsOf(spark, dir, vBad).count()
    }
  }

  // == Round-14 advice regressions ==

  test("readCdc on a schema-less legacy log drops the reserved DV key columns") {
    val dir = tmp("legacy-cdc")
    SnapshotLog.reset(dir, checkpointInterval = 1)
    SnapshotLog.append(rows(30), dir, col("k"))
    // forge a LEGACY log: strip #schema lines from every manifest (the
    // pre-schema-logging layout external logs may still carry)
    val log = java.nio.file.Paths.get(dir, "_log")
    val st = Files.list(log)
    try st.iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".manifest"))
      .foreach { mf =>
        val kept = Files.readAllLines(mf).asScala
          .filterNot(_.startsWith("#schema\t"))
        Files.write(mf, kept.mkString("\n").getBytes("UTF-8"))
      }
    finally st.close()
    assert(SnapshotLog.schemaOf(dir, 0).isEmpty)
    val v = SnapshotLog.deleteMor(spark, dir, col("m") === 2)
    val cdc = SnapshotLog.readCdc(spark, dir, v - 1, v)
    // before the fix this threw on unionByName (or leaked the columns)
    assert(!cdc.columns.exists(_.startsWith("__graft_dv_")))
    assert(cdc.filter(col("_change_type") === "delete").count() ===
      rows(30).filter(col("m") === 2).count())
  }

  // == Incremental OPTIMIZE (q218's kernel) ==

  test("optimizeIncremental coalesces small segments; big segments carry byte-identical") {
    val dir = tmp("incopt")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append(rows(1000), dir, col("k")) // the big segment
    SnapshotLog.append(rows(5, from = 1000), dir, col("k")) // tiny
    SnapshotLog.append(rows(5, from = 1005), dir, col("k")) // tiny
    SnapshotLog.append(rows(5, from = 1010), dir, col("k")) // tiny
    val health = SnapshotLog.segmentHealth(spark, dir, 3)
    val bigRel = health.maxBy(_.bytes).relPath
    assert(health.head.relPath === bigRel, "first commit must be the big one")
    // the big segment's exact on-disk file listing, to prove untouched
    def listing(rel: String): Seq[(String, Long)] = {
      val st = Files.walk(java.nio.file.Paths.get(dir, rel))
      try st.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => p.toString -> Files.size(p)).toSeq.sorted
      finally st.close()
    }
    val bigBefore = listing(bigRel)
    // threshold between tiny and big: the size-arm selects the three
    // tiny segments only (no tombstones anywhere)
    val v = SnapshotLog.optimizeIncremental(spark, dir, col("k"),
      Seq(col("k")), bucketBits = 1,
      smallBytes = health.maxBy(_.bytes).bytes,
      minTombstoneRatio = 0.1)
    val post = SnapshotLog.segments(dir, v).map(_.relPath)
    assert(post.head === bigRel, "big segment must carry by reference")
    assert(post.size <= 1 + 2, "three tiny segments coalesce into <=2^1")
    assert(listing(bigRel) === bigBefore, "carried segment files changed")
    assert(SnapshotLog.readAsOf(spark, dir, v).count() === 1015L)
    // maintenance rewrite: the change feed must stay silent
    assert(SnapshotLog.readChanges(spark, dir, 3, v).count() === 0L)
  }

  test("a DV spanning kept and selected files survives; a fully-replaced DV drops") {
    val dir = tmp("incopt-dv")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append(rows(100), dir, col("k")) // segment A
    SnapshotLog.append(rows(100, from = 100), dir, col("k")) // segment B
    val vDel = SnapshotLog.deleteMor(spark, dir,
      pmod(col("k"), lit(10L)) === 5) // one DV touching BOTH segments
    assert(SnapshotLog.meta(dir, vDel).dvs.size === 1)
    val segB = SnapshotLog.segments(dir, vDel)(1).relPath
    val v1 = SnapshotLog.optimizeSegments(spark, dir, col("k"),
      Seq(col("k")), Set(segB), bucketBits = 1)
    // B's tombstones materialized into its rewrite, but the DV still
    // tombstones segment A's files — it must stay active
    assert(SnapshotLog.meta(dir, v1).dvs.size === 1,
      "DV still referencing a kept file must survive")
    assert(SnapshotLog.readAsOf(spark, dir, v1).count() === 180L)
    // now rewrite A too: every DV key points at a replaced file — the
    // active set empties (read rent gone), content unchanged
    val segA = SnapshotLog.segments(dir, v1).head.relPath
    assert(segA === SnapshotLog.segments(dir, vDel).head.relPath)
    val v2 = SnapshotLog.optimizeSegments(spark, dir, col("k"),
      Seq(col("k")), Set(segA), bucketBits = 1)
    assert(SnapshotLog.meta(dir, v2).dvs.isEmpty,
      "fully-replaced DV must leave the active set")
    assert(SnapshotLog.readAsOf(spark, dir, v2).count() === 180L)
  }

  test("segmentHealth: stale DV entries never count against rewritten segments") {
    val dir = tmp("health-stale")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append(rows(100), dir, col("k"))
    SnapshotLog.deleteMor(spark, dir, col("m") === 1)
    val h1 = SnapshotLog.segmentHealth(spark, dir, 1)
    val expectDv = rows(100).filter(col("m") === 1).count()
    assert(h1.map(_.dvRows).sum === expectDv)
    assert(h1.forall(h => h.tombstoneRatio > 0.0))
    // a copy-on-write delete rewrites the touched segment; the DV
    // carries forward but its keys name the REPLACED file — health
    // must report the fresh segment clean, not inherit ghosts
    val v = SnapshotLog.delete(spark, dir, col("k") < 10, col("k"))
    val h2 = SnapshotLog.segmentHealth(spark, dir, v)
    assert(h2.forall(_.dvRows === 0L),
      s"stale DV counted against a rewrite: $h2")
    assert(h2.map(_.rows).sum ===
      SnapshotLog.readAsOf(spark, dir, v).count())
    assert(h2.forall(_.bytes > 0L))
  }

  test("segment row counts ride the sidecar; legacy segments fall back to a scan") {
    val dir = tmp("rows-sidecar")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append(rows(50), dir, col("k"))
    val seg0 = SnapshotLog.segments(dir, 0).head.relPath
    // the writer's one-pass stat aggregate recorded the count — health
    // reads it as metadata, no row scan
    assert(SnapshotLog.sidecarStats(dir, seg0).get("__rows")
      .map(_._1) === Some(50L))
    assert(SnapshotLog.segmentHealth(spark, dir, 0).map(_.rows) === Seq(50L))
    // a LEGACY segment (no sidecar) falls back to a column-free scan —
    // same answer, mixed histories stay safe
    Files.delete(java.nio.file.Paths.get(dir, seg0, "_zonestats"))
    val h = SnapshotLog.segmentHealth(spark, dir, 0)
    assert(h.map(_.rows) === Seq(50L))
    assert(h.head.statsCovered === 0)
    // the reserved __ namespace is refused for user stat names
    val dir2 = tmp("rows-reserved")
    intercept[IllegalArgumentException] {
      SnapshotLog.reset(dir2, statsCols = Seq("__rows" -> "k"))
    }
  }

  // == CDC-driven incremental kNN (q219's kernel) ==

  test("incrementalKnnFromLog: the increment reads ONLY the delta segment") {
    val dir = tmp("knncdc")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    SnapshotLog.append(e.filter(col("vec_id") % 5 =!= 0), dir, col("vec_id"))
    SnapshotLog.append(e.filter(col("vec_id") % 5 === 0), dir, col("vec_id"))
    val deltaRel = SnapshotLog.segments(dir, 1).last.relPath
    val ch = SnapshotLog.readChanges(spark, dir, 0, 1)
    assert(ch.inputFiles.nonEmpty &&
      ch.inputFiles.forall(_.contains(deltaRel)),
      "increment must open only the delta segment's files")
    assert(ch.count() === e.filter(col("vec_id") % 5 === 0).count())
    // the facade path ≡ the predicate path on the same increment set
    val fromLog = new GraftEngine(spark, sfDir)
      .incrementalKnnFromLog(dir, 0, 1)
      .collect().map(_.toString).sorted.toSeq
    val direct = graft.queries.VectorOps.incrementalKnnOf(spark, e,
        col("vec_id") % 5 === 0)
      .collect().map(_.toString).sorted.toSeq
    assert(fromLog === direct)
  }

  test("appends refuse columns in the reserved __graft_dv_* namespace") {
    import spark.implicits._
    val dir = tmp("reserved")
    SnapshotLog.reset(dir)
    val bad = Seq((1L, "x")).toDF("k", "__graft_dv_file")
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.append(bad, dir, col("k"))
    }
    assert(e.getMessage.contains("__graft_dv_"))
    // the refusal left nothing behind — the log is still pristine
    assert(SnapshotLog.version(dir) === -1)
    SnapshotLog.append(rows(5), dir, col("k"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.merge(spark,
        Seq((1L, 9L, "u", "z")).toDF("k", "m", "s", "__graft_dv_pos"),
        dir, "k", col("k"))
    }
    assert(e2.getMessage.contains("__graft_dv_"))
  }
}
