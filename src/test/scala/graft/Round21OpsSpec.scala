package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.SnapshotLog
import graft.streaming.SnapshotSource

/** Round-16 surfaces: MERGE key-range discovery pruning, first-class
  * UPDATE (CoW + MoR) with typed CDC rows, the insert-only tail's
  * ignoreDeletes/ignoreChanges classification, maintainView's churn
  * suppression, shallow CLONE, and the round-15 advice regressions
  * (all-null sidecar sentinel coverage).
  */
class Round21OpsSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-r21-$tag").toString

  private def rows(n: Int, from: Int = 0) = {
    import spark.implicits._
    (from until from + n).map(k => (k.toLong, k.toLong % 7, s"r$k"))
      .toDF("k", "m", "s")
  }

  /** Three key-clustered segments: k in [0,100), [100,200), [200,300). */
  private def keyClusteredLog(tag: String,
      withStats: Boolean): (String, Seq[String]) = {
    val dir = tmp(tag)
    SnapshotLog.reset(dir, checkpointInterval = 4,
      statsCols = if (withStats) Seq("k" -> "k") else Nil)
    SnapshotLog.append(rows(100), dir, col("k"))
    SnapshotLog.append(rows(100, from = 100), dir, col("k"))
    SnapshotLog.append(rows(100, from = 200), dir, col("k"))
    (dir, SnapshotLog.segments(dir, 2).map(_.relPath))
  }

  private def sortedRows(df: DataFrame): Seq[(Long, Long, String)] =
    df.select(col("k"), col("m"), col("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted

  // == MERGE key-range discovery pruning (round-16 item 1) ==

  test("merge discovery prunes to key-range-overlapping segments") {
    val (dir, segs) = keyClusteredLog("mprune", withStats = true)
    val src = rows(11, from = 120).withColumn("s", lit("upd"))
    // the skip decision itself: only the middle segment can overlap
    val cand = SnapshotLog.mergeCandidateSegs(spark, dir, 2, "k", src)
    assert(cand.map(_.relPath) === Seq(segs(1)))
    val vM = SnapshotLog.merge(spark, src, dir, "k", col("k"))
    val post = SnapshotLog.segments(dir, vM).map(_.relPath)
    // non-overlapping segments carried by reference, in place
    assert(post.take(2) === Seq(segs(0), segs(2)))
    assert(!post.contains(segs(1)))
    // answers independent of pruning: 300 rows, exactly [120,130] updated
    val out = sortedRows(SnapshotLog.readAsOf(spark, dir, vM))
    assert(out.size === 300)
    assert(out.count(_._3 == "upd") === 11)
    assert(out.filter(r => r._1 >= 120 && r._1 <= 130).forall(_._3 == "upd"))
  }

  test("merge discovery without a key stat falls back to full candidates") {
    val (dir, segs) = keyClusteredLog("mfull", withStats = false)
    val src = rows(5, from = 120)
    val cand = SnapshotLog.mergeCandidateSegs(spark, dir, 2, "k", src)
    assert(cand.map(_.relPath) === segs)
  }

  test("merge discovery never skips a segment without a recorded range") {
    val (dir, _) = keyClusteredLog("mlegacy", withStats = true)
    // simulate a pre-evolution segment: strip its sidecar
    val legacy = SnapshotLog.segments(dir, 2).map(_.relPath).head
    Files.delete(Paths.get(dir, legacy, "_zonestats"))
    val src = rows(5, from = 250) // overlaps only the third segment
    val cand = SnapshotLog.mergeCandidateSegs(spark, dir, 2, "k", src)
      .map(_.relPath)
    // stat-less segment kept (safety), middle segment skipped
    assert(cand.contains(legacy))
    assert(cand.size === 2)
  }

  test("mergeMor discovery prunes and matches the copy-on-write answer") {
    val (cowDir, _) = keyClusteredLog("mm-cow", withStats = true)
    val (morDir, morSegs) = keyClusteredLog("mm-mor", withStats = true)
    val src = rows(11, from = 120).withColumn("s", lit("upd"))
      .unionByName(rows(3, from = 500)) // inserts outside every range
    SnapshotLog.merge(spark, src, cowDir, "k", col("k"))
    val vM = SnapshotLog.mergeMor(spark, src, morDir, "k", col("k"))
    assert(sortedRows(SnapshotLog.readAsOf(spark, morDir, vM)) ===
      sortedRows(SnapshotLog.readAsOf(spark, cowDir,
        SnapshotLog.version(cowDir))))
    // MoR structure: every pre-merge segment carried, one src segment
    val post = SnapshotLog.segments(morDir, vM).map(_.relPath)
    assert(post.startsWith(morSegs) && post.size === morSegs.size + 1)
  }

  test("composite-key merge matches on every key column and still prunes") {
    import spark.implicits._
    def build(tag: String): String = {
      val dir = tmp(tag)
      SnapshotLog.reset(dir, checkpointInterval = 4,
        statsCols = Seq("k" -> "k"))
      def lines(from: Int, n: Int) =
        (from until from + n).flatMap(k =>
          Seq(1L, 2L).map(ln => (k.toLong, ln, s"r$k-$ln")))
          .toDF("k", "ln", "s")
      SnapshotLog.append(lines(0, 50), dir, col("k"))
      SnapshotLog.append(lines(100, 50), dir, col("k"))
      dir
    }
    val cow = build("ck-cow"); val mor = build("ck-mor")
    // replace ONLY line 1 of keys 110..119
    val src = (110 until 120).map(k => (k.toLong, 1L, "upd"))
      .toDF("k", "ln", "s")
    // pruning intersects per key column: the k stat alone prunes to
    // the second segment
    val cand = SnapshotLog.mergeCandidateSegsKeys(spark, cow, 1,
      Seq("k", "ln"), src)
    assert(cand.size === 1)
    SnapshotLog.mergeKeys(spark, src, cow, Seq("k", "ln"), col("k"))
    val vM = SnapshotLog.mergeMorKeys(spark, src, mor, Seq("k", "ln"),
      col("k"))
    def state(dir: String) = SnapshotLog.readAsOf(spark, dir,
        SnapshotLog.version(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq.sorted
    assert(state(cow) === state(mor))
    val got = state(mor)
    assert(got.size === 200)
    // line 1 of the cohort replaced; line 2 of the SAME keys untouched
    // (a single-key merge on k would have dropped or replaced it)
    assert(got.filter(r => r._1 >= 110 && r._1 < 120 && r._2 == 1L)
      .forall(_._3 == "upd"))
    assert(got.filter(r => r._1 >= 110 && r._1 < 120 && r._2 == 2L)
      .forall(_._3 != "upd"))
    // typed feed: exactly the replaced line images as deletes
    val dels = SnapshotLog.readCdc(spark, mor, 1, vM)
      .filter(col("_change_type") === "delete")
    assert(dels.count() === 10L)
    assert(dels.filter(col("ln") =!= 1L).count() === 0L)
  }

  // == First-class UPDATE (round-16 item 2) ==

  test("update (CoW) rewrites only touched segments, emits typed CDC") {
    val (dir, segs) = keyClusteredLog("upd-cow", withStats = true)
    val pred = col("k") < 100 && col("m") === 3
    val vU = SnapshotLog.update(spark, dir, pred,
      Seq("s" -> concat(col("s"), lit("!"))), col("k"))
    // only the first segment was touched; the others carry in place
    val post = SnapshotLog.segments(dir, vU).map(_.relPath)
    assert(post.take(2) === Seq(segs(1), segs(2)))
    assert(!post.contains(segs(0)))
    // content: same count, exactly the matched rows updated
    val out = sortedRows(SnapshotLog.readAsOf(spark, dir, vU))
    assert(out.size === 300)
    val expected = sortedRows(rows(300)).map {
      case (k, m, s) if k < 100 && m == 3 => (k, m, s + "!")
      case r => r
    }
    assert(out === expected)
    // time travel intact
    assert(sortedRows(SnapshotLog.readAsOf(spark, dir, 2)) ===
      sortedRows(rows(300)))
    // typed feed: pre/post pairs only, no plain inserts or deletes
    val cdc = SnapshotLog.readCdc(spark, dir, 2, vU)
    val byType = cdc.groupBy(col("_change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMatched = rows(300).filter(pred).count()
    assert(byType === Map(
      "update_preimage" -> nMatched, "update_postimage" -> nMatched))
    assert(cdc.filter(col("_change_type") === "update_preimage")
      .filter(col("s").endsWith("!")).count() === 0L)
    assert(cdc.filter(col("_change_type") === "update_postimage")
      .filter(!col("s").endsWith("!")).count() === 0L)
    // insert-only readChanges delivers the new images (the documented
    // ignoreChanges drift shape), never the old ones
    val ch = SnapshotLog.readChanges(spark, dir, 2, vU)
    assert(ch.count() === nMatched)
    assert(ch.filter(!col("s").endsWith("!")).count() === 0L)
  }

  test("updateMor matches update (CoW) and tombstones instead of rewriting") {
    val (cowDir, _) = keyClusteredLog("upd-c2", withStats = true)
    val (morDir, morSegs) = keyClusteredLog("upd-m2", withStats = true)
    val pred = col("m") === 5
    val set = Seq("s" -> upper(col("s")), "m" -> (col("m") + 100L))
    SnapshotLog.update(spark, cowDir, pred, set, col("k"))
    val vU = SnapshotLog.updateMor(spark, morDir, pred, set, col("k"))
    assert(sortedRows(SnapshotLog.readAsOf(spark, morDir, vU)) ===
      sortedRows(SnapshotLog.readAsOf(spark, cowDir,
        SnapshotLog.version(cowDir))))
    // MoR shape: all three segments carried + one post segment, one DV
    val post = SnapshotLog.segments(morDir, vU).map(_.relPath)
    assert(post.startsWith(morSegs) && post.size === morSegs.size + 1)
    assert(SnapshotLog.meta(morDir, vU).dvs.size === 1)
    // typed CDC identical across flavors
    def typed(dir: String, v: Int) =
      SnapshotLog.readCdc(spark, dir, 2, v)
        .select(col("_change_type"), col("k"), col("m"), col("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq.sorted
    assert(typed(morDir, vU) ===
      typed(cowDir, SnapshotLog.version(cowDir)))
    // compact materializes the tombstones away, content unchanged
    val before = sortedRows(SnapshotLog.readAsOf(spark, morDir, vU))
    val vC = SnapshotLog.compact(spark, morDir, col("k"))
    assert(SnapshotLog.meta(morDir, vC).dvs.isEmpty)
    assert(sortedRows(SnapshotLog.readAsOf(spark, morDir, vC)) === before)
  }

  test("multi-assignment UPDATE is simultaneous: SET k = m, m = k swaps") {
    import spark.implicits._
    Seq(true, false).foreach { mor =>
      val dir = tmp(if (mor) "swap-mor" else "swap-cow")
      SnapshotLog.reset(dir, checkpointInterval = 4)
      SnapshotLog.append(
        (0 until 20).map(i => (i.toLong, i.toLong + 1000L)).toDF("a", "b"),
        dir, col("a"))
      val pred = col("a") < 5
      // every assignment sees the OLD row (SQL UPDATE): a fold would
      // compute b from the already-overwritten a
      val set = Seq("a" -> col("b"), "b" -> col("a"))
      val v =
        if (mor) SnapshotLog.updateMor(spark, dir, pred, set, col("a"))
        else SnapshotLog.update(spark, dir, pred, set, col("a"))
      val got = SnapshotLog.readAsOf(spark, dir, v)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val expected = (0 until 20).map { i =>
        if (i < 5) (i.toLong + 1000L, i.toLong)
        else (i.toLong, i.toLong + 1000L)
      }.sorted
      assert(got === expected, s"mor=$mor")
    }
    // assigning one column twice is ambiguous — refused
    val dir = tmp("swap-dup")
    SnapshotLog.reset(dir, checkpointInterval = 4)
    SnapshotLog.append(rows(5), dir, col("k"))
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.update(spark, dir, col("m") === 1,
        Seq("s" -> lit("x"), "s" -> lit("y")), col("k"))
    }
    assert(e.getMessage.contains("twice"))
  }

  test("update refuses unknown columns and keeps the schema identical") {
    val (dir, _) = keyClusteredLog("upd-gate", withStats = true)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.update(spark, dir, col("m") === 1,
        Seq("nope" -> lit(1L)), col("k"))
    }
    assert(e.getMessage.contains("unknown column"))
    // assignment casts back to the recorded type: schema bit-identical
    val v = SnapshotLog.update(spark, dir, col("m") === 1,
      Seq("m" -> lit(42)), col("k")) // Int literal into a Long column
    assert(SnapshotLog.schemaOf(dir, v) === SnapshotLog.schemaOf(dir, 2))
    assert(SnapshotLog.readAsOf(spark, dir, v)
      .filter(col("m") === 42L).count() ===
      rows(300).filter(col("m") === 1).count())
    // a predicate matching nothing commits nothing
    assert(SnapshotLog.update(spark, dir, col("m") === -1L,
      Seq("m" -> lit(0L)), col("k")) === v)
  }

  // == Insert-only tail classification (round-15 advice) ==

  test("insert-only tail distinguishes deletes from updates/merges") {
    val dir = tmp("gate-log")
    SnapshotLog.reset(dir, checkpointInterval = 4)
    SnapshotLog.append(rows(50), dir, col("k"))
    def drain(ck: String, ignoreDeletes: Boolean = false,
        ignoreChanges: Boolean = false): Seq[DataFrame] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      SnapshotSource.run(spark, dir, ck, cdc = false,
        ignoreDeletes = ignoreDeletes, ignoreChanges = ignoreChanges) {
        (df, _) => got += df.cache()
      }
      got.toSeq
    }
    val ck1 = tmp("gate-ck1")
    drain(ck1) // initial snapshot
    // a pure upsert: update-bearing, NOT delete-bearing
    SnapshotLog.mergeMor(spark,
      rows(5).withColumn("s", lit("new")), dir, "k", col("k"))
    val e1 = intercept[IllegalArgumentException] { drain(ck1) }
    assert(e1.getMessage.contains("ignoreChanges"))
    // ignoreDeletes does NOT cover updates (the round-15 advice bug)
    val e2 = intercept[IllegalArgumentException] {
      drain(ck1, ignoreDeletes = true)
    }
    assert(e2.getMessage.contains("ignoreChanges"))
    // ignoreChanges delivers the new images as inserts
    val got = drain(ck1, ignoreChanges = true)
    assert(got.map(_.count()).sum === 5L)
    assert(got.head.filter(col("s") =!= "new").count() === 0L)
    // a first-class UPDATE classifies as update-bearing too
    SnapshotLog.updateMor(spark, dir, col("m") === 2,
      Seq("s" -> lit("u2")), col("k"))
    val e3 = intercept[IllegalArgumentException] { drain(ck1) }
    assert(e3.getMessage.contains("ignoreChanges"))
    val got2 = drain(ck1, ignoreChanges = true)
    assert(got2.map(_.count()).sum ===
      SnapshotLog.readAsOf(spark, dir, SnapshotLog.version(dir))
        .filter(col("s") === "u2").count())
    // a pure delete still classifies as delete-bearing
    SnapshotLog.deleteMor(spark, dir, col("m") === 3)
    val e4 = intercept[IllegalArgumentException] { drain(ck1) }
    assert(e4.getMessage.contains("ignoreDeletes"))
    // ...and ignoreChanges subsumes ignoreDeletes (Delta's rule)
    assert(drain(ck1, ignoreChanges = true).map(_.count()).sum === 0L)
  }

  // == maintainView churn suppression (round-16 item 6) ==

  test("maintainView skips churn-only commits and follows typed updates") {
    val base = tmp("ivm")
    val src = s"$base/src"; val ck = s"$base/ck"; val view = s"$base/view"
    SnapshotLog.reset(src, checkpointInterval = 4)
    SnapshotLog.reset(view, checkpointInterval = 4)
    def refresh(): Unit = {
      SnapshotSource.maintainView(spark, src, ck, view, "grp",
        col("m"), col("n"))(
        _.groupBy(col("grp")).agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k")))
      ()
    }
    def viewRows: Map[Long, (Long, Long)] =
      SnapshotLog.readAsOf(spark, view, SnapshotLog.version(view))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    SnapshotLog.append(rows(70), src, col("k"))
    refresh()
    val v0 = SnapshotLog.version(view)
    // churn-only commit: UPDATE SET s = s (values unchanged)
    SnapshotLog.updateMor(spark, src, col("m") === 4,
      Seq("s" -> col("s")), col("k"))
    refresh()
    // zero groups refreshed: the view log did not move
    assert(SnapshotLog.version(view) === v0)
    // a real update that MOVES rows between groups (m: 2 -> 9) touches
    // exactly the two groups named by its pre/post images
    SnapshotLog.updateMor(spark, src, col("m") === 2,
      Seq("m" -> lit(9L)), col("k"))
    refresh()
    val vAfter = SnapshotLog.version(view)
    assert(vAfter > v0)
    val vr = viewRows
    assert(!vr.contains(2L)) // vanished group retired
    val expect9 = rows(70).filter(col("m") === 2).count()
    assert(vr(9L)._1 === expect9)
    // full-content check against a from-scratch recompute
    val fresh = SnapshotLog.readAsOf(spark, src, SnapshotLog.version(src))
      .groupBy(col("m")).agg(count(lit(1)).as("n"), sum(col("k")).as("sk"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(vr === fresh)
    // the refresh's view CDC touches ONLY the affected groups
    val touched = SnapshotLog.readCdc(spark, view, v0, vAfter)
      .select(col("grp")).distinct().collect().map(_.getLong(0)).toSet
    assert(touched === Set(2L, 9L))
  }

  // == Shallow CLONE (round-16 item 3) ==

  test("cloneShallow reads as-of, diverges independently, vacuum-safe") {
    val src = tmp("clone-src"); val dst = tmp("clone-dst") + "/t"
    SnapshotLog.reset(src, checkpointInterval = 4,
      statsCols = Seq("k" -> "k"))
    SnapshotLog.append(rows(60), src, col("k"))
    SnapshotLog.append(rows(40, from = 60), src, col("k"))
    SnapshotLog.deleteMor(spark, src, col("m") === 6) // DVs must carry
    val vSrc = SnapshotLog.version(src)
    val srcState = sortedRows(SnapshotLog.readAsOf(spark, src, vSrc))
    assert(SnapshotLog.cloneShallow(src, dst) === 0)
    // the clone reads exactly the source's as-of state (DVs applied)
    assert(sortedRows(SnapshotLog.readAsOf(spark, dst, 0)) === srcState)
    // table properties carried: the clone prunes on the same stats spec
    assert(SnapshotLog.statsColsOf(dst) === Seq("k" -> "k"))
    // divergence is isolated both directions
    SnapshotLog.append(rows(10, from = 500), dst, col("k"))
    SnapshotLog.delete(spark, src, col("k") < 30, col("k"))
    assert(SnapshotLog.version(src) === vSrc + 1)
    assert(sortedRows(SnapshotLog.readAsOf(spark, dst, 1)) ===
      (srcState ++ sortedRows(rows(10, from = 500))).sorted)
    assert(sortedRows(SnapshotLog.readAsOf(spark, dst, 0)) === srcState)
    // vacuum the SOURCE past the shared segments (the CoW delete above
    // rewrote them away): the clone's hard links keep the bytes alive
    SnapshotLog.vacuum(src, SnapshotLog.version(src))
    assert(sortedRows(SnapshotLog.readAsOf(spark, dst, 1)) ===
      (srcState ++ sortedRows(rows(10, from = 500))).sorted)
    // and vacuuming the clone leaves the source intact
    SnapshotLog.vacuum(dst, 1)
    assert(SnapshotLog.readAsOf(spark, src, SnapshotLog.version(src))
      .count() === srcState.size - srcState.count(_._1 < 30) + 0)
    // cloning at an earlier version pins that version's content
    val dst2 = tmp("clone-dst2") + "/t"
    SnapshotLog.cloneShallow(src, dst2,
      asOfV = SnapshotLog.version(src))
    assert(sortedRows(SnapshotLog.readAsOf(spark, dst2, 0)) ===
      sortedRows(SnapshotLog.readAsOf(spark, src,
        SnapshotLog.version(src))))
    // clone refuses a non-empty target
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.cloneShallow(src, dst2)
    }
    assert(e.getMessage.contains("already holds a log"))
  }

  test("clone cost is metadata: zero data bytes copied (hard links)") {
    val src = tmp("clone-lnk"); val dst = tmp("clone-lnk-d") + "/t"
    SnapshotLog.reset(src, checkpointInterval = 4)
    SnapshotLog.append(rows(100), src, col("k"))
    SnapshotLog.cloneShallow(src, dst)
    // every cloned parquet file shares its inode with the source copy
    val rel = SnapshotLog.segments(dst, 0).head.relPath
    val walked = Files.walk(Paths.get(dst, rel))
    try walked.filter(p => Files.isRegularFile(p))
      .forEach { p =>
        val srcP = Paths.get(src, rel)
          .resolve(Paths.get(dst, rel).relativize(p).toString)
        assert(Files.isSameFile(p, srcP),
          s"$p is a copy, not a link")
      }
    finally walked.close()
  }

  // == deleteMorKeys: distributed key-set deletes ==

  test("deleteMorKeys ≡ deleteMor(isin): same content, CDC, and pruning") {
    import spark.implicits._
    val (predDir, _) = keyClusteredLog("dmk-pred", withStats = true)
    val (keysDir, keysSegs) = keyClusteredLog("dmk-keys", withStats = true)
    val doomed = Seq(120L, 125L, 130L, 999L) // 999 matches nothing
    val vP = SnapshotLog.deleteMor(spark, predDir,
      col("k").isInCollection(doomed))
    val keysDf = doomed.toDF("k")
      .unionByName(Seq(Option.empty[Long]).toDF("k")) // null never matches
    val vK = SnapshotLog.deleteMorKeys(spark, keysDir, keysDf, "k")
    assert(sortedRows(SnapshotLog.readAsOf(spark, keysDir, vK)) ===
      sortedRows(SnapshotLog.readAsOf(spark, predDir, vP)))
    def cdcRows(dir: String, v: Int) =
      SnapshotLog.readCdc(spark, dir, 2, v)
        .select(col("_change_type"), col("k")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(cdcRows(keysDir, vK) === cdcRows(predDir, vP))
    // MoR structure: no segment rewritten
    assert(SnapshotLog.segments(keysDir, vK).map(_.relPath) === keysSegs)
    // the key set prunes discovery by range (the merge rule): a set
    // inside one slice yields one candidate
    val cand = SnapshotLog.mergeCandidateSegs(spark, keysDir, vK, "k",
      Seq(110L, 115L).toDF("k"))
    assert(cand.size === 1)
    // an empty / non-overlapping key set commits nothing
    assert(SnapshotLog.deleteMorKeys(spark, keysDir,
      Seq(5000L).toDF("k"), "k") === vK)
    assert(SnapshotLog.deleteMorKeys(spark, keysDir,
      spark.range(0).select(col("id").as("k")), "k") === vK)
  }

  // == Keyed CDC APPLY (round-16 continuation) ==

  test("applyChanges replicates deletes/merges/updates/restores, crash-safe") {
    val base = tmp("apply")
    val src = s"$base/src"; val ck = s"$base/ck"; val rep = s"$base/rep"
    SnapshotLog.reset(src, checkpointInterval = 4)
    SnapshotLog.reset(rep, checkpointInterval = 4)
    def sync(): Seq[Long] =
      SnapshotSource.applyChanges(spark, src, ck, rep, "k", col("k"))
    def srcState = sortedRows(SnapshotLog.readAsOf(spark, src,
      SnapshotLog.version(src)))
    def repState = sortedRows(SnapshotLog.readAsOf(spark, rep,
      SnapshotLog.version(rep)))
    // initial snapshot
    SnapshotLog.append(rows(40), src, col("k"))
    assert(sync() === Seq(0L))
    assert(repState === srcState)
    // CoW delete + MoR merge + first-class update, one batch each
    SnapshotLog.delete(spark, src, col("m") === 2, col("k"))
    sync()
    assert(repState === srcState)
    SnapshotLog.mergeMor(spark,
      rows(10).withColumn("s", lit("merged"))
        .unionByName(rows(5, from = 900)), src, "k", col("k"))
    sync()
    assert(repState === srcState)
    SnapshotLog.updateMor(spark, src, col("m") === 5,
      Seq("s" -> concat(col("s"), lit("+"))), col("k"))
    sync()
    assert(repState === srcState)
    // a RESTORE emits delete(survivors)+insert(full) per churned file;
    // last-change-wins converges the replica to the restored state
    SnapshotLog.restore(spark, src, 1, col("k"))
    sync()
    assert(repState === srcState)
    // crash window: sink body applies, commit marker never lands —
    // the replay re-applies by value and content stays exact
    SnapshotLog.append(rows(7, from = 950), src, col("k"))
    intercept[RuntimeException] {
      SnapshotSource.run(spark, src, ck, cdc = true) { (df, _) =>
        SnapshotSource.applyCdcBatch(spark, df, rep, "k", col("k"))
        throw new RuntimeException("crash after apply, before commit")
      }
    }
    assert(sync().size === 1) // the replayed batch
    assert(repState === srcState)
    // caught up: nothing planned, replica untouched
    val v = SnapshotLog.version(rep)
    assert(sync() === Seq.empty)
    assert(SnapshotLog.version(rep) === v)
  }

  test("composite-key applyChanges replicates a line-keyed table") {
    import spark.implicits._
    val base = tmp("apply-ck")
    val src = s"$base/src"; val ck = s"$base/ck"; val rep = s"$base/rep"
    SnapshotLog.reset(src, checkpointInterval = 4)
    SnapshotLog.reset(rep, checkpointInterval = 4)
    def lines(from: Int, n: Int) =
      (from until from + n).flatMap(k =>
        Seq(1L, 2L).map(ln => (k.toLong, ln, s"r$k-$ln")))
        .toDF("k", "ln", "s")
    def sync(): Seq[Long] = SnapshotSource.applyChangesKeys(
      spark, src, ck, rep, Seq("k", "ln"), col("k"))
    def state(dir: String) = SnapshotLog.readAsOf(spark, dir,
        SnapshotLog.version(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq.sorted
    SnapshotLog.append(lines(0, 30), src, col("k"))
    sync()
    assert(state(rep) === state(src))
    // a merge replacing ONLY line 1 of some keys: the replica must not
    // touch those keys' line 2 (the single-key resolution would have
    // collapsed both lines of a key into one winner)
    SnapshotLog.mergeMorKeys(spark,
      (5 until 15).map(k => (k.toLong, 1L, "upd")).toDF("k", "ln", "s"),
      src, Seq("k", "ln"), col("k"))
    sync()
    assert(state(rep) === state(src))
    assert(state(rep).count(_._3 == "upd") === 10)
    // a delete of line 2 only
    SnapshotLog.deleteMor(spark, src, col("ln") === 2L && col("k") < 3L)
    sync()
    assert(state(rep) === state(src))
    assert(state(rep).size === 57)
  }

  // == Recall-targeted ANN auto-tuning (round-16 item 5) ==

  test("annTuned meets the recall target at minimal probe cost, both regimes") {
    try {
      Seq("isotropic", "clustered").foreach { regime =>
        val cal = graft.queries.VectorOps.annCalibration(spark, sfDir, regime)
        assert(cal.map(_._1) === graft.queries.VectorOps.ProbeGrid)
        assert(cal.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
        // full probe + exact re-rank: the ADC shortlist is the only
        // approximation left — recall must be high (IvfPqSpec pins the
        // serving arm itself)
        assert(cal.last._2 >= 0.9, s"$regime full-probe recall ${cal.last._2}")
        val (pick, sl) = graft.queries.VectorOps.annTuned(
          spark, sfDir, 0.9, regime)
        val pickRecall = cal.toMap.get(pick)
        // the pick meets the target (grid point) or is the exact
        // fallback (recall 1.0 by construction)
        if (sl == Int.MaxValue) assert(pick === 16)
        else {
          assert(pickRecall.exists(_ >= 0.9))
          // ...at MINIMAL probe cost: no cheaper grid point meets it
          assert(cal.takeWhile(_._1 < pick).forall(_._2 < 0.9),
            s"$regime picked $pick but a cheaper point meets 0.9")
        }
        // a target of 0 picks the cheapest grid point
        assert(graft.queries.VectorOps.annTuned(
          spark, sfDir, 0.0, regime)._1 === 1)
      }
      // the tuned serving path returns the q50 serving schema and the
      // fixed-dial facade default is unchanged
      val q = Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val auto = graft.queries.VectorOps.annTopKAuto(
        spark, sfDir, q, topK = 3, targetRecall = 0.9)
      assert(auto.columns.toSeq === Seq("q_id", "vec_id", "cos_r", "rn"))
      assert(auto.count() === 9L)
      val fixed = graft.queries.VectorOps.annTopK(
        spark, sfDir, q, topK = 3, nProbe = 12, shortlist = 96)
      assert(fixed.count() === 9L)
    } finally graft.queries.VectorOps.releaseCaches()
  }

  // == DESCRIBE HISTORY / CHECK constraints / vacuum dry-run ==

  test("history reports every op truthfully; dry-run names what vacuum takes") {
    val dir = tmp("hist")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append(rows(30), dir, col("k"))
    SnapshotLog.deleteMor(spark, dir, col("m") === 2)
    SnapshotLog.merge(spark, rows(5).withColumn("s", lit("u")), dir,
      "k", col("k"))
    SnapshotLog.updateMor(spark, dir, col("m") === 4,
      Seq("s" -> lit("x")), col("k"))
    SnapshotLog.compact(spark, dir, col("k"))
    val h = SnapshotLog.history(dir)
    assert(h.map(_.version) === (0 to 4))
    assert(h.map(_.opType) === Seq(Some("append"), Some("delete"),
      Some("merge"), Some("update"), Some("compact")))
    assert(h.head.rowsAdded === Some(30L))
    // CoW merge adds the src segment (5) AND the survivor rewrite of
    // the touched segment (30 rows − 4 DV-tombstoned − 4 live matched
    // = 22): rowsAdded counts rows in ALL added segments, rewrites
    // included (Delta's numOutputRows posture)
    assert(h(2).rowsAdded === Some(27L))
    assert(h(3).cdcPreSegs === 1 && h(3).cdcPostSegs === 1)
    assert(h(1).dvCount === 1 && h.last.dvCount === 0)
    assert(h.last.segments === 1)
    // dry-run is the real vacuum's exact plan
    val (doomed, mfs) = SnapshotLog.vacuumDryRun(dir, 4)
    val (gone, mGone) = SnapshotLog.vacuum(dir, 4)
    assert(gone === doomed.size && mGone === mfs)
    // history starts at the horizon afterwards, full list as added
    val h2 = SnapshotLog.history(dir)
    assert(h2.map(_.version) === Seq(4))
    assert(h2.head.segmentsAdded === 1)
  }

  test("a CHECK refuses violating writes at every path, table unmoved") {
    import spark.implicits._
    val dir = tmp("check")
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append(rows(20), dir, col("k"))
    SnapshotLog.addCheck(spark, dir, "m_small", "m < 100")
    val v1 = SnapshotLog.append(rows(10, from = 20), dir, col("k"))
    def refusedBy(body: => Unit): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("CHECK constraint"))
      assert(SnapshotLog.version(dir) === v1)
    }
    val bad = rows(5, from = 500).withColumn("m", lit(999L))
    refusedBy(SnapshotLog.append(bad, dir, col("k")))
    refusedBy(SnapshotLog.appendWithRetry(bad, dir, col("k")))
    refusedBy(SnapshotLog.merge(spark, bad, dir, "k", col("k")))
    refusedBy(SnapshotLog.mergeMor(spark, bad, dir, "k", col("k")))
    refusedBy(SnapshotLog.update(spark, dir, col("m") === 1,
      Seq("m" -> lit(500L)), col("k")))
    refusedBy(SnapshotLog.updateMor(spark, dir, col("m") === 1,
      Seq("m" -> lit(500L)), col("k")))
    // null passes (SQL CHECK), and compliant writes still land
    SnapshotLog.append(
      Seq((600L, Option.empty[Long], "n")).toDF("k", "m", "s"),
      dir, col("k"))
    SnapshotLog.update(spark, dir, col("k") === 0L,
      Seq("m" -> lit(99L)), col("k"))
    assert(SnapshotLog.readAsOf(spark, dir, SnapshotLog.version(dir))
      .count() === 31L)
    // adding a check the table already violates is refused up front
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.addCheck(spark, dir, "nope", "m > 50")
    }
    assert(e.getMessage.contains("cannot add check"))
    // checks carry through CLONE (config copies): the clone refuses too
    val dst = tmp("check-clone") + "/t"
    SnapshotLog.cloneShallow(dir, dst)
    assert(SnapshotLog.checksOf(dst) === Seq("m_small" -> "m < 100"))
    intercept[IllegalArgumentException] {
      SnapshotLog.append(bad, dst, col("k"))
    }
  }

  test("NOT NULL refuses null writes; the evolution null-fill trap is caught") {
    import spark.implicits._
    val dir = tmp("notnull")
    SnapshotLog.reset(dir, checkpointInterval = 4)
    SnapshotLog.append(rows(10), dir, col("k"))
    SnapshotLog.addNotNull(spark, dir, "s")
    val v1 = SnapshotLog.version(dir)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.append(
        Seq((100L, 1L, null: String)).toDF("k", "m", "s"), dir, col("k"))
    }
    assert(e.getMessage.contains("NOT NULL"))
    assert(SnapshotLog.version(dir) === v1)
    // compliant writes land; CHECK-style null-pass does NOT apply here
    SnapshotLog.append(Seq((100L, 1L, "ok")).toDF("k", "m", "s"),
      dir, col("k"))
    // the evolution trap: a column added AFTER old segments existed is
    // null-filled on read — NOT NULL on it must be refused up front
    SnapshotLog.append(rows(3, from = 200)
      .withColumn("x", col("k") * 2), dir, col("k"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.addNotNull(spark, dir, "x")
    }
    assert(e2.getMessage.contains("null-fill") ||
      e2.getMessage.contains("existing rows are null"))
    // unknown column refused
    intercept[IllegalArgumentException] {
      SnapshotLog.addNotNull(spark, dir, "nope")
    }
  }

  test("vacuumRetain keeps exactly the retention window; timestamp clone") {
    val dir = tmp("retain")
    SnapshotLog.reset(dir, checkpointInterval = 4)
    SnapshotLog.append(rows(10), dir, col("k"))
    Thread.sleep(15)
    SnapshotLog.append(rows(10, from = 10), dir, col("k"))
    Thread.sleep(15)
    val t1 = SnapshotLog.commitTimeOf(dir, 1)
    SnapshotLog.append(rows(10, from = 20), dir, col("k"))
    val t2 = SnapshotLog.commitTimeOf(dir, 2)
    // timestamp clone BEFORE retention trims: the table the cutoff saw
    val dst = tmp("retain-clone") + "/t"
    SnapshotLog.cloneShallowAtTimestamp(dir, dst, t1)
    assert(sortedRows(SnapshotLog.readAsOf(spark, dst, 0)) ===
      sortedRows(rows(20)))
    // cutoff predating the log keeps everything
    assert(SnapshotLog.retentionHorizon(dir, retainMs = 1L << 40,
      nowMillis = t2) === 0)
    // cutoff at t1: v1 was current then — v0 goes, v1 stays readable
    assert(SnapshotLog.retentionHorizon(dir, retainMs = t2 - t1,
      nowMillis = t2) === 1)
    SnapshotLog.vacuumRetain(dir, retainMs = t2 - t1, nowMillis = t2)
    assert(sortedRows(SnapshotLog.readAsOf(spark, dir, 1)) ===
      sortedRows(rows(20)))
    intercept[Exception] {
      SnapshotLog.readAsOf(spark, dir, 0).count()
    }
    // cutoff after the newest commit keeps only the head
    assert(SnapshotLog.retentionHorizon(dir, retainMs = 0L,
      nowMillis = t2 + 1000L) === 2)
  }

  // == Column rename: today's contract (round-16 item 8 design note) ==

  test("a column rename is refused as drop+add (the add-only contract)") {
    import spark.implicits._
    val dir = tmp("rename")
    SnapshotLog.reset(dir, checkpointInterval = 4)
    SnapshotLog.append(rows(20), dir, col("k"))
    // same data, `s` renamed to `txt`: parses as dropping `s` — the
    // ARCHITECTURE.md column-mapping note is the path to allowing this
    // without a rewrite; until ids exist the refusal is the contract
    val renamed = (0 until 20).map(k => (k.toLong, k.toLong % 7, s"r$k"))
      .toDF("k", "m", "txt")
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.append(renamed, dir, col("k"))
    }
    assert(e.getMessage.contains("drops column"))
    assert(SnapshotLog.version(dir) === 0) // the refused append left nothing
  }

  // == Sidecar sentinel for all-null stats (round-15 advice) ==

  test("a resolved-but-all-null stat still counts as covered, never prunes") {
    import spark.implicits._
    val dir = tmp("sentinel")
    SnapshotLog.reset(dir, checkpointInterval = 4,
      statsCols = Seq("v" -> "v"))
    val df = (0 until 20).map(i => (i.toLong, None: Option[Long]))
      .toDF("k", "v")
    SnapshotLog.append(df, dir, col("k"))
    val rel = SnapshotLog.segments(dir, 0).head.relPath
    // covered (the segment recorded under the current spec)...
    assert(SnapshotLog.sidecarCovered(dir, rel) === Set("v"))
    assert(SnapshotLog.segmentHealth(spark, dir, 0).head.statsCovered === 1)
    // ...but no prunable range exists, so the read never skips
    assert(SnapshotLog.sidecarStats(dir, rel).get("v") === None)
    val (fr, scanned, total) = SnapshotLog.readAsOfFilteredOn(
      spark, dir, 0, "v", col("v"), 0L, 10L)
    assert(scanned === total)
    assert(fr.count() === 0L) // residual still applies
  }
}
