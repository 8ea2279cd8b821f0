package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ext.SnapshotLog
import graft.functions.BloomAgg

/** Per-segment Bloom sidecars (round-17 continuation): point-key
  * discovery pruning for MERGE/DELETE-by-keys on tables whose key
  * ranges overlap across segments (the scattered-key layout range
  * zone maps cannot prune), plus the build aggregate's own laws.
  */
class BloomStatsSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-bloom-$tag").toString

  private def rows(ks: Seq[Long]) = {
    import spark.implicits._
    ks.map(k => (k, s"r$k")).toDF("k", "s")
  }

  test("bloom_build is partitioning-invariant and has no false negatives") {
    BloomAgg.ensureRegistered(spark)
    import spark.implicits._
    val df = (0L until 5000L).map(k => k * 37L).toDF("k")
    def build(parts: Int): Array[Byte] = df.repartition(parts)
      .agg(call_function(BloomAgg.name, xxhash64(col("k")),
        lit(10000L), lit(0.01)).as("b"))
      .head().getAs[Array[Byte]](0)
    val one = build(1)
    val eight = build(8)
    assert(java.util.Arrays.equals(one, eight),
      "serialized bloom must not depend on partitioning")
    // no false negatives: every inserted key probes true
    graft.functions.BloomMightContain.ensureRegistered(spark)
    val misses = df
      .filter(!call_function(graft.functions.BloomMightContain.name,
        lit(one), xxhash64(col("k"))))
      .count()
    assert(misses === 0L)
  }

  test("interleaved-key segments: ranges cannot prune, blooms can") {
    val dir = tmp("ivl")
    SnapshotLog.reset(dir, statsCols = Seq("kk" -> "k"))
    SnapshotLog.setBloomOn(dir, "kk", expectedItems = 10000L,
      fpp = 1e-8)
    // three segments with FULLY overlapping [min, max] key ranges
    // but disjoint residue classes — the zone map keeps all three
    val all = (0L until 3000L)
    (0 to 2).foreach { r =>
      SnapshotLog.append(rows(all.filter(_ % 3 == r)), dir, col("k"))
    }
    import spark.implicits._
    val srcKeys = all.filter(k => k % 300 == 1).map(k => (k, "u")).toDF("k", "s")
    val cands = SnapshotLog.mergeCandidateSegsKeys(spark, dir, 2,
      Seq("k"), srcKeys)
    assert(cands.size === 1,
      s"bloom should prune to the residue-1 segment, got ${cands.size}")
    // pruning is candidates-only: the merge answer is unchanged
    val v = SnapshotLog.mergeKeys(spark, srcKeys, dir, Seq("k"), col("k"))
    val got = SnapshotLog.readAsOf(spark, dir, v)
      .filter(col("s") === "u").select(col("k"))
      .collect().map(_.getLong(0)).toSet
    assert(got === all.filter(_ % 300 == 1).toSet)
    assert(SnapshotLog.readAsOf(spark, dir, v).count() === 3000L)
  }

  test("segments written before setBloomOn are never skipped") {
    val dir = tmp("pre")
    SnapshotLog.reset(dir, statsCols = Seq("kk" -> "k"))
    SnapshotLog.append(rows((0L until 100L).filter(_ % 2 == 0)), dir, col("k"))
    SnapshotLog.setBloomOn(dir, "kk")
    SnapshotLog.append(rows((0L until 100L).filter(_ % 2 == 1)), dir, col("k"))
    import spark.implicits._
    // keys live in the PRE-bloom segment; it has no bloom → kept
    val srcKeys = Seq((2L, "u"), (4L, "u")).toDF("k", "s")
    val cands = SnapshotLog.mergeCandidateSegsKeys(spark, dir, 1,
      Seq("k"), srcKeys)
    assert(cands.size === 1, "pre-bloom segment kept, bloomed one pruned")
    val v = SnapshotLog.mergeKeys(spark, srcKeys, dir, Seq("k"), col("k"))
    assert(SnapshotLog.readAsOf(spark, dir, v)
      .filter(col("s") === "u").count() === 2L)
  }

  test("in-range-but-absent keys: the bloom prunes what ranges cannot") {
    val dir = tmp("none")
    SnapshotLog.reset(dir, statsCols = Seq("kk" -> "k"))
    SnapshotLog.setBloomOn(dir, "kk", fpp = 1e-8)
    // even keys only: the recorded range is [0, 1998]
    SnapshotLog.append(rows((0L until 2000L).filter(_ % 2 == 0)),
      dir, col("k"))
    import spark.implicits._
    // odd keys sit INSIDE the range — only the bloom can rule them out
    val ghost = Seq.tabulate(20)(i => (2L * i + 1L, "u")).toDF("k", "s")
    val cands = SnapshotLog.mergeCandidateSegsKeys(spark, dir, 0,
      Seq("k"), ghost)
    assert(cands.isEmpty, s"bloom should prune the only segment: $cands")
    val before = SnapshotLog.version(dir)
    val v = SnapshotLog.deleteMorKeysMulti(spark, dir, ghost, Seq("k"))
    assert(v === before, "no-match delete commits nothing")
  }

  test("optimize rewrites carry blooms forward") {
    val dir = tmp("opt")
    SnapshotLog.reset(dir, statsCols = Seq("kk" -> "k"))
    SnapshotLog.setBloomOn(dir, "kk", fpp = 1e-8)
    (0 to 2).foreach { r =>
      SnapshotLog.append(rows((0L until 600L).filter(_ % 3 == r)),
        dir, col("k"))
    }
    val vOpt = SnapshotLog.optimize(spark, dir, col("k"), Seq(col("k")))
    val segs = SnapshotLog.segments(dir, vOpt)
    assert(segs.forall(s =>
      SnapshotLog.sidecarBloom(dir, s.relPath).contains("kk")),
      "every rewritten segment must record the configured bloom")
  }

  test("readAsOfKeys: point lookup opens only bloom-admitted segments") {
    val dir = tmp("plk")
    SnapshotLog.reset(dir, statsCols = Seq("kk" -> "k"))
    SnapshotLog.setBloomOn(dir, "kk", expectedItems = 10000L, fpp = 1e-8)
    val all = (0L until 3000L)
    (0 to 2).foreach { r =>
      SnapshotLog.append(rows(all.filter(_ % 3 == r)), dir, col("k"))
    }
    import spark.implicits._
    val probe = Seq(7L, 301L, 904L).toDF("k") // all residue 1
    val (df, scanned, total) = SnapshotLog.readAsOfKeys(spark, dir, 2,
      Seq("k"), probe)
    assert((scanned, total) === ((1, 3)))
    assert(df.select(col("k")).collect().map(_.getLong(0)).toSet ===
      Set(7L, 301L, 904L))
    // answer equals the full read filtered to the keys (independence
    // from pruning), including under deletion vectors
    SnapshotLog.deleteMorKeysMulti(spark, dir, Seq(301L).toDF("k"), Seq("k"))
    val v = SnapshotLog.version(dir)
    val (df2, _, _) = SnapshotLog.readAsOfKeys(spark, dir, v, Seq("k"), probe)
    assert(df2.select(col("k")).collect().map(_.getLong(0)).toSet ===
      Set(7L, 904L))
    // absent keys: zero segments opened, empty frame, schema intact
    val (df3, s3, _) = SnapshotLog.readAsOfKeys(spark, dir, v, Seq("k"),
      Seq(9999L).toDF("k"))
    assert(df3.count() === 0L && s3 === 0)
    assert(df3.columns.toSeq === Seq("k", "s"))
  }

  test("large key sets take the distributed probe path and prune identically") {
    val dir = tmp("big")
    SnapshotLog.reset(dir, statsCols = Seq("kk" -> "k"))
    SnapshotLog.setBloomOn(dir, "kk", expectedItems = 200000L, fpp = 1e-8)
    // two residue-interleaved segments; the 70k-key probe set exceeds
    // the driver-probe threshold (65536), forcing the distributed
    // aggregate probe — the verdict must match the driver path's
    val all = (0L until 140000L)
    (0 to 1).foreach { r =>
      SnapshotLog.append(rows(all.filter(_ % 2 == r)), dir, col("k"))
    }
    import spark.implicits._
    val srcKeys = all.filter(_ % 2 == 1).map(k => (k, "u")).toDF("k", "s")
    val cands = SnapshotLog.mergeCandidateSegsKeys(spark, dir, 1,
      Seq("k"), srcKeys)
    assert(cands.size === 1,
      s"distributed bloom probe should keep only the odd segment: $cands")
  }

  test("clones carry blooms; health reports bloom coverage") {
    val src = tmp("clsrc"); val dst = tmp("cldst")
    SnapshotLog.reset(src, statsCols = Seq("kk" -> "k"))
    SnapshotLog.append(rows((0L until 100L).filter(_ % 2 == 0)),
      src, col("k"))
    SnapshotLog.setBloomOn(src, "kk", fpp = 1e-8)
    SnapshotLog.append(rows((0L until 100L).filter(_ % 2 == 1)),
      src, col("k"))
    // health: the pre-config segment reads bloomsCovered 0 — the
    // maintenance cue that a rewrite would arm point-key pruning
    val h = SnapshotLog.segmentHealth(spark, src, 1)
      .map(x => x.relPath -> x.bloomsCovered).toMap
    assert(h.values.toSeq.sorted === Seq(0, 1))
    // a shallow clone serves the same bloom-pruned lookups: even-key
    // probes keep the (pre-config, bloom-less) even segment — absent
    // blooms never skip — while the odd segment's bloom rules it out
    java.nio.file.Files.delete(java.nio.file.Paths.get(dst))
    SnapshotLog.cloneShallow(src, dst)
    import spark.implicits._
    val (hits, scanned, total) = SnapshotLog.readAsOfKeys(spark, dst,
      SnapshotLog.version(dst), Seq("k"), Seq(2L, 4L).toDF("k"))
    assert((scanned, total) === ((1, 2)))
    assert(hits.count() === 2L)
  }

  test("incremental optimize arms blooms on pre-config segments, then converges") {
    val dir = tmp("arm")
    SnapshotLog.reset(dir, statsCols = Seq("kk" -> "k"))
    // two big pre-config segments (written before any bloom config)
    SnapshotLog.append(rows((0L until 400L).filter(_ % 2 == 0)),
      dir, col("k"))
    SnapshotLog.append(rows((0L until 400L).filter(_ % 2 == 1)),
      dir, col("k"))
    SnapshotLog.setBloomOn(dir, "kk", fpp = 1e-8)
    // the selection policy must pick BOTH bloom-less segments even
    // though they are neither small-file nor tombstone-heavy cases
    val v1 = SnapshotLog.optimizeIncremental(spark, dir, col("k"),
      Seq(col("k")), smallBytes = 1L)
    assert(v1 === 2)
    assert(SnapshotLog.segmentHealth(spark, dir, v1)
      .forall(_.bloomsCovered === 1))
    // convergence: a second call finds full coverage and rewrites
    // nothing
    val v2 = SnapshotLog.optimizeIncremental(spark, dir, col("k"),
      Seq(col("k")), smallBytes = 1L)
    assert(v2 === v1, "armed table must not re-rewrite")
    assert(SnapshotLog.readAsOf(spark, dir, v2).count() === 400L)
  }

  test("tuple blooms prune composite keys no single column can") {
    val dir = tmp("tup")
    import spark.implicits._
    def rows2(ps: Seq[(Long, Long)]) =
      ps.map { case (a, b) => (a, b, s"r$a-$b") }.toDF("a", "b", "s")
    // ONE stat, over the whole key tuple: its range (a hash) prunes
    // nothing, its bloom is the point
    SnapshotLog.reset(dir, statsCols = Seq("tk" -> "xxhash64(a, b)"))
    SnapshotLog.setBloomOn(dir, "tk", expectedItems = 10000L, fpp = 1e-8)
    val all = for { a <- 0L until 60L; b <- 0L until 50L } yield (a, b)
    // both segments span the FULL range of a AND of b — no
    // single-column stat could separate them
    SnapshotLog.append(rows2(all.filter(t => (t._1 + t._2) % 2 == 0)),
      dir, col("a"))
    SnapshotLog.append(rows2(all.filter(t => (t._1 + t._2) % 2 == 1)),
      dir, col("a"))
    val probe = all.filter(t => (t._1 + t._2) % 2 == 0).take(20)
      .toDF("a", "b")
    val cands = SnapshotLog.mergeCandidateSegsKeys(spark, dir, 1,
      Seq("a", "b"), probe)
    assert(cands.size === 1,
      s"tuple bloom should prune to the even-sum segment: ${cands.size}")
    // pruning is candidates-only: the composite delete is exact
    val v = SnapshotLog.deleteMorKeysMulti(spark, dir, probe, Seq("a", "b"))
    assert(SnapshotLog.readAsOf(spark, dir, v).count() === 3000L - 20L)
  }

  test("setBloomOn refuses unknown stats and bad parameters") {
    val dir = tmp("cfg")
    SnapshotLog.reset(dir, statsCols = Seq("kk" -> "k"))
    intercept[IllegalArgumentException] {
      SnapshotLog.setBloomOn(dir, "nope")
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.setBloomOn(dir, "kk", fpp = 0.0)
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.setBloomOn(dir, "kk", expectedItems = 0L)
    }
  }
}
