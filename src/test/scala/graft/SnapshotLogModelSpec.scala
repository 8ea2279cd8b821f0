package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import scala.util.Random
import graft.ext.SnapshotLog

/** Model-based randomized exercise of the SnapshotLog contract: a
  * seeded op sequence (append / WIDE append / compact / vacuum /
  * refused narrow append / row-level DELETE / MERGE upsert / the read
  * surfaces) runs against both the real log and a trivial in-memory
  * model, and every read must agree after every mutation. The
  * scenario tests in SnapshotLogSpec pin individual behaviors; this
  * suite hunts INTERACTIONS enumerated cases miss —
  * append-after-compact, vacuum landing ON a compaction version, CDC
  * windows straddling both, tag survival through compact-then-vacuum
  * chains, a column-add interleaved arbitrarily with all of the above
  * (every version must read back under ITS OWN schema, old rows
  * null-fill the added column, compaction materializes without
  * changing values, and a narrow append after the add is refused
  * WITHOUT moving the log), and — since row-level writes landed —
  * deletes/merges interleaved with evolution, compaction, vacuum and
  * both change feeds: time travel must keep pre-delete versions
  * intact, `readChanges` must deliver merge src rows as plain inserts
  * and NEVER a rewrite segment, and `readCdc` must deliver exactly
  * the removed rows as deletes beside those inserts. Seeds are fixed,
  * so a failure replays exactly.
  */
class SnapshotLogModelSpec extends SparkSpec {

  /** Per-version model state: the (k, x) rows this version ADDED
    * (x = None for rows added before/without the wide column), the
    * rows it REMOVED (delete targets / merge-replaced old images),
    * and the full snapshot as of it.
    */
  private case class V(rowsAdded: Seq[(Long, Option[Long])],
      rowsDeleted: Seq[(Long, Option[Long])],
      snapshot: Seq[(Long, Option[Long])],
      updPre: Seq[(Long, Option[Long])] = Nil,
      updPost: Seq[(Long, Option[Long])] = Nil)

  private def readKeys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("k")).collect().map(_.getLong(0)).toSeq.sorted

  /** Sorted by the FULL pair, not the key alone: a key merged twice in
    * one CDC window legitimately appears with two images, and a
    * key-only sort would leave their relative order unspecified.
    */
  private def readPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Option[Long])] =
    df.select(col("k"), col("x")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq.sorted

  /** Returns whether the sequence exercised the column-add (callers
    * assert it on at least one seed, so the evolution checks can't all
    * pass vacuously).
    */
  private def runSequence(seed: Int, opCount: Int,
      checkpointInterval: Int = SnapshotLog.DefaultCheckpointInterval,
      withReplica: Boolean = false)
      : Boolean = {
    import spark.implicits._
    val rnd = new Random(seed)
    // delete FLAVOR (copy-on-write vs merge-on-read) draws from its own
    // stream so adding it never perturbs the recorded seeds' op layout;
    // the two flavors share one contract, so the model doesn't care —
    // any divergence is a DV bug interacting with whatever the main
    // stream interleaved around it
    val morRnd = new Random(seed * 31 + 7)
    // same trick for the compact FLAVOR (plain compact vs OPTIMIZE —
    // both content-preserving dataChange=false rewrites) and for the
    // streaming tail's injected crashes (round-15 item 6)
    val optRnd = new Random(seed * 17 + 3)
    val crashRnd = new Random(seed * 101 + 13)
    // first-class UPDATE (round-16) rides the former read-only op 7;
    // its cohort, image and flavor draw from THIS stream so no
    // recorded seed's main/mor/opt/crash layout moves
    val updRnd = new Random(seed * 53 + 29)
    val dir = Files.createTempDirectory(
      s"snaplog_model_${seed}_ci$checkpointInterval").toString
    SnapshotLog.reset(dir, checkpointInterval)
    var versions = Vector.empty[V] // index == version number
    var horizon = 0                // lowest version still readable
    var tags = Set.empty[Long]
    var nextRow = 0L
    var wideSince: Option[Int] = None // first version whose schema has x

    def latest: Int = versions.size - 1

    // == The streaming SOURCE rides the same interleaving (round-15
    // item 6): a checkpointed CDC tail (graft.streaming.SnapshotSource)
    // drains after every op into a batch-id-keyed sink model, with
    // randomly injected crashes between the sink body and the batch
    // commit. Exactly-once delivery = the sink's cumulative inserts are
    // EXACTLY every version's added rows (the first batch is the
    // initial snapshot, which at drain-every-op cadence is v0's adds)
    // and its deletes exactly every version's removed rows — across
    // MoR deletes/merges, compaction, OPTIMIZE, vacuum and the
    // column-add, a double-delivery or a dataChange leak breaks the
    // multiset equality immediately.
    val ckDir = Files.createTempDirectory(
      s"snaplog_model_ck_${seed}_ci$checkpointInterval").toString
    val sinkModel = scala.collection.mutable.Map
      .empty[Long, Seq[(String, Long, Option[Long])]]
    def recordBatch(df: org.apache.spark.sql.DataFrame, bid: Long): Unit = {
      val hasX = df.columns.contains("x")
      sinkModel(bid) = df.select(
          col("_change_type"), col("k"),
          (if (hasX) col("x") else lit(null).cast("long")).as("x"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    }
    // == Keyed CDC-apply REPLICA rides the same interleaving (round-16):
    // a second tail replicates the log via applyChanges after every op;
    // the replica's content must equal the model snapshot exactly —
    // across MoR/CoW deletes, merges, typed updates, compaction,
    // OPTIMIZE, vacuum and the column-add. Gated by withReplica (one
    // dedicated seed) to bound suite cost.
    val applyCk = Files.createTempDirectory(
      s"snaplog_model_ack_${seed}_ci$checkpointInterval").toString
    val replicaDir = Files.createTempDirectory(
      s"snaplog_model_rep_${seed}_ci$checkpointInterval").toString + "/t"
    def drainReplica(opIx: Int): Unit = if (withReplica) {
      import graft.streaming.SnapshotSource
      SnapshotSource.applyChanges(spark, dir, applyCk, replicaDir,
        "k", col("k"))
      val snap = versions.last.snapshot
      if (snap.isEmpty) {
        if (SnapshotLog.version(replicaDir) >= 0)
          assert(SnapshotLog.readAsOf(spark, replicaDir,
            SnapshotLog.version(replicaDir)).isEmpty,
            s"seed=$seed op=$opIx replica not empty")
      } else {
        val rep = SnapshotLog.readAsOf(spark, replicaDir,
          SnapshotLog.version(replicaDir))
        if (wideSince.isDefined)
          assert(readPairs(rep) === snap,
            s"seed=$seed op=$opIx replica diverged")
        else
          assert(readKeys(rep) === snap.map(_._1),
            s"seed=$seed op=$opIx replica diverged")
      }
    }

    def drainTail(opIx: Int): Unit = {
      import graft.streaming.SnapshotSource
      if (crashRnd.nextInt(4) == 0) {
        // crash AFTER the sink body, BEFORE the commit — the replayed
        // batch id overwrites its own sink entry (idempotent apply)
        try SnapshotSource.trigger(spark, dir, ckDir) { (df, bid) =>
          recordBatch(df, bid)
          throw new RuntimeException("injected tail crash")
        } catch { case e: RuntimeException
            if e.getMessage.contains("injected") => () }
      }
      SnapshotSource.run(spark, dir, ckDir)(recordBatch)
      val got = sinkModel.values.flatten.toSeq
      val gotIns = got.collect { case ("insert", k, x) => (k, x) }.sorted
      val gotDel = got.collect { case ("delete", k, x) => (k, x) }.sorted
      val gotPre = got.collect { case ("update_preimage", k, x) => (k, x) }
        .sorted
      val gotPost = got.collect { case ("update_postimage", k, x) => (k, x) }
        .sorted
      assert(gotIns === versions.flatMap(_.rowsAdded).sorted,
        s"seed=$seed op=$opIx source tail inserts diverged")
      assert(gotDel === versions.flatMap(_.rowsDeleted).sorted,
        s"seed=$seed op=$opIx source tail deletes diverged")
      assert(gotPre === versions.flatMap(_.updPre).sorted,
        s"seed=$seed op=$opIx source tail preimages diverged")
      assert(gotPost === versions.flatMap(_.updPost).sorted,
        s"seed=$seed op=$opIx source tail postimages diverged")
    }

    (1 to opCount).foreach { opIx =>
      val op =
        if (versions.isEmpty) rnd.nextInt(2) // only appends make sense yet
        else rnd.nextInt(9) // 0 append, 1 wide append, 2 compact, 3 vacuum,
                            // 4 refused narrow-after-wide, 5 delete,
                            // 6 merge, 7 first-class update, 8 read-only
      op match {
        case 0 | 1 =>
          val n = 1 + rnd.nextInt(5)
          val ks = (nextRow until nextRow + n).toSeq
          nextRow += n
          val tag = if (rnd.nextBoolean()) Some(opIx.toLong) else None
          // add-only contract: once the schema is wide, every later
          // append must carry the column — the model never violates it
          val wide = op == 1 || wideSince.isDefined
          val rows: Seq[(Long, Option[Long])] =
            if (wide) ks.map(k => k -> Some(k * 7))
            else ks.map(k => k -> (None: Option[Long]))
          val df =
            if (wide) rows.map { case (k, x) => (k, x.get) }.toDF("k", "x")
            else ks.toDF("k")
          val v = SnapshotLog.append(df, dir, col("k"), tag)
          tags ++= tag
          if (wide && wideSince.isEmpty) wideSince = Some(v)
          val snap = versions.lastOption.map(_.snapshot).getOrElse(Nil) ++ rows
          versions :+= V(rows, Nil, snap.sortBy(_._1))
          assert(v === latest, s"seed=$seed op=$opIx version drift")
        case 2 =>
          // flavor from its own stream (seed-layout-stable): plain
          // compact vs OPTIMIZE ZORDER — both content-preserving
          // dataChange=false rewrites the feed must stay silent across.
          // An empty-snapshot optimize skips its commit (returns prev).
          if (optRnd.nextBoolean()) {
            val before = SnapshotLog.version(dir)
            val v = SnapshotLog.optimize(spark, dir, col("k"),
              Seq(col("k")), bucketBits = 1)
            if (v > before) versions :+= V(Nil, Nil, versions.last.snapshot)
            else assert(versions.last.snapshot.isEmpty,
              s"seed=$seed op=$opIx optimize skipped a non-empty snapshot")
          } else {
            SnapshotLog.compact(spark, dir, col("k"))
            versions :+= V(Nil, Nil, versions.last.snapshot)
          }
        case 3 =>
          // retention coordinates with consumer lag (the Delta
          // posture): the tail drains any planned-but-uncommitted
          // batch BEFORE manifests below its offset can be dropped
          drainTail(opIx)
          drainReplica(opIx)
          val newHorizon = horizon + rnd.nextInt(latest - horizon + 1)
          SnapshotLog.vacuum(dir, newHorizon)
          horizon = newHorizon
        case 4 if wideSince.isDefined =>
          // a narrow append after the column-add is a DROP: it must be
          // refused loudly and must leave the log exactly where it was
          val before = SnapshotLog.version(dir)
          intercept[IllegalArgumentException] {
            SnapshotLog.append(Seq(nextRow).toDF("k"), dir, col("k"))
          }
          assert(SnapshotLog.version(dir) === before,
            s"seed=$seed op=$opIx refused append moved the log")
        case 5 =>
          // row-level delete of a residue class of the CURRENT snapshot;
          // an empty match must commit NOTHING (version unchanged)
          val m = 2 + rnd.nextInt(3)
          val r = rnd.nextInt(m)
          val before = SnapshotLog.version(dir)
          val snap = versions.last.snapshot
          val doomed = snap.filter(_._1 % m == r)
          val pred = pmod(col("k"), lit(m.toLong)) === r.toLong
          val v =
            if (morRnd.nextBoolean()) SnapshotLog.deleteMor(spark, dir, pred)
            else SnapshotLog.delete(spark, dir, pred, col("k"))
          if (doomed.isEmpty)
            assert(v === before && SnapshotLog.version(dir) === before,
              s"seed=$seed op=$opIx empty delete must not commit")
          else {
            versions :+= V(Nil, doomed, snap.filterNot(_._1 % m == r))
            assert(v === latest, s"seed=$seed op=$opIx delete version drift")
          }
        case 6 =>
          // MERGE: replace up to 3 existing keys (new x image in the
          // wide regime) and insert 1-2 brand-new keys, one commit.
          // In the narrow regime a replacement is value-identical
          // (the row is just its key), but CDC must still deliver
          // delete(old) + insert(new) — the feed reports row images,
          // not diffs.
          val snap = versions.last.snapshot
          val updKeys = rnd.shuffle(snap.map(_._1)).take(rnd.nextInt(4))
          val nNew = 1 + rnd.nextInt(2)
          val newKeys = (nextRow until nextRow + nNew).toSeq
          nextRow += nNew
          val wide = wideSince.isDefined
          val srcRows: Seq[(Long, Option[Long])] =
            if (wide) (updKeys ++ newKeys).map(k => k -> Some(k * 13 + 1))
            else (updKeys ++ newKeys).map(k => k -> (None: Option[Long]))
          val src =
            if (wide) srcRows.map { case (k, x) => (k, x.get) }.toDF("k", "x")
            else srcRows.map(_._1).toDF("k")
          val v =
            if (morRnd.nextBoolean())
              SnapshotLog.mergeMor(spark, src, dir, "k", col("k"))
            else SnapshotLog.merge(spark, src, dir, "k", col("k"))
          val updSet = updKeys.toSet
          versions :+= V(srcRows, snap.filter(p => updSet(p._1)),
            (snap.filterNot(p => updSet(p._1)) ++ srcRows).sortBy(_._1))
          assert(v === latest, s"seed=$seed op=$opIx merge version drift")
        case 7 =>
          // first-class UPDATE of a residue class: in the wide regime
          // a real image change (x = k*29+2); in the narrow regime the
          // only column IS the key, so the update is an IDENTITY churn
          // (k = k) — preimage == postimage, the exact no-op-churn
          // shape the IVM gate suppresses, and the feed must still
          // deliver the typed pair. An empty match commits nothing.
          val m = 2 + updRnd.nextInt(3)
          val r = updRnd.nextInt(m)
          val before = SnapshotLog.version(dir)
          val snap = versions.last.snapshot
          val matched = snap.filter(_._1 % m == r)
          val pred = pmod(col("k"), lit(m.toLong)) === r.toLong
          val wide = wideSince.isDefined
          val set: Seq[(String, org.apache.spark.sql.Column)] =
            if (wide) Seq("x" -> (col("k") * 29L + 2L))
            else Seq("k" -> col("k"))
          val v =
            if (updRnd.nextBoolean())
              SnapshotLog.updateMor(spark, dir, pred, set, col("k"))
            else SnapshotLog.update(spark, dir, pred, set, col("k"))
          if (matched.isEmpty)
            assert(v === before && SnapshotLog.version(dir) === before,
              s"seed=$seed op=$opIx empty update must not commit")
          else {
            val post: Seq[(Long, Option[Long])] =
              if (wide) matched.map { case (k, _) => k -> Some(k * 29 + 2) }
              else matched
            versions :+= V(Nil, Nil,
              (snap.filterNot(_._1 % m == r) ++ post).sortBy(_._1),
              updPre = matched.sorted, updPost = post.sorted)
            assert(v === latest, s"seed=$seed op=$opIx update version drift")
          }
        case _ => () // read-only step: the checks below are the op
      }

      // --- invariants, after EVERY step ---
      assert(SnapshotLog.version(dir) === latest, s"seed=$seed op=$opIx")
      assert(SnapshotLog.committedBatches(dir) === tags,
        s"seed=$seed op=$opIx batch tags diverged")

      // a random surviving snapshot reads back exactly the model rows,
      // under the schema AS OF that version: pre-add versions read the
      // narrow shape, post-add versions null-fill old rows
      val v = horizon + rnd.nextInt(latest - horizon + 1)
      val asOf = SnapshotLog.readAsOf(spark, dir, v)
      if (wideSince.exists(_ <= v)) {
        assert(asOf.columns.toSeq === Seq("k", "x"),
          s"seed=$seed op=$opIx v$v schema")
        assert(readPairs(asOf) === versions(v).snapshot,
          s"seed=$seed op=$opIx readAsOf v$v")
      } else {
        assert(asOf.columns.toSeq === Seq("k"),
          s"seed=$seed op=$opIx v$v leaked the evolved schema backwards")
        assert(readKeys(asOf) === versions(v).snapshot.map(_._1),
          s"seed=$seed op=$opIx readAsOf v$v")
      }

      // a random CDC window delivers exactly the appends inside it —
      // never a compaction rewrite — under toV's schema
      val toV = horizon + rnd.nextInt(latest - horizon + 1)
      val fromV =
        if (horizon == 0 && rnd.nextBoolean()) -1
        else horizon + rnd.nextInt(toV - horizon + 1)
      val expected =
        if (fromV < 0) versions(toV).snapshot
        else ((fromV + 1) to toV).flatMap(w => versions(w).rowsAdded)
          .sorted
      // the insert-feed surface ALSO delivers update postimages (they
      // are live dataChange segments — the documented ignoreChanges
      // drift shape), while the typed feed tags them update_postimage
      val expWithPost =
        if (fromV < 0) versions(toV).snapshot
        else ((fromV + 1) to toV)
          .flatMap(w => versions(w).rowsAdded ++ versions(w).updPost)
          .sorted
      val delta = SnapshotLog.readChanges(spark, dir, fromV, toV)
      if (wideSince.exists(_ <= toV))
        assert(readPairs(delta) === expWithPost,
          s"seed=$seed op=$opIx readChanges($fromV, $toV)")
      else
        assert(readKeys(delta) === expWithPost.map(_._1),
          s"seed=$seed op=$opIx readChanges($fromV, $toV)")

      // the FULL feed over the same window: the identical inserts plus
      // exactly the rows deletes/merges removed, tagged _change_type —
      // and from-empty (-1) is net state, no deletes
      val cdc = SnapshotLog.readCdc(spark, dir, fromV, toV)
      val expDeletes =
        if (fromV < 0) Nil
        else ((fromV + 1) to toV).flatMap(w => versions(w).rowsDeleted)
          .sorted
      val cdcIns = cdc.filter(col("_change_type") === "insert")
      val cdcDel = cdc.filter(col("_change_type") === "delete")
      val cdcPre = cdc.filter(col("_change_type") === "update_preimage")
      val cdcPost = cdc.filter(col("_change_type") === "update_postimage")
      val expPre =
        if (fromV < 0) Nil
        else ((fromV + 1) to toV).flatMap(w => versions(w).updPre).sorted
      val expPost =
        if (fromV < 0) Nil
        else ((fromV + 1) to toV).flatMap(w => versions(w).updPost).sorted
      if (wideSince.exists(_ <= toV)) {
        assert(readPairs(cdcPre) === expPre,
          s"seed=$seed op=$opIx readCdc($fromV, $toV) preimages")
        assert(readPairs(cdcPost) === expPost,
          s"seed=$seed op=$opIx readCdc($fromV, $toV) postimages")
      } else {
        assert(readKeys(cdcPre) === expPre.map(_._1),
          s"seed=$seed op=$opIx readCdc($fromV, $toV) preimages")
        assert(readKeys(cdcPost) === expPost.map(_._1),
          s"seed=$seed op=$opIx readCdc($fromV, $toV) postimages")
      }
      if (wideSince.exists(_ <= toV)) {
        assert(readPairs(cdcIns) === expected,
          s"seed=$seed op=$opIx readCdc($fromV, $toV) inserts")
        assert(readPairs(cdcDel) === expDeletes,
          s"seed=$seed op=$opIx readCdc($fromV, $toV) deletes")
      } else {
        assert(readKeys(cdcIns) === expected.map(_._1),
          s"seed=$seed op=$opIx readCdc($fromV, $toV) inserts")
        assert(readKeys(cdcDel) === expDeletes.map(_._1),
          s"seed=$seed op=$opIx readCdc($fromV, $toV) deletes")
      }

      // every change row carries the version that produced it
      // (round-12: the ordering column keyed sinks replay by): for a
      // random version inside the window, the w-tagged inserts/deletes
      // are EXACTLY the model's w-th commit; the from-empty feed is
      // one synthetic commit tagged toV
      if (fromV < 0) {
        if (versions(toV).snapshot.nonEmpty)
          assert(cdc.select(col("_commit_version")).distinct()
            .collect().map(_.getInt(0)).toSeq === Seq(toV),
            s"seed=$seed op=$opIx from-empty feed must tag toV")
      } else if (toV > fromV) {
        val w = fromV + 1 + rnd.nextInt(toV - fromV)
        val insW = cdcIns.filter(col("_commit_version") === w)
        val delW = cdcDel.filter(col("_commit_version") === w)
        if (wideSince.exists(_ <= toV)) {
          assert(readPairs(insW) === versions(w).rowsAdded.sorted,
            s"seed=$seed op=$opIx v$w-tagged inserts")
          assert(readPairs(delW) === versions(w).rowsDeleted.sorted,
            s"seed=$seed op=$opIx v$w-tagged deletes")
        } else {
          assert(readKeys(insW) === versions(w).rowsAdded.map(_._1).sorted,
            s"seed=$seed op=$opIx v$w-tagged inserts")
          assert(readKeys(delW) === versions(w).rowsDeleted.map(_._1).sorted,
            s"seed=$seed op=$opIx v$w-tagged deletes")
        }
      }

      // zone-filtered read: contents independent of segment layout,
      // and never more segments opened than the manifest lists
      val snap = versions(latest).snapshot
      if (snap.nonEmpty) {
        val lo = snap(rnd.nextInt(snap.size))._1
        val hi = lo + rnd.nextInt(8)
        val (df, scanned, total) =
          SnapshotLog.readAsOfFiltered(spark, dir, latest, col("k"), lo, hi)
        assert(readKeys(df) === snap.map(_._1).filter(k => k >= lo && k <= hi),
          s"seed=$seed op=$opIx filtered [$lo,$hi]")
        assert(scanned <= total)
      }

      // pre-horizon versions are gone LOUDLY, not silently empty
      if (horizon > 0)
        intercept[Exception] {
          SnapshotLog.readAsOf(spark, dir, horizon - 1).count()
        }

      // the streaming tail consumes this op's commits exactly once
      // (crashes injected at random — see drainTail)
      drainTail(opIx)
      drainReplica(opIx)
    }
    wideSince.isDefined
  }

  test("seeded op sequences: every read surface tracks the model (seed 11)") {
    runSequence(seed = 11, opCount = 16)
  }

  test("seeded op sequences: every read surface tracks the model (seed 42)") {
    runSequence(seed = 42, opCount = 16)
  }

  test("seeded op sequences: every read surface tracks the model (seed 97)") {
    runSequence(seed = 97, opCount = 16)
  }

  test("seeded op sequences: every read surface tracks the model (seed 1234)") {
    val evolved = runSequence(seed = 1234, opCount = 20)
    assert(evolved, "seed 1234 must exercise the column-add — " +
      "pick a different seed if the RNG layout changes")
  }

  test("a CDC-apply replica tracks the model through every op (seed 42)") {
    runSequence(seed = 42, opCount = 16, withReplica = true)
  }

  // == Incremental (delta) manifests: the same sequences must read
  // identically at a SHORT checkpoint interval (delta chains cross
  // checkpoints, vacuums land mid-chain and materialize the horizon)
  // and at interval 1 (always-full — the legacy layout). The model
  // never looks at the layout, so any divergence is a resolution bug.
  test("interval=3: delta chains + checkpoint + vacuum materialization track the model") {
    runSequence(seed = 11, opCount = 16, checkpointInterval = 3)
    runSequence(seed = 42, opCount = 16, checkpointInterval = 3)
    runSequence(seed = 1234, opCount = 20, checkpointInterval = 3)
  }

  test("interval=1 (always-full) behaves identically") {
    runSequence(seed = 42, opCount = 16, checkpointInterval = 1)
  }

  test("delta manifests actually occur and resolve at interval=3") {
    import spark.implicits._
    val dir = Files.createTempDirectory("snaplog_delta_shape").toString
    SnapshotLog.reset(dir, checkpointInterval = 3)
    (0 until 7).foreach { i =>
      SnapshotLog.append(Seq(i.toLong).toDF("k"), dir, col("k"))
    }
    // v0/v3/v6 checkpoints, the rest deltas — the layout claim itself
    val deltas = (0 to 6).map(v => SnapshotLog.isDelta(dir, v))
    assert(deltas === Seq(false, true, true, false, true, true, false))
    // every version resolves to exactly its prefix
    (0 to 6).foreach { v =>
      assert(SnapshotLog.readAsOf(spark, dir, v)
        .collect().map(_.getLong(0)).sorted.toSeq === (0L to v.toLong))
    }
    // vacuum to a mid-chain horizon: v4 (a delta over v3) must
    // materialize and v5/v6 must still resolve through it
    SnapshotLog.vacuum(dir, 4)
    assert(!SnapshotLog.isDelta(dir, 4), "horizon must be materialized")
    (4 to 6).foreach { v =>
      assert(SnapshotLog.readAsOf(spark, dir, v)
        .collect().map(_.getLong(0)).sorted.toSeq === (0L to v.toLong))
    }
    intercept[Exception] {
      SnapshotLog.readAsOf(spark, dir, 3).count()
    }
  }
}
