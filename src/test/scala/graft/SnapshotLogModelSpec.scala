package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import scala.util.Random
import graft.ext.SnapshotLog

/** Model-based randomized exercise of the SnapshotLog contract: a
  * seeded op sequence (append / WIDE append / compact / vacuum /
  * refused narrow append / the three read surfaces) runs against both
  * the real log and a trivial in-memory model, and every read must
  * agree after every mutation. The scenario tests in SnapshotLogSpec
  * pin individual behaviors; this suite hunts INTERACTIONS enumerated
  * cases miss — append-after-compact, vacuum landing ON a compaction
  * version, CDC windows straddling both, tag survival through
  * compact-then-vacuum chains, and (since schema evolution landed) a
  * column-add interleaved arbitrarily with all of the above: every
  * version must read back under ITS OWN schema, old rows null-fill the
  * added column, compaction materializes without changing values, and
  * a narrow append after the add is refused WITHOUT moving the log.
  * Seeds are fixed, so a failure replays exactly.
  */
class SnapshotLogModelSpec extends SparkSpec {

  /** Per-version model state: the (k, x) rows this version ADDED
    * (x = None for rows added before/without the wide column) and the
    * full snapshot as of it.
    */
  private case class V(rowsAdded: Seq[(Long, Option[Long])],
      snapshot: Seq[(Long, Option[Long])])

  private def readKeys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("k")).collect().map(_.getLong(0)).toSeq.sorted

  private def readPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Option[Long])] =
    df.select(col("k"), col("x")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq.sortBy(_._1)

  /** Returns whether the sequence exercised the column-add (callers
    * assert it on at least one seed, so the evolution checks can't all
    * pass vacuously).
    */
  private def runSequence(seed: Int, opCount: Int): Boolean = {
    import spark.implicits._
    val rnd = new Random(seed)
    val dir = Files.createTempDirectory(s"snaplog_model_$seed").toString
    var versions = Vector.empty[V] // index == version number
    var horizon = 0                // lowest version still readable
    var tags = Set.empty[Long]
    var nextRow = 0L
    var wideSince: Option[Int] = None // first version whose schema has x

    def latest: Int = versions.size - 1

    (1 to opCount).foreach { opIx =>
      val op =
        if (versions.isEmpty) rnd.nextInt(2) // only appends make sense yet
        else rnd.nextInt(7) // 0 append, 1 wide append, 2 compact, 3 vacuum,
                            // 4 refused narrow-after-wide, 5-6 read-only
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
          versions :+= V(rows, snap.sortBy(_._1))
          assert(v === latest, s"seed=$seed op=$opIx version drift")
        case 2 =>
          SnapshotLog.compact(spark, dir, col("k"))
          versions :+= V(Nil, versions.last.snapshot)
        case 3 =>
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
          .sortBy(_._1)
      val delta = SnapshotLog.readChanges(spark, dir, fromV, toV)
      if (wideSince.exists(_ <= toV))
        assert(readPairs(delta) === expected,
          s"seed=$seed op=$opIx readChanges($fromV, $toV)")
      else
        assert(readKeys(delta) === expected.map(_._1),
          s"seed=$seed op=$opIx readChanges($fromV, $toV)")

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
}
