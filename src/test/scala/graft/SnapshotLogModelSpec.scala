package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import scala.util.Random
import graft.ext.SnapshotLog

/** Model-based randomized exercise of the SnapshotLog contract: a
  * seeded op sequence (append / compact / vacuum / the three read
  * surfaces) runs against both the real log and a trivial in-memory
  * model, and every read must agree after every mutation. The scenario
  * tests in SnapshotLogSpec pin individual behaviors; this suite hunts
  * INTERACTIONS enumerated cases miss — append-after-compact, vacuum
  * landing ON a compaction version, CDC windows straddling both, tag
  * survival through compact-then-vacuum chains. Seeds are fixed, so a
  * failure replays exactly.
  */
class SnapshotLogModelSpec extends SparkSpec {

  /** Per-version model state: the rows this version ADDED (empty for a
    * compaction) and the full snapshot as of it.
    */
  private case class V(rowsAdded: Seq[Long], snapshot: Seq[Long])

  private def readKeys(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("k")).collect().map(_.getLong(0)).toSeq.sorted

  private def runSequence(seed: Int, opCount: Int): Unit = {
    import spark.implicits._
    val rnd = new Random(seed)
    val dir = Files.createTempDirectory(s"snaplog_model_$seed").toString
    var versions = Vector.empty[V] // index == version number
    var horizon = 0                // lowest version still readable
    var tags = Set.empty[Long]
    var nextRow = 0L

    def latest: Int = versions.size - 1

    (1 to opCount).foreach { opIx =>
      val op =
        if (versions.isEmpty) 0 // nothing to compact/vacuum/read yet
        else rnd.nextInt(6)     // 0-1 append, 2 compact, 3 vacuum, 4-5 no-op mutation (read-only step)
      op match {
        case 0 | 1 =>
          val n = 1 + rnd.nextInt(5)
          val rows = (nextRow until nextRow + n).toSeq
          nextRow += n
          val tag = if (rnd.nextBoolean()) Some(opIx.toLong) else None
          val v = SnapshotLog.append(rows.toDF("k"), dir, col("k"), tag)
          tags ++= tag
          val snap = versions.lastOption.map(_.snapshot).getOrElse(Nil) ++ rows
          versions :+= V(rows, snap.sorted)
          assert(v === latest, s"seed=$seed op=$opIx version drift")
        case 2 =>
          SnapshotLog.compact(spark, dir, col("k"))
          versions :+= V(Nil, versions.last.snapshot)
        case 3 =>
          val newHorizon = horizon + rnd.nextInt(latest - horizon + 1)
          SnapshotLog.vacuum(dir, newHorizon)
          horizon = newHorizon
        case _ => () // read-only step: the checks below are the op
      }

      // --- invariants, after EVERY step ---
      assert(SnapshotLog.version(dir) === latest, s"seed=$seed op=$opIx")
      assert(SnapshotLog.committedBatches(dir) === tags,
        s"seed=$seed op=$opIx batch tags diverged")

      // a random surviving snapshot reads back exactly the model rows
      val v = horizon + rnd.nextInt(latest - horizon + 1)
      assert(readKeys(SnapshotLog.readAsOf(spark, dir, v)) ===
        versions(v).snapshot, s"seed=$seed op=$opIx readAsOf v$v")

      // a random CDC window delivers exactly the appends inside it —
      // never a compaction rewrite, regardless of what the window spans
      val toV = horizon + rnd.nextInt(latest - horizon + 1)
      val fromV =
        if (horizon == 0 && rnd.nextBoolean()) -1
        else horizon + rnd.nextInt(toV - horizon + 1)
      val expected =
        if (fromV < 0) versions(toV).snapshot
        else ((fromV + 1) to toV).flatMap(w => versions(w).rowsAdded).sorted
      assert(readKeys(SnapshotLog.readChanges(spark, dir, fromV, toV)) ===
        expected, s"seed=$seed op=$opIx readChanges($fromV, $toV)")

      // zone-filtered read: contents independent of segment layout,
      // and never more segments opened than the manifest lists
      val snap = versions(latest).snapshot
      if (snap.nonEmpty) {
        val lo = snap(rnd.nextInt(snap.size))
        val hi = lo + rnd.nextInt(8)
        val (df, scanned, total) =
          SnapshotLog.readAsOfFiltered(spark, dir, latest, col("k"), lo, hi)
        assert(readKeys(df) === snap.filter(k => k >= lo && k <= hi),
          s"seed=$seed op=$opIx filtered [$lo,$hi]")
        assert(scanned <= total)
      }

      // pre-horizon versions are gone LOUDLY, not silently empty
      if (horizon > 0)
        intercept[Exception] {
          SnapshotLog.readAsOf(spark, dir, horizon - 1).count()
        }
    }
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
}
