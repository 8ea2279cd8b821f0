package graft

import org.apache.spark.sql.functions._
import graft.queries.VectorOps

/** Round-11 additions: snapshot-log row-level writes (q192/q193
  * scenario checks beyond the model suite), the facade-graph memo, and
  * the new curation operators' invariants.
  */
class Round16OpsSpec extends SparkSpec {

  test("facade kNN graphs memoize by input plan — repeat calls share one entry") {
    // the round-10 advice finding: every knnGraphOf call persisted a
    // NEW MEMORY_AND_DISK frame, so repeated GraftEngine.mutualKnn
    // calls in a long-lived session stacked pinned caches until the
    // global release. The memo must hand the SAME graph back for the
    // same input plan, and a different frame must still get its own.
    val e1 = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val e2 = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val g1 = VectorOps.knnGraphOf(spark, e1)
    val g2 = VectorOps.knnGraphOf(spark, e2)
    assert(g1 eq g2, "same input plan must share one memoized graph")
    val g3 = VectorOps.knnGraphOf(spark,
      e1.filter(col("vec_id") % 2 === 0))
    assert(!(g1 eq g3), "a different frame must build its own graph")
    VectorOps.releaseCaches()
  }

  test("snapshot delete: empty match commits nothing; zone-filtered reads survive") {
    import graft.ext.SnapshotLog
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_del_r16").toString
    SnapshotLog.reset(dir)
    SnapshotLog.append((0L until 100L).map(k => (k, k * 3)).toDF("k", "p"),
      dir, col("k"))
    SnapshotLog.append((100L until 200L).map(k => (k, k * 3)).toDF("k", "p"),
      dir, col("k"))
    // no-match delete: version must NOT advance
    assert(SnapshotLog.delete(spark, dir, col("k") === -1L, col("k")) === 1)
    assert(SnapshotLog.version(dir) === 1)
    // real delete: k in [50, 150) — touches BOTH segments
    val v = SnapshotLog.delete(spark, dir,
      col("k") >= 50L && col("k") < 150L, col("k"))
    assert(v === 2)
    assert(SnapshotLog.readAsOf(spark, dir, 2).count() === 100)
    assert(SnapshotLog.readAsOf(spark, dir, 1).count() === 200) // time travel
    // zone-filtered read post-delete: values right, zone map from the
    // REWRITTEN segment (not the pre-delete input)
    val (df, scanned, total) =
      SnapshotLog.readAsOfFiltered(spark, dir, 2, col("k"), 0L, 60L)
    assert(df.count() === 50) // survivors in [0, 60] = k 0..49
    assert(scanned <= total)
    SnapshotLog.vacuum(dir, 2)
    // pre-horizon time travel gone loudly; current still reads
    intercept[Exception] { SnapshotLog.readAsOf(spark, dir, 1).count() }
    assert(SnapshotLog.readAsOf(spark, dir, 2).count() === 100)
  }

  test("snapshot CDC after delete+vacuum horizon keeps only surviving manifests' deletes") {
    import graft.ext.SnapshotLog
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_cdc_r16").toString
    SnapshotLog.reset(dir)
    SnapshotLog.append((0L until 10L).toDF("k"), dir, col("k"))          // v0
    SnapshotLog.delete(spark, dir, col("k") < 3L, col("k"))              // v1
    SnapshotLog.append((10L until 15L).toDF("k"), dir, col("k"))         // v2
    val cdc = SnapshotLog.readCdc(spark, dir, 0, 2)
    val dels = cdc.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().sorted.toSeq
    val ins = cdc.filter(col("_change_type") === "insert")
      .select("k").as[Long].collect().sorted.toSeq
    assert(dels === Seq(0L, 1L, 2L))
    assert(ins === (10L until 15L).toSeq)
    // vacuum past the delete version: its #cdcdel segment may go, but
    // surviving windows must still answer
    SnapshotLog.vacuum(dir, 2)
    val cdc2 = SnapshotLog.readCdc(spark, dir, 2, 2)
    assert(cdc2.count() === 0)
  }

  test("merge refuses a source that drops columns (add-only evolution gate)") {
    import graft.ext.SnapshotLog
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_mrg_r16").toString
    SnapshotLog.reset(dir)
    SnapshotLog.append(Seq((1L, 10L), (2L, 20L)).toDF("k", "x"), dir, col("k"))
    intercept[IllegalArgumentException] {
      SnapshotLog.merge(spark, Seq(1L).toDF("k"), dir, "k", col("k"))
    }
    assert(SnapshotLog.version(dir) === 0, "refused merge moved the log")
    // and a WIDENING merge evolves: new column null-fills old rows
    val v = SnapshotLog.merge(spark,
      Seq((2L, 21L, 99L)).toDF("k", "x", "y"), dir, "k", col("k"))
    val snap = SnapshotLog.readAsOf(spark, dir, v)
    assert(snap.columns.toSeq === Seq("k", "x", "y"))
    assert(snap.filter(col("k") === 1L && col("y").isNull).count() === 1)
    assert(snap.filter(col("k") === 2L && col("x") === 21L &&
      col("y") === 99L).count() === 1)
  }
}
