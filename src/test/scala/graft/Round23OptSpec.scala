package graft

import org.apache.spark.sql.functions._
import graft.ext.{IvfPq, SnapshotLog}

/** Round-17 OPTIMIZATION invariants — each pins an internals change
  * that must not drift the operator's output:
  *
  * 1. `IvfPq.searchGrid` (the one-chain calibration sweep) returns,
  *    per grid nProbe, rows identical to the sequential
  *    `search(nProbe = p)` it replaced.
  * 2. The observe-folded segment write records sidecar stats identical
  *    to a direct aggregate of the written segment (the two-pass shape
  *    it replaced), including the all-null sentinel.
  * 3. A SnapshotLog commit must not poison later ML-model transforms:
  *    Spark's `Observation` helper initializes the session's
  *    non-serializable ObservationManager field, which rides into ML
  *    scoring closures via trainingSummary.sparkSession — the regression
  *    the full-sweep verify caught (q173 → q138 "Task not
  *    serializable"). The fold uses the string-named observe overload,
  *    which never touches the manager.
  */
class Round23OptSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("searchGrid(p-grid) rows == sequential search(nProbe=p) per point") {
    val index = IvfPq.build(spark, emb, dim = 64, kCells = 8)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val grid = Seq(1, 2, 4, 8)
    val merged = IvfPq.searchGrid(index, emb, queries, topK = 5,
        probeGrid = grid, shortlist = 24)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
      .toSet
    val sequential = grid.flatMap { p =>
      IvfPq.search(index, emb, queries, topK = 5, nProbe = p,
          shortlist = 24)
        .collect()
        .map(r => (p, r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3)))
    }.toSet
    assert(merged === sequential)
    index.close()
  }

  test("observed write's sidecar stats == direct aggregate of the segment") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-optspec-obs").toString
    SnapshotLog.reset(dir, statsCols = Seq(
      "ok" -> "o_orderkey",
      "nul" -> "CAST(NULL AS BIGINT)")) // all-null sentinel coverage
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(5000)
    val v = SnapshotLog.append(o, dir, col("o_custkey"))
    val seg = SnapshotLog.segments(dir, v).head
    val stats = SnapshotLog.sidecarStats(dir, seg.relPath)
    val direct = spark.read.parquet(s"$dir/${seg.relPath}")
      .agg(min(col("o_orderkey")).cast("long"),
        max(col("o_orderkey")).cast("long"),
        min(col("o_custkey")).cast("long"),
        max(col("o_custkey")).cast("long"),
        count(lit(1))).head()
    assert(stats("ok") === (direct.getLong(0), direct.getLong(1)))
    assert((seg.min, seg.max) === (direct.getLong(2), direct.getLong(3)))
    assert(stats("__rows") === (direct.getLong(4), direct.getLong(4)))
    // resolved-but-all-null stat records the sentinel: covered, no range
    assert(!stats.contains("nul"))
    assert(SnapshotLog.sidecarCovered(dir, seg.relPath).contains("nul"))
  }

  test("a snapshot commit never breaks later ML-model task serialization") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-optspec-ser").toString
    SnapshotLog.reset(dir)
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).limit(1000)
    SnapshotLog.append(o, dir, col("o_orderkey"))
    // the q173 → q138 shape: an LR fit + transform AFTER a commit; with
    // Observation this threw Task not serializable at the transform
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val labeled = o.select(col("o_totalprice").cast("double").as("f"),
      (col("o_orderkey") % 2).cast("double").as("label"))
    val assembled = new VectorAssembler().setInputCols(Array("f"))
      .setOutputCol("features").transform(labeled)
    val model = new LogisticRegression().setMaxIter(2).fit(assembled)
    // transform serializes the model (with its training summary) into
    // the scoring task closure — the poisoned session died right here
    assert(model.transform(assembled).count() === 1000L)
  }
}
