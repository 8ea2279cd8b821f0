package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins BenchBaseline (the transcribed BASELINE.md medians Bench.scala
  * adjudicates against) in sync with the live registry and build-step
  * list: a renamed/removed query with a stale medians key would
  * silently drop out of the ratio check (n_compared shrinks but nothing
  * fails), and a build-step rename would orphan its `build:` row. New
  * queries registered AFTER the record are legitimate — Bench reports
  * them in `no_base` with raw seconds — so the spec allows registry ⊃
  * baseline but never baseline ⊄ registry.
  */
class BaselineSyncSpec extends AnyFunSuite {

  test("every BenchBaseline query key names a registered query") {
    val registered = Registry.all.map(_.name).toSet
    val stale = BenchBaseline.medians.keys
      .filterNot(_.startsWith("build:"))
      .filterNot(registered)
    assert(stale.isEmpty, s"stale baseline keys: ${stale.mkString(",")}")
  }

  test("every BenchBaseline build key names a Bench build step") {
    val steps = Bench.buildSteps.map { case (n, _) => s"build:$n" }.toSet
    val stale = BenchBaseline.medians.keys
      .filter(_.startsWith("build:")).filterNot(steps)
    assert(stale.isEmpty, s"stale baseline build keys: ${stale.mkString(",")}")
  }

  test("baseline covers the recorded-round surface (only post-record queries may be missing)") {
    val missing = Registry.all.map(_.name)
      .filterNot(BenchBaseline.medians.contains)
    // r12 recorded all 199 then-registered queries; anything missing
    // here must be new-this-round (name it below when adding one, so
    // an accidental omission can't hide behind the allowance)
    val newThisRound = Set(
      "q200_stream_replay_audit",
      "q201_ann_recall_clustered",
      "q202_commit_retry_audit",
      "q203_manifest_compaction",
      "q204_unigram_segmentation",
      "q205_deflate_sizes",
      "q206_snapshot_optimize",
      "q207_bucketed_join",
      "q208_multidim_prune",
      // round 14
      "q209_snapshot_delete_mor",
      "q210_graph_ann_recall",
      "q211_wordpiece_train",
      "q212_wordpiece_encode",
      "q213_stats_evolution",
      "q214_wordpiece_segmentation",
      "q215_graph_ann_topk",
      "q216_snapshot_merge_mor",
      // round 15
      "q217_stream_source_audit",
      "q218_incremental_optimize",
      "q219_incremental_knn_cdc",
      "q220_segment_health",
      "q221_incremental_view",
      "q222_snapshot_restore",
      // round 16
      "q223_snapshot_update",
      "q224_snapshot_clone",
      "q225_ann_autotune",
      "q226_cdc_apply",
      "q227_snapshot_history",
      "q228_check_constraints",
      "q229_composite_merge",
      // round 17
      "q230_column_rename",
      "q231_declared_clustering",
      "q232_ann_arm_autotune",
      "q233_multi_table_txn",
      "q234_txn_move")
    val unexplained = missing.filterNot(newThisRound)
    assert(unexplained.isEmpty,
      s"queries with no baseline median and no new-query allowance: ${unexplained.mkString(",")}")
  }
}
