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
    // the r17 record covers EVERY registered row (3-invocation
    // protocol, 2026-08-16); name queries added AFTER it here, so an
    // accidental omission can't hide behind the allowance
    val newThisRound = Set(
      "q235_bloom_discovery",
      "q236_consistent_pin",
      "q237_point_lookup",
      "q238_txn_cdc_apply",
      "q239_tuple_bloom")
    val unexplained = missing.filterNot(newThisRound)
    assert(unexplained.isEmpty,
      s"queries with no baseline median and no new-query allowance: ${unexplained.mkString(",")}")
  }
}
