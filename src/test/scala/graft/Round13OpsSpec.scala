package graft

import org.apache.spark.sql.functions._

/** Round-13 wave invariants: q172 UniMax allocation algebra and q174
  * pruning-rank consistency (q171 is pinned by AsOfJoinSpec, q173 by
  * SnapshotLogSpec, q175 by ApproxRewriteSpec — each new operator
  * class gets its own suite; this one covers the closed-form queries).
  */
class Round13OpsSpec extends SparkSpec {

  test("q172: allocations exhaust the budget, respect caps, cap epochs at 4") {
    val rows = Registry.byName("q172_unimax_mix").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val tokens = rows.map(_.getLong(1))
    val caps = rows.map(_.getLong(2))
    val allocs = rows.map(_.getDouble(3))
    val epochs = rows.map(_.getDouble(4))
    val budget = math.floor(tokens.sum / 2.0)
    // waterfill exhausts the budget exactly (to rounding)
    assert(math.abs(allocs.sum - budget) <= 0.01 * rows.length,
      s"sum ${allocs.sum} vs budget $budget")
    allocs.zip(caps).foreach { case (a, c) =>
      assert(a <= c + 1e-6, s"allocation $a exceeds cap $c") }
    epochs.foreach(e => assert(e <= 4.0 + 1e-9))
    // uniformity: every uncapped source gets the same water level
    val uncapped = allocs.zip(caps).filter { case (a, c) => a < c - 1e-6 }
    if (uncapped.size > 1) {
      assert(uncapped.map(_._1).distinct.size === 1,
        "uncapped sources must share one water level")
    }
  }

  test("q178: the bucketed skyline equals the brute-force dominance skyline") {
    val m = Tables.load(spark, sfDir, "documents").selectExpr(
      "doc_id",
      "cast(size(split(text, ' ')) as long) AS tok",
      "round(cast(size(array_distinct(split(text, ' '))) as double) / " +
        "size(split(text, ' ')), 6) AS div")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // O(n^2) reference on the 500-doc fixture: survive iff nothing
    // weakly dominates with one strict axis
    val expect = m.filter { case (_, t, dv) =>
      !m.exists { case (_, t2, d2) =>
        t2 >= t && d2 >= dv && (t2 > t || d2 > dv) }
    }.map(_._1).toSet
    val got = Registry.byName("q178_pareto_frontier").fn(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q174: prune counts follow the 20% rule; boundary dominates the kept set") {
    val rows = Registry.byName("q174_difficulty_prune").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val pruned = r.getLong(2)
      assert(pruned === n * 20 / 100, s"label ${r.get(0)}: $pruned of $n")
      if (pruned > 0 && !r.isNullAt(3) && !r.isNullAt(4)) {
        // pruned examples are the MOST prototypical: the weakest pruned
        // cosine still sits at/above the mean of the kept ones
        assert(r.getDouble(3) >= r.getDouble(4) - 1e-9)
      }
    }
  }
}
