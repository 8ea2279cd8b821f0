package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contract of the factored-out q142 PageRank kernel
  * (TextOps.pageRankRanks):
  *  - tol = Some(0.0) is the exact-9dp-fixpoint exit — bit-for-bit
  *    indistinguishable from the unconditional fixed-round loop, and
  *    it must actually FIRE (fewer rounds) on a degree-regular graph;
  *  - a loose tol is the non-oracle serving option — fewer rounds on
  *    irregular graphs while agreeing with the fixed loop at the 6dp
  *    rounding q142 publishes;
  *  - on the fixture's real near-dup pair graph the exact exit stays
  *    bit-for-bit equal to fixed-8 whether or not it fires.
  */
class PageRankSpec extends SparkSpec {

  /** (withDeg, deg) frames in the exact shape q142 feeds the kernel. */
  private def frames(pairs: DataFrame): (DataFrame, DataFrame) = {
    val edges = pairs.select(col("da"), col("db")).unionAll(
      pairs.select(col("db").as("da"), col("da").as("db")))
    val deg = edges.groupBy(col("da"))
      .agg(count(lit(1)).cast("double").as("deg"))
    (edges.join(deg, Seq("da")), deg)
  }

  private def ranksOf(df: DataFrame): Map[Long, Double] =
    df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("r")).toMap

  private def pairsDf(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("da", "db")
  }

  test("exact-fixpoint exit fires on a regular graph, bit-for-bit ≡ fixed") {
    // a triangle is degree-regular: r=1.0 is the stationary point, so
    // round 1 reproduces r0 exactly and round 2 detects the fixpoint
    val (withDeg, deg) = frames(pairsDf(Seq((1L, 2L), (2L, 3L), (1L, 3L))))
    val (fixed, nFixed) = graft.queries.TextOps
      .pageRankRanksCounted(withDeg, deg, 8, tol = None)
    val (early, nEarly) = graft.queries.TextOps
      .pageRankRanksCounted(withDeg, deg, 8, tol = Some(0.0))
    assert(nFixed === 8)
    assert(nEarly < 8, "exact fixpoint should fire on a regular graph")
    assert(ranksOf(early) === ranksOf(fixed))
  }

  test("loose-tol exit fires on an irregular graph, within 5.67·tol of the fixpoint") {
    // a 3-chain contracts at the damping factor 0.85/round (its update
    // Jacobian eigenvalue is exactly 0.85), so the exact 9dp fixpoint
    // is ~130 rounds away — the tolerance exit is the practical
    // option. Stopping at residual ≤ tol leaves the result within
    // tol·0.85/(1−0.85) ≈ 5.67·tol of the true fixpoint, which is
    // known analytically here: chain ends x = 0.15 + 0.425y,
    // hub y = 0.15 + 1.7x → x = 0.21375/0.2775, y = 0.15 + 1.7x
    // (and every triangle node sits at exactly 1.0).
    val (withDeg, deg) =
      frames(pairsDf(Seq((10L, 11L), (11L, 12L), (1L, 2L), (2L, 3L), (1L, 3L))))
    val tol = 1e-3
    val budget = 48
    val (early, nEarly) = graft.queries.TextOps
      .pageRankRanksCounted(withDeg, deg, budget, tol = Some(tol))
    assert(nEarly < budget, "tolerance exit should fire within the budget")
    val x = 0.21375 / 0.2775
    val y = 0.15 + 1.7 * x
    val want = Map(10L -> x, 12L -> x, 11L -> y, 1L -> 1.0, 2L -> 1.0, 3L -> 1.0)
    val got = ranksOf(early)
    assert(got.keySet === want.keySet)
    val bound = tol * 0.85 / 0.15 + 1e-9
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) <= bound,
        s"node $k: ${got(k)} vs fixpoint $v (bound $bound)")
    }
  }

  test("exact exit ≡ fixed-8 on the fixture's near-dup pair graph") {
    val pairs = Registry.byName("q42_minhash_lsh_pairs").fn(spark, sfDir)
    assert(pairs.count() > 0, "fixture should contain planted near-dups")
    val (withDeg, deg) = frames(pairs)
    val fixed = graft.queries.TextOps
      .pageRankRanks(withDeg, deg, 8, tol = None)
    val early = graft.queries.TextOps
      .pageRankRanks(withDeg, deg, 8, tol = Some(0.0))
    assert(ranksOf(early) === ranksOf(fixed))
    graft.queries.TextOps.releaseCaches()
  }
}
