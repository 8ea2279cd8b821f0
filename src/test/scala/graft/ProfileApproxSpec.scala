package graft

import org.apache.spark.sql.functions._

/** q158 — the sketch-mode profiler (q151's 100 TB form). Rows-only at
  * the driver gate (HLL register layouts aren't engine-portable), so
  * these tests carry the correctness weight: agreement with the exact
  * profiler inside the sketch's error bound, exact agreement on every
  * non-sketched statistic, and the plan shape the scale claim rests on
  * (ONE scan, ONE aggregate — no per-column jobs, no distinct
  * expansion).
  */
class ProfileApproxSpec extends SparkSpec {

  test("q158 matches q151's exact profile; distinct estimates within the HLL bound") {
    val exact = Registry.byName("q151_data_profile").fn(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5), r.getDouble(6))).toMap
    val approx = Registry.byName("q158_profile_approx").fn(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5), r.getDouble(6))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (c, (nRows, nNull, nDistinct, mn, mx, avgLen)) =>
      val (aRows, aNull, aDistinct, aMn, aMx, aLen) = approx(c)
      // everything but the distinct count is computed exactly
      assert(aRows === nRows, s"$c n_rows")
      assert(aNull === nNull, s"$c n_null")
      assert(aMn === mn && aMx === mx, s"$c min/max")
      assert(aLen === avgLen, s"$c avg_len")
      // p=12 HLL: rse ≈ 1.6%; 5% is the documented operating bound
      // (same margin HllAggSpec pins for the q85 kernel)
      val err = math.abs(aDistinct - nDistinct).toDouble / math.max(nDistinct, 1L)
      assert(err <= 0.05, s"$c distinct est $aDistinct vs exact $nDistinct (err $err)")
    }
  }

  test("q158 is ONE scan + ONE aggregate: no per-column jobs, no distinct expand") {
    staticPlan {
      val qe = Registry.byName("q158_profile_approx").fn(spark, sfDir)
        .queryExecution
      val txt = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
      val scans = txt.linesIterator.count(_.trim.startsWith("ReadSchema:"))
      assert(scans === 1, s"expected a single corpus scan, got $scans")
      // exact COUNT(DISTINCT) would plan an Expand (one replica of the
      // input per distinct column) — the sketch form must not
      assert(!txt.contains("Expand"),
        "sketch profiler plan contains a distinct-aggregate Expand")
    }
  }
}
