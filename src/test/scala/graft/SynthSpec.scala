package graft

import org.apache.spark.sql.functions._
import graft.reco.RatingSynth

/** F6 rating-synthesis invariants: tier bounds and distribution
  * against the reference's weight table (imb_rating.py:116–124), and
  * seeded determinism.
  */
class SynthSpec extends SparkSpec {

  test("ratings are stars in 1..5") {
    val r = RatingSynth.synthRatings(spark, sfDir)
    val mm = r.agg(min("rating"), max("rating")).collect().head
    assert(mm.getFloat(0) >= 1f && mm.getFloat(1) <= 5f)
  }

  test("high-tier items draw only {3,4,5} with ~{10,40,50}% weights") {
    val r = RatingSynth.synthRatings(spark, "/root/testdata/sf0.01")
    val counts = r.groupBy("rating").count().collect()
      .map(x => x.getFloat(0) -> x.getLong(1)).toMap
    // the fixture's discounts put every item in the >=8.0 tier
    assert(counts.keySet.subsetOf(Set(3f, 4f, 5f)))
    val n = counts.values.sum.toDouble
    assert(math.abs(counts(3f) / n - 0.10) < 0.03)
    assert(math.abs(counts(4f) / n - 0.40) < 0.03)
    assert(math.abs(counts(5f) / n - 0.50) < 0.03)
  }

  test("seeded synthesis is deterministic across runs") {
    def snapshot() = RatingSynth.synthRatings(spark, sfDir)
      .groupBy("rating").count().collect()
      .map(x => (x.getFloat(0), x.getLong(1))).toSet
    assert(snapshot() === snapshot())
  }
}
