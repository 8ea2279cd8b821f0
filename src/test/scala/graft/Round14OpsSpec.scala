package graft

import org.apache.spark.sql.functions._

/** Round-14 wave invariants: the screened containment composition
  * (q179) must be EXACTLY the all-pairs kernel's answer while doing
  * candidate-linear work — the equivalence-plus-economy proof the
  * IVF-PQ family established with q139. (q180/q181 are pinned by
  * AsOfJoinPropertySpec and their own DuckDB LATERAL oracles; the
  * SnapshotLog round-10 contracts by SnapshotLogSpec.)
  */
class Round14OpsSpec extends SparkSpec {

  test("q179 screen-then-price equals q169's exact all-pairs kernel") {
    def rows(name: String) = Registry.byName(name).fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val exact = rows("q169_containment_dedup")
    val screened = rows("q179_containment_screened")
    assert(exact.nonEmpty, "fixture must exercise the containment gate")
    assert(screened === exact,
      s"screen lost ${(exact -- screened).size} pairs / " +
        s"invented ${(screened -- exact).size}")
  }

  test("the winnowing screen is a real screen: candidates ≪ all-pairs") {
    val docs = Tables.load(spark, sfDir, "documents")
    // the SAME factored pipeline q179 runs — a re-implemented copy here
    // could drift from the shipped screen and keep passing
    val nCand = graft.queries.TextOps.containmentCandidates(docs).count()
    val nDocs = docs.count()
    val allPairs = nDocs * (nDocs - 1) / 2
    assert(nCand > 0)
    // the whole point of the composition: the exact kernel prices a
    // vanishing fraction of the quadratic pair space
    assert(nCand < allPairs / 20,
      s"screen admitted $nCand of $allPairs pairs — not a screen")
  }

  test("short contained docs route through exact postings, not the screen") {
    import spark.implicits._
    // a 5-token doc emits NO winnowing fingerprints (needs >= 7
    // tokens), so the screen alone is structurally blind to it; the
    // kernel's short-doc posting arm must still find its container
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "w5 w6 w7 w8 w9"), // fully contained in doc 2, C = 1.0
      (2L, big),
      (3L, (1 to 20).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val got = graft.queries.TextOps.screenedContainmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 0.8),
      s"short contained doc must surface: ${got.toSeq}")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      "an unrelated doc must pair with nothing")
  }

  test("winnowing guarantee on the fixture: every 7-token shared run collides") {
    import spark.implicits._
    // two docs sharing an exact 7-token run (w+k-1) must share ≥1
    // fingerprint wherever the run sits — the Schleimer guarantee the
    // screen's recall contract cites
    val run = (1 to 7).map(i => s"run$i").mkString(" ")
    def pad(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, s"${pad("a", 9)} $run ${pad("b", 4)}"),
      (2L, s"$run ${pad("c", 11)}"),
      (3L, pad("d", 15))).toDF("doc_id", "text")
    val fp = graft.queries.TextOps.winnowFingerprints(docs)
    val shared = fp.as("x").join(fp.as("y"), Seq("fp"))
      .filter(col("x.doc_id") === 1L && col("y.doc_id") === 2L).count()
    assert(shared >= 1, "docs sharing a 7-token run must share a fingerprint")
    val noise = fp.as("x").join(fp.as("y"), Seq("fp"))
      .filter(col("x.doc_id") === 3L && col("y.doc_id") =!= 3L).count()
    assert(noise === 0, "an unrelated doc must share nothing")
  }

  test("q182 epoch shuffle: complete, contiguous, decorrelated, rerun-stable") {
    val out = Registry.byName("q182_epoch_shuffle").fn(spark, sfDir).cache()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    // every doc appears exactly once per epoch
    assert(out.count() === 2 * nDocs)
    assert(out.groupBy(col("epoch"), col("doc_id")).count()
      .filter(col("count") =!= 1).count() === 0)
    // positions are a contiguous 1..shard_n permutation inside every shard
    val byShard = out.groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("mn"),
        max(col("pos")).as("mx"), countDistinct(col("pos")).as("nd"),
        max(col("shard_n")).as("sn"))
    assert(byShard.filter(col("mn") =!= 1 || col("mx") =!= col("n") ||
      col("nd") =!= col("n") || col("sn") =!= col("n")).count() === 0)
    // epochs reshuffle: the (shard, pos) slot of a doc must differ
    // between epochs for (nearly) all docs — identical orders would
    // mean the epoch number never reached the hash
    val e0 = out.filter(col("epoch") === 0)
      .select(col("doc_id"), col("shard").as("s0"), col("pos").as("p0"))
    val e1 = out.filter(col("epoch") === 1)
      .select(col("doc_id"), col("shard").as("s1"), col("pos").as("p1"))
    val same = e0.join(e1, Seq("doc_id"))
      .filter(col("s0") === col("s1") && col("p0") === col("p1")).count()
    assert(same < nDocs / 10,
      s"$same of $nDocs docs kept their slot across epochs — not reshuffled")
    // pure function of (id, epoch): a second run is bit-identical
    val again = Registry.byName("q182_epoch_shuffle").fn(spark, sfDir)
    assert(out.exceptAll(again).count() === 0 &&
      again.exceptAll(out).count() === 0)
    out.unpersist()
  }
}
