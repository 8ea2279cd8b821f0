package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.ext.ShingleStore
import graft.queries.TextOps

/** The bucketed shingle materialization must be value-identical to the
  * in-session computation and must actually remove the shuffle from
  * doc_id-keyed consumers — otherwise it's just a slower cache.
  */
class ShingleStoreSpec extends SparkSpec {

  test("materialized shingle table equals the computed shingle set") {
    val docs = Tables.load(spark, sfDir, "documents")
    ShingleStore.materialize(docs, "shingles_b", buckets = 4)
    try {
      val live = TextOps.shingleSet(docs)
      val stored = ShingleStore.load(spark, "shingles_b")
      assert(stored.exceptAll(live).count() === 0)
      assert(live.exceptAll(stored).count() === 0)
    } finally spark.sql("DROP TABLE IF EXISTS shingles_b")
  }

  test("doc_id aggregation over the store plans without a data shuffle") {
    val docs = Tables.load(spark, sfDir, "documents")
    ShingleStore.materialize(docs, "shingles_b2", buckets = 4)
    try staticPlan {
      // per-doc shingle-set sizes: the |A| / |B| side of every Jaccard
      // verify join — on the bucketed store this aggregates in place
      val sizes = ShingleStore.load(spark, "shingles_b2")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val shuffles = sizes.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed store still shuffles: ${shuffles.mkString(", ")}")
      // and the values are right
      val live = TextOps.shingleSet(docs)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      assert(sizes.exceptAll(live).count() === 0)
    } finally spark.sql("DROP TABLE IF EXISTS shingles_b2")
  }

  test("q110/q127 are value-identical when the kernel serves from the store") {
    // the ScaleStress --shingle-store contract: swapping the in-memory
    // shingle cache for the bucketed parquet table changes NOTHING
    // downstream of the pair kernel — survivor election and the
    // threshold sweep are the two longest derivation chains over it
    def run(name: String) =
      Registry.byName(name).fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
    val live110 = run("q110_dedup_survivors")
    val live127 = run("q127_threshold_sweep")
    TextOps.releaseCaches()
    val docs = Tables.load(spark, sfDir, "documents")
    ShingleStore.materialize(docs, "shingles_swap", buckets = 4)
    try {
      TextOps.installShingleStore(ShingleStore.load(spark, "shingles_swap"),
        corpus = Tables.load(spark, sfDir, "documents"))
      assert(run("q110_dedup_survivors") === live110)
      assert(run("q127_threshold_sweep") === live127)
    } finally {
      TextOps.clearShingleStore()
      TextOps.releaseCaches()
      spark.sql("DROP TABLE IF EXISTS shingles_swap")
    }
  }

  test("store substitutes on plan identity: fixture reloads match, a slice does not") {
    // the substitution gate is a canonicalized-plan match against the
    // registered corpus — two independent loads of the same fixture
    // table must match (or the swap above silently stopped swapping),
    // and a derived slice must NOT (that's the wrong-answer path the
    // gate closes)
    val a = Tables.load(spark, sfDir, "documents").queryExecution.analyzed
    val b = Tables.load(spark, sfDir, "documents").queryExecution.analyzed
    assert(a.sameResult(b), "fixture reloads stopped canonical-matching — " +
      "the installed store would never substitute")
    val slice = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 3 === 0).queryExecution.analyzed
    assert(!a.sameResult(slice))
  }

  test("a caller frame that is NOT the registered corpus bypasses the store") {
    // the round-10 advice finding: GraftEngine.softDedupYield on a
    // caller frame in a session with an installed store read the STORE
    // corpus's shingles for clustering while token counts came from
    // the caller frame — silently wrong yields. The gate must compute
    // fresh shingles for the mismatched frame instead.
    val docs = Tables.load(spark, sfDir, "documents")
    val slice = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"), col("text"))
    val engine = new GraftEngine(spark, sfDir)
    val expected = engine.softDedupYield(slice).collect().map(_.toString).sorted
    TextOps.releaseCaches()
    ShingleStore.materialize(docs, "shingles_gate", buckets = 4)
    try {
      TextOps.installShingleStore(ShingleStore.load(spark, "shingles_gate"),
        corpus = docs)
      val gated = engine.softDedupYield(slice).collect().map(_.toString).sorted
      assert(gated === expected,
        "installed store leaked into a mismatched caller frame")
    } finally {
      TextOps.clearShingleStore()
      TextOps.releaseCaches()
      spark.sql("DROP TABLE IF EXISTS shingles_gate")
    }
  }
}
