package graft

import org.apache.spark.sql.functions._

/** The library facade exposes the full surface from one handle. */
class GraftEngineSpec extends SparkSpec {

  private lazy val engine = new GraftEngine(spark, sfDir)

  test("query-by-name reaches every registered query") {
    assert(engine.query("q01_popular").count() > 0)
    assert(engine.query("q40_dedup_exact").count() === 500)
    intercept[NoSuchElementException] { engine.query("no_such_query") }
  }

  test("native functions are registered through the facade") {
    val r = engine.table("embeddings").limit(5)
      .select(expr("cosine_sim(embedding, embedding)").as("c")).collect()
    assert(r.forall(x => math.abs(x.getDouble(0) - 1.0) < 1e-9))
  }

  test("catalog existence probe and ensure-view registration") {
    assert(!engine.tableExists("nation"))
    // registers when absent, no-op when already present
    assert(engine.ensureView("nation"))
    assert(engine.tableExists("nation"))
    assert(!engine.ensureView("nation"))
    assert(spark.sql("SELECT count(*) AS n FROM nation").head().getLong(0) === 25L)
    spark.catalog.dropTempView("nation")
    assert(!engine.tableExists("nation"))
  }

  test("integrity audit reports clean fixtures") {
    val checks = engine.query("q64_integrity_checks").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(checks === Map(
      "orphan_orders" -> 0L, "orphan_lineitems" -> 0L,
      "dup_custkeys" -> 0L, "null_acctbal" -> 0L))
  }

  test("annTopK serves caller queries through the shared index") {
    import org.apache.spark.sql.functions.col
    val q = engine.table("embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    try {
      // exhaustive configuration must reproduce the exact baseline
      val n = engine.table("embeddings").count().toInt
      val viaEngine = engine.annTopK(q, topK = 5, nProbe = 16, shortlist = n)
        .collect().toSeq
      val exact = engine.query("q50_cosine_topk").collect().toSeq
      assert(viaEngine === exact)
      // the serving configuration returns a full top-5 per query
      val served = engine.annTopK(q).collect()
      assert(served.length === q.count().toInt * 5)
    } finally engine.releaseCaches()
  }

  test("hybridTopK at full probe reproduces registered q156 bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // caller-shaped queries: (q_id, q_text, q_emb) — the same five
    // docs q156 ranks (doc_id = vec_id links the modalities)
    val q = engine.table("documents").filter(col("doc_id") < 5)
      .select(col("doc_id").as("q_id"), col("text").as("q_text"))
      .join(engine.table("embeddings").filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
        Seq("q_id"))
    try {
      // full probe + unbounded shortlist: the dense arm is exact (the
      // q139 losslessness property), so the fused output must equal
      // the registered query's exact-cosine arm bit-for-bit
      val viaEngine = engine.hybridTopK(q, topK = 10, nProbe = 16,
        shortlist = Int.MaxValue).collect().toSeq
      val registered = engine.query("q156_hybrid_rrf").collect().toSeq
      assert(viaEngine === registered)
      // the serving configuration (single-digit probe) still fuses a
      // per-query candidate list with ranks from both arms
      val served = engine.hybridTopK(q).collect()
      assert(served.nonEmpty)
      assert(served.forall(r => r.getAs[Int]("rn") >= 1))
    } finally engine.releaseCaches()
  }

  test("engine construction pins the session timezone to UTC") {
    // the events loader's TimestampNTZ branch casts through the
    // SESSION zone; an externally-built non-UTC session would read
    // TZ-shifted instants vs the DuckDB oracle. The facade is the one
    // entry point whose session the engine doesn't build itself, so
    // construction must repair the zone — and the repair must make
    // the epoch-compared events queries match their UTC values.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      val utcRows = engine.query("q17_recent_events").collect().toSeq
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e2 = new GraftEngine(spark, sfDir)
      assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
      assert(e2.query("q17_recent_events").collect().toSeq === utcRows)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
