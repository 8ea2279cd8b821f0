package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-7 additions beyond their DuckDB oracle
  * twins: q140's per-cell semantic-dedup yield and q141's BM25 ranking
  * must each equal a from-scratch in-memory recomputation of the same
  * semantics (centroid routing + sign-bucket blocking + keep-earliest;
  * tf/df/idf/length-norm scoring), and q139 must keep reproducing the
  * q50 exact baseline through the session-memoized index.
  */
class Round10OpsSpec extends SparkSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q140 yield equals an independent semantic-dedup recomputation") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getAs[Number]("vec_id").longValue(),
        r.getAs[Number]("label").longValue(),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
      .sortBy(_._1)
    val n = emb.length
    // per-label centroids, components rounded to 6dp (the q52 rule)
    val cent = emb.groupBy(_._2).view.mapValues { vs =>
      val dim = vs.head._3.length
      Array.tabulate(dim)(i => r6(vs.map(_._3(i)).sum / vs.length))
    }.toMap
    // nearest-centroid assignment on 6dp-rounded squared L2, label tiebreak
    val assign = emb.map { case (id, _, v) =>
      val best = cent.toSeq.map { case (lbl, c) =>
        (r6(v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum), lbl)
      }.min
      id -> best._2
    }.toMap
    // adaptive sign bucket: smallest bits in [8,24] with n <= 32 * 2^bits
    val bits = (8 until 24).find(b => n <= (32L << b)).getOrElse(24)
    val bucket = emb.map { case (id, _, v) =>
      id -> (0 until bits).map(j => if (v(j) > 0) 1 << j else 0).sum
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      r6(dot / (math.sqrt(a.indices.map(i => a(i) * a(i)).sum) *
        math.sqrt(b.indices.map(i => b(i) * b(i)).sum)))
    }
    val byVec = emb.map(e => e._1 -> e._3).toMap
    val removed = (for {
      (a, ia) <- emb.map(_._1).zipWithIndex
      b <- emb.map(_._1).drop(ia + 1)
      if assign(a) == assign(b) && bucket(a) == bucket(b)
      if cos(byVec(a), byVec(b)) >= 0.3
    } yield b).toSet
    val expect = emb.groupBy(e => assign(e._1)).view.mapValues { vs =>
      val rem = vs.count(e => removed(e._1))
      (vs.length.toLong, rem.toLong, (vs.length - rem).toLong)
    }.toMap

    val got = Registry.byName("q140_semdedup").fn(spark, sfDir).collect()
      .map(r => r.getAs[Number]("cell").longValue() ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("n_kept"))).toMap
    assert(got === expect)
    assert(got.values.map(_._1).sum === n.toLong)
    // the blocking must actually bite on this fixture
    assert(got.values.map(_._2).sum > 0, "no semantic dups found — fixture drift?")
  }

  test("q141 ranking equals an independent BM25 recomputation") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text").split(" ", -1).toSeq))
    val nDocs = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum / nDocs
    val tf = docs.flatMap { case (id, tk) =>
      tk.groupBy(identity).map { case (t, xs) => (id, t, xs.length.toDouble) }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val qterms = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(3).toMap
    val scores = tf.filter(x => qterms.contains(x._2))
      .groupBy(_._1).view.mapValues { xs =>
        r6(xs.toSeq.sortBy(_._2).map { case (id, t, f) =>
          val d = qterms(t)
          val dl = docs.find(_._1 == id).get._2.length.toDouble
          val idf = r6(math.log(1.0 + (nDocs - d + 0.5) / (d + 0.5)))
          val tfn = r6(f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl / avgdl)))
          idf * tfn
        }.sum)
      }.toMap
    val expect = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }

    val got = Registry.byName("q141_bm25_topk").fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"),
        r.getAs[Int]("rn"))).toSeq
    assert(got === expect)
    // scores non-increasing in rank
    got.map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b); case _ => ()
    }
  }

  test("q142 equals an independent PageRank recomputation over q41's pairs") {
    val pairs = Registry.byName("q41_jaccard_pairs").fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")))
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    var rank = deg.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to 8) {
      val contrib = edges.groupBy(_._2).view.mapValues { es =>
        es.sortBy(_._1).map { case (u, _) => rank(u) / deg(u) }.sum
      }.toMap
      rank = deg.keys.map(v =>
        v -> BigDecimal(0.15 + 0.85 * contrib(v))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    }
    val expect = rank.map { case (v, r) =>
      v -> (deg(v).toLong, r6(r))
    }
    val got = Registry.byName("q142_pair_pagerank").fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("deg"), r.getAs[Double]("pr"))).toMap
    assert(got === expect)
    // every rank is at least the damping floor; hubs beat leaves
    assert(got.values.forall(_._2 >= 0.15))
    graft.queries.TextOps.releaseCaches()
  }

  test("q143 equals a direct java.util.zip recomputation") {
    import java.util.zip.Deflater
    def deflateSize(text: String): Int = {
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
      try {
        d.setInput(text.getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](8192)
        var total = 0
        while (!d.finished()) total += d.deflate(buf)
        total
      } finally d.end()
    }
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    val expect = docs.groupBy(_._1).view.mapValues { ds =>
      val ratios = ds.map { case (_, t) =>
        r6(deflateSize(t).toDouble / t.getBytes("UTF-8").length)
      }
      (ds.length.toLong, r6(ratios.sum / ratios.length), ratios.min,
        ratios.max, ratios.count(_ < 0.35).toLong)
    }.toMap
    val got = Registry.byName("q143_compression_quality").fn(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("avg_ratio"),
          r.getAs[Double]("min_ratio"), r.getAs[Double]("max_ratio"),
          r.getAs[Long]("n_repetitive"))).toMap
    // n_docs, min, max, n_repetitive are exact; avg is rounded from a
    // distributed sum, so compare it at the shared 6dp granularity
    assert(got.keySet === expect.keySet)
    got.foreach { case (src, (n, avg, mn, mx, rep)) =>
      val (en, eavg, emn, emx, erep) = expect(src)
      assert((n, mn, mx, rep) === ((en, emn, emx, erep)), src)
      assert(math.abs(avg - eavg) < 2e-6, s"$src avg $avg vs $eavg")
    }
    // the expression itself must be exactly the zip library's answer
    val one = spark.sql(
      "SELECT deflate_size('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS s")
      .head().getInt(0)
    assert(one === deflateSize("a" * 30))
  }

  test("round-7 oracle queries are shuffle-partitioning invariant") {
    // the determinism discipline (6dp rounding before ranking, unique-id
    // tiebreaks, per-iteration 9dp pinning) must make results identical
    // under a different exchange width — the local stand-in for "same
    // answer on a 1000-executor cluster"
    val names = Seq("q140_semdedup", "q141_bm25_topk", "q142_pair_pagerank")
    def runAll() =
      names.map(n => n -> Registry.byName(n).fn(spark, sfDir).collect().toSeq).toMap
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val base = runAll()
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      // pinned kernels/indexes were materialized at the old width —
      // drop them so the rerun rebuilds everything at the new width
      graft.queries.TextOps.releaseCaches()
      graft.queries.VectorOps.releaseCaches()
      val re = runAll()
      names.foreach(n => assert(re(n) === base(n), s"$n drifted"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.queries.TextOps.releaseCaches()
      graft.queries.VectorOps.releaseCaches()
    }
  }

  test("q139 through the memoized index still equals the q50 exact baseline") {
    val exact = Registry.byName("q50_cosine_topk").fn(spark, sfDir).collect().toSeq
    val viaIndex = Registry.byName("q139_ivfpq_exact").fn(spark, sfDir).collect().toSeq
    assert(viaIndex === exact)
    // a second invocation serves from the memo and must be identical
    val again = Registry.byName("q139_ivfpq_exact").fn(spark, sfDir).collect().toSeq
    assert(again === exact)
    graft.queries.VectorOps.releaseCaches()
  }
}
