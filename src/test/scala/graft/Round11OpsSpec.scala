package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-8 additions beyond their DuckDB oracle
  * twins: q146's triangle/clustering-coefficient table, q147's
  * two-arm recall@3 calibration, q148's Morton-layout audit, and
  * q149's simplified silhouette must each equal a from-scratch
  * in-memory recomputation of the same semantics, plus the
  * discriminative claims each query's doc makes (dup cliques exist,
  * z-order bounds BOTH spans where a 1-D sort does not, silhouette
  * partitions the corpus).
  */
class Round11OpsSpec extends SparkSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The exact verified near-dup pair set (q41 semantics): distinct
    * 3-gram shingles, pairwise Jaccard >= 0.5 on 6dp rounding.
    */
  private def exactPairs(): Seq[(Long, Long)] = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text").split(" ", -1)))
      .sortBy(_._1)
    val sh = docs.toSeq.map { case (id, tk) =>
      id -> tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    for {
      ((a, sa), i) <- sh.zipWithIndex
      (b, sb) <- sh.drop(i + 1)
      c = (sa & sb).size
      if c > 0 && r6(c.toDouble / (sa.size + sb.size - c)) >= 0.5
    } yield (a, b)
  }

  test("q146 equals an independent triangle/lcc recomputation") {
    val edges = exactPairs()
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      (a, b) <- edges
      c <- adj(a) & adj(b)
      if c > b // a < b < c: count each triangle once
    } {
      triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1
    }
    val expect = adj.map { case (v, nb) =>
      val d = nb.size.toLong
      val t = triPerNode(v)
      (v, (d, t, if (d >= 2) r6(2.0 * t / (d * (d - 1))) else 0.0))
    }

    val got = Registry.byName("q146_pair_triangles").fn(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("tri"), r.getAs[Double]("lcc"))).toMap
    assert(got === expect)
    // the fixture's dup groups must yield real cliques, and lcc is a ratio
    assert(got.values.exists { case (_, t, l) => t > 0 && l == 1.0 },
      "no dup clique found — fixture drift?")
    assert(got.values.forall { case (_, _, l) => l >= 0.0 && l <= 1.0 })
  }

  test("q147 equals an independent two-arm recall recomputation") {
    val emb = Tables.load(spark, sfDir, "embeddings").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Number]("label").longValue(),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
      .sortBy(_._1)
    val n = emb.length
    val byVec = emb.map(e => e._1 -> e._3).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      r6(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    // q51's adaptive sign bucket
    val bits = (8 until 24).find(b => n <= (32L << b)).getOrElse(24)
    val bucket = emb.map { case (id, _, v) =>
      id -> (0 until bits).map(j => if (v(j) > 0) 1 << j else 0).sum
    }.toMap
    // q52's label-centroid cell assignment (6dp centroids and distances)
    val cent = emb.groupBy(_._2).view.mapValues { vs =>
      Array.tabulate(vs.head._3.length)(i => r6(vs.map(_._3(i)).sum / vs.length))
    }.toMap
    val cell = emb.map { case (id, _, v) =>
      id -> cent.toSeq.map { case (lbl, c) =>
        (r6(v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum), lbl)
      }.min._2
    }.toMap
    def top3(qid: Long, cand: Seq[Long]): Set[Long] =
      cand.filter(_ != qid)
        .map(id => (id, cos(byVec(qid), byVec(id))))
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    val ids = emb.map(_._1)
    val expect = (for {
      qid <- ids.filter(_ < 10)
      (m, cand) <- Seq(
        "lsh_bucket" -> ids.filter(i => bucket(i) == bucket(qid)),
        "ivf_cell" -> ids.filter(i => cell(i) == cell(qid)))
    } yield {
      val hits = (top3(qid, ids.toSeq) & top3(qid, cand.toSeq)).size.toLong
      (m, qid) -> (hits, r6(hits / 3.0))
    }).toMap

    val got = Registry.byName("q147_ann_recall").fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("method"), r.getAs[Long]("q_id")) ->
        (r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))).toMap
    assert(got === expect)
    assert(got.keys.map(_._1).toSet === Set("lsh_bucket", "ivf_cell"))
    assert(got.count(_._1._1 == "lsh_bucket") === 10)
    // the calibration claim: single-probe recall on the isotropic
    // fixture is far below q133's multi-probe 0.9 floor
    val mean = got.values.map(_._2).sum / got.size
    assert(mean < 0.9, s"single-probe recall $mean — fixture no longer isotropic?")
  }

  test("q148 equals an independent Morton-layout recomputation") {
    val rows = Tables.load(spark, sfDir, "orders")
      .select(col("o_totalprice"), col("o_orderdate").cast("date").as("d"))
      .collect()
      .map(r => (math.round(r.getAs[Double]("o_totalprice") * 100),
        r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay))
    val (pmin, pmax) = (rows.map(_._1).min, rows.map(_._1).max)
    val (dmin, dmax) = (rows.map(_._2).min, rows.map(_._2).max)
    val quant = rows.map { case (pc, dd) =>
      ((pc - pmin) * 65535L / (pmax - pmin), (dd - dmin) * 65535L / (dmax - dmin))
    }
    def morton(pq: Long, dq: Long): Long =
      (0 until 16).map(j =>
        (((pq >> j) & 1L) << (2 * j)) | (((dq >> j) & 1L) << (2 * j + 1))).sum
    val all = quant.map { case (pq, dq) => (morton(pq, dq), pq, dq) }
    val expect = (
      all.groupBy { case (z, _, _) => ("zorder", z >> 28) } ++
        all.groupBy { case (_, _, dq) => ("datesort", dq >> 12) }
      ).map { case (k, vs) =>
      k -> (vs.length.toLong,
        vs.map(_._2).max - vs.map(_._2).min,
        vs.map(_._3).max - vs.map(_._3).min)
    }

    val got = Registry.byName("q148_zorder_layout").fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[Long]("bucket")) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("price_span"),
          r.getAs[Long]("date_span"))).toMap
    assert(got === expect)
    // the layout claim: 4 Morton bits bound BOTH spans near a quarter
    // of the range, while the 1-D date sort leaves price unconstrained
    val zo = got.filter(_._1._1 == "zorder").values
    val ds = got.filter(_._1._1 == "datesort").values
    assert(zo.forall { case (_, ps, dds) => ps < 20000 && dds < 20000 })
    assert(ds.forall { case (_, ps, _) => ps > 55000 })
  }

  test("q149 equals an independent silhouette recomputation") {
    val emb = Tables.load(spark, sfDir, "embeddings").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Number]("label").longValue(),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
      .sortBy(_._1)
    val cent = emb.groupBy(_._2).view.mapValues { vs =>
      Array.tabulate(vs.head._3.length)(i => r6(vs.map(_._3(i)).sum / vs.length))
    }.toMap
    val perVec = emb.map { case (id, _, v) =>
      val ds = cent.toSeq.map { case (lbl, c) =>
        (r6(v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum), lbl)
      }.sorted.map { case (d2, lbl) => (math.sqrt(d2), lbl) }
      val (a, assigned) = ds.head
      val b = ds.tail.map(_._1).min
      val s = if (math.max(a, b) == 0) 0.0 else r6((b - a) / math.max(a, b))
      (assigned, s)
    }
    val expect = perVec.groupBy(_._1).map { case (c, vs) =>
      val ss = vs.map(_._2)
      c -> (ss.length.toLong, r6(ss.sum / ss.length), ss.min, ss.max)
    }

    val got = Registry.byName("q149_cell_silhouette").fn(spark, sfDir).collect()
      .map(r => r.getAs[Number]("cell").longValue() ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("avg_sil"),
          r.getAs[Double]("min_sil"), r.getAs[Double]("max_sil"))).toMap
    assert(got === expect)
    assert(got.values.map(_._1).sum === emb.length.toLong)
    assert(got.values.forall { case (_, avg, mn, mx) =>
      mn >= -1.0 && mx <= 1.0 && avg >= mn && avg <= mx })
  }

  test("q150 equals an independent variance-spectrum recomputation") {
    val vecs = Tables.load(spark, sfDir, "embeddings").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val nd = vecs.head.length
    val spectrum = (0 until nd).map { i =>
      val xs = vecs.map(_(i))
      val mu = r6(xs.sum / xs.length)
      val m2 = r6(xs.map(x => x * x).sum / xs.length)
      (i, mu, r6(m2 - mu * mu))
    }
    val total = spectrum.map(_._3).sum
    val ranked = spectrum.sortBy { case (i, _, v) => (-v, i) }
    val cums = ranked.scanLeft(0.0)(_ + _._3).tail
    val expect = ranked.zipWithIndex.map { case ((i, mu, v), k) =>
      (k + 1) -> (i, mu, v, r6(cums(k) / total))
    }.toMap

    val got = Registry.byName("q150_dim_variance").fn(spark, sfDir).collect()
      .map(r => r.getAs[Int]("vrank") ->
        ((r.getAs[Int]("dim"), r.getAs[Double]("mu"),
          r.getAs[Double]("variance"), r.getAs[Double]("cum_share")))).toMap
    assert(got === expect)
    assert(got.size === nd)
    // cumulative share is monotone and ends at 1
    assert(got(nd)._4 === 1.0)
    assert((1 until nd).forall(k => got(k)._4 <= got(k + 1)._4))
  }

  test("q151 equals an independent profile and scans ONE column per branch") {
    val docs = Tables.load(spark, sfDir, "documents").collect()
    val byCol: Map[String, Seq[Any]] =
      Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
        c -> docs.toSeq.map(_.getAs[Any](c))
      }.toMap
    val expect = byCol.map { case (c, vs) =>
      val typed = vs.filter(_ != null)
      // min/max are TYPED (numeric for longs) before the string cast —
      // lexicographic "99" > "499" must not leak into the expectation
      val (mn, mx) = typed.head match {
        case _: Long =>
          val l = typed.map(_.asInstanceOf[Long]); (l.min.toString, l.max.toString)
        case _ =>
          val t = typed.map(_.toString); (t.min, t.max)
      }
      val present = typed.map(String.valueOf(_))
      c -> (vs.length.toLong, vs.count(_ == null).toLong,
        present.distinct.length.toLong, mn, mx,
        BigDecimal(present.map(_.length.toDouble).sum / present.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }

    val df = Registry.byName("q151_data_profile").fn(spark, sfDir)
    val got = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getDouble(6))).toMap
    assert(got === expect)
    // the scale claim: each union branch's parquet scan must prune to
    // exactly its own column, never the full row
    staticPlan {
      val txt = Registry.byName("q151_data_profile").fn(spark, sfDir)
        .queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      val reads = txt.linesIterator
        .filter(_.trim.startsWith("ReadSchema:")).toSeq
      assert(reads.nonEmpty)
      // one field per scan = no comma inside the struct<...>
      assert(reads.forall(l => !l.substring(l.indexOf("struct<")).contains(",")),
        s"a profile branch reads more than its column:\n${reads.mkString("\n")}")
    }
  }
}
