package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-6 trainer/dedup additions beyond their
  * DuckDB oracle twins: the BPE merge list must behave like BPE
  * (monotone counts, merges composed from live symbols), and q135's
  * reported spans must be EXACTLY the longest shared token runs an
  * independent in-memory recomputation finds.
  */
class Round9OpsSpec extends SparkSpec {

  test("q134 learns 10 merges with non-increasing counts") {
    val rows = Registry.byName("q134_bpe_train").fn(spark, sfDir).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Int]("merge_round")).toSeq === (1 to 10))
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ===
        r.getAs[String]("lhs") + r.getAs[String]("rhs"))
      assert(r.getAs[Long]("n") > 0)
    }
    // any pair created by a merge has count <= the count of a pair it
    // replaced, so the winning count can never rise between rounds
    val ns = rows.sortBy(_.getAs[Int]("merge_round")).map(_.getAs[Long]("n"))
    ns.sliding(2).foreach { case Array(a, b) => assert(a >= b, s"$a -> $b") }
    // later merges may stack on earlier ones: each lhs/rhs must be a
    // single char or a previously produced merged symbol
    val known = scala.collection.mutable.Set.empty[String]
    rows.sortBy(_.getAs[Int]("merge_round")).foreach { r =>
      Seq(r.getAs[String]("lhs"), r.getAs[String]("rhs")).foreach { sym =>
        assert(sym.length === 1 || known.contains(sym),
          s"symbol '$sym' is neither a char nor a prior merge")
      }
      known += r.getAs[String]("merged")
    }
  }

  test("q136 encodes every word into at least 1 and at most |word| symbols") {
    val rows = Registry.byName("q136_bpe_encode").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalWords = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1).count()
    assert(rows.map(_.getAs[Long]("n_words")).sum === totalWords)
    rows.foreach { r =>
      val (w, c, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_bpe_tokens"))
      // each BPE symbol spans >= 1 char and each word is >= 1 symbol
      assert(t >= w && t <= c, s"tokens $t outside [$w, $c]")
      // 10 merges on this fixture must actually compress: strictly
      // fewer symbols than characters
      assert(t < c)
    }
  }

  test("q135 spans equal an independent longest-common-run recomputation") {
    val got = Registry.byName("q135_exact_substring").fn(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        (r.getAs[Long]("max_shared_tokens"), r.getAs[Long]("n_spans"))).toMap
    assert(got.nonEmpty, "fixture should contain long shared spans")
    val texts = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))
      .toMap
    // independent oracle: same anchor/cap/floor semantics, computed
    // with plain Scala collections instead of joins and windows
    val anchors = scala.collection.mutable.Map.empty[Seq[String], List[(Long, Int)]]
    texts.foreach { case (id, tk) =>
      tk.sliding(8).zipWithIndex.foreach { case (a, i) =>
        if (a.length == 8) anchors.updateWith(a.toSeq)(o => Some((id, i) :: o.getOrElse(Nil)))
      }
    }
    val kept = anchors.filter(_._2.size <= 50)
    val runs = scala.collection.mutable.Map.empty[(Long, Long, Int), List[Int]]
    kept.values.foreach { posts =>
      for ((da, pa) <- posts; (db, pb) <- posts if da < db)
        runs.updateWith((da, db, pa - pb))(o => Some(pa :: o.getOrElse(Nil)))
    }
    val want = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    runs.foreach { case ((da, db, _), pas) =>
      var run = 1
      val sorted = pas.sorted
      (sorted.tail.zip(sorted.init) :+ (Int.MinValue, 0)).foreach { case (cur, prev) =>
        if (cur == prev + 1) run += 1
        else {
          val span = run + 7
          if (span >= 16) want.updateWith((da, db)) {
            case Some((mx, n)) => Some((math.max(mx, span.toLong), n + 1))
            case None => Some((span.toLong, 1L))
          }
          run = 1
        }
      }
    }
    assert(got === want.toMap)
  }

  test("q137 removal accounting matches an independent position-union recomputation") {
    val got = Registry.byName("q137_substring_yield").fn(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_docs_affected"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("n_tokens_removed"))).toMap
    val docRows = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").split(" ", -1)))
    val anchors = scala.collection.mutable.Map.empty[Seq[String], List[(Long, Int)]]
    docRows.foreach { case (id, _, tk) =>
      tk.sliding(8).zipWithIndex.foreach { case (a, i) =>
        if (a.length == 8) anchors.updateWith(a.toSeq)(o => Some((id, i) :: o.getOrElse(Nil)))
      }
    }
    val runs = scala.collection.mutable.Map.empty[(Long, Long, Int), List[Int]]
    anchors.filter(_._2.size <= 50).values.foreach { posts =>
      for ((da, pa) <- posts; (db, pb) <- posts if da < db)
        runs.updateWith((da, db, pa - pb))(o => Some(pa :: o.getOrElse(Nil)))
    }
    // keep-earliest: the LATER doc of each pair loses every position a
    // qualifying run covers; runs from different partners union
    val covered = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Int]]
    runs.foreach { case ((_, db, diag), pas) =>
      val sorted = pas.sorted
      var runStart = sorted.head
      var prev = sorted.head
      def flush(last: Int): Unit = {
        val span = last - runStart + 8
        if (span >= 16) {
          val pb0 = runStart - diag
          covered.getOrElseUpdate(db, scala.collection.mutable.Set.empty) ++=
            (pb0 until pb0 + span)
        }
      }
      sorted.tail.foreach { cur =>
        if (cur != prev + 1) { flush(prev); runStart = cur }
        prev = cur
      }
      flush(prev)
    }
    val want = docRows.groupBy(_._2).map { case (src, rows) =>
      src -> (rows.length.toLong,
        rows.count(r => covered.contains(r._1)).toLong,
        rows.map(_._3.length.toLong).sum,
        rows.map(r => covered.get(r._1).map(_.size.toLong).getOrElse(0L)).sum)
    }
    assert(got === want)
    assert(got.values.map(_._4).sum > 0, "fixture should remove some tokens")
  }

  test("q39 winnowing pairs match an in-memory reference implementation") {
    val got = Registry.byName("q39_winnow_fingerprints").fn(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        r.getAs[Long]("n_shared_fp")).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val k = 4; val w = 4
    val fps = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").split(" ", -1)))
      .filter(_._2.length >= k + w - 1)
      .map { case (id, tk) =>
        val hs = tk.sliding(k).map(a => md5hex(a.mkString(" "))).toArray
        // window min, ties to the RIGHTMOST minimal hash
        val sel = (0 to hs.length - w).map { i =>
          val win = hs.slice(i, i + w)
          val mn = win.min
          i + win.lastIndexOf(mn)
        }.toSet
        id -> sel.map(hs).toSet
      }.toMap
    val df = fps.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).filter(_._2.size <= 50).keySet
    val capped = fps.view.mapValues(_.filter(df)).toMap
    val want = (for {
      (da, fa) <- capped.toSeq; (db, fb) <- capped.toSeq if da < db
      shared = (fa & fb).size if shared >= 2
    } yield (da, db) -> shared.toLong).toMap
    assert(got === want)
    assert(want.nonEmpty, "fixture should contain winnowing overlaps")
  }

  test("q77 packing accounting matches a direct cumulative recomputation") {
    val got = Registry.byName("q77_seq_packing").fn(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_chunks"), r.getAs[Long]("n_boundary_docs"),
          r.getAs[Double]("tail_fill"))).toMap
    val L = 512L
    val want = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").split(" ", -1).length.toLong))
      .groupBy(_._2).map { case (src, rows) =>
        val lens = rows.sortBy(_._1).map(_._3)
        val ends = lens.scanLeft(0L)(_ + _).tail
        val boundary = ends.zip(lens).count { case (en, n) =>
          (en - n) / L != (en - 1) / L }
        val tot = lens.sum
        val chunks = (tot + L - 1) / L
        val tail = BigDecimal((tot - (chunks - 1) * L).toDouble / L)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        src -> (lens.length.toLong, tot, chunks, boundary.toLong, tail)
      }
    assert(got === want)
    assert(want.values.exists(_._4 > 0), "fixture should split some docs")
  }
}
