package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ext.SnapshotLog

/** Round-12 pins: the CDC feed's `_commit_version` ordering contract,
  * delete's determinism gate + SQL null semantics, merge's
  * materialize-src-once guarantee under a non-deterministic source,
  * and KeyedMemo.drain's no-leak release under racing builds.
  */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  private def freshLog(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    SnapshotLog.reset(dir)
    dir
  }

  test("readCdc tags _commit_version; keyed last-wins replay rebuilds the snapshot") {
    val dir = freshLog("cdc-ver")
    // v0: base; v1 and v2: two merges touching the SAME key (id=2) so
    // the window holds multiple delete/insert rows for one key — the
    // exact case that is unorderable without a version column.
    SnapshotLog.append(
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "t"), dir, col("t"))
    SnapshotLog.merge(spark,
      Seq((2L, 21L), (4L, 40L)).toDF("id", "t"), dir, "id", col("t"))
    SnapshotLog.merge(spark,
      Seq((2L, 22L), (3L, 31L)).toDF("id", "t"), dir, "id", col("t"))

    val cdc = SnapshotLog.readCdc(spark, dir, 0, 2)
    assert(cdc.columns.contains("_commit_version"))
    // each row carries the version whose commit produced it
    val byVer = cdc.groupBy("_commit_version", "_change_type").count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byVer((1, "insert")) === 2) // v1 src rows
    assert(byVer((1, "delete")) === 1) // old id=2
    assert(byVer((2, "insert")) === 2) // v2 src rows
    assert(byVer((2, "delete")) === 2) // v1's id=2 + old id=3

    // the contract the column exists for: apply changes per key in
    // _commit_version order (delete-before-insert within a version),
    // last wins — the replayed state must equal readAsOf(toV)
    val lastIns = cdc
      .withColumn("_rk", row_number().over(Window.partitionBy("id")
        .orderBy(col("_commit_version").desc,
          // insert outranks delete at the same version (update = del+ins)
          when(col("_change_type") === "insert", 1).otherwise(0).desc)))
      .filter(col("_rk") === 1 && col("_change_type") === "insert")
      .select("id", "t")
    val replayed = SnapshotLog.readAsOf(spark, dir, 0)
      .join(cdc.select("id").distinct(), Seq("id"), "left_anti")
      .select("id", "t").unionByName(lastIns)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val snap = SnapshotLog.readAsOf(spark, dir, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replayed === snap)
    assert(snap === Set((1L, 10L), (2L, 22L), (3L, 31L), (4L, 40L)))

    // from-empty feed is one synthetic snapshot commit tagged toV
    val fromEmpty = SnapshotLog.readCdc(spark, dir, -1, 2)
    assert(fromEmpty.select("_commit_version").distinct()
      .collect().map(_.getInt(0)).toSeq === Seq(2))
  }

  test("delete refuses a non-deterministic predicate up front (no orphan commit)") {
    val dir = freshLog("del-nondet")
    SnapshotLog.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "t"), dir, col("t"))
    val ex = intercept[IllegalArgumentException] {
      SnapshotLog.delete(spark, dir, rand() < 0.5, col("t"))
    }
    assert(ex.getMessage.contains("deterministic"))
    assert(SnapshotLog.version(dir) === 0) // nothing committed
    assert(SnapshotLog.readAsOf(spark, dir, 0).count() === 2)
  }

  test("delete keeps null-predicate rows: SQL DELETE drops only proven hits") {
    val dir = freshLog("del-null")
    // s is null for id=3 → predicate (s < 15) is null there: SQL DELETE
    // removes only rows where the predicate is TRUE, so id=3 survives
    SnapshotLog.append(
      Seq((1L, 10L, Some(10L)), (2L, 20L, Some(20L)), (3L, 30L, None))
        .toDF("id", "t", "s"),
      dir, col("t"))
    val v = SnapshotLog.delete(spark, dir, col("s") < 15, col("t"))
    val left = SnapshotLog.readAsOf(spark, dir, v)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(left === Set(2L, 3L))
    // and the CDC delete side carries exactly the proven hit
    val dels = SnapshotLog.readCdc(spark, dir, 0, v)
      .filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(dels === Set(1L))
  }

  test("merge materializes src once: a non-deterministic source cannot lose keys") {
    // Without materialization, the src plan re-evaluates per phase
    // (keys, cdc-del, rewrite anti-join, final segment) and a rand()
    // source can delete a key whose replacement never lands. With the
    // src segment written first and all phases reading it back, the
    // commit is internally consistent for ANY sampled subset.
    (0 until 5).foreach { trial =>
      val dir = freshLog(s"merge-nondet-$trial")
      val base = (1L to 50L).map(i => (i, i * 10L)).toDF("id", "t")
      SnapshotLog.append(base, dir, col("t"))
      val src = (1L to 50L).map(i => (i, i * 10L + 1L)).toDF("id", "t")
        .filter(rand() < 0.5) // non-deterministic subset
      val v = SnapshotLog.merge(spark, src, dir, "id", col("t"))
      val snap = SnapshotLog.readAsOf(spark, dir, v)
      val keys = snap.select("id").collect().map(_.getLong(0)).toSeq
      // no key lost, none duplicated, and every row is either the old
      // image or the updated one — never a half-applied mix
      assert(keys.sorted === (1L to 50L))
      val bad = snap.filter(col("t") =!= col("id") * 10L &&
        col("t") =!= col("id") * 10L + 1L).count()
      assert(bad === 0)
    }
  }

  test("q195 cross-set runs: verbatim embedding caught exactly, position-exact") {
    import graft.queries.TextOps
    val evalToks = (1 to 20).map(i => s"e$i")
    val prefix = (1 to 10).map(i => s"p$i")
    val suffix = (1 to 10).map(i => s"s$i")
    val docs = Seq(
      (100L, evalToks.mkString(" ")),                             // eval doc
      (200L, (prefix ++ evalToks ++ suffix).mkString(" ")),       // contaminated
      (300L, (1 to 30).map(i => s"c$i").mkString(" "))            // clean
    ).toDF("doc_id", "text")
    val runs = TextOps.crossRuns(docs, col("doc_id") === 100L)
      .select(col("dt"), col("de"), col("pt0").cast("long"),
        col("span").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    // one maximal span: the 20 embedded tokens, starting at train
    // position 11 (1-based, after the 10-token prefix)
    assert(runs.toSeq === Seq((200L, 100L, 11L, 20L)))
  }

  test("q195 granularity floor: sub-8-token scatter shares no anchor (documented miss)") {
    import graft.queries.TextOps
    val evalToks = (1 to 24).map(i => s"e$i")
    // train doc holds ALL eval tokens, but in 4-token chunks each
    // broken by noise — no 8 consecutive shared tokens, no anchor
    val scattered = evalToks.grouped(4).zipWithIndex
      .flatMap { case (chunk, i) => chunk :+ s"noise$i" }.toSeq
    val docs = Seq(
      (100L, evalToks.mkString(" ")),
      (200L, scattered.mkString(" "))
    ).toDF("doc_id", "text")
    assert(TextOps.crossRuns(docs, col("doc_id") === 100L).count() === 0)
  }

  test("q195 agrees with q135's self-join runs on cross-set pairs (span-union accounting)") {
    import graft.queries.TextOps
    // fixture corpus, q86's split: every (eval, train) span q135's
    // self-join finds must surface identically in the cross-set kernel
    // WHERE the df-cap regimes agree — substringRuns caps df over ALL
    // anchors, crossRuns over TRAIN anchors only, so restrict the
    // comparison to runs whose anchors are cap-safe on both sides by
    // using a corpus slice small enough that no anchor nears df 50.
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 300)
    val ev = col("doc_id") % 20 === 0
    val cross = TextOps.crossRuns(docs, ev)
      .select(col("de"), col("dt"), col("pt0").cast("long"),
        col("span").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    // self-join runs keyed (da < db); map each cross-set pair into the
    // train-position frame: db is the later doc, pb0 its position —
    // when the TRAIN doc is db, pt0 = pb0; when the EVAL doc is db,
    // the train position is pb0 + diag (pa = pb + diag)
    val self = TextOps.substringRunsRaw(docs)
      .withColumn("aEval", col("da") % 20 === 0)
      .withColumn("bEval", col("db") % 20 === 0)
      .filter(col("aEval") =!= col("bEval")) // cross-set pairs only
      .select(
        when(col("aEval"), col("da")).otherwise(col("db")).as("de"),
        when(col("aEval"), col("db")).otherwise(col("da")).as("dt"),
        when(col("aEval"), col("pb0"))
          .otherwise(col("pb0") + col("diag")).cast("long").as("pt0"),
        col("span").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(cross === self)
    assert(cross.nonEmpty, "fixture slice must contain cross-set spans")
  }

  test("q196 composition: funnel over extracted text equals q107's funnel over originals") {
    // the extractor round-trips the wrap exactly, so the q107 verdict
    // rollup computed THROUGH the wrap->extract path must be
    // identical to the one computed on the raw corpus — the
    // composition contract that lets a crawl pipeline put extraction
    // in front of the funnel without re-calibrating thresholds
    val funnel = Registry.byName("q107_filter_funnel")
      .fn(spark, sfDir)
      .select(col("verdict"), col("n_docs"), col("avg_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    val viaHtml = Registry.byName("q196_html_extract")
      .fn(spark, sfDir)
      .select(col("verdict"), col("n_docs"), col("avg_tokens"),
        col("n_roundtrip"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(viaHtml.map(v => (v._1, v._2, v._3)) === funnel)
    // every doc round-trips byte-for-byte (single-spaced fixture)
    assert(viaHtml.map(_._4).sum === viaHtml.map(_._2).sum)
  }

  test("q197 re-derivation: the multiplicative-weights update follows from its own outputs") {
    val rows = Registry.byName("q197_doremi_weights").fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length > 1)
    // exact integer re-derivation: w_raw = tokens * (1e6 + excess),
    // weight = round(w_raw / Z, 6) — BigInt, no doubles until the end
    val wRaw = rows.map(r => BigInt(r._2) * (BigInt(1000000) + BigInt(r._4)))
    val z = wRaw.sum
    val zTok = rows.map(r => BigInt(r._2)).sum
    rows.zip(wRaw).foreach { case ((src, tok, _, _, wb, wd), w) =>
      val expectedD = BigDecimal(w) / BigDecimal(z)
      assert(math.abs(wd - expectedD.toDouble) < 5e-7, s"doremi weight of $src")
      val expectedB = BigDecimal(tok) / BigDecimal(zTok)
      assert(math.abs(wb - expectedB.toDouble) < 5e-7, s"base weight of $src")
    }
    // weights normalize, excess floors at zero, and the update moves
    // mass TOWARD high-excess sources and away from zero-excess ones
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-4)
    assert(rows.forall(_._4 >= 0L))
    if (rows.exists(_._4 > 0L))
      rows.filter(_._4 == 0L).foreach { r =>
        assert(r._6 <= r._5 + 5e-7, s"zero-excess ${r._1} must not gain mass")
      }
  }

  test("q198 unigram-LM: hard-EM loss is monotone; Viterbi pieces round-trip; reruns agree") {
    import graft.queries.TextOps
    val (pieces, losses, seg) = TextOps.unigramLoop(spark, sfDir, rounds = 3)
    // round-trip: the backwalk emits pieces end-to-front, so the
    // reversed concat must rebuild every word byte-for-byte, and no
    // piece may fall outside the trained inventory
    val broken = seg
      .filter(concat_ws("", reverse(col("ps"))) =!= col("w")).count()
    assert(broken === 0L, "every Viterbi segmentation must rebuild its word")
    val inventory = pieces.map(_._1).toSet
    val offVocab = seg.select(explode(col("ps")).as("p")).distinct()
      .collect().map(_.getString(0)).filterNot(inventory)
    assert(offVocab.isEmpty, s"pieces outside inventory: ${offVocab.take(5).toSeq}")
    // hard-EM monotonicity: each round's Viterbi total under the
    // re-estimated costs can only improve or hold — up to the
    // micro-nat quantization of per-piece ln costs (slack 0.1%)
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + (a / 1000L),
        s"EM loss must not increase: $losses")
    }
    assert(losses.forall(_ > 0L))
    // char fallback totality: every single char survives pruning, so
    // any word stays segmentable
    val charPieces = pieces.filter(_._1.length == 1).map(_._1).toSet
    val corpusChars = Tables.load(spark, sfDir, "documents")
      .select(explode(split(regexp_replace(col("text"), " ", ""), ""))
        .as("c"))
      .filter(length(col("c")) === 1)
      .distinct().collect().map(_.getString(0))
      .filter(_.nonEmpty).toSet
    assert(corpusChars.subsetOf(charPieces))
    // pruning is real: the trained inventory is smaller than the seed
    assert(pieces.length < 512 + charPieces.size + 64)
    assert(pieces.exists(_._1.length > 1), "multi-char pieces must survive")
    // usage is frequency-weighted and positive; costs sort sanely
    // (more-used pieces never cost more than less-used ones)
    assert(pieces.forall(_._2 > 0L))
    val byUse = pieces.sortBy(-_._2)
    byUse.sliding(2).foreach { case Seq(hi, lo) =>
      assert(hi._3 <= lo._3,
        s"cost must be non-increasing in usage: $hi vs $lo")
    }
    // rerun determinism (the oracle-free query's stability contract)
    val (pieces2, losses2, _) = TextOps.unigramLoop(spark, sfDir, rounds = 3)
    assert(pieces2 === pieces && losses2 === losses)
  }

  test("q179 adversarial recall: 3-gram confetti evades winnowing, prefix route catches it") {
    import graft.queries.TextOps
    // A's every 3-token shingle appears in B, but each is isolated by
    // unique noise — containment C(A,B) = 1.0 with NO shared 4-token
    // run, so winnowing (which guarantees a fingerprint only for
    // 7+-token shared runs) is structurally blind to the pair
    val a = (1 to 30).map(i => s"w$i")
    val confetti = a.sliding(3).zipWithIndex
      .flatMap { case (g, i) => g ++ Seq(s"z$i") }.toSeq
    val docs = Seq(
      (1L, a.mkString(" ")),
      (2L, confetti.mkString(" ")),
      // background docs so df stats and the prefix rank are exercised
      (3L, (1 to 40).map(i => s"b$i").mkString(" ")),
      (4L, (1 to 40).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    try {
      // measured winnow-only recall on the adversary: zero
      val winnowOnly = TextOps.containmentCandidates(docs)
        .filter(col("dx") === 1L && col("dy") === 2L).count()
      assert(winnowOnly === 0L,
        "winnowing should miss the scattered-overlap pair (the documented gap)")
      // the composed screen prices it exactly: C = 1.0
      val got = TextOps.screenedContainmentPairs(docs)
        .filter(col("da") === 1L && col("db") === 2L)
        .select(col("containment")).collect().map(_.getDouble(0))
      assert(got.toSeq === Seq(1.0),
        "the prefix route must nominate the confetti pair for exact pricing")
    } finally TextOps.releaseCaches()
  }

  test("round-12 facades: decontaminateSpans, extractHtml, lossAwareMix") {
    val eng = new GraftEngine(spark, sfDir)
    // decontaminateSpans: same kernel as the registered query
    val docs = Seq(
      (1L, (1 to 20).map(i => s"e$i").mkString(" ")),
      (2L, ((1 to 5).map(i => s"p$i") ++ (1 to 20).map(i => s"e$i"))
        .mkString(" "))
    ).toDF("doc_id", "text")
    val spans = eng.decontaminateSpans(docs, col("doc_id") === 1L)
      .select(col("dt"), col("pt0").cast("long"), col("span").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq === Seq((2L, 6L, 20L)))
    // extractHtml strips boilerplate and round-trips body text
    val page = Seq(1).toDF("i").select(lit(
      "<html><head><title>x</title></head><body><nav>m | n</nav>" +
        "<p>hello there</p><footer>c</footer></body></html>").as("h"))
    assert(page.select(eng.extractHtml(col("h"))).first().getString(0)
      === "hello there")
    // lossAwareMix: zero-excess sources keep base proportions; an
    // excess source gains exactly the integer-MW amount
    val stats = Seq(("a", 100L, 5.0), ("b", 100L, 6.0))
      .toDF("source", "n_tokens", "nll")
    val mix = eng.lossAwareMix(stats, referenceNll = 5.0)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getDouble(5)))).toMap
    assert(mix("a")._1 === 0L && mix("b")._1 === 1000000L)
    // w_b = 100*(2e6) / (100*1e6 + 100*2e6) = 2/3
    assert(math.abs(mix("b")._2 - 0.666667) < 1e-6)
    assert(math.abs(mix("a")._2 - 0.333333) < 1e-6)
  }

  test("q199 unigram encode: token mass re-derives from the segmentation; fertility bounded") {
    import graft.queries.TextOps
    try {
      val enc = Registry.byName("q199_unigram_encode").fn(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5)))
      assert(enc.nonEmpty)
      // totals re-derive EXACTLY from the (memoized) trainer state: the
      // corpus-wide unigram-token mass is sum(freq * |pieces|) over the
      // segmentation frame — same object q198 trains, so no drift
      val (_, _, seg) = TextOps.unigramLoop(spark, sfDir, rounds = 3)
      val expected = seg
        .select(sum(col("freq") * size(col("ps")))).first().getLong(0)
      assert(enc.map(_._4).sum === expected)
      // fertility: at least 1 token per word, never more than its chars
      enc.foreach { case (src, nw, nc, nt, tpc, tpw) =>
        assert(nt >= nw && nt <= nc, s"$src token mass out of bounds")
        assert(tpw >= 1.0 && tpc <= 1.0, s"$src fertility out of bounds")
      }
      // the memo makes encode rerun-stable AND cheap (no second EM run)
      val enc2 = Registry.byName("q199_unigram_encode").fn(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getLong(3)))
      assert(enc2.toSeq === enc.map(r => (r._1, r._4)).toSeq)
    } finally TextOps.releaseCaches()
  }

  test("KeyedMemo.drain cannot leak a build racing the release") {
    // Hammer: builders insert values while a drainer repeatedly drains.
    // Every build that COMPLETED must be observable exactly once —
    // either in some drain's removed set or still in the memo at the
    // end. The old snapshot-then-clear release lost builds that
    // completed between the snapshot and the clear.
    (0 until 20).foreach { round =>
      val memo = new KeyedMemo[Int, Integer]
      val built = new java.util.concurrent.atomic.AtomicInteger(0)
      val drained = new java.util.concurrent.ConcurrentLinkedQueue[Integer]
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(8)
      (0 until 6).foreach { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            (0 until 50).foreach { i =>
              memo.getOrBuild(t * 1000 + i) {
                built.incrementAndGet(); Integer.valueOf(t * 1000 + i)
              }
            }
          }
        })
      }
      (0 until 2).foreach { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            (0 until 25).foreach { _ => memo.drain().foreach(drained.add) }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(30, TimeUnit.SECONDS))
      val leftover = memo.drain()
      val seen = drained.size + leftover.size
      assert(seen === built.get(),
        s"round=$round built=${built.get()} observed=$seen — a completed " +
          "build escaped both the drains and the memo (leak)")
    }
  }
}
