package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.ext.SnapshotLog

/** Round-14 fixes: empty-snapshot optimize safety, crashed-optimize
  * staging reclaim, malformed-#base loudness, legacy config-less log
  * layout, drain liveness under continuous traffic, and the bucketed
  * catalog-name race.
  */
class Round19OpsSpec extends SparkSpec {

  test("optimize on an empty snapshot skips the commit and keeps the head readable") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-opt-empty").toString
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append((0L until 50L).map(k => (k, k * 2))
      .toDF("k", "v"), dir, col("k"))
    // delete-all leaves a readable 0-row rewrite segment at the head
    val vDel = SnapshotLog.delete(spark, dir, lit(true), col("k"))
    assert(SnapshotLog.readAsOf(spark, dir, vDel).count() === 0L)
    // a scheduled OPTIMIZE of the empty head must not publish an
    // unreadable zero-segment manifest — it skips and returns prev
    val vOpt = SnapshotLog.optimize(spark, dir, col("k"),
      Seq(col("k"), col("v")), bucketBits = 2)
    assert(vOpt === vDel, "empty optimize must return the unchanged head")
    assert(SnapshotLog.version(dir) === vDel)
    assert(SnapshotLog.readAsOf(spark, dir, vDel).count() === 0L)
    // and no staging residue survives the skip
    val residue = Files.list(Paths.get(dir)).iterator()
    val stray = new scala.collection.mutable.ArrayBuffer[String]
    while (residue.hasNext) {
      val n = residue.next().getFileName.toString
      if (n.startsWith(".opt-")) stray += n
    }
    assert(stray.isEmpty, s"staging residue after skipped optimize: $stray")
  }

  test("vacuum reclaims stale .opt-* staging past the age horizon, keeps fresh ones") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-opt-reclaim").toString
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append((0L until 20L).map(k => (k, k))
      .toDF("k", "v"), dir, col("k"))
    // a crashed optimize's residue: files last touched long ago
    val stale = Paths.get(dir, ".opt-99-dead")
    Files.createDirectories(stale)
    Files.write(stale.resolve("part-0"), "x".getBytes(StandardCharsets.UTF_8))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 60L * 60L * 1000L)
    Files.setLastModifiedTime(stale.resolve("part-0"), old)
    Files.setLastModifiedTime(stale, old)
    // a live concurrent optimize's staging: freshly written
    val live = Paths.get(dir, ".opt-100-live")
    Files.createDirectories(live)
    Files.write(live.resolve("part-0"), "y".getBytes(StandardCharsets.UTF_8))
    SnapshotLog.vacuum(dir, 0, staleOptimizeAgeMs = 10L * 60L * 1000L)
    assert(!Files.exists(stale), "stale staging must be reclaimed")
    assert(Files.exists(live), "fresh staging (a live optimize) must survive")
    // default never reclaims — the pre-round-14 contract
    SnapshotLog.vacuum(dir, 0)
    assert(Files.exists(live))
  }

  test("a corrupted #base pointer fails loudly, not by unbounded recursion") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-badbase").toString
    SnapshotLog.reset(dir, checkpointInterval = 3)
    SnapshotLog.append((0L until 10L).map(k => (k, k))
      .toDF("k", "v"), dir, col("k"))
    // a self-referencing delta manifest at v1
    SnapshotLog.publish(dir, 1, Seq("#base\t1"))
    val e = intercept[IllegalStateException] {
      SnapshotLog.readAsOf(spark, dir, 1)
    }
    assert(e.getMessage.contains("#base"))
  }

  test("a config-less legacy log writes full manifests always") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-legacy-log").toString
    // no reset: append bootstraps _log without a config file, the
    // legacy layout external readers expect to stay full-list
    (0 until 4).foreach { i =>
      SnapshotLog.append(Seq((i.toLong, i.toLong)).toDF("k", "v"),
        dir, col("k"))
    }
    assert(SnapshotLog.checkpointIntervalOf(dir) === 1)
    (0 to 3).foreach { v =>
      assert(!SnapshotLog.isDelta(dir, v), s"v$v must be a full manifest")
    }
    assert(SnapshotLog.readAsOf(spark, dir, 3).count() === 4L)
  }

  test("KeyedMemo.drain terminates under continuous getOrBuild traffic") {
    val memo = new KeyedMemo[Long, Integer]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val nextKey = new java.util.concurrent.atomic.AtomicLong(0L)
    // every key whose getOrBuild RETURNED — the set the no-leak
    // property below is stated over (keys are unique per call, so
    // every call is a fresh build and value == key)
    val returned = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    (0 until 4).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit =
          while (!stop.get()) {
            val k = nextKey.incrementAndGet()
            memo.getOrBuild(k)(Integer.valueOf(k.toInt))
            returned.add(k)
          }
      })
    }
    val drained =
      try {
        Thread.sleep(100L)
        // the old global-counter wait never reached zero under this
        // load; the per-generation counter only waits on builds that
        // entered the detached map, so drain returns promptly mid-flood
        val t0 = System.nanoTime()
        val d = memo.drain()
        val waitedMs = (System.nanoTime() - t0) / 1000000L
        assert(waitedMs < 5000L,
          s"drain blocked ${waitedMs}ms under continuous traffic")
        assert(d.nonEmpty)
        d
      } finally {
        stop.set(true)
        pool.shutdown()
        pool.awaitTermination(10, java.util.concurrent.TimeUnit.SECONDS)
      }
    // with traffic quiesced, the second drain holds exactly the rest:
    // the two drains are DISJOINT (no value surfaces twice) and their
    // union covers every returned key (no build slipped between the
    // generation swap and the counter wait — the leak drain() closes).
    // Builds that entered the memo but whose `returned.add` had not run
    // at a drain boundary can only make the drains a SUPERSET of
    // `returned`, never smaller — the quiesced snapshot sees all adds.
    val leftover = memo.drain()
    val all = (drained ++ leftover).map(_.longValue())
    assert(all.size === all.distinct.size, "drains must be disjoint")
    val returnedSet = returned.asScala.toSet
    assert(returnedSet.subsetOf(all.toSet),
      s"${(returnedSet -- all.toSet).size} built values leaked past both drains")
  }

  // == Deletion vectors (merge-on-read DELETE) ==

  private def morFixture(tag: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft-dv-$tag").toString
    SnapshotLog.reset(dir, checkpointInterval = 3)
    val rows = (0L until 300L).map(k => (k, k % 7, s"r$k"))
    SnapshotLog.append(rows.take(150).toDF("k", "m", "s"), dir, col("k"))
    SnapshotLog.append(rows.drop(150).toDF("k", "m", "s"), dir, col("k"))
    dir
  }

  private def content(dir: String, v: Int): Seq[String] =
    SnapshotLog.readAsOf(spark, dir, v)
      .collect().map(_.toString).sorted.toSeq

  test("deleteMor ≡ copy-on-write delete: same snapshot, same CDC, no segment rewrite") {
    val cow = morFixture("cow")
    val mor = morFixture("mor")
    val pred = col("m") === 3
    val vCow = SnapshotLog.delete(spark, cow, pred, col("k"))
    val preSegs = SnapshotLog.segments(mor, 1).map(_.relPath)
    val vMor = SnapshotLog.deleteMor(spark, mor, pred)
    assert(content(mor, vMor) === content(cow, vCow))
    // the economy: MoR rewrote NOTHING, CoW rewrote both touched segs
    assert(SnapshotLog.segments(mor, vMor).map(_.relPath) === preSegs)
    assert(SnapshotLog.segments(cow, vCow).map(_.relPath) !== preSegs)
    // CDC delivers identical delete rows on both paths
    def cdcDel(dir: String, v: Int): Seq[String] =
      SnapshotLog.readCdc(spark, dir, 1, v)
        .filter(col("_change_type") === "delete")
        .drop("_change_type", "_commit_version")
        .collect().map(_.toString).sorted.toSeq
    assert(cdcDel(mor, vMor) === cdcDel(cow, vCow))
    // time travel unaffected on the MoR path
    assert(SnapshotLog.readAsOf(spark, mor, 1).count() === 300L)
  }

  test("deleteMor composes: second delete, append, filtered reads, merge — none resurrect tombstoned rows") {
    import spark.implicits._
    val dir = morFixture("compose")
    val v1 = SnapshotLog.deleteMor(spark, dir, col("m") === 3)
    val v2 = SnapshotLog.deleteMor(spark, dir, col("m") === 5)
    assert(SnapshotLog.meta(dir, v2).dvs.size === 2)
    val expectAfter = (0L until 300L).filter(k => k % 7 != 3 && k % 7 != 5)
    assert(SnapshotLog.readAsOf(spark, dir, v2)
      .collect().map(_.getLong(0)).sorted.toSeq === expectAfter)
    // an idempotent re-delete commits nothing
    assert(SnapshotLog.deleteMor(spark, dir, col("m") === 3) === v2)
    // zone-map-filtered read applies the DVs too
    val (fr, _, _) =
      SnapshotLog.readAsOfFiltered(spark, dir, v2, col("k"), 0L, 99L)
    assert(fr.collect().map(_.getLong(0)).sorted.toSeq ===
      expectAfter.filter(_ <= 99L))
    // append after MoR: new rows visible, tombstones still applied
    val v3 = SnapshotLog.append(
      Seq((1000L, 3L, "fresh")).toDF("k", "m", "s"), dir, col("k"))
    assert(SnapshotLog.readAsOf(spark, dir, v3).count() ===
      expectAfter.size + 1L)
    // merge on a DV'd table must not resurrect deleted keys: upsert a
    // surviving key; deleted keys stay gone
    val v4 = SnapshotLog.merge(spark,
      Seq((0L, 0L, "updated")).toDF("k", "m", "s"), dir, "k", col("k"))
    val after = SnapshotLog.readAsOf(spark, dir, v4)
    assert(after.filter(col("m") === 3 && col("k") < 1000L).count() === 0L,
      "merge rewrite resurrected tombstoned rows")
    assert(after.filter(col("k") === 0L).select(col("s"))
      .head().getString(0) === "updated")
    // CoW delete on a DV'd table: survivors of its rewrite exclude
    // tombstoned rows
    val v5 = SnapshotLog.delete(spark, dir, col("m") === 6, col("k"))
    val end = SnapshotLog.readAsOf(spark, dir, v5)
    assert(end.filter(col("m").isin(3L, 5L, 6L) && col("k") < 1000L)
      .count() === 0L)
    assert(end.filter(col("k") === 1000L).count() === 1L)
  }

  test("DV reads keep predicate pushdown and broadcast the tombstone side") {
    val dir = morFixture("plan")
    val v = SnapshotLog.deleteMor(spark, dir, col("m") === 3)
    staticPlan {
      val df = SnapshotLog.readAsOf(spark, dir, v).filter(col("k") >= 100L)
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.size === 2, "expected a data scan and a DV scan")
      // the data-side predicate pushes THROUGH the anti-join into the
      // parquet scan — a 100 TB DV read must still prune/push like a
      // plain read
      assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(_.contains("GreaterThanOrEqual(k,100"))),
        s"filter not pushed: ${scans.map(_.metadata.get("PushedFilters"))}")
      // the tombstone side is delete-sized: planned as the BROADCAST
      // side of the anti-join, and column-pruned to its key pair
      val bhj = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bhj.exists(_.joinType ==
        org.apache.spark.sql.catalyst.plans.LeftAnti),
        "DV application must plan as a broadcast LEFT ANTI join")
      val dvScan = scans.find(_.schema.fieldNames.contains("__graft_dv_file"))
      assert(dvScan.isDefined, "no DV-side scan found")
      assert(dvScan.get.schema.fieldNames.toSet ===
        Set("__graft_dv_file", "__graft_dv_pos"),
        s"DV scan not column-pruned: ${dvScan.get.schema.fieldNames.toSeq}")
      // and the plan is not just shapely — it answers correctly
      assert(df.count() ===
        (100L until 300L).count(_ % 7 != 3))
    }
  }

  test("vacuum keeps referenced DV segments; compact materializes and frees them") {
    val dir = morFixture("vac")
    val vDel = SnapshotLog.deleteMor(spark, dir, col("m") === 2)
    val dvRel = SnapshotLog.meta(dir, vDel).dvs.head
    // horizon at the delete: the DV segment must survive (still read)
    SnapshotLog.vacuum(dir, vDel)
    assert(Files.exists(Paths.get(dir, dvRel)), "referenced DV vacuumed away")
    val survivors = SnapshotLog.readAsOf(spark, dir, vDel).count()
    assert(survivors < 300L)
    // compact materializes the tombstones into the rewrite...
    val vCpt = SnapshotLog.compact(spark, dir, col("k"))
    assert(SnapshotLog.meta(dir, vCpt).dvs.isEmpty)
    assert(SnapshotLog.readAsOf(spark, dir, vCpt).count() === survivors)
    // ...and a vacuum past it reclaims the DV segment
    SnapshotLog.vacuum(dir, vCpt)
    assert(!Files.exists(Paths.get(dir, dvRel)),
      "unreferenced DV must be reclaimed")
    assert(SnapshotLog.readAsOf(spark, dir, vCpt).count() === survivors)
  }

  // == Graph-based ANN serving (q210/q215) ==

  test("graph beam search: climbs tight clusters, visits ≪ corpus, deterministic") {
    import spark.implicits._
    import graft.queries.VectorOps
    // 4 tight orthogonal clusters × 25 vectors (dim 64): cluster c
    // peaks on dims 16c..16c+15 with small deterministic per-vector
    // jitter — in-cluster cosine ≫ cross-cluster, so the kNN graph is
    // intra-cluster and a walk entered anywhere in the cluster should
    // reach the exact top-3
    def jit(id: Long, i: Int): Float =
      (((id * 2654435761L + i * 40503L) % 1000L).toFloat - 500f) / 5000f
    val vecs = (0L until 100L).map { id =>
      val c = (id % 4).toInt
      val emb = Array.tabulate(64) { i =>
        if (i >= 16 * c && i < 16 * (c + 1)) 1f + jit(id, i) else jit(id, i)
      }
      (id, emb)
    }
    val e0 = vecs.toDF("vec_id", "embedding")
    val (topk, visited) = VectorOps.graphBeamSearch(spark, e0,
      beam = 8, hops = 4, entries = 8)
    // exact top-3 per query, brute force in the test
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (dot, na, nb) = (0.0, 0.0, 0.0)
      (0 until 64).foreach { i =>
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val byId = vecs.toMap
    val exact = (0L until 10L).map { qid =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(byId(qid), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    }.toMap
    val got = topk.collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // entries 0..7 cover all 4 clusters (id % 4), so every query's own
    // cluster is entered; the walk must stay in-cluster and recall most
    // of the exact top-3 (greedy graph search is approximate by design
    // — 2/3 average is the meaningful floor, exactness is not promised)
    (0L until 10L).foreach { q =>
      assert(got(q).forall(_ % 4 == q % 4),
        s"query $q walked out of its cluster: ${got(q)}")
    }
    val totalHits = (0L until 10L).map(q => (got(q) intersect exact(q)).size).sum
    assert(totalHits >= 20, s"graph recall too low: $totalHits/30 exact hits")
    // the walk's bound (entries + hops·beam·3·degree) EXCEEDS this
    // 100-node micro-corpus, so the visited count is only pinned to
    // stay under it — the meaningful visited ≪ corpus assertion lives
    // in the fixture-scale test below, where the corpus dwarfs the
    // bound
    val maxVisited = visited.groupBy(col("q_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxVisited < 100L,
      s"beam walk scored the whole micro-corpus ($maxVisited of 100)")
    // rerun-deterministic (fresh walk, same ranking rules)
    val (topk2, _) = VectorOps.graphBeamSearch(spark, e0,
      beam = 8, hops = 4, entries = 8)
    assert(topk2.collect().map(_.toString).sorted.toSeq ===
      topk.collect().map(_.toString).sorted.toSeq)
  }

  test("q210 fixture walks: visited ≪ corpus on both regimes") {
    import graft.queries.VectorOps
    try {
      val corpusN = graft.Tables.load(spark, sfDir, "embeddings").count()
      VectorOps.graphBeamRegimes(spark, sfDir).foreach {
        case (regime, _, topk, visited) =>
          assert(topk.groupBy(col("q_id")).count()
            .filter(col("count") =!= 3).count() === 0L,
            s"$regime: every query must return exactly 3 neighbors")
          val maxVisited = visited.groupBy(col("q_id")).count()
            .agg(max(col("count"))).head().getLong(0)
          assert(maxVisited < corpusN / 2,
            s"$regime: walk scored $maxVisited of $corpusN")
      }
    } finally graft.queries.VectorOps.releaseCaches()
  }

  // == Stats-spec evolution (q213) ==

  test("evolveStatsCols: add-only by name, idempotent re-add, mixed-history prune safety") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-spe").toString
    SnapshotLog.reset(dir, checkpointInterval = 3,
      statsCols = Seq("a" -> "a"))
    // segment under the ORIGINAL spec: no range recorded for b
    SnapshotLog.append((0L until 100L).map(k => (k, k % 10))
      .toDF("a", "b"), dir, col("a"))
    // evolve; re-adding the identical pair is a no-op, re-binding fails
    SnapshotLog.evolveStatsCols(dir, Seq("b" -> "b"))
    SnapshotLog.evolveStatsCols(dir, Seq("b" -> "b"))
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.evolveStatsCols(dir, Seq("b" -> "b * 2"))
    }
    assert(e.getMessage.contains("add-only"))
    assert(SnapshotLog.statsColsOf(dir) === Seq("a" -> "a", "b" -> "b"))
    // segment under the EVOLVED spec records b
    SnapshotLog.append((100L until 200L).map(k => (k, k % 10))
      .toDF("a", "b"), dir, col("a"))
    // b-pruned read over the mixed history: the pre-evolution segment
    // has no recorded b range and must be KEPT (never wrong-skipped);
    // content stays exact via the residual
    val (fr, scanned, total) = SnapshotLog.readAsOfFilteredOn(
      spark, dir, 1, "b", col("b"), 0L, 2L)
    assert(total === 2 && scanned === 2,
      s"mixed history must keep the stat-less segment: $scanned of $total")
    assert(fr.count() === (0L until 200L).count(_ % 10 <= 2))
    // a legacy config-less log refuses evolution loudly
    val legacy = Files.createTempDirectory("graft-spe-legacy").toString
    SnapshotLog.append(Seq((1L, 1L)).toDF("a", "b"), legacy, col("a"))
    intercept[IllegalArgumentException] {
      SnapshotLog.evolveStatsCols(legacy, Seq("b" -> "b"))
    }
  }

  // == Timestamp time travel ==

  test("versionAt resolves wall-clock instants; stamps survive materialization and vacuum") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ts-travel").toString
    SnapshotLog.reset(dir, checkpointInterval = 3)
    val times = (0 until 4).map { i =>
      SnapshotLog.append(Seq((i.toLong, i.toLong)).toDF("k", "v"),
        dir, col("k"))
      Thread.sleep(15L)
      SnapshotLog.commitTimeOf(dir, i)
    }
    assert(times == times.sorted, "single-writer stamps must be monotone")
    // an instant between v1 and v2 reads v1; exactly at v2 reads v2
    assert(SnapshotLog.versionAt(dir, (times(1) + times(2)) / 2) === 1)
    assert(SnapshotLog.versionAt(dir, times(2)) === 2)
    // exactly at the newest commit resolves the head; PAST it fails
    // loudly (Delta's timestampAsOf contract — a typo'd future date
    // must not silently read HEAD; the round-14 advice finding)
    assert(SnapshotLog.versionAt(dir, times(3)) === 3)
    intercept[IllegalArgumentException] {
      SnapshotLog.versionAt(dir, times(3) + 60000L)
    }
    assert(SnapshotLog.readAsOfTimestamp(spark, dir, times(1)).count() === 2L)
    // before the log: loud
    intercept[IllegalArgumentException] {
      SnapshotLog.versionAt(dir, times(0) - 1000L)
    }
    // vacuum materializes the horizon (v1 is a delta) — its stamp must
    // survive, and pre-horizon instants fail loudly, not silently-v0
    SnapshotLog.vacuum(dir, 1)
    assert(SnapshotLog.commitTimeOf(dir, 1) === times(1))
    assert(SnapshotLog.versionAt(dir, times(2)) === 2)
    intercept[IllegalArgumentException] {
      SnapshotLog.versionAt(dir, times(0))
    }
  }

  // == WordPiece tokenizer (q211/q212/q214) ==

  test("wordpiece greedy property: single-char words, all-UNK, literal-## collisions (seeded)") {
    import spark.implicits._
    import graft.queries.TextOps
    // the input class the enumerated tests don't generate: words
    // containing literal '#' runs, whose continuation candidates spell
    // "##" + "#…" and collide with ##-prefixed vocab entries; plus
    // 1-char words and words with no match at all (→ [UNK], n_sym 1)
    val maxLen = 5
    val vocab = Set("a", "b", "#", "ab", "##a", "##b", "###", "####",
      "##ab", "aa", "##ba")
    val rnd = new scala.util.Random(20260816)
    val alphabet = "ab#c" // 'c' is in no vocab entry — the UNK driver
    val seeded = (1 to 120).map { _ =>
      val len = 1 + rnd.nextInt(6)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val edge = Seq("a", "b", "#", "c", "##", "###", "a##b", "##ab",
      "#a", "a#", "ba##", "####")
    val words = (seeded ++ edge).distinct
    // the reference: the WordPiece contract stated directly — greedy
    // longest-match at the cursor over (pos==0 ? s : "##"+s), whole
    // word → [UNK] on any gap
    def ref(w: String): Int = {
      var pos = 0; var n = 0
      while (pos < w.length) {
        val pre = if (pos == 0) "" else "##"
        (math.min(maxLen, w.length - pos) to 1 by -1)
          .find(ln => vocab(pre + w.substring(pos, pos + ln))) match {
          case Some(ln) => n += 1; pos += ln
          case None => return 1
        }
      }
      n
    }
    val got = TextOps.wordpieceGreedy(
        words.map(w => (w, 1L)).toDF("w", "freq"),
        vocab.toSeq.toDF("sym"), maxLen)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    words.foreach { w =>
      assert(got(w) === ref(w), s"word '$w' diverged from the contract")
    }
    // the named classes really occurred (not vacuous)
    assert(words.exists(_.length == 1))
    assert(words.exists(w => ref(w) == 1 && w.exists(_ == 'c')))
    assert(words.exists(w => w.contains("##") && ref(w) > 1))
  }

  test("wordpiece greedy matcher: longest-match-first, ## continuation, UNK on gap") {
    import spark.implicits._
    import graft.queries.TextOps
    val syms = Seq("h", "##e", "he", "##l", "##o", "##ll", "##lo")
      .toDF("sym")
    val words = Seq(("hello", 3L), ("hell", 2L), ("hex", 1L), ("h", 5L))
      .toDF("w", "freq")
    val got = TextOps.wordpieceGreedy(words, syms, maxLen = 4)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    // hello: he | ##ll (longest at pos 3 beats ##l) | ##o -> 3
    assert(got("hello") === 3)
    // hell: he | ##ll -> 2
    assert(got("hell") === 2)
    // hex: he | ##x missing -> whole word UNK -> 1
    assert(got("hex") === 1)
    assert(got("h") === 1)
    // a vocab token LONGER than any merge-count heuristic: with the
    // whole word in the vocab and the span cap at its true length, the
    // greedy match is 1 token (the rounds+1 cap regression: merge
    // lengths can double per round, so the cap must come from the
    // vocab's real max consumed length)
    val symsLong = syms.union(Seq("hello").toDF("sym"))
    val gotLong = TextOps.wordpieceGreedy(words, symsLong, maxLen = 5)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(gotLong("hello") === 1)
  }

  test("wordpiece span cap derives from the vocab, not the round count") {
    import graft.queries.TextOps
    try {
      // trained at 10 rounds on the fixture corpus: every trained
      // word's greedy segmentation must never be beaten by a LONGER
      // vocab-token match the cap could have hidden — verify by
      // asserting every merged token is proposable: re-encode each
      // merged token's raw spelling as a standalone word; a correctly
      // capped matcher scores it as ONE token
      val (merges, _) = TextOps.wordpieceLoop(spark, sfDir, rounds = 10)
      import spark.implicits._
      val mergedWords = merges.collect().map { r =>
        val m = r.getString(3)
        (if (m.startsWith("##")) m.stripPrefix("##") else m, 1L)
      }.distinct.toSeq
      // initial-position spellings only (a ##-continuation token can't
      // START a word); keep those whose spelling IS an initial token
      val initial = merges.collect().map(_.getString(3))
        .filter(!_.startsWith("##")).distinct.toSeq
      if (initial.nonEmpty) {
        val vocab = TextOps.wordpieceLoop(spark, sfDir, rounds = 10)._2
        // the trained segmentation of a word equal to an initial vocab
        // token must be exactly 1 piece
        val seg = vocab.filter(col("w").isin(initial: _*))
          .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
        seg.foreach { case (w, n) =>
          assert(n === 1, s"vocab token '$w' not matched whole (n_sym=$n)")
        }
      }
      assert(mergedWords.nonEmpty)
    } finally graft.queries.TextOps.releaseCaches()
  }

  test("wordpiece trainer invariants: rounds, spelling, score algebra, segmentation bounds") {
    import graft.queries.TextOps
    try {
      val (merges, seg) = TextOps.wordpieceLoop(spark, sfDir, rounds = 10)
      val m = merges.collect()
      assert(m.length === 10)
      m.foreach { r =>
        val (lhs, rhs, merged) =
          (r.getString(1), r.getString(2), r.getString(3))
        // merged spelling: lhs + rhs-without-## — the ## marker appears
        // exactly once, inherited from lhs's position class
        assert(merged === lhs + rhs.stripPrefix("##"),
          s"bad merged spelling: $lhs + $rhs -> $merged")
        assert(!rhs.isEmpty && r.getLong(4) > 0L && r.getDouble(5) > 0.0)
      }
      // greedy piece counts: >= 1, <= word length, never 0; and no
      // corpus word is UNK (every char is in the init vocab)
      val rows = seg.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (w, n) = (r.getString(0), r.getInt(2))
        assert(n >= 1 && n <= w.length, s"n_sym $n outside [1, ${w.length}] for $w")
      }
      // q212's corpus mass re-derives from the segmentation by algebra:
      // n_wp_tokens(source) = sum over corpus words of n_sym
      val enc = Registry.byName("q212_wordpiece_encode").fn(spark, sfDir)
        .select(col("source"), col("n_wp_tokens"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val docs = graft.Tables.load(spark, sfDir, "documents")
      val recomputed = docs
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 1)
        .join(seg.select(col("w"), col("n_sym")), Seq("w"))
        .groupBy(col("source"))
        .agg(sum(col("n_sym").cast("long")).as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(enc === recomputed)
    } finally graft.queries.TextOps.releaseCaches()
  }

  test("wordpiece tokenizer: encode after reload ≡ encode in session") {
    import graft.queries.TextOps
    val eng = new GraftEngine(spark, sfDir)
    try {
      val inSession = eng.query("q212_wordpiece_encode")
        .collect().map(_.toString).toSeq
      val dir = Files.createTempDirectory("graft-tok-wp").toString
      eng.saveTokenizer(dir, kind = "wordpiece", rounds = 10, format = "orc")
      TextOps.releaseCaches()
      assert(eng.encodeWithTokenizer(dir, kind = "wordpiece", format = "orc")
        .collect().map(_.toString).toSeq === inSession)
    } finally TextOps.releaseCaches()
  }

  test("concurrent bucketed materializations of one name do not clobber") {
    import graft.ingest.BucketedTables
    val base = Files.createTempDirectory("graft-bucketed-race").toString
    val o = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val expect = o.count()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    import scala.jdk.CollectionConverters._
    val tasks = (0 until 2).map { i =>
      new java.util.concurrent.Callable[Long] {
        def call(): Long = BucketedTables.materialize(spark, o,
          "graft_race_orders_b", s"$base/o$i", "o_orderkey", 4).count()
      }
    }
    try {
      val counts = pool.invokeAll(tasks.asJava).asScala.map(_.get())
      // both materializations complete and the surviving binding reads
      // whole — the unserialized DROP+create lost rows or threw
      counts.foreach(c => assert(c === expect))
      assert(spark.table(BucketedTables.scopedName("graft_race_orders_b"))
        .count() === expect)
    } finally {
      pool.shutdown()
      spark.sql(s"DROP TABLE IF EXISTS ${BucketedTables.scopedName("graft_race_orders_b")}")
    }
  }
}
