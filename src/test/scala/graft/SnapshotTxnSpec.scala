package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64
import org.apache.spark.sql.functions._
import graft.ext.{SnapshotLog, SnapshotTxn}

/** Multi-table transaction (round-17 item 5): both-or-neither across
  * logs under every crash window the protocol has — before the
  * intent (neither, forever), after the intent but before any/all
  * manifest publishes (both, healed by any reader), and the
  * foreign-writer violation (loud, never silent).
  */
class SnapshotTxnSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-txn-$tag").toString

  private def rows(n: Int, from: Int = 0) = {
    import spark.implicits._
    (from until from + n).map(k => (k.toLong, s"r$k")).toDF("k", "s")
  }

  private def keys(dir: String): Set[Long] = {
    val v = SnapshotLog.version(dir)
    if (v < 0) Set.empty
    else SnapshotLog.readAsOf(spark, dir, v)
      .select(col("k")).collect().map(_.getLong(0)).toSet
  }

  private def txnFiles(dir: String): Seq[String] = {
    val ld = Paths.get(dir, "_log")
    if (!Files.isDirectory(ld)) Nil
    else {
      val s = Files.list(ld)
      try {
        val it = s.iterator()
        val b = Seq.newBuilder[String]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.startsWith("txn-")) b += n
        }
        b.result()
      } finally s.close()
    }
  }

  test("commitTogether: both tables commit atomically, txn files cleaned") {
    val a = tmp("a"); val b = tmp("b")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    SnapshotLog.append(rows(10), a, col("k"))
    val staged = Seq(
      SnapshotLog.stageAppend(rows(5, from = 100), a, col("k")),
      SnapshotLog.stageAppend(rows(7, from = 200), b, col("k")))
    val vs = SnapshotTxn.commitTogether(staged)
    assert(vs === Map(a -> 1, b -> 0))
    assert(SnapshotLog.version(a) === 1)
    assert(SnapshotLog.version(b) === 0)
    assert(keys(a) === ((0L until 10L) ++ (100L until 105L)).toSet)
    assert(keys(b) === (200L until 207L).toSet)
    assert(txnFiles(a).isEmpty && txnFiles(b).isEmpty)
    // the logs stay ordinary logs: a plain append continues the line
    assert(SnapshotLog.append(rows(1, from = 999), b, col("k")) === 1)
  }

  test("crash before the intent: NEITHER table ever shows the data") {
    val a = tmp("pa"); val b = tmp("pb")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    val staged = Seq(
      SnapshotLog.stageAppend(rows(5), a, col("k")),
      SnapshotLog.stageAppend(rows(5), b, col("k")))
    val id = SnapshotTxn.newTxnId()
    SnapshotTxn.writePointers(staged, id)
    // CRASH here: the intent never publishes. Readers see nothing,
    // now or ever — the stale pointer is ignored, not followed
    assert(SnapshotLog.version(a) === -1)
    assert(SnapshotLog.version(b) === -1)
    assert(keys(a).isEmpty && keys(b).isEmpty)
    // the non-coordinator carries the inert pointer; reads still work
    val ptrCarrier = Seq(a, b).filter(d => txnFiles(d).nonEmpty)
    assert(ptrCarrier.size === 1)
    // subsequent NORMAL writes are unaffected by the garbage
    SnapshotLog.append(rows(3, from = 50), a, col("k"))
    SnapshotLog.append(rows(3, from = 60), b, col("k"))
    assert(keys(a) === (50L until 53L).toSet)
    assert(keys(b) === (60L until 63L).toSet)
    // age-gated reap collects the aborted pointer (and only that)
    val d = ptrCarrier.head
    assert(SnapshotTxn.reapAborted(d, horizonMs = 0,
      nowMs = System.currentTimeMillis() + 1000) === 1)
    assert(txnFiles(d).isEmpty)
  }

  test("crash after the intent: ANY reader heals BOTH tables") {
    val a = tmp("ia"); val b = tmp("ib")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    val staged = Seq(
      SnapshotLog.stageAppend(rows(4), a, col("k")),
      SnapshotLog.stageAppend(rows(6, from = 10), b, col("k")))
    val id = SnapshotTxn.newTxnId()
    SnapshotTxn.writePointers(staged, id)
    SnapshotTxn.publishIntent(staged, id)
    // CRASH here: committed but nothing published. The first read of
    // EITHER table rolls the whole transaction forward
    assert(SnapshotLog.version(b) === 0) // read the non-coordinator
    assert(SnapshotLog.version(a) === 0)
    assert(keys(a) === (0L until 4L).toSet)
    assert(keys(b) === (10L until 16L).toSet)
    assert(txnFiles(a).isEmpty && txnFiles(b).isEmpty)
  }

  test("crash mid roll-forward: the published half stays, the other heals") {
    val a = tmp("ma"); val b = tmp("mb")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    val staged = Seq(
      SnapshotLog.stageAppend(rows(4), a, col("k")),
      SnapshotLog.stageAppend(rows(6, from = 10), b, col("k")))
    val id = SnapshotTxn.newTxnId()
    SnapshotTxn.writePointers(staged, id)
    SnapshotTxn.publishIntent(staged, id)
    // simulate the crash window: hand-publish ONE participant's
    // manifest straight from the intent (what roll-forward's first
    // step does), then die before the second
    val coordDir = Seq(a, b).minBy(d =>
      Paths.get(d).toAbsolutePath.normalize.toString)
    val intent = Paths.get(coordDir, "_log", s"txn-$id.intent")
    val firstLine = new String(Files.readAllBytes(intent),
      StandardCharsets.UTF_8).linesIterator
      .find(_.startsWith(s"table\t${Paths.get(a).toAbsolutePath.normalize}"))
      .get.split('\t')
    val manifest = new String(Base64.getDecoder.decode(firstLine(3)),
      StandardCharsets.UTF_8)
    Files.write(Paths.get(a, "_log", s"v${firstLine(2)}.manifest"),
      manifest.getBytes(StandardCharsets.UTF_8))
    // a reader of the UNPUBLISHED table converges the rest —
    // idempotently past the half that already landed
    assert(keys(b) === (10L until 16L).toSet)
    assert(keys(a) === (0L until 4L).toSet)
    assert(txnFiles(a).isEmpty && txnFiles(b).isEmpty)
  }

  test("a foreign writer on a reserved version fails healing LOUDLY") {
    val a = tmp("fa"); val b = tmp("fb")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    val staged = Seq(
      SnapshotLog.stageAppend(rows(4), a, col("k")),
      SnapshotLog.stageAppend(rows(6, from = 10), b, col("k")))
    val id = SnapshotTxn.newTxnId()
    SnapshotTxn.writePointers(staged, id)
    SnapshotTxn.publishIntent(staged, id)
    // a non-transactional writer violates the single-writer contract:
    // raw-publishes its own v0 into one participant during the crash
    // window (bypassing version(), which would have healed first)
    Files.write(Paths.get(b, "_log", "v0.manifest"),
      "not\tthe\ttransaction's\tmanifest".getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalStateException] { SnapshotLog.version(a) }
    assert(e.getMessage.contains("single-writer contract"))
  }

  test("moveKeys: rows relocate atomically; replay is a version-preserving no-op") {
    val a = tmp("mva"); val b = tmp("mvb")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    SnapshotLog.append(rows(20), a, col("k"))
    import spark.implicits._
    val ks = Seq(3L, 7L, 11L, 99L).toDF("k") // 99 absent — ignored
    val (va, vb) = SnapshotTxn.moveKeys(spark, a, b, ks, Seq("k"), col("k"))
    assert((va, vb) === ((1, 0)))
    assert(keys(a) === (0L until 20L).toSet -- Set(3L, 7L, 11L))
    assert(keys(b) === Set(3L, 7L, 11L))
    // full row content rides the move (tombstone-readback path)
    val moved = SnapshotLog.readAsOf(spark, b, 0).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("s")).toMap
    assert(moved === Map(3L -> "r3", 7L -> "r7", 11L -> "r11"))
    assert(txnFiles(a).isEmpty && txnFiles(b).isEmpty)
    // replay: the keys are gone — nothing stages, versions unchanged
    val (va2, vb2) = SnapshotTxn.moveKeys(spark, a, b, ks, Seq("k"), col("k"))
    assert((va2, vb2) === ((1, 0)))
    // CDC stays replication-consistent: typed deletes on the source,
    // an insert batch on the destination
    val srcCdc = SnapshotLog.readCdc(spark, a, 0, 1)
      .groupBy(col("_change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(srcCdc === Map("delete" -> 3L))
    val dstCdc = SnapshotLog.readCdc(spark, b, -1, 0)
      .groupBy(col("_change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dstCdc === Map("insert" -> 3L))
  }

  test("moveKeys crash window: post-intent, one read heals delete AND append") {
    val a = tmp("mvca"); val b = tmp("mvcb")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    SnapshotLog.append(rows(10), a, col("k"))
    import spark.implicits._
    val ks = Seq(2L, 5L).toDF("k")
    val Some((del, moved)) =
      SnapshotLog.stageDeleteMorKeysMulti(spark, a, ks, Seq("k"))
    val app = SnapshotLog.stageAppend(moved, b, col("k"))
    val id = SnapshotTxn.newTxnId()
    SnapshotTxn.writePointers(Seq(del, app), id)
    SnapshotTxn.publishIntent(Seq(del, app), id)
    // the writer dies here; one ordinary read of EITHER converges both
    assert(keys(b) === Set(2L, 5L))
    assert(keys(a) === (0L until 10L).toSet -- Set(2L, 5L))
    assert(txnFiles(a).isEmpty && txnFiles(b).isEmpty)
  }

  test("moveKeys abort window: pre-intent, neither table ever changes") {
    val a = tmp("mvaa"); val b = tmp("mvab")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    SnapshotLog.append(rows(10), a, col("k"))
    import spark.implicits._
    val ks = Seq(2L, 5L).toDF("k")
    val Some((del, moved)) =
      SnapshotLog.stageDeleteMorKeysMulti(spark, a, ks, Seq("k"))
    val app = SnapshotLog.stageAppend(moved, b, col("k"))
    SnapshotTxn.writePointers(Seq(del, app), SnapshotTxn.newTxnId())
    // no intent ever publishes: the delete never surfaces, the
    // destination never gains a version
    assert(keys(a) === (0L until 10L).toSet)
    assert(SnapshotLog.version(b) === -1)
    // the stale pointer (one file, in the non-coordinator's log) is
    // age-gated reap fare
    val reaped = SnapshotTxn.reapAborted(a, 0,
      System.currentTimeMillis() + 1000) +
      SnapshotTxn.reapAborted(b, 0, System.currentTimeMillis() + 1000)
    assert(reaped === 1)
    assert(txnFiles(a).isEmpty && txnFiles(b).isEmpty)
  }

  test("pinTogether heals a crashed txn before answering") {
    val a = tmp("pina"); val b = tmp("pinb")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    SnapshotLog.append(rows(5), a, col("k"))
    val staged = Seq(
      SnapshotLog.stageAppend(rows(3, from = 100), a, col("k")),
      SnapshotLog.stageAppend(rows(4, from = 200), b, col("k")))
    val id = SnapshotTxn.newTxnId()
    SnapshotTxn.writePointers(staged, id)
    SnapshotTxn.publishIntent(staged, id)
    // the writer dies before roll-forward; the pin itself converges
    // both logs — no pinned pair can show half the transaction
    val pins = SnapshotTxn.pinTogether(Seq(a, b))
    assert(pins === Map(a -> 1, b -> 0))
    assert(txnFiles(a).isEmpty && txnFiles(b).isEmpty)
  }

  test("pinTogether never exposes half a transaction under a committing writer") {
    val a = tmp("racea"); val b = tmp("raceb")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    val writer = new Thread(() => {
      (0 until 12).foreach { i =>
        SnapshotTxn.commitTogether(Seq(
          SnapshotLog.stageAppend(rows(2, from = i * 10), a, col("k")),
          SnapshotLog.stageAppend(rows(2, from = i * 10), b, col("k"))))
        Thread.sleep(5)
      }
    })
    writer.start()
    try {
      // only paired transactions ever commit, so EVERY consistent cut
      // has version(a) == version(b); a straddled pin would differ
      (0 until 25).foreach { _ =>
        val pins = SnapshotTxn.pinTogether(Seq(a, b), maxAttempts = 200)
        assert(pins(a) === pins(b),
          s"pin exposed half a transaction: $pins")
      }
    } finally writer.join()
    assert(SnapshotLog.version(a) === 11)
    assert(SnapshotLog.version(b) === 11)
  }

  test("pinned reads are isolated from later writers") {
    val a = tmp("isoa"); val b = tmp("isob")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    SnapshotTxn.commitTogether(Seq(
      SnapshotLog.stageAppend(rows(6), a, col("k")),
      SnapshotLog.stageAppend(rows(4, from = 50), b, col("k"))))
    val pins = SnapshotTxn.pinTogether(Seq(a, b))
    SnapshotLog.append(rows(9, from = 300), a, col("k"))
    SnapshotLog.append(rows(9, from = 400), b, col("k"))
    assert(SnapshotLog.readAsOf(spark, a, pins(a)).count() === 6L)
    assert(SnapshotLog.readAsOf(spark, b, pins(b)).count() === 4L)
    intercept[IllegalArgumentException] {
      SnapshotTxn.pinTogether(Nil)
    }
    intercept[IllegalArgumentException] {
      SnapshotTxn.pinTogether(Seq(a, a))
    }
  }

  test("transactional apply: one folded commit + bookmark under one intent; replay skips") {
    import graft.streaming.SnapshotSource
    val dst = tmp("apta"); val bm = tmp("aptb")
    SnapshotLog.reset(dst); SnapshotLog.reset(bm)
    import spark.implicits._
    def cdc(rs: Seq[(Long, String, String)], v: Int) =
      rs.map { case (k, s, t) => (k, s, t, v) }
        .toDF("k", "s", "_change_type", "_commit_version")
    // batch 0: initial inserts
    val b0 = cdc((0L until 10L).map(k => (k, s"r$k", "insert")), 0)
    assert(SnapshotSource.applyCdcBatchTxn(spark, b0, dst, bm, 0L, "k",
      col("k")))
    assert(SnapshotLog.version(dst) === 0 && SnapshotLog.version(bm) === 0)
    // replay of batch 0: the bookmark gates it — NO new versions
    assert(!SnapshotSource.applyCdcBatchTxn(spark, b0, dst, bm, 0L, "k",
      col("k")))
    assert(SnapshotLog.version(dst) === 0 && SnapshotLog.version(bm) === 0)
    // batch 1: a delete, an update pair and an insert — the old
    // two-commit apply made TWO dst versions; the folded commit makes ONE
    val b1 = cdc(Seq((3L, "r3", "delete"), (5L, "r5", "update_preimage"),
      (5L, "R5", "update_postimage"), (100L, "r100", "insert")), 1)
    assert(SnapshotSource.applyCdcBatchTxn(spark, b1, dst, bm, 1L, "k",
      col("k")))
    assert(SnapshotLog.version(dst) === 1, "merge + delete fold into ONE version")
    val got = SnapshotLog.readAsOf(spark, dst, 1).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("s")).toMap
    val want = (0L until 10L).filterNot(_ == 3L)
      .map(k => k -> s"r$k").toMap + (5L -> "R5") + (100L -> "r100")
    assert(got === want)
    val bms = SnapshotLog.readAsOf(spark, bm, SnapshotLog.version(bm))
      .collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[Long]("n_upserts"), r.getAs[Long]("n_deletes"))).toSet
    assert(bms === Set((0L, 10L, 0L), (1L, 2L, 1L)))
    assert(txnFiles(dst).isEmpty && txnFiles(bm).isEmpty)
  }

  test("transactional apply, post-intent crash: the bookmark gate heals and skips") {
    import graft.streaming.SnapshotSource
    val dst = tmp("apca"); val bm = tmp("apcb")
    SnapshotLog.reset(dst); SnapshotLog.reset(bm)
    SnapshotLog.append(rows(6), dst, col("k"))
    import spark.implicits._
    val ups = Seq((2L, "U2")).toDF("k", "s")
    val dels = Seq(Tuple1(4L)).toDF("k")
    val Some(dataSt) = SnapshotLog.stageApplyMorKeys(spark, ups, dels,
      dst, Seq("k"), col("k"))
    val bmSt = SnapshotLog.stageAppend(
      Seq((7L, 1L, 1L)).toDF("batch_id", "n_upserts", "n_deletes"),
      bm, col("batch_id"))
    val id = SnapshotTxn.newTxnId()
    SnapshotTxn.writePointers(Seq(dataSt, bmSt), id)
    SnapshotTxn.publishIntent(Seq(dataSt, bmSt), id)
    // writer dies; the REPLAY's own bookmark read heals both and skips
    val changes = Seq((2L, "U2", "insert", 1), (4L, "r4", "delete", 1))
      .toDF("k", "s", "_change_type", "_commit_version")
    assert(!SnapshotSource.applyCdcBatchTxn(spark, changes, dst, bm, 7L,
      "k", col("k")))
    assert(SnapshotLog.version(dst) === 1 && SnapshotLog.version(bm) === 0)
    val got = keys(dst)
    assert(got === Set(0L, 1L, 2L, 3L, 5L))
    assert(txnFiles(dst).isEmpty && txnFiles(bm).isEmpty)
  }

  test("transactional apply, pre-intent crash: the replay applies cleanly") {
    import graft.streaming.SnapshotSource
    val dst = tmp("appa"); val bm = tmp("appb")
    SnapshotLog.reset(dst); SnapshotLog.reset(bm)
    SnapshotLog.append(rows(5), dst, col("k"))
    import spark.implicits._
    val ups = Seq((1L, "U1")).toDF("k", "s")
    val dels = spark.emptyDataset[Tuple1[Long]].toDF("k")
    val Some(dataSt) = SnapshotLog.stageApplyMorKeys(spark, ups, dels,
      dst, Seq("k"), col("k"))
    val bmSt = SnapshotLog.stageAppend(
      Seq((3L, 1L, 0L)).toDF("batch_id", "n_upserts", "n_deletes"),
      bm, col("batch_id"))
    SnapshotTxn.writePointers(Seq(dataSt, bmSt), SnapshotTxn.newTxnId())
    // no intent: nothing ever lands; the replay applies for real
    val changes = Seq((1L, "U1", "insert", 1))
      .toDF("k", "s", "_change_type", "_commit_version")
    assert(SnapshotSource.applyCdcBatchTxn(spark, changes, dst, bm, 3L,
      "k", col("k")))
    assert(SnapshotLog.version(dst) === 1 && SnapshotLog.version(bm) === 0)
    val got = SnapshotLog.readAsOf(spark, dst, 1).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("s")).toMap
    assert(got === Map(0L -> "r0", 1L -> "U1", 2L -> "r2", 3L -> "r3",
      4L -> "r4"))
  }

  test("continuous txn tail: WAL replay after a crash is a version-exact skip") {
    import graft.streaming.SnapshotSource
    val src = tmp("cta"); val dst = tmp("ctb"); val bm = tmp("ctc")
    val ck = Files.createTempDirectory("graft-txn-ck").toString
    SnapshotLog.reset(src); SnapshotLog.reset(dst); SnapshotLog.reset(bm)
    SnapshotLog.append(rows(8), src, col("k"))
    import spark.implicits._
    SnapshotLog.deleteMorKeysMulti(spark, src, Seq(Tuple1(2L)).toDF("k"),
      Seq("k"))
    val ids = SnapshotSource.applyChangesTxnKeys(spark, src, ck, dst, bm,
      Seq("k"), col("k"), maxVersionsPerTrigger = 1)
    assert(ids === Seq(0L, 1L))
    val (vDst, vBm) = (SnapshotLog.version(dst), SnapshotLog.version(bm))
    assert(keys(dst) === (0L until 8L).toSet - 2L)
    // crash: the sink body ran but the checkpoint's commit marker for
    // the last batch never landed — the WAL must REPLAY it, and the
    // bookmark must turn the replay into a version-exact skip
    Files.delete(Paths.get(ck, "commits", "1"))
    val replay = SnapshotSource.applyChangesTxnKeys(spark, src, ck, dst,
      bm, Seq("k"), col("k"), maxVersionsPerTrigger = 1)
    assert(replay === Seq(1L))
    assert(SnapshotLog.version(dst) === vDst)
    assert(SnapshotLog.version(bm) === vBm)
    assert(keys(dst) === (0L until 8L).toSet - 2L)
  }

  test("facade: snapshotMoveKeys relocates a key cohort") {
    val a = tmp("gmva"); val b = tmp("gmvb")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    SnapshotLog.append(rows(8), a, col("k"))
    import spark.implicits._
    val eng = new GraftEngine(spark, "/root/testdata/sf0.001")
    val (va, vb) = eng.snapshotMoveKeys(a, b, Seq(1L, 6L).toDF("k"),
      Seq("k"), col("k"))
    assert((va, vb) === ((1, 0)))
    assert(keys(a) === Set(0L, 2L, 3L, 4L, 5L, 7L))
    assert(keys(b) === Set(1L, 6L))
  }

  test("facade: snapshotAppendTogether commits N frames atomically") {
    val a = tmp("ga"); val b = tmp("gb")
    SnapshotLog.reset(a); SnapshotLog.reset(b)
    val eng = new GraftEngine(spark, "/root/testdata/sf0.001")
    val vs = eng.snapshotAppendTogether(Seq(
      (rows(3), a, col("k")), (rows(4, from = 10), b, col("k"))))
    assert(vs === Map(a -> 0, b -> 0))
    assert(keys(a) === (0L until 3L).toSet)
    assert(keys(b) === (10L until 14L).toSet)
    assert(txnFiles(a).isEmpty && txnFiles(b).isEmpty)
  }

  test("three tables, one commit point; duplicate participants refused") {
    val dirs = Seq(tmp("t1"), tmp("t2"), tmp("t3"))
    dirs.foreach(SnapshotLog.reset(_))
    val staged = dirs.zipWithIndex.map { case (d, i) =>
      SnapshotLog.stageAppend(rows(3, from = i * 10), d, col("k"))
    }
    SnapshotTxn.commitTogether(staged)
    dirs.zipWithIndex.foreach { case (d, i) =>
      assert(keys(d) === (i * 10L until i * 10L + 3L).toSet)
      assert(txnFiles(d).isEmpty)
    }
    val dup = Seq(
      SnapshotLog.stageAppend(rows(1, from = 100), dirs.head, col("k")),
      SnapshotLog.stageAppend(rows(1, from = 200), dirs.head, col("k")))
    intercept[IllegalArgumentException] {
      SnapshotTxn.commitTogether(dup)
    }
  }
}
