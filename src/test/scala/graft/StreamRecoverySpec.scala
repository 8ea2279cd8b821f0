package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.streaming.StreamOps

/** Checkpoint-recovery proof for the streaming surface: windowed state
  * written in run 1 must survive a query restart and flush correctly
  * in run 2 — the behavior a MemoryStream smoke test can't show.
  */
class StreamRecoverySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("windowed aggregation state survives a checkpointed restart") {
    val root = Files.createTempDirectory("graft-stream")
    val src = root.resolve("src"); Files.createDirectories(src)
    val ckpt = root.resolve("ckpt").toString
    val sink = root.resolve("sink").toString

    def writeFile(name: String, rows: Seq[String]): Unit =
      Files.writeString(src.resolve(name), rows.mkString("\n"))

    def run(): Unit = {
      val stream = spark.readStream.schema(schema).json(src.toString)
      val q = StreamOps.tumblingCounts(stream, "1 hour", "0 seconds")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    // run 1: three hour-0 events + one hour-1 event (advances watermark
    // past nothing yet — hour-0 window still open state at shutdown)
    writeFile("f1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01 00:05:00","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01 00:25:00","user_id":2,"event_type":"view","value":2.0}""",
      """{"event_id":3,"ts":"2024-01-01 00:45:00","user_id":1,"event_type":"click","value":3.0}""",
      """{"event_id":4,"ts":"2024-01-01 01:10:00","user_id":3,"event_type":"view","value":4.0}"""))
    run()

    // run 2: an hour-2 event advances the watermark past hour-0 AND
    // hour-1; those windows flush from RECOVERED state
    writeFile("f2.json", Seq(
      """{"event_id":5,"ts":"2024-01-01 02:15:00","user_id":1,"event_type":"click","value":5.0}"""))
    run()

    val out = spark.read.parquet(sink)
      .select(col("window_start").cast("string").as("w"), col("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hour-0 count=3 proves run-1 state survived the restart: file f1
    // was committed in run 1 and never re-read in run 2
    assert(out.get("2024-01-01 00:00:00") === Some(3L))
    assert(out.get("2024-01-01 01:00:00") === Some(1L))
  }

  test("snapshot sink: a checkpoint restart replays the in-doubt batch exactly once") {
    import graft.ext.SnapshotLog
    val root = Files.createTempDirectory("graft-stream-snap")
    val src = root.resolve("src"); Files.createDirectories(src)
    val ckpt = root.resolve("ckpt")
    val logDir = root.resolve("log").toString

    def writeFile(name: String, rows: Seq[String]): Unit =
      Files.writeString(src.resolve(name), rows.mkString("\n"))
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).json(src.toString)
      val q = StreamOps.snapshotSinkStream(
          stream.select(col("event_id"), col("user_id"), col("value")),
          logDir, "event_id")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    writeFile("f1.json", (1L to 3L).map(i =>
      s"""{"event_id":$i,"ts":"2024-01-01 00:0$i:00","user_id":$i,"event_type":"click","value":$i.0}"""))
    runOnce()
    val vRun1 = SnapshotLog.version(logDir)
    assert(vRun1 >= 0)
    assert(SnapshotLog.readAsOf(spark, logDir, vRun1).count() === 3L)
    val batchesRun1 = SnapshotLog.committedBatches(logDir)

    // the crash window: the sink committed its batch to the LOG, but
    // the engine died before writing the checkpoint's commits/<N>
    // marker — on restart Structured Streaming re-executes batch N
    // with the same offsets and batchId. Drop the newest commit marker
    // to reproduce exactly that topology.
    val commitsDir = ckpt.resolve("commits")
    val newest = Files.list(commitsDir).toArray.map(_.toString)
      .map(java.nio.file.Paths.get(_))
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toInt)
    Files.delete(newest)
    // the local-FS checkpoint writes a CRC sidecar per marker; a stale
    // one blocks the replayed batch's re-write of the same marker
    Files.deleteIfExists(
      commitsDir.resolve(s".${newest.getFileName.toString}.crc"))

    writeFile("f2.json", (4L to 5L).map(i =>
      s"""{"event_id":$i,"ts":"2024-01-01 01:0$i:00","user_id":$i,"event_type":"click","value":$i.0}"""))
    runOnce()

    // the replayed batch hit the log's batch-id gate (checked against
    // the MANIFEST, not local state — correct across restarts): no
    // duplicate rows, and the new batch landed exactly once
    val vEnd = SnapshotLog.version(logDir)
    val all = SnapshotLog.readAsOf(spark, logDir, vEnd)
    assert(all.count() === 5L, "replayed batch double-landed or new batch lost")
    assert(all.select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
      === (1L to 5L))
    val batchesEnd = SnapshotLog.committedBatches(logDir)
    assert(batchesRun1.subsetOf(batchesEnd))
    assert(batchesEnd.size === batchesRun1.size + 1,
      s"expected exactly one new batch id: $batchesRun1 -> $batchesEnd")
    // history: every version is still a readable snapshot (one per
    // landed batch — the replay added NO version)
    (0 to vEnd).foreach { v =>
      assert(SnapshotLog.readAsOf(spark, logDir, v).count() > 0L)
    }
  }

  test("snapshot source: a checkpoint restart replays the in-doubt batch exactly once") {
    import graft.ext.SnapshotLog
    import graft.streaming.SnapshotSource
    // the full lakehouse loop: a REAL streaming query lands events in
    // log A (snapshotSinkStream, proven above), and the round-15
    // SOURCE tails A into log B (mirror). The crash topology is the
    // source-side twin of the sink test: the mirror processed a batch
    // (B committed it), then died before the SOURCE checkpoint's
    // commits/<N> marker landed — the restart replays the same version
    // range under the same batch id and B's manifest-checked batch
    // gate must skip it.
    val root = Files.createTempDirectory("graft-source-recovery")
    val src = root.resolve("src"); Files.createDirectories(src)
    val ckpt = root.resolve("ckpt")
    val logA = root.resolve("logA").toString
    val logB = root.resolve("logB").toString
    val srcCk = root.resolve("srcCk").toString
    SnapshotLog.reset(logB, checkpointInterval = 3)

    def writeFile(name: String, rows: Seq[String]): Unit =
      Files.writeString(src.resolve(name), rows.mkString("\n"))
    def runSinkOnce(): Unit = {
      val stream = spark.readStream.schema(schema).json(src.toString)
      val q = StreamOps.snapshotSinkStream(
          stream.select(col("event_id"), col("user_id"), col("value")),
          logA, "event_id")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    writeFile("f1.json", (1L to 3L).map(i =>
      s"""{"event_id":$i,"ts":"2024-01-01 00:0$i:00","user_id":$i,"event_type":"click","value":$i.0}"""))
    runSinkOnce()
    assert(SnapshotSource.mirror(spark, logA, srcCk, logB, "event_id")
      === Seq(0L))
    assert(SnapshotLog.readAsOf(spark, logB, SnapshotLog.version(logB))
      .count() === 3L)

    // the crash window: drop the source checkpoint's newest commit
    // marker — batch 0 is now planned-but-uncommitted, exactly the
    // state a crash between the sink body and commitBatch leaves
    val commits = java.nio.file.Paths.get(srcCk, "commits")
    val newest = Files.list(commits).toArray.map(_.toString)
      .map(java.nio.file.Paths.get(_))
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toInt)
    Files.delete(newest)

    writeFile("f2.json", (4L to 5L).map(i =>
      s"""{"event_id":$i,"ts":"2024-01-01 01:0$i:00","user_id":$i,"event_type":"click","value":$i.0}"""))
    runSinkOnce()
    // restart: batch 0 REPLAYS (same id, same range — B's gate skips
    // it), then the new batch 1 lands exactly once
    assert(SnapshotSource.mirror(spark, logA, srcCk, logB, "event_id")
      === Seq(0L, 1L))

    val vB = SnapshotLog.version(logB)
    assert(vB === 1, "replay must not add a B version")
    val all = SnapshotLog.readAsOf(spark, logB, vB)
    assert(all.count() === 5L, "replayed batch double-landed or new batch lost")
    assert(all.select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
      === (1L to 5L))
    // B's content is exactly A's — the mirror contract
    val aRows = SnapshotLog.readAsOf(spark, logA, SnapshotLog.version(logA))
      .collect().map(_.toString).sorted.toSeq
    assert(all.collect().map(_.toString).sorted.toSeq === aRows)
  }
}
