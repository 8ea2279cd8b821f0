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
}
