package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps.Event

/** Stream-stream interval join: purchases attributed to the click that
  * preceded them within 30 minutes — watermarks on both sides bound
  * the join state, the core pattern of streaming attribution at scale.
  */
class StreamJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked stream-stream join attributes purchases to recent clicks") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]

    val c = clicks.toDF()
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val p = purchases.toDF()
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")

    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("click_id"))

    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 01:00:00"), 7, "click", 1.0),
        Event(3, ts("2024-01-01 00:05:00"), 8, "click", 1.0))
      purchases.addData(
        Event(10, ts("2024-01-01 00:10:00"), 7, "purchase", 9.0), // ← click 1
        Event(11, ts("2024-01-01 01:20:00"), 7, "purchase", 9.0), // ← click 2
        Event(12, ts("2024-01-01 02:00:00"), 8, "purchase", 9.0)) // click 3 too old
      q.processAllAvailable()
      val got = spark.table("attributed").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(got === Set(10L -> 1L, 11L -> 2L))
    } finally q.stop()
  }
}
