package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Structured Streaming surface driven through MemoryStream: the
  * tumbling-window agg and the stateful sessionizer.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window counts over a memory stream") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamOps.tumblingCounts(input.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:50:00"), 1, "view", 2.0),
        Event(3, ts("2024-01-01 01:10:00"), 2, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling").collect()
        .map(r => r.getAs[Timestamp]("window_start").toString -> r.getAs[Long]("cnt"))
        .toMap
      assert(rows("2024-01-01 00:00:00.0") === 2)
      assert(rows("2024-01-01 01:00:00.0") === 1)
    } finally q.stop()
  }

  test("streaming split assignment matches the batch assignment exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // split is a pure function of doc_id (TextOps.splitFor), so a doc
    // arriving on a stream must land in the same split a batch backfill
    // would put it in — the leakage-free property under incremental ingest.
    val input = MemoryStream[StreamOps.Doc]
    val q = input.toDF()
      .withColumn("split", graft.queries.TextOps.splitFor(col("doc_id")))
      .writeStream.format("memory").queryName("split_stream")
      .outputMode("append").start()
    try {
      val docs = (1L to 40L).map(i => StreamOps.Doc(i, ts("2024-01-01 00:00:00"), s"d$i"))
      input.addData(docs.take(20): _*)
      q.processAllAvailable()
      input.addData(docs.drop(20): _*)
      q.processAllAvailable()
      val streamed = spark.table("split_stream")
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = docs.toDF()
        .withColumn("split", graft.queries.TextOps.splitFor(col("doc_id")))
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed === batch)
      assert(streamed.values.toSet.subsetOf(Set("train", "val", "test")))
    } finally q.stop()
  }

  test("streaming funnel verdicts match the batch cascade exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val input = MemoryStream[StreamOps.Doc]
    val q = StreamOps.funnelStream(
        input.toDF().withColumn("lang", lit("en")))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      val texts = Seq(
        "short one",                                          // too_short
        ("the " * 20).trim,                                   // high_stop
        Seq.tabulate(20)(i => s"1234$i!!").mkString(" "),     // low_alpha
        ("the quick brown fox jumps over lazy dogs again " * 3).trim) // kept
      val docs = texts.zipWithIndex.map { case (t, i) =>
        StreamOps.Doc(i.toLong, ts("2024-01-01 00:00:00"), t)
      }
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("funnel_stream")
        .select("doc_id", "verdict").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = docs.toDF().withColumn("lang", lit("en"))
        .withColumn("verdict",
          graft.queries.TextOps.funnelVerdict(col("text"), col("lang")))
        .select("doc_id", "verdict").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed === batch)
      assert(streamed(0L) === "too_short")
      assert(streamed(3L) === "kept")
    } finally q.stop()
  }

  test("streaming Gopher gate matches the batch q144 battery exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // real fixture documents, so the equality covers the full metric
    // battery (bullet/ellipsis lines, dup fractions), not toy strings
    val fixture = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").limit(50).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[StreamOps.Doc]
    val q = StreamOps.gopherGateStream(input.toDF())
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try {
      val docs = fixture.map { case (id, text) =>
        StreamOps.Doc(id, ts("2024-01-01 00:00:00"), text)
      }
      input.addData(docs.take(25).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(docs.drop(25).toIndexedSeq: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        r.getLong(0) -> r.toSeq.drop(1)
      val streamed = spark.table("gopher_stream").collect().map(key).toMap
      // batch twin = the registered q144 projection on the same docs
      val batch = Registry.byName("q144_gopher_rules").fn(spark, sfDir)
        .filter(col("doc_id").isin(fixture.map(_._1).toSeq: _*))
        .collect().map(key).toMap
      assert(streamed === batch)
      assert(streamed.size === 50)
      // the gate must discriminate on real data in both modes
      val gates = streamed.values.map(_.last).toSet
      assert(gates === Set(true, false))
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dim and keeps unmatched rows") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "trial")).toDF("user_id", "segment")
    val q = StreamOps.enrichStream(input.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:20:00"), 2, "view", 2.0),
        Event(3, ts("2024-01-01 00:30:00"), 99, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("segment")).toMap
      assert(rows === Map(1L -> "gold", 2L -> "trial", 3L -> null))
    } finally q.stop()
    // the static side must hash-broadcast, not shuffle the stream:
    // assert on the equivalent batch plan (same join, same hint)
    val batchPlan = StreamOps.enrichStream(
      Seq(Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0)).toDS().toDF(),
      dim).queryExecution.executedPlan.toString
    assert(batchPlan.contains("BroadcastHashJoin"), batchPlan)
  }

  test("stream-stream interval join attributes clicks to views and bounds state") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = StreamOps.joinStreams(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      views.addData(Event(10, ts("2024-01-01 00:10:00"), 1, "view", 0.0))
      clicks.addData(
        Event(20, ts("2024-01-01 00:40:00"), 1, "click", 1.0), // in window
        Event(21, ts("2024-01-01 02:30:00"), 1, "click", 1.0), // too late
        Event(22, ts("2024-01-01 00:30:00"), 2, "click", 1.0)) // other user
      q.processAllAvailable()
      val rows = spark.table("attributed")
        .select("view_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet === Set((10L, 20L)))
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates, keeps distinct docs") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamOps.Doc]
    val q = StreamOps.dedupStream(input.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        StreamOps.Doc(1, ts("2024-01-01 00:00:00"), "the same text"),
        StreamOps.Doc(2, ts("2024-01-01 00:05:00"), "THE SAME   text".replace("   ", " ")),
        StreamOps.Doc(3, ts("2024-01-01 00:10:00"), "a different text"))
      q.processAllAvailable()
      // one survivor per digest: normalization folds case, so docs 1+2
      // collapse; doc 3 survives separately
      val ids = spark.table("dedup_stream").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids.contains(3L))
      assert((ids & Set(1L, 2L)).size === 1)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits exactly the closed sessions") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamOps.sessionizeClosed(input.toDS())
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:10:00"), 7, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("closed_sessions").count() === 0) // still open
      // 40-min gap closes the first session; a later event stays open
      input.addData(
        Event(3, ts("2024-01-01 00:50:00"), 7, "click", 1.0),
        Event(4, ts("2024-01-01 00:55:00"), 7, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("closed_sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("n_events"),
          r.getAs[Long]("end_s") - r.getAs[Long]("start_s")))
      assert(rows.toSeq === Seq((7L, 2, 600L)))
    } finally q.stop()
  }

  test("stateful sessionization with inactivity gap") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamOps.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:10:00"), 7, "view", 1.0))
      q.processAllAvailable()
      // second batch: 40 min later → new session (gap > 30 min)
      input.addData(Event(3, ts("2024-01-01 00:50:00"), 7, "click", 1.0))
      q.processAllAvailable()
      val upd = spark.table("sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("n_events")))
      assert(upd.contains((7L, 2)))  // first batch: 2 events in session
      assert(upd.last === ((7L, 1))) // gap reset the in-session count
    } finally q.stop()
  }

  test("foreachBatch manifest sink writes per-batch accounting partitions") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    val out = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    val docs = MemoryStream[StreamOps.Doc]
    val q = StreamOps.manifestSink(
      docs.toDF().withColumn("source",
        concat(lit("src"), (col("doc_id") % 2).cast("string"))), out).start()
    try {
      docs.addData(
        StreamOps.Doc(1, ts("2024-01-01 00:00:01"), "a b c"),
        StreamOps.Doc(2, ts("2024-01-01 00:00:02"), "d e"))
      q.processAllAvailable()
      docs.addData(StreamOps.Doc(3, ts("2024-01-01 00:00:03"), "f g h i"))
      q.processAllAvailable()
      val m = spark.read.parquet(out)
        .selectExpr("cast(batch_id as long) AS bid", "source", "n_docs", "n_tokens")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      // batch 0: doc1→src1 (3 toks), doc2→src0 (2); batch 1: doc3→src1 (4)
      assert(m === Set((0L, "src1", 1L, 3L), (0L, "src0", 1L, 2L),
        (1L, "src1", 1L, 4L)))
    } finally q.stop()
  }

  test("streaming index ingest encodes like batch and replays idempotently") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val index = graft.ext.IvfPq.build(spark, e, dim = 64, kCells = 4, kCodes = 8)
    try {
      val newVecs = e.limit(20).collect().map(r => StreamOps.Vec(
        r.getAs[Long]("vec_id") + 1000000L,
        r.getAs[scala.collection.Seq[Float]]("embedding").toSeq)).toSeq
      val root = java.nio.file.Files.createTempDirectory("graft-ingest")
      val ingest = root.resolve("ingest").toString
      val input = MemoryStream[StreamOps.Vec]
      val q = StreamOps.indexIngestStream(index, input.toDF(), ingest)
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .start()
      try {
        input.addData(newVecs.take(10)); q.processAllAvailable()
        input.addData(newVecs.drop(10)); q.processAllAvailable()
      } finally q.stop()

      def codesIn(path: String) = spark.read.parquet(path)
        .select(col("vec_id"), col("cell"), col("codes")).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
          r.getAs[scala.collection.Seq[Int]]("codes").toList)).toSet

      // stream-encoded codes must equal a batch encode of the same rows
      // through the same standing quantizers
      val expect = graft.ext.IvfPq.encode(index, newVecs.toDF()).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
          r.getAs[scala.collection.Seq[Int]]("codes").toList)).toSet
      assert(codesIn(ingest) === expect)
      assert(expect.map(_._1) === newVecs.map(_.vec_id).toSet)

      // a replayed micro-batch (same batchId after checkpoint recovery)
      // overwrites its own batch_id partition instead of double-counting
      graft.ext.IvfPq.encode(index, newVecs.take(10).toDF())
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$ingest/batch_id=0")
      assert(codesIn(ingest) === expect)
    } finally index.close()
  }

  test("streaming kNN refresh matches the batch incremental kernel exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // new vectors COPY existing embeddings (ids shifted), so each lands
    // in an occupied bucket and must surface with a cosine-1 neighbor
    val newVecs = corpus.limit(5).collect().map(r => StreamOps.Vec(
      r.getAs[Long]("vec_id") + 1000000L,
      r.getAs[scala.collection.Seq[Float]]("embedding").toSeq)).toSeq
    val root = java.nio.file.Files.createTempDirectory("graft-knnref")
    val out = root.resolve("refresh").toString
    val input = MemoryStream[StreamOps.Vec]
    val q = StreamOps.knnRefreshStream(input.toDF(), corpus, out)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    try { input.addData(newVecs); q.processAllAvailable() } finally q.stop()

    def lists(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("cos_r"), r.getAs[Int]("rn"))).toSet
    val streamed = lists(spark.read.parquet(s"$out/batch_id=0"))
    // stream ≡ batch through the factored kernel
    val expect = lists(StreamOps.knnRefreshBatch(newVecs.toDF(), corpus))
    assert(streamed === expect)
    assert(streamed.nonEmpty)
    // every arriving vector got a fresh list, and its rank-1 neighbor
    // is its embedding's original at cosine 1
    newVecs.foreach { v =>
      val top = streamed.filter(t => t._1 == v.vec_id && t._4 == 1)
      assert(top.size === 1, s"vec ${v.vec_id} has no refreshed list")
      assert(top.head._3 === 1.0,
        s"vec ${v.vec_id}'s rank-1 neighbor is not its cosine-1 twin")
    }
    // standing vectors in touched buckets see the newcomer too: the
    // copied-from originals now rank their twin at cosine 1
    val originals = newVecs.map(_.vec_id - 1000000L).toSet
    originals.foreach { o =>
      assert(streamed.exists(t => t._1 == o && t._3 == 1.0),
        s"original $o's list was not refreshed with its twin")
    }
  }

  test("streaming REAL-codec image decode matches the batch decode exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.multimodal.MediaOps
    // real PNG/BMP bytes, synthesized once, fed both ways
    val params = (0L until 40L).map { i =>
      (i, 16 + (i % 13).toInt * 3, 16 + (i % 7).toInt * 4,
        i % 251, (i * 7) % 241, if (i % 2 == 0) "png" else "bmp")
    }
    val media = MediaOps.encodeImages(
        params.toDF("doc_id", "width", "height", "s1", "s2", "format"))
      .select("doc_id", "content").as[(Long, Array[Byte])].collect()
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.decodeImageStream(
        input.toDF().toDF("doc_id", "content"))
      .writeStream.format("memory").queryName("decode_stream")
      .outputMode("append").start()
    try {
      input.addData(media.take(20).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(media.drop(20).toIndexedSeq: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        r.getLong(0) -> r.toSeq.drop(1).map {
          case a: scala.collection.Seq[_] => a.toVector
          case x => x
        }
      val streamed = spark.table("decode_stream").collect().map(key).toMap
      val batch = MediaOps.decodeImagesReal(
          media.toSeq.toDF("doc_id", "content"))
        .toDF().collect().map(key).toMap
      assert(streamed === batch)
      assert(streamed.size === 40)
      // decodes are real: widths recovered from the actual containers
      val widths = spark.table("decode_stream")
        .select(col("doc_id"), col("width")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      params.foreach { case (id, w, _, _, _, _) => assert(widths(id) === w) }
    } finally q.stop()
  }

  test("streaming windowed audio energy matches the batch windows exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.multimodal.MediaOps
    // real WAV bytes (integer sawtooth — q161's waveform), fed both ways
    val params = (0L until 30L).map(i => (i, 300 + (i % 11).toInt * 90, 3 + i % 97))
    val media = MediaOps.encodeWavSaw(
        params.toDF("doc_id", "n_samples", "k"))
      .select("doc_id", "content").as[(Long, Array[Byte])].collect()
    val input = MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.audioWindowStream(
        input.toDF().toDF("doc_id", "content"), 256)
      .writeStream.format("memory").queryName("audio_stream")
      .outputMode("append").start()
    try {
      input.addData(media.take(15).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(media.drop(15).toIndexedSeq: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getLong(3), r.getInt(4))
      val streamed = spark.table("audio_stream").collect().map(key).toMap
      val batch = MediaOps.decodeAudioWindows(
          media.toSeq.toDF("doc_id", "content"), 256)
        .toDF().collect().map(key).toMap
      assert(streamed === batch)
      // window fan-out happened: more windows than clips
      assert(streamed.size > 30)
    } finally q.stop()
  }

  test("streaming as-of through the native exec equals the batch join") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    // dimension history pinned at a SnapshotLog version
    val dimDir = java.nio.file.Files.createTempDirectory("asof-dim").toString
    graft.ext.SnapshotLog.reset(dimDir)
    val dim = Seq((1L, t0, 10L), (1L, t0 + 1200, 11L), (2L, t0 + 300, 20L))
      .toDF("user_id", "rt", "rid")
    graft.ext.SnapshotLog.append(dim, dimDir, col("rt"))
    val outDir = java.nio.file.Files.createTempDirectory("asof-out").toString

    val input = MemoryStream[Event]
    val left = input.toDF().select(col("user_id"),
      col("event_id").as("pid"), unix_timestamp(col("ts")).as("p_ts"))
    val q = StreamOps.asofSnapshotStream(left, dimDir, dimVersion = 0,
      keys = Seq("user_id"), leftTimeCol = "p_ts", rightTimeCol = "rt",
      outDir = outDir, rightTiebreakCols = Seq("rid")).start()
    val events = Seq(
      Event(1, ts("2024-01-01 00:10:00"), 1, "purchase", 1.0), // → rid 10
      Event(2, ts("2024-01-01 00:30:00"), 1, "purchase", 1.0), // → rid 11
      Event(3, ts("2024-01-01 00:04:00"), 2, "purchase", 1.0), // before dim → null
      Event(4, ts("2024-01-01 00:30:00"), 3, "purchase", 1.0)) // no dim user → null
    try {
      input.addData(events.take(2): _*)
      q.processAllAvailable()
      input.addData(events.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("pid"), if (r.isNullAt(r.fieldIndex("rid"))) -1L
        else r.getAs[Long]("rid"))
    // two micro-batches landed under batch_id partitions; their union
    // must equal the batch-mode kernel over the same inputs
    val streamed = spark.read.parquet(outDir)
      .select(col("pid"), col("rid")).collect().map(key).toSet
    val batchLeft = events.toDF().select(col("user_id"),
      col("event_id").as("pid"), unix_timestamp(col("ts")).as("p_ts"))
    val batch = StreamOps.asofEnrichBatch(batchLeft, dimDir, 0,
        Seq("user_id"), "p_ts", "rt", Seq("rid"), None,
        org.apache.spark.sql.graft.AsOfJoinApi.Backward)
      .select(col("pid"), col("rid")).collect().map(key).toSet
    assert(streamed === batch)
    assert(streamed === Set((1L, 10L), (2L, 11L), (3L, -1L), (4L, -1L)))
  }

  test("streaming SCD2 enrichment recovers each event's own point-in-time tier") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the dimension: q168's SCD2 build over the fixture events
    val dim = Registry.byName("q168_scd2_tiers").fn(spark, sfDir)
    // stream a deterministic slice of the same events back through
    val evRows = Tables.load(spark, sfDir, "events")
      .filter(col("event_id") % 5 === 0)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[StreamOps.Event].collect().toSeq
    val input = MemoryStream[StreamOps.Event]
    val q = StreamOps.scd2EnrichStream(input.toDF(), dim)
      .writeStream.format("memory").queryName("scd2_enrich").start()
    try {
      input.addData(evRows)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("scd2_enrich")
      .select(col("event_id"), col("pit_tier"), col("value")).collect()
    assert(got.length === evRows.length)
    // point-in-time property: every event's enriched tier IS the tier
    // its own value maps to (it fell inside the version it opened or
    // extended), and exactly one version matched (no row fan-out)
    got.foreach { r =>
      val v = r.getDouble(2)
      val expect = if (v < 50) "low" else if (v < 200) "mid" else "high"
      assert(r.getString(1) === expect, s"event ${r.getLong(0)}")
    }
    // stream ≡ batch: the same kernel over the same rows
    val batch = graft.queries.EventOps.pointInTimeJoin(
        Tables.load(spark, sfDir, "events")
          .filter(col("event_id") % 5 === 0)
          .withColumn("sec",
            org.apache.spark.sql.functions.floor(col("ts").cast("double"))
              .cast("long")), dim)
      .select(col("event_id"), col("pit_tier")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.map(r => r.getLong(0) -> r.getString(1)).toMap === batch)
  }

  test("streaming snapshot sink commits one version per batch, replays skip") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.ext.SnapshotLog
    val dir = java.nio.file.Files.createTempDirectory("graft-snapstream").toString
    SnapshotLog.reset(dir)
    val input = MemoryStream[StreamOps.Doc]
    val q = StreamOps.snapshotSinkStream(
      input.toDF().withColumn("t", org.apache.spark.sql.functions.col("doc_id")),
      dir, "t").start()
    try {
      input.addData(
        StreamOps.Doc(1, ts("2024-01-01 00:00:01"), "a"),
        StreamOps.Doc(2, ts("2024-01-01 00:00:02"), "b"))
      q.processAllAvailable()
      input.addData(StreamOps.Doc(3, ts("2024-01-01 00:00:03"), "c"))
      q.processAllAvailable()
    } finally q.stop()
    // one snapshot per micro-batch, each historically readable
    assert(SnapshotLog.version(dir) === 1)
    assert(SnapshotLog.readAsOf(spark, dir, 0).count() === 2)
    assert(SnapshotLog.readAsOf(spark, dir, 1).count() === 3)
    assert(SnapshotLog.committedBatches(dir) === Set(0L, 1L))
    // checkpoint-recovery replay: the SAME batchId through the REAL
    // gate must not commit a duplicate snapshot
    val replay = Seq(StreamOps.Doc(3, ts("2024-01-01 00:00:03"), "c"))
      .toDF().withColumn("t", org.apache.spark.sql.functions.col("doc_id"))
    StreamOps.snapshotCommitBatch(replay, dir, "t", batchId = 1L)
    assert(SnapshotLog.version(dir) === 1)
    // a genuinely new batch still lands
    StreamOps.snapshotCommitBatch(replay, dir, "t", batchId = 2L)
    assert(SnapshotLog.version(dir) === 2)
    assert(SnapshotLog.readAsOf(spark, dir, 2).count() === 4)
  }
}
