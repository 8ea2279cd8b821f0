package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaOps

/** Multimodal plumbing: binary columns through the batched
  * mapPartitions decode path, resize arithmetic, frame sampling.
  */
class MediaOpsSpec extends SparkSpec {

  private def media = Tables.load(spark, sfDir, "documents")
    .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))

  test("batched decode: deterministic metadata + fixed-width features") {
    val d = MediaOps.decodeImages(media).cache()
    assert(d.count() === 500)
    val r = d.filter(col("doc_id") === 0).collect().head
    assert(r.n_bytes > 0)
    assert(r.width >= 64 && r.width < 1280)
    assert(r.height >= 64 && r.height < 720)
    assert(r.features.length === 8)
    assert(r.features.forall(f => f >= 0f && f < 1f))
    // decode is a pure function of the bytes → stable across runs
    val again = MediaOps.decodeImages(media)
      .filter(col("doc_id") === 0).collect().head
    assert(again.width === r.width && again.features.toSeq === r.features.toSeq)
  }

  test("resize preserves aspect ratio and never upscales") {
    val d = MediaOps.resizeMeta(MediaOps.decodeImages(media).toDF(), 128, 128)
    val bad = d.filter(col("out_width") > 128 || col("out_height") > 128 ||
      col("out_width") > col("width") || col("out_height") > col("height"))
    assert(bad.count() === 0)
    // aspect ratio within integer-rounding slack: half a pixel per dim
    val drift = d.withColumn("r1", col("width").cast("double") / col("height"))
      .withColumn("r2", col("out_width").cast("double") / col("out_height"))
      .withColumn("tol",
        lit(0.5) / col("out_width") + lit(0.5) / col("out_height") + lit(0.01))
      .filter(abs(col("r1") - col("r2")) / col("r1") > col("tol"))
    assert(drift.count() === 0)
  }

  test("frame sampling explodes every k-th frame") {
    val f = MediaOps.sampleFrames(media, everyK = 10)
    val perDoc = f.groupBy("doc_id", "n_frames")
      .agg(count(lit(1)).as("n"), max("frame_idx").as("maxi")).collect()
    perDoc.foreach { r =>
      val nFrames = r.getAs[Int]("n_frames")
      assert(r.getAs[Long]("n") === (nFrames + 9) / 10)
      assert(r.getAs[Int]("maxi") < nFrames)
    }
  }

  test("tolerant decode quarantines corrupt rows instead of failing the job") {
    import spark.implicits._
    // a real PNG, a truncated PNG, and garbage bytes in one batch —
    // the strict path dies on the first bad row; the tolerant path
    // must decode the good row identically and tag the bad ones
    val good = MediaOps.synthImage(16, 12, 3L, 5L, "png")
    val rows = Seq(
      (1L, good),
      (2L, good.take(10)),            // truncated header
      (3L, Array.fill[Byte](64)(7))   // not an image at all
    ).toDF("doc_id", "content")
    intercept[org.apache.spark.SparkException] {
      MediaOps.decodeImagesReal(rows).collect()
    }
    val got = MediaOps.decodeImagesTolerant(rows).collect()
      .map(a => a.doc_id -> a).toMap
    assert(got.size === 3)
    val ok = got(1L)
    assert(ok.err.isEmpty && ok.info.nonEmpty)
    val expect = MediaOps.decodeImage(1L, good)
    assert(ok.info.get.px_sum === expect.px_sum &&
      ok.info.get.ahash === expect.ahash)
    Seq(2L, 3L).foreach { id =>
      assert(got(id).info.isEmpty && got(id).err.exists(_.nonEmpty),
        s"doc $id must be quarantined with an error: ${got(id)}")
    }

    // audio twin: one good WAV, one truncated — same contract
    val wav = MediaOps.synthWavSaw(256, 37L)
    val arows = Seq((1L, wav), (2L, wav.take(11))).toDF("doc_id", "content")
    val agot = MediaOps.decodeAudioTolerant(arows).collect()
      .map(a => a.doc_id -> a).toMap
    assert(agot(1L).err.isEmpty &&
      agot(1L).info.get.sq_sum === MediaOps.decodeWav(1L, wav).sq_sum)
    assert(agot(2L).info.isEmpty && agot(2L).err.exists(_.nonEmpty))
  }
}
