package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaOps

/** REAL-codec multimodal path (q152–q154): the JDK's own image
  * (javax.imageio) and audio (javax.sound.sampled) codecs, run as
  * batched mapPartitions on executors. These tests pin the kernel
  * semantics the DuckDB oracles can't see — perceptual-hash behavior,
  * lossy-JPEG tolerance, PCM peak/RMS — plus cross-codec pixel
  * identity, the property q154's dedup rests on.
  */
class MediaCodecSpec extends SparkSpec {

  private def closedFormSums(w: Int, h: Int, s1: Long, s2: Long): (Long, Long) = {
    var sum = 0L; var wsum = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val g = MediaOps.synthPixel(x, y, s1, s2)
      sum += g; wsum += g.toLong * (1L + x + w.toLong * y)
    }
    (sum, wsum)
  }

  test("PNG round trip is pixel-exact: decoded sums equal closed form") {
    val bytes = MediaOps.synthImage(37, 29, 117L, 203L, "png")
    val info = MediaOps.decodeImage(7L, bytes)
    val (sum, wsum) = closedFormSums(37, 29, 117L, 203L)
    assert(info.width === 37 && info.height === 29)
    assert(info.px_sum === sum && info.px_wsum === wsum)
    assert(info.n_bytes === bytes.length && bytes.length > 0)
  }

  test("BMP decodes to the SAME pixels as PNG — q154's cross-format axiom") {
    val png = MediaOps.decodeImage(1L, MediaOps.synthImage(41, 23, 88L, 15L, "png"))
    val bmp = MediaOps.decodeImage(2L, MediaOps.synthImage(41, 23, 88L, 15L, "bmp"))
    assert(png.px_sum === bmp.px_sum && png.px_wsum === bmp.px_wsum)
    assert(png.ahash === bmp.ahash)
    assert(png.features.toSeq === bmp.features.toSeq)
    // different containers really produced different bytes
    assert(png.n_bytes !== bmp.n_bytes)
  }

  test("JPEG (lossy, real codec) preserves dims and approximate content") {
    val jpg = MediaOps.decodeImage(3L, MediaOps.synthImage(48, 32, 50L, 60L, "jpg"))
    val ref = MediaOps.decodeImage(4L, MediaOps.synthImage(48, 32, 50L, 60L, "png"))
    assert(jpg.width === 48 && jpg.height === 32)
    // mean gray within a few percent of the lossless reference
    val mJ = jpg.px_sum.toDouble / (48 * 32)
    val mP = ref.px_sum.toDouble / (48 * 32)
    assert(math.abs(mJ - mP) < 8.0, s"jpeg mean drifted: $mJ vs $mP")
  }

  test("aHash: identical images collide; a quadrant blackout moves few-but-some bits") {
    val a = MediaOps.decodeImage(1L, MediaOps.synthImage(64, 48, 9L, 31L, "png"))
    val b = MediaOps.decodeImage(2L, MediaOps.synthImage(64, 48, 9L, 31L, "bmp"))
    assert(a.ahash === b.ahash)
    // black out the top-left 16x12 quadrant -> only its blocks flip
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MediaOps.synthImage(64, 48, 9L, 31L, "png")))
    for (y <- 0 until 12; x <- 0 until 16) img.setRGB(x, y, 0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val c = MediaOps.decodeImage(3L, bos.toByteArray)
    // the 4 blacked-out blocks flip toward 0, and the lowered global
    // mean can flip borderline blocks elsewhere — aHash changes must be
    // real but stay well under half the bits (random images differ ~32)
    val d = java.lang.Long.bitCount(a.ahash ^ c.ahash)
    assert(d > 0 && d < 28, s"expected a bounded ahash change, got $d bits")
  }

  test("WAV round trip: header fields, frame count, exact peak and RMS carrier") {
    val n = 1234
    val bytes = MediaOps.synthWav(n, 440.0)
    assert(bytes.length === 44 + 2 * n) // canonical RIFF header - q153's oracle
    val info = MediaOps.decodeWav(5L, bytes)
    assert(info.sample_rate === 8000 && info.channels === 1 && info.bits === 16)
    assert(info.n_frames === n)
    // recompute peak/sq_sum directly from the synthesis formula
    var peak = 0; var sq = 0L
    for (i <- 0 until n) {
      val v = math.round(12000 * math.sin(2 * math.Pi * 440.0 * i / 8000.0)).toInt
      peak = math.max(peak, math.abs(v)); sq += v.toLong * v
    }
    assert(info.peak === peak && info.sq_sum === sq)
    // RMS of a full-cycle-count sine ~ amplitude/sqrt(2) within 1%
    val rms = math.sqrt(info.sq_sum.toDouble / info.n_frames)
    assert(math.abs(rms - 12000 / math.sqrt(2)) < 120)
  }

  test("plan shapes: codec stages are narrow; q154 shuffles once; q155 broadcasts its matrix") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
    staticPlan {
      // q152: synth -> encode -> decode -> project is one narrow chain;
      // the ONLY exchange is the final ORDER BY's range partitioning
      val p152 = Registry.byName("q152_image_codec").fn(spark, sfDir)
        .queryExecution.executedPlan
      val ex152 = p152.collect { case e: ShuffleExchangeExec => e }
      assert(ex152.length === 1 &&
        ex152.head.outputPartitioning.isInstanceOf[RangePartitioning],
        s"q152 expected exactly one range exchange, got: $ex152")
      // q154: decode chain + ONE hash shuffle (fingerprint groupBy) +
      // the final sort — never a pairwise join
      val p154 = Registry.byName("q154_cross_format_dup").fn(spark, sfDir)
        .queryExecution.executedPlan
      val ex154 = p154.collect { case e: ShuffleExchangeExec => e.outputPartitioning }
      assert(ex154.count(_.isInstanceOf[HashPartitioning]) === 1 &&
        ex154.count(_.isInstanceOf[RangePartitioning]) === 1,
        s"q154 expected one hash + one range exchange, got: $ex154")
      // q155: the 1024-row Rademacher matrix joins the exploded corpus
      // as a BROADCAST hash join — the matrix must never shuffle the
      // corpus side
      val p155 = Registry.byName("q155_rand_projection").fn(spark, sfDir)
        .queryExecution.executedPlan
      assert(p155.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        "q155's projection-matrix join is not broadcast")
    }
  }

  test("q154 finds the fixture's cross-format families; q152/q153 dims are in contract") {
    val fam = Registry.byName("q154_cross_format_dup").fn(spark, sfDir).cache()
    try {
      assert(fam.count() === 19) // prefix-dup families at sf0.001
      assert(fam.filter(col("n_formats") === 2).count() === 9)
      // family members genuinely share the decoded image
      assert(fam.filter(col("n_docs") < 2).count() === 0)
      val img = Registry.byName("q152_image_codec").fn(spark, sfDir)
      val bad = img.filter(col("width") < 16 || col("width") >= 64 ||
        col("height") < 16 || col("height") >= 48 ||
        col("px_sum") <= 0 || col("px_sum") >= col("width") * col("height") * 255)
      assert(bad.count() === 0)
      val au = Registry.byName("q153_audio_codec").fn(spark, sfDir)
      assert(au.filter(col("n_bytes") !== lit(44) + col("n_frames") * 2).count() === 0)
    } finally fam.unpersist()
  }

  test("q159: planted block-mirror twin — aHash preserved bit-for-bit, exact fingerprint broken, bands find it") {
    // codec-level check of the perturbation's algebra: the mirrored
    // twin keeps every 8×8 block's pixel MULTISET, so px_sum and the
    // whole aHash survive exactly, while px_wsum (pixel positions —
    // the q154 exact fingerprint) diverges
    val a = MediaOps.decodeImage(1L, MediaOps.synthImage(37, 23, 17L, 29L, "png"))
    val b = MediaOps.decodeImage(2L,
      MediaOps.synthImage(37, 23, 17L, 29L, "png", mirror = true))
    assert(a.ahash === b.ahash)
    assert(a.px_sum === b.px_sum)
    assert(a.px_wsum !== b.px_wsum)
    assert(a.features.toSeq === b.features.toSeq)
    // end-to-end: the fixture's cross-parity family members (even =
    // base, odd = mirrored twin) surface as PERCEPTUAL-ONLY pairs —
    // hamming 0, same_pixels 0 — exactly the pairs q154's exact
    // fingerprint groupBy is blind to; same-parity members stay exact
    val pairs = Registry.byName("q159_phash_neardup").fn(spark, sfDir).cache()
    try {
      assert(pairs.filter(col("same_pixels") === 0 && col("hamming") === 0)
        .count() > 0, "no perceptual-only planted pair found")
      assert(pairs.filter(col("same_pixels") === 1).count() > 0)
      // the banding guarantee: every emitted pair is within threshold
      // (<= 3 differing bits always leave one of 4 bands exact)
      assert(pairs.filter(col("hamming") > 3).count() === 0)
    } finally pairs.unpersist()
  }

  test("q160: NN thumbnail samples exactly the floor-grid source pixels") {
    val w = 37; val h = 29; val s1 = 117L; val s2 = 203L
    val bytes = MediaOps.synthImage(w, h, s1, s2, "png")
    val ti = MediaOps.decodeThumbs(
      spark.createDataFrame(Seq((7L, bytes))).toDF("doc_id", "content"), 8)
      .collect().head
    var tSum = 0L; var tWsum = 0L
    for (j <- 0 until 8; i <- 0 until 8) {
      val g = MediaOps.synthPixel(i * w / 8, j * h / 8, s1, s2)
      tSum += g; tWsum += g.toLong * (1L + i + 8L * j)
    }
    assert(ti.width === w && ti.height === h)
    assert(ti.t_sum === tSum && ti.t_wsum === tWsum)
    // thumbnails of the SAME image are identical across containers —
    // the resize sees decoded pixels, not bytes
    val bmp = MediaOps.decodeThumbs(
      spark.createDataFrame(Seq((8L, MediaOps.synthImage(w, h, s1, s2, "bmp"))))
        .toDF("doc_id", "content"), 8).collect().head
    assert(bmp.t_sum === ti.t_sum && bmp.t_wsum === ti.t_wsum)
  }

  test("q161: audio windows PARTITION the clip — energies sum to the clip's sq_sum") {
    val n = 1000; val k = 37L
    val bytes = MediaOps.synthWavSaw(n, k)
    val whole = MediaOps.decodeWav(5L, bytes)
    val wins = MediaOps.decodeAudioWindows(
      spark.createDataFrame(Seq((5L, bytes))).toDF("doc_id", "content"), 256)
      .collect().sortBy(_.win_idx)
    assert(wins.length === (n + 255) / 256)
    assert(wins.map(_.energy).sum === whole.sq_sum)
    assert(wins.map(_.n_samples).sum === n)
    assert(wins.map(_.peak).max === whole.peak)
    // sawtooth samples are integer-exact: window 0's energy equals the
    // closed form the q161 oracle recomputes
    val e0 = (0 until 256).map { i =>
      val v = ((i * k) % 2048 - 1024); v * v
    }.sum
    assert(wins.head.energy === e0)
  }
}
