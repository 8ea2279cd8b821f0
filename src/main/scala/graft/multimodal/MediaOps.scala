package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, processed batch-wise with
  * mapPartitions (the JVM analog of pandas-UDF/mapInPandas batching —
  * one iterator per partition, amortized setup, no per-row driver
  * involvement).
  *
  * Two tiers of codec:
  *
  *  - **Real codecs where the JDK ships them** (no external libs in
  *    this container, but `javax.imageio` — PNG/JPEG/BMP/GIF — and
  *    `javax.sound.sampled` — WAV/PCM — are part of every JDK):
  *    `encodePng`/`decodeImages` and `encodeWav`/`decodeAudio` below
  *    run REAL byte-level codec round trips on executors. PNG and
  *    WAV-PCM are lossless, so the q152/q153 oracle queries can
  *    hash-check the decoded pixels/headers against a closed-form
  *    DuckDB twin.
  *  - **Stub where the JDK has no codec** (video containers):
  *    `decodeStub`/`sampleFrames` keep the deterministic stand-in so
  *    the explode/batch plumbing stays testable; swapping the stub for
  *    a JNI/javacv decoder changes one function.
  */
object MediaOps {

  /** Output row of the decode stage. */
  final case class DecodedImage(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      features: Array[Float])

  /** STUB — deterministic fake decode. A real implementation would
    * hand `bytes` to an image codec; this derives stable pseudo
    * dimensions and a 8-dim "embedding" from the content so tests can
    * assert exact values. Marked stub per the container's no-codec
    * constraint.
    */
  def decodeStub(docId: Long, bytes: Array[Byte]): DecodedImage = {
    var h = 1125899906842597L // FNV-ish rolling hash over content
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val w = 64 + math.floorMod(h, 1216).toInt
    val ht = 64 + math.floorMod(h >> 11, 656).toInt
    val feats = Array.tabulate(8)(j =>
      (math.floorMod(h >> (j * 7), 1000) / 1000.0f))
    DecodedImage(docId, bytes.length, w, ht, feats)
  }

  /** Batched decode over a binary column: (doc_id, content binary) →
    * typed DecodedImage rows. mapPartitions keeps the iterator lazy
    * (spill-safe) and lets a real decoder reuse per-partition codec
    * state — identical in shape to mapInPandas batches.
    */
  def decodeImages(df: DataFrame): Dataset[DecodedImage] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decodeStub(id, bytes) } }
  }

  /** "Resize": recompute metadata for a target box, preserving aspect
    * ratio — pure column arithmetic once decode has run (no second
    * pass over the bytes).
    */
  def resizeMeta(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0))
    decoded.withColumn("out_width",
        greatest(round(col("width") * scale, 0), lit(1)).cast("int"))
      .withColumn("out_height",
        greatest(round(col("height") * scale, 0), lit(1)).cast("int"))
  }

  /** Frame sampling for "video" content: emit every k-th frame index
    * up to a deterministic pseudo frame count — the explode shape of a
    * real frame sampler, with the decoder stubbed.
    */
  def sampleFrames(df: DataFrame, everyK: Int = 10): DataFrame =
    df.select(col("doc_id").cast("long"),
      (pmod(xxhash64(col("content")), lit(241L)) + lit(30)).cast("int").as("n_frames"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"))

  // ------------------------------------------------------------------
  // REAL image codec path (javax.imageio — ships in every JDK).
  // ------------------------------------------------------------------

  /** Decoded-image row: exact pixel statistics from a REAL decoder.
    * `px_sum` is the integer sum of the 8-bit luminance
    * ((r + 2g + b) / 4, the power-of-two luma approximation — EXACTLY
    * the gray value when r = g = b, so the closed-form gray-fixture
    * oracles hold bit-for-bit, while a real color image fed through
    * the facade gets a genuine luma instead of one channel) and
    * `px_wsum` its position-weighted twin (weight 1 + x + w·y) — both
    * exact Longs, safe to hash-compare against a closed-form oracle,
    * and together a content fingerprint of the decoded pixels
    * (collision-probed: 0 accidental collisions at 50k images).
    * `ahash` is the classic 64-bit average-hash perceptual
    * fingerprint: 8×8 block means thresholded at the global mean,
    * MSB-first; Hamming distance on it is the standard image near-dup
    * metric. `features` is the 64-dim block-mean vector (the aHash
    * pre-image), usable as a cheap visual embedding.
    */
  final case class ImageInfo(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      px_sum: Long,
      px_wsum: Long,
      ahash: Long,
      features: Array[Float])

  /** Deterministic gray pixel pattern:
    * g(x,y) = (x²·7 + y²·13 + (x+y)·s1 + x·y·s2) % 256.
    * The two seed multipliers (callers derive s1/s2 from disjoint
    * prime moduli of a content hash) give distinct seeds distinct
    * images — the naive single-seed `(…+seed)%256` pattern collapsed
    * to seed%256 and produced thousands of accidental identical
    * images at 5k docs.
    */
  def synthPixel(x: Int, y: Int, s1: Long, s2: Long): Int =
    ((x.toLong * x * 7 + y.toLong * y * 13 + (x + y) * s1 + x.toLong * y * s2) % 256).toInt

  /** Within-block x-reflection on the aHash floor grid (pixel x →
    * block x*8/w; span [xs, xe]): maps x to xs + xe - x. A PERCEPTUAL
    * perturbation with an exact algebraic property: every 8×8 block
    * keeps its pixel MULTISET (reflection permutes within the span),
    * so block means, the global mean, `px_sum`, and therefore the
    * whole aHash are preserved BIT-FOR-BIT — while pixel POSITIONS
    * change, so `px_wsum` and the exact decoded-pixel fingerprint
    * (q154) diverge. The planted near-identical twin q159 needs:
    * invisible to exact dedup, Hamming-0 to the perceptual hash.
    */
  def mirrorX(x: Int, w: Int): Int = {
    val bx = x * 8 / w
    val xs = (bx * w + 7) / 8
    val xe = ((bx + 1) * w + 7) / 8 - 1
    xs + xe - x
  }

  /** Deterministic gray image encoded with a REAL JDK codec ("png" or
    * "bmp"; both lossless for TYPE_INT_RGB). The fixture parquet holds
    * no genuine image bytes (TESTDATA.md), so image queries SYNTHESIZE
    * bytes from fixture columns on executors and round-trip them
    * through the real codec — the decode side exercises exactly the
    * code path real scraped images would take, and losslessness makes
    * the pixel statistics oracle-checkable in closed form.
    */
  def synthImage(width: Int, height: Int, s1: Long, s2: Long,
      format: String): Array[Byte] =
    synthImage(width, height, s1, s2, format, mirror = false)

  /** `mirror = true` samples the pattern at the block-reflected x
    * (`mirrorX`) — the q159 planted near-identical twin: same blocks,
    * different pixel layout, then through the REAL codec like any
    * other image.
    */
  def synthImage(width: Int, height: Int, s1: Long, s2: Long,
      format: String, mirror: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val sx = if (mirror) mirrorX(x, width) else x
        val g = synthPixel(sx, y, s1, s2)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for format $format")
    bos.toByteArray
  }

  /** Real decode of one image (any ImageIO format: PNG/JPEG/BMP/GIF).
    * One pass over the pixels accumulates the exact gray sums and the
    * 8×8 block sums for aHash/features; block edges use the floor-grid
    * (pixel p → block p*8/dim) so every pixel lands in exactly one
    * block at any dimension.
    */
  def decodeImage(docId: Long, bytes: Array[Byte]): ImageInfo = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image bytes for doc $docId")
    val w = img.getWidth
    val h = img.getHeight
    val blockSum = new Array[Long](64)
    val blockN = new Array[Long](64)
    var sum = 0L
    var wsum = 0L
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        // luma (r + 2g + b) / 4: = gray for r=g=b inputs (oracle-exact),
        // a real weighted luminance for color inputs
        val g = (((rgb >> 16) & 0xff) + 2 * ((rgb >> 8) & 0xff) + (rgb & 0xff)) >> 2
        sum += g
        wsum += g.toLong * (1L + x + w.toLong * y)
        val b = by * 8 + x * 8 / w
        blockSum(b) += g
        blockN(b) += 1
        x += 1
      }
      y += 1
    }
    val feats = new Array[Float](64)
    var i = 0
    while (i < 64) {
      feats(i) = if (blockN(i) == 0) 0f
        else (blockSum(i).toDouble / blockN(i) / 255.0).toFloat
      i += 1
    }
    val mean = sum.toDouble / (w.toLong * h) / 255.0
    var hash = 0L
    i = 0
    while (i < 64) {
      if (feats(i) > mean) hash |= (1L << (63 - i))
      i += 1
    }
    ImageInfo(docId, bytes.length, w, h, sum, wsum, hash, feats)
  }

  /** Batched real decode: (doc_id, content binary) → ImageInfo rows.
    * mapPartitions (not per-row UDF) so a real deployment can hoist
    * per-partition codec state (ImageIO reader instances, scratch
    * buffers) out of the row loop — the same batch shape as
    * mapInPandas.
    */
  def decodeImagesReal(df: DataFrame): Dataset[ImageInfo] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => decodeImage(id, bytes) }
      }
  }

  /** One decode attempt: `info` populated on success, `err` on
    * failure — never both. The tolerant-path row shape (see
    * `decodeImagesTolerant`).
    */
  final case class ImageAttempt(
      doc_id: Long,
      err: Option[String],
      info: Option[ImageInfo])

  /** Corrupt-input-TOLERANT batched decode — the posture a scraped
    * 100 TB corpus actually requires: `decodeImagesReal` fails the
    * whole job on the first undecodable byte string (correct for the
    * oracle fixtures, where a decode failure IS a bug; fatal in
    * production, where some fraction of any crawl is truncated or
    * mislabeled). Same single mapPartitions pass, but each row's
    * decode is caught: successes carry `info`, failures carry a
    * truncated `err` and flow to a quarantine sink instead of killing
    * the stage. Split the result with `err.isNull` — no second decode
    * pass, no driver involvement.
    */
  def decodeImagesTolerant(df: DataFrame): Dataset[ImageAttempt] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try ImageAttempt(id, None, Some(decodeImage(id, bytes)))
          catch { case scala.util.control.NonFatal(e) =>
            ImageAttempt(id, Some(
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"),
              None)
          }
        }
      }
  }

  /** Tolerant twin of one WAV decode (see `decodeImagesTolerant`). */
  final case class AudioAttempt(
      doc_id: Long,
      err: Option[String],
      info: Option[AudioInfo])

  def decodeAudioTolerant(df: DataFrame): Dataset[AudioAttempt] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try AudioAttempt(id, None, Some(decodeWav(id, bytes)))
          catch { case scala.util.control.NonFatal(e) =>
            AudioAttempt(id, Some(
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"),
              None)
          }
        }
      }
  }

  /** Batched real encode: (doc_id, width, height, s1, s2, format) →
    * image bytes via the JDK codec named per row. The synthesis side
    * of the q152/q154 codec round trips.
    */
  def encodeImages(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("width").cast("int"),
        col("height").cast("int"), col("s1").cast("long"),
        col("s2").cast("long"), col("format").cast("string"))
      .as[(Long, Int, Int, Long, Long, String)]
      .mapPartitions { it =>
        it.map { case (id, w, h, s1, s2, fmt) =>
          (id, fmt, synthImage(w, h, s1, s2, fmt))
        }
      }
      .toDF("doc_id", "format", "content")
  }

  /** encodeImages with a per-row `mirror` flag (boolean column): the
    * q159 synthesis side — mirrored rows carry the block-reflected
    * twin of the same pattern.
    */
  def encodeImagesFlagged(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("width").cast("int"),
        col("height").cast("int"), col("s1").cast("long"),
        col("s2").cast("long"), col("format").cast("string"),
        col("mirror").cast("boolean"))
      .as[(Long, Int, Int, Long, Long, String, Boolean)]
      .mapPartitions { it =>
        it.map { case (id, w, h, s1, s2, fmt, mir) =>
          (id, fmt, synthImage(w, h, s1, s2, fmt, mir))
        }
      }
      .toDF("doc_id", "format", "content")
  }

  // ------------------------------------------------------------------
  // REAL audio codec path (javax.sound.sampled — ships in every JDK).
  // ------------------------------------------------------------------

  /** Decoded-audio row from a REAL WAV parse: format fields come from
    * the RIFF header, `n_frames`/`peak`/`sq_sum` from reading the PCM
    * stream back (16-bit little-endian mono). `sq_sum` (integer sum of
    * squared samples) is the exact fixed-point carrier for RMS —
    * distributed double summation would be order-sensitive.
    */
  final case class AudioInfo(
      doc_id: Long,
      n_bytes: Int,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_frames: Long,
      peak: Int,
      sq_sum: Long)

  /** Deterministic mono 16-bit PCM sine WAV, written by the JDK's real
    * RIFF/WAVE encoder (canonical 44-byte header + 2·n bytes of PCM —
    * probed, not assumed; Q153's oracle checks the size).
    */
  def synthWav(nSamples: Int, freqHz: Double, sampleRate: Float = 8000f,
      amplitude: Int = 12000): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = math.round(amplitude *
        math.sin(2 * math.Pi * freqHz * i / sampleRate)).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real WAV decode of one clip: header via AudioSystem, then the PCM
    * payload re-read sample by sample.
    */
  def decodeWav(docId: Long, bytes: Array[Byte]): AudioInfo = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
      s"doc $docId: unsupported WAV layout $f")
    val data = ais.readAllBytes()
    var peak = 0
    var sqSum = 0L
    var i = 0
    while (i + 1 < data.length) {
      val v = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toInt
      val a = math.abs(v)
      if (a > peak) peak = a
      sqSum += v.toLong * v
      i += 2
    }
    AudioInfo(docId, bytes.length, f.getSampleRate.toInt, f.getChannels,
      f.getSampleSizeInBits, ais.getFrameLength, peak, sqSum)
  }

  /** Batched real WAV encode: (doc_id, n_samples, freq_hz) → bytes. */
  def encodeWav(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("n_samples").cast("int"),
        col("freq_hz").cast("double"))
      .as[(Long, Int, Double)]
      .mapPartitions { it =>
        it.map { case (id, n, fr) => (id, synthWav(n, fr)) }
      }
      .toDF("doc_id", "content")
  }

  /** Batched real WAV decode: (doc_id, content binary) → AudioInfo. */
  def decodeAudioReal(df: DataFrame): Dataset[AudioInfo] = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => decodeWav(id, bytes) }
      }
  }

  // ------------------------------------------------------------------
  // Round 9: integer-exact audio (windowed energy) + real pixel resize.
  // ------------------------------------------------------------------

  /** Deterministic sawtooth sample: v(i) = ((i·k) mod 2048) − 1024.
    * Pure integer arithmetic — unlike the sine synth (whose
    * round(sin·A) is not oracle-portable across libm implementations,
    * the q153 lesson), every sample and therefore every windowed
    * energy is recomputable EXACTLY by a SQL twin.
    */
  def sawSample(i: Long, k: Long): Int = ((i * k) % 2048 - 1024).toInt

  /** Deterministic mono 16-bit PCM sawtooth WAV through the real JDK
    * RIFF/WAVE encoder — the integer-exact sibling of `synthWav`.
    */
  def synthWavSaw(nSamples: Int, k: Long,
      sampleRate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = sawSample(i.toLong, k).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Batched real sawtooth-WAV encode: (doc_id, n_samples, k) → bytes. */
  def encodeWavSaw(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col("doc_id").cast("long"), col("n_samples").cast("int"),
        col("k").cast("long"))
      .as[(Long, Int, Long)]
      .mapPartitions { it =>
        it.map { case (id, n, k) => (id, synthWavSaw(n, k)) }
      }
      .toDF("doc_id", "content")
  }

  /** Per-window audio features from a REAL WAV parse: the PCM stream
    * splits into fixed `win`-sample frames (last window ragged) and
    * each accumulates an exact integer energy (sum of squared
    * samples) and peak — the frame-level feature extraction (VAD,
    * loudness contours, silence trimming) a 100 TB audio corpus runs.
    * All Longs: no float summation anywhere, so a SQL twin can
    * recompute every window bit-for-bit from the synth formula.
    */
  final case class AudioWindow(
      doc_id: Long,
      win_idx: Int,
      n_samples: Int,
      energy: Long,
      peak: Int)

  /** Batched real WAV decode → exploded per-window rows. One codec
    * parse per clip; windows emit from the same pass (an iterator
    * flatMap — no second read of the bytes).
    */
  def decodeAudioWindows(df: DataFrame, win: Int): Dataset[AudioWindow] = {
    import df.sparkSession.implicits._
    require(win > 0, "window must be positive")
    df.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val f = ais.getFormat
          require(f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
            !f.isBigEndian, s"doc $id: unsupported WAV layout $f")
          val data = ais.readAllBytes()
          val n = data.length / 2
          val out = scala.collection.mutable.ArrayBuffer.empty[AudioWindow]
          var w = 0
          while (w * win < n) {
            val lo = w * win
            val hi = math.min(lo + win, n)
            var energy = 0L
            var peak = 0
            var i = lo
            while (i < hi) {
              val v = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
              val a = math.abs(v)
              if (a > peak) peak = a
              energy += v.toLong * v
              i += 1
            }
            out += AudioWindow(id, w, hi - lo, energy, peak)
            w += 1
          }
          out
        }
      }
  }

  /** Real-decode + nearest-neighbor k×k thumbnail in one pass: the
    * floor-grid sample maps thumb cell (i, j) to source pixel
    * (i·w/k, j·h/k) — the classic NN downsample, fully deterministic
    * (no filtering kernel, no float resample), so a closed-form twin
    * can reproduce the thumbnail bytes exactly. `t_sum`/`t_wsum` are
    * the thumbnail's exact luma checksums (the q152 fingerprint idiom
    * applied to the k×k grid).
    */
  final case class ThumbInfo(
      doc_id: Long,
      width: Int,
      height: Int,
      t_sum: Long,
      t_wsum: Long)

  def decodeThumbs(df: DataFrame, k: Int): Dataset[ThumbInfo] = {
    import df.sparkSession.implicits._
    require(k > 0, "thumbnail size must be positive")
    df.select(col("doc_id").cast("long"), col("content").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image bytes for doc $id")
          val w = img.getWidth
          val h = img.getHeight
          var tSum = 0L
          var tWsum = 0L
          var j = 0
          while (j < k) {
            val sy = j * h / k
            var i = 0
            while (i < k) {
              val sx = i * w / k
              val rgb = img.getRGB(sx, sy)
              val g = (((rgb >> 16) & 0xff) + 2 * ((rgb >> 8) & 0xff) +
                (rgb & 0xff)) >> 2
              tSum += g
              tWsum += g.toLong * (1L + i + k.toLong * j)
              i += 1
            }
            j += 1
          }
          ThumbInfo(id, w, h, tSum, tWsum)
        }
      }
  }
}
