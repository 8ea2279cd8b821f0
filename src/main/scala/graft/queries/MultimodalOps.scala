package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.multimodal.MediaOps

/** REAL-codec multimodal queries (round 8): the container ships no
  * external media libraries, but the JDK itself carries real codecs —
  * `javax.imageio` (PNG/JPEG/BMP/GIF) and `javax.sound.sampled`
  * (RIFF/WAVE PCM). These queries round-trip real bytes through those
  * codecs ON EXECUTORS (batched mapPartitions, the mapInPandas shape),
  * upgrading the multimodal story from "deterministic stub" (q53,
  * which remains as the no-codec plumbing baseline) to "real encoder →
  * real decoder → exact pixel/PCM statistics".
  *
  * Because the fixture parquet has no genuine image/audio bytes
  * (TESTDATA.md), the bytes are SYNTHESIZED from fixture columns with
  * closed-form content — and because PNG, BMP and WAV-PCM are
  * lossless, a DuckDB twin can recompute the decoded statistics in
  * closed form: the oracle hash only matches if the real codec round
  * trip preserved every pixel/sample. Scale shape: encode and decode
  * are narrow per-row stages (no shuffle); only the final per-doc
  * project (q152/q153) or fingerprint groupBy (q154) exchanges data.
  *
  * Reference anchor: the reference app treats media as opaque blobs
  * next to typed metadata; these queries are the engine-side decode /
  * feature-extract path a 100 TB multimodal corpus needs
  * (SURVEY.md "multimodal columns" north star).
  */
object MultimodalOps {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private def shufflePartitions(s: SparkSession): Int =
    s.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** 24-bit content hash from the first 6 hex digits of
    * md5(first 100 chars of text) — the q53 hex→int idiom, identical
    * in Spark and DuckDB so both engines derive the same per-doc image
    * parameters. Keyed on the document HEAD (not the full text) so the
    * fixture's near-dup families — same head, perturbed tails, zero
    * EXACT text dups at sf0.01 — share an image, modeling the common
    * scrape reality of one picture attached to lightly-edited copies
    * of a page; q154's cross-format families exist because of this.
    */
  private def hv =
    conv(substring(md5(substring(col("text"), 1, 100)), 1, 6), 16, 10).cast("long")

  /** DuckDB twin of `hv` (no hex→int builtin there: positional
    * instr over the hex alphabet, as proven by q53).
    */
  private val hvSql: String = {
    def digit(i: Int, mult: String) =
      s"(instr('0123456789abcdef', substr(md5(substr(text,1,100)),$i,1))-1)$mult"
    "(" + digit(1, "*1048576") + " + " + digit(2, "*65536") + " + " +
      digit(3, "*4096") + " + " + digit(4, "*256") + " + " +
      digit(5, "*16") + " + " + digit(6, "") + ")"
  }

  /** Per-doc image parameters: dims in [16,64)×[16,48), two seed
    * multipliers over disjoint prime moduli of the content hash (the
    * collision-probed design — see MediaOps.synthPixel).
    */
  private def imageParams(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("hv", hv)
      .select(col("doc_id"),
        expr("CAST(16 + hv % 48 AS INT)").as("width"),
        expr("CAST(16 + (hv div 48) % 32 AS INT)").as("height"),
        expr("hv % 251").as("s1"),
        expr("(hv div 251) % 241").as("s2"))

  /** Shared SQL prefix: per-doc closed-form pixel statistics. The
    * `g` grid join (i < width) replaces a lateral range — 64×64 max
    * dims keep it a few-million-row nested loop at sf0.01.
    */
  private val pxSql: String =
    s"WITH h AS (SELECT doc_id, $hvSql AS hv FROM documents), " +
      "dims AS (SELECT doc_id, CAST(16 + hv % 48 AS INT) AS width, " +
      "CAST(16 + (hv // 48) % 32 AS INT) AS height, " +
      "hv % 251 AS s1, (hv // 251) % 241 AS s2 FROM h), " +
      "g AS (SELECT i FROM range(0, 64) t(i)), " +
      "px AS (SELECT d.doc_id, d.width, d.height, " +
      "SUM((x.i*x.i*7 + y.i*y.i*13 + (x.i+y.i)*d.s1 + x.i*y.i*d.s2) % 256) AS px_sum, " +
      "SUM(((x.i*x.i*7 + y.i*y.i*13 + (x.i+y.i)*d.s1 + x.i*y.i*d.s2) % 256) " +
      "* (1 + x.i + d.width*y.i)) AS px_wsum " +
      "FROM dims d JOIN g x ON x.i < d.width JOIN g y ON y.i < d.height " +
      "GROUP BY d.doc_id, d.width, d.height) "

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q152_image_codec",
      "REAL image-codec round trip on executors: per-doc deterministic gray images (dims + two prime-modulus seeds from md5(text)) are encoded with the JDK's real PNG writer and decoded with its real PNG reader (javax.imageio), one batched mapPartitions stage each, no shuffle until the final sort. Output is the decoded width/height and the exact integer pixel sums; the DuckDB oracle recomputes them in closed form, so the hash only matches if the real compress→decompress cycle preserved every pixel. The production shape for '100 TB of scraped images': opaque binary column in, typed features out, codec work embarrassingly parallel on executors.",
      (s, d) => {
        // range-partition on doc_id BEFORE the codec stage, then sort
        // within partitions: a final .orderBy would put the range
        // exchange ABOVE the narrow codec chain, and its sampling pass
        // re-executes that whole chain (no intermediate exchange to
        // resume from) — every image would be encoded+decoded TWICE.
        // This way the sampler scans only the cheap params and the
        // codecs run once; range partitions + in-partition sort is the
        // same total order. The partition count is EXPLICIT: the
        // params shuffle is a few bytes/row, so AQE would coalesce it
        // to ~1 partition and serialize the expensive codec stage
        // behind it (the cheap-bytes/expensive-compute trap; measured
        // 3x slower at 10x) — an explicit count pins the parallelism.
        val parts = imageParams(s, d).withColumn("format", lit("png"))
          .repartitionByRange(shufflePartitions(s), col("doc_id"))
        MediaOps.decodeImagesReal(MediaOps.encodeImages(parts)).toDF()
          .select(col("doc_id"), col("width"), col("height"),
            col("px_sum"), col("px_wsum"))
          .sortWithinPartitions(col("doc_id"))
      },
      Some(pxSql +
        "SELECT doc_id, width, height, CAST(px_sum AS BIGINT) AS px_sum, " +
        "CAST(px_wsum AS BIGINT) AS px_wsum FROM px ORDER BY doc_id")),

    GraftQuery(
      "q153_audio_codec",
      "REAL audio-codec round trip: per-doc 16-bit mono PCM sine clips (length from doc_id, frequency from n_chars) are written by the JDK's real RIFF/WAVE encoder and parsed back by its real WAV reader (javax.sound.sampled), batched mapPartitions on executors. Output is what the DECODER reports — container size, header fields (sample rate / channels / bit depth), and the frame count from reading the PCM payload back — and the oracle recomputes each in closed form (canonical WAV = 44-byte header + 2 bytes per sample), so a hash match proves the real encode→parse cycle is lossless and the header arithmetic exact. peak/RMS from the same parse are pinned by MediaCodecSpec (sin() rounding is not oracle-portable).",
      (s, d) => {
        // pre-codec range partition (explicit width — see q152's AQE
        // note) + in-partition sort: a post-codec orderBy's sampling
        // pass would synthesize and parse every WAV twice
        val clips = t(s, d, "documents")
          .select(col("doc_id"),
            (lit(800) + pmod(col("doc_id"), lit(1600L))).cast("int").as("n_samples"),
            (lit(100.0) + pmod(col("n_chars"), lit(900L)).cast("double")).as("freq_hz"))
          .repartitionByRange(shufflePartitions(s), col("doc_id"))
        MediaOps.decodeAudioReal(MediaOps.encodeWav(clips)).toDF()
          .select(col("doc_id"), col("n_bytes"), col("sample_rate"),
            col("channels"), col("bits"), col("n_frames"),
            (col("n_frames") * 125).as("duration_us"))
          .sortWithinPartitions(col("doc_id"))
      },
      Some("SELECT doc_id, " +
        "CAST(44 + 2*(800 + doc_id % 1600) AS INT) AS n_bytes, " +
        "CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels, " +
        "CAST(16 AS INT) AS bits, CAST(800 + doc_id % 1600 AS BIGINT) AS n_frames, " +
        "CAST((800 + doc_id % 1600) * 125 AS BIGINT) AS duration_us " +
        "FROM documents ORDER BY doc_id")),

    GraftQuery(
      "q154_cross_format_dup",
      "Cross-container image dedup over REAL decoded pixels: even docs encode as PNG, odd docs as BMP (two different real JDK codecs), then ALL bytes decode through one ImageIO path and dedup groups on the decoded-pixel fingerprint (width, height, px_sum, px_wsum — collision-probed unique per distinct image at 50k scale). Families with n_formats=2 are the pairs byte-level dedup (q40's md5-of-content) CAN'T see: same picture, different container bytes. This is the production argument for decode-then-dedup on a multimodal corpus. One decode pass, one fingerprint groupBy — no pairwise join anywhere. Oracle: DuckDB rebuilds the same families from the closed-form pixel sums, so the hash only matches if PNG-decode and BMP-decode of the same logical image produce IDENTICAL pixels.",
      (s, d) => {
        val withFmt = imageParams(s, d)
          .withColumn("format",
            when(pmod(col("doc_id"), lit(2)) === 0, lit("png")).otherwise(lit("bmp")))
        // n_formats as max(has_png)+max(has_bmp), not count_distinct:
        // the distinct-aggregate plan would add a second full shuffle
        // of the fingerprint table (expand + regroup) for a 2-value
        // domain — one hash exchange is the 100 TB shape, and
        // MediaCodecSpec pins it
        MediaOps.decodeImagesReal(MediaOps.encodeImages(withFmt)).toDF()
          .groupBy("width", "height", "px_sum", "px_wsum")
          .agg(count(lit(1)).as("n_docs"),
            (max(when(pmod(col("doc_id"), lit(2)) === 0, 1L).otherwise(0L)) +
              max(when(pmod(col("doc_id"), lit(2)) === 1, 1L).otherwise(0L))).as("n_formats"),
            min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .filter(col("n_docs") > 1)
          .orderBy(col("min_doc"))
      },
      Some(pxSql +
        "SELECT width, height, CAST(px_sum AS BIGINT) AS px_sum, " +
        "CAST(px_wsum AS BIGINT) AS px_wsum, " +
        "CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(count(DISTINCT CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END) AS BIGINT) AS n_formats, " +
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc " +
        "FROM px GROUP BY width, height, px_sum, px_wsum " +
        "HAVING count(*) > 1 ORDER BY min_doc"))
  )

  val queriesRound9: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q159_phash_neardup",
      "PERCEPTUAL image near-dup over the decoder's 64-bit aHash — the pairs q154's exact-pixel fingerprint CANNOT see: odd docs synthesize the within-block x-MIRRORED twin of their pattern (MediaOps.mirrorX — every 8x8 aHash block keeps its pixel multiset, so block means, global mean and therefore the aHash are preserved bit-for-bit while pixel positions, px_wsum and the exact fingerprint all diverge), everything round-trips the REAL PNG codec, and near-dups are found by the q42 LSH posture transplanted to image space: the 64-bit aHash splits into 4x16-bit bands, docs sharing ANY band become candidates (groupBy-scale, never all-pairs), and candidates verify on full Hamming distance <= 3 — a threshold the banding makes LOSSLESS by pigeonhole (3 differing bits touch at most 3 of 4 bands, so one band always matches exactly). Output pairs carry the Hamming distance and a same_pixels flag separating exact dups from the perceptual-only pairs that motivate the query. Oracle: DuckDB rebuilds pixels, block means, float-cast aHash bands, the band join and the Hamming verify in closed form — a hash match proves the real codec round trip, the JVM's float block arithmetic, and the band algebra all agree with the twin. Scale: one codec pass, band-key shuffles, candidate-volume-linear verify.",
      (s, d) => {
        val parts = imageParams(s, d)
          .withColumn("format", lit("png"))
          .withColumn("mirror", pmod(col("doc_id"), lit(2)) === 1)
          .repartitionByRange(shufflePartitions(s), col("doc_id"))
        val info = MediaOps
          .decodeImagesReal(MediaOps.encodeImagesFlagged(parts)).toDF()
          .select(col("doc_id"), col("width"), col("height"),
            col("px_sum"), col("px_wsum"), col("ahash"))
        val bands = info.select(col("doc_id"), col("width"), col("height"),
          col("px_sum"), col("px_wsum"), col("ahash"),
          explode(array((0 until 4).map { k =>
            struct(lit(k).as("band_idx"),
              shiftrightunsigned(col("ahash"), 48 - 16 * k)
                .bitwiseAND(lit(0xffffL)).as("band"))
          }: _*)).as("bd"))
          .select(col("doc_id"), col("width"), col("height"), col("px_sum"),
            col("px_wsum"), col("ahash"), col("bd.band_idx"), col("bd.band"))
        val a = bands.select(col("band_idx"), col("band"),
          col("doc_id").as("da"), col("ahash").as("ah_a"),
          col("px_sum").as("ps_a"), col("px_wsum").as("pw_a"),
          col("width").as("w_a"), col("height").as("h_a"))
        val b = bands.select(col("band_idx"), col("band"),
          col("doc_id").as("db"), col("ahash").as("ah_b"),
          col("px_sum").as("ps_b"), col("px_wsum").as("pw_b"),
          col("width").as("w_b"), col("height").as("h_b"))
        a.join(b, Seq("band_idx", "band")).filter(col("da") < col("db"))
          .select(col("da"), col("db"), col("ah_a"), col("ah_b"),
            col("ps_a"), col("ps_b"), col("pw_a"), col("pw_b"),
            col("w_a"), col("w_b"), col("h_a"), col("h_b"))
          .distinct() // a pair sharing 2+ bands collapses to one row
          .withColumn("hamming",
            expr("CAST(bit_count(ah_a ^ ah_b) AS INT)"))
          .filter(col("hamming") <= 3)
          .select(col("da"), col("db"), col("hamming"),
            when(col("ps_a") === col("ps_b") && col("pw_a") === col("pw_b")
              && col("w_a") === col("w_b") && col("h_a") === col("h_b"),
              1).otherwise(0).as("same_pixels"))
          .orderBy(col("da"), col("db"))
      },
      Some(s"WITH h AS (SELECT doc_id, $hvSql AS hv FROM documents), " +
        "dims AS (SELECT doc_id, CAST(16 + hv % 48 AS INT) AS width, " +
        "CAST(16 + (hv // 48) % 32 AS INT) AS height, " +
        "hv % 251 AS s1, (hv // 251) % 241 AS s2 FROM h), " +
        "g AS (SELECT i FROM range(0, 64) t(i)), " +
        // bx/xs/xe: the aHash floor-grid block of pixel x and its span;
        // odd docs sample the pattern at the reflected sx = xs + xe - x
        "p0 AS (SELECT d.doc_id, d.width, d.height, d.s1, d.s2, " +
        "x.i AS x, y.i AS y, x.i*8//d.width AS bx " +
        "FROM dims d JOIN g x ON x.i < d.width JOIN g y ON y.i < d.height), " +
        "p1 AS (SELECT doc_id, width, height, s1, s2, x, y, " +
        "CASE WHEN doc_id % 2 = 1 THEN " +
        "((bx*width + 7)//8) + (((bx+1)*width + 7)//8 - 1) - x " +
        "ELSE x END AS sx FROM p0), " +
        "v AS (SELECT doc_id, width, height, x, y, " +
        "(sx*sx*7 + y*y*13 + (sx+y)*s1 + sx*y*s2) % 256 AS v FROM p1), " +
        "agg AS (SELECT doc_id, width, height, SUM(v) AS px_sum, " +
        "SUM(v*(1 + x + width*y)) AS px_wsum " +
        "FROM v GROUP BY doc_id, width, height), " +
        "blk AS (SELECT doc_id, (y*8//height)*8 + (x*8//width) AS bi, " +
        "SUM(v) AS bs, COUNT(*) AS bn FROM v GROUP BY doc_id, bi), " +
        // float-cast block mean vs double global mean — the JVM's
        // exact comparison (feats are Float, the mean a Double)
        "fm AS (SELECT b.doc_id, b.bi, " +
        "CAST(b.bs/b.bn/255.0 AS FLOAT) AS feat, " +
        "a.px_sum/(a.width*a.height)/255.0 AS mean " +
        "FROM blk b JOIN agg a USING (doc_id)), " +
        "bits AS (SELECT doc_id, bi//16 AS band_idx, " +
        "CAST(SUM(CASE WHEN feat > mean THEN (1 << (15 - (bi % 16))) " +
        "ELSE 0 END) AS BIGINT) AS band FROM fm GROUP BY doc_id, bi//16), " +
        "pd AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db " +
        "FROM bits a JOIN bits b ON a.band_idx = b.band_idx " +
        "AND a.band = b.band AND a.doc_id < b.doc_id), " +
        "hm AS (SELECT pd.da, pd.db, " +
        "CAST(SUM(bit_count(xor(ba.band, bb.band))) AS INT) AS hamming " +
        "FROM pd JOIN bits ba ON ba.doc_id = pd.da " +
        "JOIN bits bb ON bb.doc_id = pd.db AND bb.band_idx = ba.band_idx " +
        "GROUP BY pd.da, pd.db), " +
        "sp AS (SELECT pd.da, pd.db, " +
        "CASE WHEN aa.px_sum = ab.px_sum AND aa.px_wsum = ab.px_wsum " +
        "AND aa.width = ab.width AND aa.height = ab.height " +
        "THEN 1 ELSE 0 END AS same_pixels " +
        "FROM pd JOIN agg aa ON aa.doc_id = pd.da " +
        "JOIN agg ab ON ab.doc_id = pd.db) " +
        "SELECT h.da, h.db, h.hamming, s.same_pixels " +
        "FROM hm h JOIN sp s ON s.da = h.da AND s.db = h.db " +
        "WHERE h.hamming <= 3 ORDER BY h.da, h.db")),

    GraftQuery(
      "q160_image_thumbs",
      "REAL pixel resize — the thumbnailing pass a 100 TB image corpus runs before any vision model sees it: every doc's PNG round-trips the real JDK codec and a nearest-neighbor 8x8 downsample samples the DECODED pixels on the floor grid (thumb cell (i,j) <- source pixel (i*w/8, j*h/8)) in the same mapPartitions pass as the decode — one codec read per image, no second pass over the bytes, no shuffle until the final per-doc project. NN (not bilinear) is chosen deliberately: it selects exact source pixels, so the thumbnail is closed-form recomputable and the oracle hash proves the real decode -> resample chain end-to-end, where a float filter kernel would be codec-exact but oracle-opaque. Output is each thumbnail's exact luma checksums (the q152 fingerprint idiom on the 8x8 grid) — collision-grade evidence the resize read the right 64 pixels of every image.",
      (s, d) => {
        // pre-codec explicit-width range partition + in-partition sort:
        // same double trap as q152 (orderBy resamples the codec chain;
        // AQE would coalesce the cheap params exchange to ~1 partition)
        val parts = imageParams(s, d).withColumn("format", lit("png"))
          .repartitionByRange(shufflePartitions(s), col("doc_id"))
        MediaOps.decodeThumbs(MediaOps.encodeImages(parts), 8).toDF()
          .select(col("doc_id"), col("width"), col("height"),
            col("t_sum"), col("t_wsum"))
          .sortWithinPartitions(col("doc_id"))
      },
      Some(s"WITH h AS (SELECT doc_id, $hvSql AS hv FROM documents), " +
        "dims AS (SELECT doc_id, CAST(16 + hv % 48 AS INT) AS width, " +
        "CAST(16 + (hv // 48) % 32 AS INT) AS height, " +
        "hv % 251 AS s1, (hv // 251) % 241 AS s2 FROM h), " +
        "g AS (SELECT i FROM range(0, 8) t(i)), " +
        "tp AS (SELECT d.doc_id, d.width, d.height, ti.i AS ti, tj.i AS tj, " +
        "ti.i*d.width//8 AS sx, tj.i*d.height//8 AS sy, d.s1, d.s2 " +
        "FROM dims d CROSS JOIN g ti CROSS JOIN g tj) " +
        "SELECT doc_id, width, height, " +
        "CAST(SUM((sx*sx*7 + sy*sy*13 + (sx+sy)*s1 + sx*sy*s2) % 256) AS BIGINT) AS t_sum, " +
        "CAST(SUM(((sx*sx*7 + sy*sy*13 + (sx+sy)*s1 + sx*sy*s2) % 256) " +
        "* (1 + ti + 8*tj)) AS BIGINT) AS t_wsum " +
        "FROM tp GROUP BY doc_id, width, height ORDER BY doc_id")),

    GraftQuery(
      "q161_audio_energy",
      "Frame-level audio feature extraction through the REAL codec: per-doc sawtooth PCM clips (v(i) = ((i*k) mod 2048) - 1024 — pure integer arithmetic, the q153 lesson applied: round(sin) is not oracle-portable across libm implementations, integer waveforms are) are written by the real JDK RIFF/WAVE encoder, parsed back by the real WAV reader, and ONE pass over the decoded PCM emits fixed 256-sample windows each carrying an exact integer energy (sum of squared samples) and peak — the loudness/VAD feature grid an audio corpus computes before silence trimming or segment selection. All-integer accumulators make every window bit-for-bit recomputable by the closed-form twin, so a hash match proves the real encode -> parse -> window chain exactly. Scale: codec + windowing are one narrow flatMap (rows fan out ~10x into windows, no shuffle); only the final sort exchanges data.",
      (s, d) => {
        val clips = t(s, d, "documents")
          .select(col("doc_id"),
            (lit(800) + pmod(col("doc_id"), lit(1600L))).cast("int").as("n_samples"),
            (lit(3) + pmod(col("doc_id"), lit(97L))).cast("long").as("k"))
          .repartitionByRange(shufflePartitions(s), col("doc_id"))
        MediaOps.decodeAudioWindows(MediaOps.encodeWavSaw(clips), 256).toDF()
          .select(col("doc_id"), col("win_idx"), col("n_samples"),
            col("energy"), col("peak"))
          .sortWithinPartitions(col("doc_id"), col("win_idx"))
      },
      Some("WITH c AS (SELECT doc_id, " +
        "CAST(800 + doc_id % 1600 AS INT) AS n_samples, " +
        "3 + doc_id % 97 AS k FROM documents), " +
        "s AS (SELECT c.doc_id, i.range AS i, " +
        "CAST((i.range * c.k) % 2048 - 1024 AS INT) AS v, " +
        "CAST(i.range // 256 AS INT) AS win_idx " +
        "FROM c, range(0, 2400) i WHERE i.range < c.n_samples) " +
        "SELECT doc_id, win_idx, CAST(count(*) AS INT) AS n_samples, " +
        "CAST(SUM(CAST(v AS BIGINT)*v) AS BIGINT) AS energy, " +
        "CAST(MAX(abs(v)) AS INT) AS peak " +
        "FROM s GROUP BY doc_id, win_idx ORDER BY doc_id, win_idx"))
  )
}
