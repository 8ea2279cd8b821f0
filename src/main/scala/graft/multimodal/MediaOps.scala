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
  * The actual codecs are NOT in this container (north-star note in the
  * build brief), so `decodeStub` is a clearly-marked deterministic
  * stand-in: it derives pseudo width/height/features from the bytes.
  * Everything around it — the binary schema, the batched iterator
  * shape, partition-preserving execution, and the typed output — is
  * the real production plumbing; swapping `decodeStub` for a JNI/
  * javacv decoder changes one function.
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
}
