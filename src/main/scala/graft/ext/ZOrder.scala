package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional Morton (z-order) layout writer — the actionable
  * twin of the q148_zorder_layout audit (Relational.scala): where q148
  * MEASURES how a Morton bucketing would bound per-bucket zone-map
  * spans, `zorderWrite` actually ships that layout, the same operation
  * Delta/Iceberg run as OPTIMIZE ZORDER BY. Rows are quantized per
  * dimension by in-plan integer min-max scaling (the min/max agg is a
  * broadcast 1-row side — no driver action), bit-interleaved
  * round-robin into one Morton code, then range-partitioned and sorted
  * by it, so every output file covers a compact z-range whose parquet
  * min/max footer stats bound EVERY interleaved dimension at once —
  * a scan filtering on any subset of the dims prunes files/row-groups
  * without the layout having favored one column order.
  *
  * Scale: quantize+interleave is a per-row 64-bit integer map;
  * `repartitionByRange` samples the z distribution (one extra pass)
  * and produces one balanced shuffle; the within-partition sort is
  * the write-side sort every clustered layout pays. Dimensions must
  * be integral-castable (the caller maps money to cents, timestamps
  * to epoch days — the q148 discipline); n_dims * bits must fit 63
  * bits.
  *
  * Boundary straddle (inherent to EVERY range-partitioned z-order,
  * including Delta's OPTIMIZE): equal-count z-ranges are not aligned
  * to Morton-bit boundaries, so a file whose range crosses a high bit
  * flip spans that bit's dimension widely — typical files bound every
  * dimension at ~2^-(bits_assigned/n) of its range, but O(1) straddler
  * files per high bit do not (ZOrderSpec measures exactly this shape).
  * Aligned bucketing would cap every file at the cost of unbalanced
  * file sizes under skew; balanced files win at scale because stragglers
  * hurt every query while straddlers only blunt pruning on a few files.
  */
object ZOrder {

  /** df + a `__z` Morton column over `dims` (each an integral-castable
    * expression), `bits` per dimension.
    */
  def withZ(df: DataFrame, dims: Seq[Column], bits: Int = 16): DataFrame = {
    require(dims.nonEmpty && dims.size * bits <= 63,
      s"${dims.size} dims x $bits bits exceed a 63-bit Morton code")
    val n = dims.size
    val qcols = dims.zipWithIndex.map { case (c, k) => c.cast("long").as(s"__d$k") }
    val base = df.select(col("*") +: qcols: _*)
    val mmCols = dims.indices.flatMap(k =>
      Seq(min(col(s"__d$k")).as(s"__min$k"), max(col(s"__d$k")).as(s"__max$k")))
    val mm = base.agg(mmCols.head, mmCols.tail: _*)
    val top = (1L << bits) - 1
    val quant = base.crossJoin(broadcast(mm))
    val z = dims.indices.map { k =>
      // quantize to [0, 2^bits-1]; a constant dimension maps to 0
      val q = expr(s"((__d$k - __min$k) * $top) div " +
        s"greatest(__max$k - __min$k, 1)")
      // interleave round-robin: bit j of dim k lands at j*n + k
      (0 until bits).map(j =>
        shiftleft(shiftright(q, j).bitwiseAND(lit(1L)), j * n + k): Column)
        .reduce(_ + _)
    }.reduce(_ + _)
    quant.withColumn("__z", z)
      .drop(dims.indices.flatMap(k =>
        Seq(s"__d$k", s"__min$k", s"__max$k")): _*)
  }

  /** Write `df` parquet under a z-order clustering on `dims` into
    * `files` range partitions (≈ output files).
    */
  def zorderWrite(df: DataFrame, dims: Seq[Column], path: String,
      files: Int = 16, bits: Int = 16): Unit =
    withZ(df, dims, bits)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
