package graft

import org.apache.spark.sql.functions._
import graft.ext.ZOrder

/** ext/ZOrder's layout contract, proven at the FILE level — the unit
  * parquet zone-maps actually prune on: after `zorderWrite` on
  * (price cents, order epoch-day), EVERY output file's min/max span
  * must be a bounded fraction of BOTH dimension ranges, while the
  * 1-D date-sorted layout it replaces leaves the price span at ~full
  * range in every file. Plus content preservation and the Morton-code
  * unit properties.
  */
class ZOrderSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-zorder").toString

  test("morton code interleaves round-robin and respects bounds") {
    import spark.implicits._
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L))
      .toDF("x", "y")
    // bits=2 on a [0,3] domain: quantization is identity
    val z = ZOrder.withZ(df, Seq(col("x"), col("y")), bits = 2)
      .select("x", "y", "__z").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // x bits at even positions, y bits at odd: (3,0)->0b0101, (0,3)->0b1010
    assert(z((0L, 0L)) === 0L)
    assert(z((3L, 0L)) === 5L)
    assert(z((0L, 3L)) === 10L)
    assert(z((3L, 3L)) === 15L)
  }

  test("a constant dimension quantizes to zero instead of dividing by zero") {
    import spark.implicits._
    val df = Seq((1L, 7L), (2L, 7L)).toDF("x", "y")
    val z = ZOrder.withZ(df, Seq(col("x"), col("y")), bits = 4)
      .select("__z").collect().map(_.getLong(0))
    // y contributes nothing; x spans {0, 15} at even positions
    assert(z.toSet === Set(0L, (0 until 4).map(j => 1L << (2 * j)).sum))
  }

  test("zorderWrite bounds BOTH per-file spans where a date sort cannot") {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc"),
        expr("CAST(unix_date(CAST(o_orderdate AS DATE)) AS BIGINT)").as("dd"))
    val zDir = s"${tmp()}/z"
    val dDir = s"${tmp()}/d"
    ZOrder.zorderWrite(orders, Seq(col("pc"), col("dd")), zDir, files = 16)
    orders.repartitionByRange(16, col("dd")).sortWithinPartitions("dd")
      .write.mode("overwrite").parquet(dDir)

    val stats = orders.agg(min("pc"), max("pc"), min("dd"), max("dd"))
      .collect().head
    val (pRange, dRange) =
      (stats.getLong(1) - stats.getLong(0), stats.getLong(3) - stats.getLong(2))

    def fileSpans(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("pc") - min("pc")).as("ps"), (max("dd") - min("dd")).as("ds"))
      .collect().map(r => (r.getAs[Long]("ps"), r.getAs[Long]("ds")))

    val zSpans = fileSpans(zDir)
    val dSpans = fileSpans(dDir)
    assert(zSpans.length >= 8, "z-order write produced too few files")
    // 16 range partitions ~ 4 Morton bits ~ 2 bits/dim: TYPICAL files
    // bound both spans near 1/4 of each range; equal-count z-ranges
    // that straddle a high Morton-bit flip legitimately span that
    // dimension wider (the documented boundary-straddle property), so
    // the claim is "all but the straddlers, and the median tightly"
    def median(xs: Seq[Long]) = xs.sorted.apply(xs.length / 2)
    val bounded = zSpans.count { case (ps, ds) =>
      ps <= pRange * 0.6 && ds <= dRange * 0.6 }
    assert(bounded >= zSpans.length - 2,
      s"z-order file spans not bounded: ${zSpans.mkString(",")}")
    assert(median(zSpans.map(_._1).toSeq) <= pRange * 0.45 &&
      median(zSpans.map(_._2).toSeq) <= dRange * 0.45,
      s"z-order median spans too wide: ${zSpans.mkString(",")}")
    // the 1-D sort bounds dates tightly but leaves price at full range
    assert(dSpans.forall { case (_, ds) => ds <= dRange * 0.45 })
    assert(dSpans.count { case (ps, _) => ps >= pRange * 0.8 } >= dSpans.length / 2,
      s"date-sorted files unexpectedly bound price: ${dSpans.mkString(",")}")

    // content is preserved exactly
    val back = spark.read.parquet(zDir)
    assert(back.count() === orders.count())
    assert(back.select("o_orderkey", "pc", "dd").except(
      orders.select("o_orderkey", "pc", "dd")).isEmpty)

    // CONSUMER half — the measured end-to-end win the layout exists
    // for: a 2-predicate query box (the center quarter of each dim)
    // against the min/max stats each file actually carries, i.e. the
    // skip decision a zone-map reader (parquet row-group pushdown,
    // Delta/Iceberg file planning) makes. The date-sorted layout can
    // only prune on the date predicate (~1/4 of files survive, price
    // unbounded); the z-order layout prunes on BOTH (~1/16 aligned
    // cell + boundary straddlers).
    // finer layout for the file-skip measurement: at 16 files (2
    // Morton bits/dim) the box-aligned region is a single cell and
    // equal-count straddlers dominate the count on a 1.5k-row
    // fixture; 64 files (3 bits/dim) gives the box 4 aligned cells
    // and makes the straddler fraction visible as the minority it is
    val zDir64 = s"${tmp()}/z64"
    val dDir64 = s"${tmp()}/d64"
    ZOrder.zorderWrite(orders, Seq(col("pc"), col("dd")), zDir64, files = 64)
    orders.repartitionByRange(64, col("dd")).sortWithinPartitions("dd")
      .write.mode("overwrite").parquet(dDir64)
    val (pLo, pHi) = (stats.getLong(0) + pRange / 4, stats.getLong(0) + pRange / 2)
    val (dLo, dHi) = (stats.getLong(2) + dRange / 4, stats.getLong(2) + dRange / 2)
    def filesHit(dir: String): (Long, Long) = {
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("pc").as("pmn"), max("pc").as("pmx"),
          min("dd").as("dmn"), max("dd").as("dmx"))
      val hit = perFile.filter(col("pmx") >= pLo && col("pmn") <= pHi &&
        col("dmx") >= dLo && col("dmn") <= dHi).count()
      (hit, perFile.count())
    }
    val (zHit, zTot) = filesHit(zDir64)
    val (dHit, dTot) = filesHit(dDir64)
    assert(zHit < dHit,
      s"z-order read $zHit/$zTot files vs date-sort $dHit/$dTot — no pruning win")
    assert(zHit <= zTot / 4, s"z-order box query still touches $zHit/$zTot files")
    // and both layouts answer the boxed query identically
    def boxed(dir: String) = spark.read.parquet(dir)
      .filter(col("pc").between(pLo, pHi) && col("dd").between(dLo, dHi))
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(boxed(zDir64) === boxed(dDir64))
  }
}
