package graft.ext

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal lakehouse-style snapshot log: versioned manifests over
  * immutable parquet segments with per-segment zone-map stats — the
  * transaction-log pattern behind time travel and incremental reruns
  * (the public Delta/Iceberg design, reduced to its Spark-first core;
  * q162's snapshot diff computes WHAT changed between corpus states,
  * this records and REPLAYS state itself).
  *
  * Layout under `dir`:
  *   seg-<v>/            immutable parquet segment written at commit v
  *   _log/v<N>.manifest  text lines "segRelPath<TAB>min<TAB>max" — the
  *                       FULL segment list composing snapshot N (so a
  *                       reader opens exactly one manifest, never
  *                       replays deltas), with zone-map min/max of the
  *                       stats column per segment.
  *
  * Commits are atomic via write-temp-then-rename of the manifest file
  * — readers only ever see fully-written manifests. Single writer by
  * contract (a cluster deployment would CAS the manifest rename
  * against a coordination service; the read path is unchanged).
  *
  * Scale: a snapshot read is `spark.read.parquet(segments…)` — plain
  * pruned/pushed columnar scans; time travel costs ONE tiny manifest
  * read, and `readAsOf(lo, hi)` drops whole segments by zone-map
  * overlap BEFORE Spark ever lists their files, the same skip decision
  * ZOrderSpec measures on file stats. At 100 TB the manifest is
  * O(segments), metadata-sized, and stays on the driver.
  */
object SnapshotLog {

  final case class Segment(relPath: String, min: Long, max: Long,
      tag: Option[Long] = None)

  private def logDir(dir: String): Path = Paths.get(dir, "_log")

  /** `Files.list`/`Files.walk` return open directory streams that MUST
    * be closed — a polling caller (a reader looping on `version`)
    * would otherwise exhaust file descriptors (caught by
    * SnapshotLogSpec's racing-reader test).
    */
  private def listed[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(p)
    try f(s.iterator().asScala) finally s.close()
  }

  private def walked[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.walk(p)
    try f(s.iterator().asScala) finally s.close()
  }

  /** Latest committed version, or -1 when the log is empty. */
  def version(dir: String): Int = {
    val ld = logDir(dir)
    if (!Files.isDirectory(ld)) -1
    else listed(ld)(_.map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt }
      .foldLeft(-1)(math.max))
  }

  /** Drops every segment and manifest — a fresh log. */
  def reset(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.isDirectory(root)) {
      walked(root)(_.toSeq).reverse.foreach(Files.delete)
    }
    Files.createDirectories(logDir(dir))
  }

  def segments(dir: String, v: Int): Seq[Segment] = {
    val mf = logDir(dir).resolve(s"v$v.manifest")
    require(Files.exists(mf), s"no snapshot v$v in $dir")
    Files.readAllLines(mf, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map { line =>
        line.split('\t') match {
          case Array(p, mn, mx) => Segment(p, mn.toLong, mx.toLong)
          case Array(p, mn, mx, tag) =>
            Segment(p, mn.toLong, mx.toLong, Some(tag.toLong))
        }
      }
  }

  /** Writer tags already committed (streaming idempotency: a replayed
    * micro-batch checks its batchId against the LOG, not local state —
    * correct across restarts). Empty log → empty set.
    */
  def committedBatches(dir: String): Set[Long] = {
    val v = version(dir)
    if (v < 0) Set.empty else segments(dir, v).flatMap(_.tag).toSet
  }

  /** Commits `df` as a new immutable segment; the new snapshot is the
    * previous segment list plus this one. `statsCol` must evaluate to
    * a long — its min/max become the segment's zone map (one
    * metadata-sized 1-row aggregate; the only driver action).
    * Returns the new version number.
    */
  def append(df: DataFrame, dir: String, statsCol: Column,
      batchTag: Option[Long] = None): Int = {
    Files.createDirectories(logDir(dir))
    val prev = version(dir)
    val v = prev + 1
    val rel = s"seg-$v"
    val stats = df.agg(min(statsCol).cast("long").as("mn"),
      max(statsCol).cast("long").as("mx")).head()
    val (mn, mx) =
      if (stats.isNullAt(0)) (Long.MaxValue, Long.MinValue)
      else (stats.getLong(0), stats.getLong(1))
    df.write.mode("overwrite").parquet(Paths.get(dir, rel).toString)
    val carried = if (prev < 0) Nil else segments(dir, prev)
    val lines = (carried :+ Segment(rel, mn, mx, batchTag))
      .map(s => (Seq(s.relPath, s.min.toString, s.max.toString) ++
        s.tag.map(_.toString)).mkString("\t")).mkString("\n")
    val tmp = logDir(dir).resolve(s".v$v.manifest.tmp")
    Files.write(tmp, lines.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, logDir(dir).resolve(s"v$v.manifest"),
      StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** The table exactly as of snapshot `v`. */
  def readAsOf(spark: SparkSession, dir: String, v: Int): DataFrame = {
    val segs = segments(dir, v)
    require(segs.nonEmpty, s"snapshot v$v is empty")
    spark.read.parquet(segs.map(s => Paths.get(dir, s.relPath).toString): _*)
  }

  /** Change-data feed: the rows ADDED in versions (fromV, toV] — the
    * segments in toV's manifest absent from fromV's (append-only log,
    * so segment-set difference IS the row delta; fromV = -1 means
    * everything). An incremental consumer reads exactly the new
    * segments — never a diff of the full table (q162's content-diff
    * is for when no log exists). Empty delta → empty frame with toV's
    * schema.
    */
  def readChanges(spark: SparkSession, dir: String,
      fromV: Int, toV: Int): DataFrame = {
    val before = if (fromV < 0) Set.empty[String]
      else segments(dir, fromV).map(_.relPath).toSet
    val delta = segments(dir, toV).filterNot(s => before(s.relPath))
    if (delta.isEmpty) readAsOf(spark, dir, toV).limit(0)
    else spark.read.parquet(
      delta.map(s => Paths.get(dir, s.relPath).toString): _*)
  }

  /** Compaction: commit a NEW version whose manifest lists ONE
    * rewritten segment holding the current snapshot — the small-file
    * fix for long append histories. Old versions still read their old
    * segments (nothing is deleted; `vacuum` reclaims). Returns the new
    * version.
    */
  def compact(spark: SparkSession, dir: String, statsCol: Column): Int = {
    val prev = version(dir)
    require(prev >= 0, s"nothing to compact in $dir")
    val v = prev + 1
    val rel = s"seg-$v"
    val snap = readAsOf(spark, dir, prev)
    val stats = snap.agg(min(statsCol).cast("long").as("mn"),
      max(statsCol).cast("long").as("mx")).head()
    val (mn, mx) =
      if (stats.isNullAt(0)) (Long.MaxValue, Long.MinValue)
      else (stats.getLong(0), stats.getLong(1))
    snap.write.mode("overwrite").parquet(Paths.get(dir, rel).toString)
    val line = s"$rel\t$mn\t$mx"
    val tmp = logDir(dir).resolve(s".v$v.manifest.tmp")
    Files.write(tmp, line.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, logDir(dir).resolve(s"v$v.manifest"),
      StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Retention enforcement: drop manifests BELOW `horizon` and delete
    * every segment directory no manifest ≥ horizon references. Time
    * travel to versions before the horizon is gone afterwards — the
    * documented retention trade every production log makes. Returns
    * (segment dirs deleted, manifests dropped).
    */
  def vacuum(dir: String, horizon: Int): (Int, Int) = {
    val latest = version(dir)
    require(horizon >= 0 && horizon <= latest,
      s"horizon $horizon outside [0, $latest]")
    val keep = (horizon to latest)
      .flatMap(v => segments(dir, v).map(_.relPath)).toSet
    val root = Paths.get(dir)
    val segDirs = listed(root)(
      _.filter(p => p.getFileName.toString.startsWith("seg-")).toSeq)
    val doomedSegs = segDirs.filterNot(p => keep(p.getFileName.toString))
    doomedSegs.foreach { p =>
      walked(p)(_.toSeq).reverse.foreach(Files.delete)
    }
    val doomedMfs = (0 until horizon)
      .map(v => logDir(dir).resolve(s"v$v.manifest"))
      .filter(Files.exists(_))
    doomedMfs.foreach(Files.delete(_))
    (doomedSegs.size, doomedMfs.size)
  }

  /** Zone-map-pruned read: only segments whose [min, max] overlaps
    * [lo, hi] are opened; the exact predicate is re-applied as a
    * residual so the answer is independent of segment layout. Returns
    * (frame, segmentsScanned, segmentsTotal) so callers — and
    * SnapshotLogSpec — can assert the skip actually happened.
    */
  def readAsOfFiltered(spark: SparkSession, dir: String, v: Int,
      statsCol: Column, lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val segs = segments(dir, v)
    val hit = segs.filter(s => s.min <= hi && s.max >= lo)
    val df =
      if (hit.isEmpty) readAsOf(spark, dir, v).limit(0)
      else spark.read
        .parquet(hit.map(s => Paths.get(dir, s.relPath).toString): _*)
        .filter(statsCol >= lo && statsCol <= hi)
    (df, hit.size, segs.size)
  }
}
