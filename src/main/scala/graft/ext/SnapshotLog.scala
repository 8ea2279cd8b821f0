package graft.ext

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
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
  *   _log/v<N>.manifest  text lines "segRelPath<TAB>min<TAB>max[<TAB>tag]"
  *                       — the FULL segment list composing snapshot N
  *                       (so a reader opens exactly one manifest, never
  *                       replays deltas), with zone-map min/max of the
  *                       stats column per segment — plus metadata lines
  *                       starting with '#':
  *                         #batches<TAB>id,id,…   every streaming batch
  *                           id EVER committed (carried forward by both
  *                           append and compact, so the idempotency
  *                           gate survives compaction — a replayed
  *                           micro-batch after a compact still skips)
  *                         #compacted<TAB>rel,…   segments that are
  *                           REWRITES of existing rows (dataChange =
  *                           false) — the change feed must never
  *                           re-deliver them as inserts.
  *                         #schema<TAB>json       the snapshot's
  *                           SCHEMA as of this version (add-only
  *                           evolution: appends may add nullable
  *                           columns, never drop or retype) — readers
  *                           apply it instead of merging parquet
  *                           footers, and time travel sees the schema
  *                           as of the version it reads.
  *
  * Commits are atomic AND exclusive: the manifest is written to a temp
  * name and published with `Files.createLink` (hard link), which fails
  * with FileAlreadyExistsException when the target version exists —
  * readers only ever see fully-written manifests, and of two racing
  * writers targeting the same next version exactly one wins while the
  * loser gets a loud ConcurrentModificationException instead of
  * silently clobbering the winner's commit (a rename(2) publish would
  * replace it). A cluster deployment swaps the link for a CAS against
  * a coordination service; the read path is unchanged.
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
      tag: Option[Long] = None, dataChange: Boolean = true)

  /** Manifest metadata: every batch id ever committed, the set of
    * segments that are rewrites (dataChange = false), and — ONLY in
    * the manifest of a version that performed a row-level delete or
    * merge — the change-data segments holding the rows that version
    * REMOVED (`#cdcdel`). Unlike batches/compacted, cdcDel is a
    * per-version event record, not carried-forward state: it describes
    * what THIS commit deleted, so append/compact never propagate it
    * and the delete history dies with its manifest at vacuum time —
    * the same retention trade the version history itself makes.
    *
    * `dvs` (round 14) is the table's ACTIVE deletion-vector set — the
    * merge-on-read counterpart to copy-on-write rewrites: each entry
    * names a delete-sized segment of (file, row-index) tombstones that
    * every snapshot read anti-joins away (`#dvs`, carried-forward
    * standing state like batches/compacted). `compact`/`optimize`
    * materialize DVs into their rewrite and reset the set; a
    * copy-on-write rewrite of SOME segments leaves the set intact —
    * entries pointing at replaced files simply stop matching (segment
    * names are writer-unique), so staleness is inert, never wrong.
    */
  /** `cdcPre`/`cdcPost` (round 16) are UPDATE's typed change segments —
    * per-version event records like cdcDel, never carried: cdcPre
    * names the segment holding the replaced old images
    * (`_change_type = update_preimage` in the feed), cdcPost names the
    * new-image segment (a live dataChange segment of the snapshot that
    * the feed tags `update_postimage` instead of plain insert —
    * Delta's four-valued _change_type column). `opType` records which
    * operation produced the version (append/compact/optimize/delete/
    * merge/update/restore/clone) — the streaming gate classifies
    * delete-bearing vs update-bearing versions from it instead of
    * guessing from cdcDel (legacy manifests have None and classify as
    * their pre-round-16 behavior).
    */
  final case class ManifestMeta(batches: Set[Long], compacted: Set[String],
      cdcDel: Set[String] = Set.empty, dvs: Set[String] = Set.empty,
      cdcPre: Set[String] = Set.empty, cdcPost: Set[String] = Set.empty,
      opType: Option[String] = None, cluster: Option[String] = None) {
    /** The STANDING state a successor commit carries forward — batch
      * ids, compaction flags and active DVs; the per-version event
      * fields (cdcDel/cdcPre/cdcPost/opType/cluster) reset. Every
      * commit that starts from its predecessor's meta must go through
      * this — a bare .copy leaks the previous version's change-event
      * record into the new manifest.
      */
    def carried: ManifestMeta =
      copy(cdcDel = Set.empty, cdcPre = Set.empty, cdcPost = Set.empty,
        opType = None, cluster = None)
  }

  private[ext] def logDir(dir: String): Path = Paths.get(dir, "_log")

  /** == Incremental manifests (round-13) ==
    * Full-list manifests rewrite O(segments) lines per commit — at
    * 100 TB with thousands of segments and frequent appends, commit
    * cost grows linearly with table AGE. Commits therefore write only
    * the DELTA against the previous version (the Delta-log posture;
    * Iceberg's manifest list is the same idea one level up):
    *
    *   #base<TAB><v-1>        this manifest is a delta over v-1
    *   +<TAB>rel<TAB>min<TAB>max[<TAB>tag]   segment added at v
    *   -<TAB>rel              segment removed at v
    *
    * plus the SAME full-state meta lines as always (#batches/
    * #compacted/#cdcdel/#schema — they are id- or schema-sized, never
    * segment-list-sized, so delta-encoding them would buy nothing and
    * cost a merge rule). Readers resolve a delta chain by walking
    * #base links back to the nearest FULL manifest (every
    * `checkpointInterval`-th version, recorded per log in
    * `_log/config` at reset time — a table property, so every writer
    * of a log agrees), applying removals and additions in order; the
    * chain is at most `interval` manifests, each metadata-sized.
    * Old full-format logs have no #base lines and read unchanged.
    *
    * `vacuum` MATERIALIZES the horizon manifest to full form before
    * dropping earlier ones — a kept delta chain never dangles below
    * the horizon (chains are strictly v → v−1, so a full horizon
    * closes every surviving chain).
    */
  val DefaultCheckpointInterval = 8

  private def configPath(dir: String): Path = logDir(dir).resolve("config")

  /** The log's checkpoint interval (full manifest every N versions),
    * recorded at `reset` in `_log/config`. Logs created before the
    * config existed (or with interval 1) write full manifests always —
    * a MISSING config therefore resolves to 1, not the default: an
    * external reader of a legacy log expects the full-list layout, and
    * silently switching it to delta manifests on its next commit would
    * break that reader (the documented behavior is authoritative; the
    * default applies only to `reset`'s parameter).
    */
  def checkpointIntervalOf(dir: String): Int = {
    val p = configPath(dir)
    if (!Files.exists(p)) 1
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .collectFirst { case l if l.startsWith("interval=") =>
        l.stripPrefix("interval=").toInt }
      .getOrElse(DefaultCheckpointInterval)
  }

  /** Whether v's manifest is a delta (diagnostic; q203 audits it). */
  def isDelta(dir: String, v: Int): Boolean =
    manifestLines(dir, v).exists(_.startsWith("#base\t"))

  /** `Files.list`/`Files.walk` return open directory streams that MUST
    * be closed — a polling caller (a reader looping on `version`)
    * would otherwise exhaust file descriptors (caught by
    * SnapshotLogSpec's racing-reader test).
    */
  private[ext] def listed[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(p)
    try f(s.iterator().asScala) finally s.close()
  }

  private def walked[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.walk(p)
    try f(s.iterator().asScala) finally s.close()
  }

  /** Latest committed version, or -1 when the log is empty.
    *
    * This is every read/write path's visibility choke point, so it is
    * ALSO where committed-but-unpublished multi-table transactions
    * roll forward (SnapshotTxn.heal): a crash between an intent's
    * publish and its per-table manifest publishes must not leave the
    * slow table's new version invisible while the fast table's shows
    * — healing before answering makes the intent publish the
    * effective cross-table commit point. The rare-path check rides
    * the directory listing version() already pays; logs that never
    * participate in a transaction see zero extra I/O.
    */
  def version(dir: String): Int = {
    val ld = logDir(dir)
    if (!Files.isDirectory(ld)) -1
    else {
      def names = listed(ld)(_.map(_.getFileName.toString).toSeq)
      val first = names
      val resolved =
        if (first.exists(SnapshotTxn.isTxnFile)) {
          SnapshotTxn.heal(dir, first)
          names // re-list: healing may have published manifests here
        } else first
      resolved
        .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
          s.stripPrefix("v").stripSuffix(".manifest").toInt }
        .foldLeft(-1)(math.max)
    }
  }

  /** `version` without the transaction-healing hook — what is
    * PHYSICALLY published right now. SnapshotTxn reads this while
    * healing (the hook calling itself back would recurse).
    */
  private[ext] def rawVersion(dir: String): Int = {
    val ld = logDir(dir)
    if (!Files.isDirectory(ld)) -1
    else listed(ld)(_.map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt }
      .foldLeft(-1)(math.max))
  }

  /** Drops every segment and manifest — a fresh log. The checkpoint
    * interval AND the sidecar stats schema are TABLE properties fixed
    * here (not per-commit) so every writer of the log agrees on which
    * versions are full manifests and which columns every segment
    * carries zone stats for. `statsCols` are (name, SQL expression)
    * pairs — expressions, not bare columns, so the engine-wide
    * long-quantization discipline (cents, epoch seconds/days) is
    * spelled once at table creation (Delta's
    * dataSkippingNumIndexedCols posture, by explicit schema instead of
    * positional count).
    */
  def reset(dir: String,
      checkpointInterval: Int = DefaultCheckpointInterval,
      statsCols: Seq[(String, String)] = Nil): Unit = {
    require(checkpointInterval >= 1,
      s"checkpointInterval must be >= 1, got $checkpointInterval")
    val root = Paths.get(dir)
    if (Files.isDirectory(root)) {
      walked(root)(_.toSeq).reverse.foreach(Files.delete)
    }
    Files.createDirectories(logDir(dir))
    val lines = s"interval=$checkpointInterval" +:
      statsCols.map { case (n, e) =>
        requireStatLine(n, e)
        s"stat\t$n\t$e"
      }
    Files.write(configPath(dir),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  /** == Stats-spec evolution (round-14, Iceberg's partition-spec-
    * evolution posture) ==
    * The sidecar stats schema is a table property fixed at reset — but
    * which dimensions matter changes over a table's life, and a 100 TB
    * re-ingest to change metadata is not an option. `evolveStatsCols`
    * APPENDS stat columns to the table config: segments written before
    * the evolution simply have no recorded range for the new column
    * and are never skipped (the mixed-history safety `sidecarStats`
    * already guarantees), segments written after record it, and the
    * next `optimize` on the new dimensions re-clusters the whole
    * snapshot under the evolved spec — each segment prunes under the
    * spec that wrote it, old layouts keep reading. Evolution is
    * ADD-ONLY BY NAME: re-binding an existing stat name to a different
    * expression is refused — old sidecars recorded the old expression's
    * ranges, and pruning them under a new meaning would skip matching
    * segments silently (the exact wrong-skip zone maps must never
    * make). Re-adding an identical (name, expr) pair is a no-op.
    */
  /** BOTH fields tab/newline-free: a newline in the NAME would split
    * the config entry across lines and poison every later statsColsOf
    * parse — i.e. every subsequent write to the table.
    */
  private def requireStatLine(n: String, e: String): Unit = {
    require(!n.contains('\t') && !n.contains('\n') &&
      !e.contains('\t') && !e.contains('\n'),
      s"stats name/expr must be tab/newline-free: $n")
    // "__" prefixes the sidecar's RESERVED entries (__rows) — a user
    // stat by such a name would collide with them
    require(!n.startsWith("__"),
      s"stat name '$n' collides with the sidecar's reserved __ namespace")
  }

  /** Config evolution is a read-modify-write; it serializes per path
    * WITHIN the JVM (the in-process race two engine threads can
    * actually hit). Cross-process concurrent evolutions follow the
    * file's documented cluster posture — swap the whole metadata layer
    * for a CAS service; the single-writer deployment is exact.
    */
  private val configLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** == Declared clustering spec (round-17 item 7 — Iceberg's
    * partition-spec / Delta's CLUSTER BY posture, lite) ==
    * The table DECLARES its clustering dimensions once
    * (`cluster<TAB>expr` config lines, ordered); `optimize(spark, dir,
    * statsCol)` with no dims applies them, and the optimize commit
    * records the spec it used (`#cluster` manifest line, surfaced by
    * `history`). Re-clustering becomes a POLICY — a maintenance job
    * needs no per-call knowledge of the table's layout. The spec may
    * EVOLVE (setClusterBy replaces it): segments keep the layout that
    * wrote them, pruning stays safe under mixed histories (absent
    * stats never skip), and the next declared optimize re-clusters
    * under the new spec — exactly Iceberg's spec-evolution contract.
    * `renameColumn` re-binds the spec's expressions like every other
    * config expression.
    */
  def clusterByOf(dir: String): Seq[String] = {
    val p = configPath(dir)
    if (!Files.exists(p)) Nil
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(_.startsWith("cluster\t")).map(_.split('\t')(1)).toSeq
  }

  def setClusterBy(spark: SparkSession, dir: String,
      dims: Seq[String]): Unit = {
    require(dims.nonEmpty, "a clustering spec needs at least one dimension")
    val p = configPath(dir)
    require(Files.exists(p),
      s"no table config in $dir — reset first (the clustering spec is a " +
        "table property)")
    dims.foreach { e =>
      require(!e.contains('\t') && !e.contains('\n'),
        s"cluster expression must be tab/newline-free: $e")
      require(scala.util.Try(
        spark.sessionState.sqlParser.parseExpression(e)).isSuccess,
        s"cluster expression does not parse: $e")
    }
    val lock = configLocks.computeIfAbsent(
      p.toAbsolutePath.toString, _ => new Object)
    lock.synchronized {
      val lines = Files.readAllLines(p, StandardCharsets.UTF_8).asScala
        .toSeq.filterNot(_.startsWith("cluster\t")) ++
        dims.map(e => s"cluster\t$e")
      val tmp = logDir(dir).resolve(s".config.tmp-${writerToken()}")
      Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** == Per-segment Bloom sidecars (round-17 continuation — Delta's
    * bloom-filter-index posture on the zone-map engine) ==
    * Range zone maps prune date/cluster-ordered layouts; a SCATTERED
    * key layout (hash-distributed ids, residue-sharded ingest) leaves
    * every segment's [min, max] overlapping every probe, and
    * MERGE/DELETE-by-keys discovery opens the whole table. A bloom
    * config line (`bloom<TAB>statName<TAB>expectedItems<TAB>fpp`)
    * makes every subsequent segment write record, IN the one-pass stat
    * aggregate it already runs (`bloom_build` is a
    * TypedImperativeAggregate — zero extra scans, the q208 rule), a
    * Bloom filter of the stat expression's xxhash64 values, stored
    * beside the zone stats (`_bloomstats`, base64 lines keyed by stat
    * name like the sidecar). Discovery then probes each
    * range-surviving candidate's bloom DISTRIBUTED over the src keys
    * (`bloomPruneCandidates`). Zone-map law throughout: a bloom has
    * no false negatives (it can only KEEP extra candidates, never
    * drop a true one — oversubscription just degrades fpp), segments
    * written before the config carry no bloom and never skip, and the
    * exact key semi-join downstream re-applies equality, so answers
    * are independent of pruning. Blooms key by STAT NAME, so
    * `renameColumn` needs no re-keying (the recorded bits hash VALUES,
    * which renames don't change), and compaction/OPTIMIZE rewrites
    * record fresh blooms through the same stat pass.
    */
  def bloomSpecOf(dir: String): Map[String, (Long, Double)] = {
    val p = configPath(dir)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(_.startsWith("bloom\t")).map { l =>
        val a = l.split('\t')
        a(1) -> (a(2).toLong, a(3).toDouble)
      }.toMap
  }

  def setBloomOn(dir: String, statName: String,
      expectedItems: Long = 1L << 17, fpp: Double = 0.001): Unit = {
    val p = configPath(dir)
    require(Files.exists(p),
      s"no table config in $dir — reset first (the bloom spec is a " +
        "table property)")
    require(expectedItems > 0,
      s"expectedItems must be positive: $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1): $fpp")
    require(statsColsOf(dir).exists(_._1 == statName),
      s"no stat named '$statName' — blooms attach to a recorded stat " +
        "expression (add it via reset/evolveStatsCols first)")
    val lock = configLocks.computeIfAbsent(
      p.toAbsolutePath.toString, _ => new Object)
    lock.synchronized {
      val lines = Files.readAllLines(p, StandardCharsets.UTF_8).asScala
        .toSeq.filterNot(_.startsWith(s"bloom\t$statName\t")) :+
        s"bloom\t$statName\t$expectedItems\t$fpp"
      val tmp = logDir(dir).resolve(s".config.tmp-${writerToken()}")
      Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  def evolveStatsCols(dir: String, add: Seq[(String, String)]): Unit = {
    val p = configPath(dir)
    require(Files.exists(p),
      s"no table config in $dir — legacy config-less logs have no stats " +
        "schema to evolve; reset first")
    val lock = configLocks.computeIfAbsent(
      p.toAbsolutePath.toString, _ => new Object)
    lock.synchronized {
      val existing = statsColsOf(dir).toMap
      add.foreach { case (n, e) =>
        requireStatLine(n, e)
        existing.get(n).foreach { old =>
          require(old == e,
            s"stat '$n' is already recorded as '$old' — stats evolution is " +
              s"add-only by name; '$e' would change its meaning under old " +
              "sidecars")
        }
      }
      val fresh = add.filterNot { case (n, _) => existing.contains(n) }
      if (fresh.nonEmpty) {
        val lines =
          Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq ++
            fresh.map { case (n, e) => s"stat\t$n\t$e" }
        val tmp = logDir(dir).resolve(s".config.tmp-${writerToken()}")
        Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, p,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
  }

  /** == CHECK constraints (round-16 continuation — Delta's
    * ALTER TABLE ADD CONSTRAINT) ==
    * Per-table row predicates stored in `_log/config`
    * (`check<TAB>name<TAB>sqlExpr`) and enforced at the ONE choke
    * point every data segment already passes through: the one-pass
    * stat aggregate (`segStatPlan`/`writeSegWithStats`) gains a violation counter per
    * check — `sum(expr IS FALSE)`, SQL CHECK semantics, null passes —
    * so enforcement costs ZERO extra scans on append, compact,
    * optimize, merge (src + rewrite), and update (post + survivor)
    * alike. A violating commit throws BEFORE any manifest publishes;
    * the already-written segment is an unreferenced orphan `vacuum`
    * reclaims (the same economy failed commits and lost retry races
    * already rely on — a CHECK needs the data scanned, so unlike the
    * schema gate it cannot refuse before bytes land; Delta's write
    * transactions abort the same way). `addCheck` first validates the
    * CURRENT head (one scan) and refuses if existing rows violate —
    * after that, the invariant is table-wide: rewrites only move
    * checked rows, and the only paths that create NEW row images
    * (append/merge src/update postimages/restore comebacks) all run
    * the counter. A check that does not resolve against a segment's
    * schema fails LOUDLY — silently skipping a constraint is how bad
    * rows land unreported.
    */
  def addCheck(spark: SparkSession, dir: String, name: String,
      exprSql: String): Unit = {
    val p = configPath(dir)
    require(Files.exists(p),
      s"no table config in $dir — reset first (checks are table properties)")
    requireStatLine(name, exprSql)
    val lock = configLocks.computeIfAbsent(
      p.toAbsolutePath.toString, _ => new Object)
    lock.synchronized {
      // head validation runs INSIDE the config lock and the head is
      // re-checked after the scan (round-17 advice): a commit landing
      // mid-scan would otherwise slip unvalidated rows under a
      // constraint that then reads as table-wide. The re-check closes
      // the scan-to-publish window; a writer already past its own
      // config read but not yet published remains the caller's to
      // serialize (constraint-add is single-writer-vs-in-flight-
      // commits, the same contract as config evolution — Delta closes
      // it by running ADD CONSTRAINT inside a table transaction, a
      // protocol this log reserves for data commits).
      val head = version(dir)
      if (head >= 0) {
        val bad = readAsOf(spark, dir, head)
          .filter(expr(exprSql).isNotNull && !expr(exprSql)).count()
        require(bad == 0L,
          s"cannot add check '$name': $bad existing rows violate $exprSql")
      }
      require(version(dir) == head,
        s"table advanced past v$head while validating check '$name' — " +
          "the scan no longer proves the head is clean; retry")
      val existing = checksOf(dir).toMap
      existing.get(name).foreach { old =>
        require(old == exprSql,
          s"check '$name' is already recorded as '$old' — drop-and-re-add " +
            "is not supported; pick a new name")
      }
      if (!existing.contains(name)) {
        val lines =
          Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq :+
            s"check\t$name\t$exprSql"
        val tmp = logDir(dir).resolve(s".config.tmp-${writerToken()}")
        Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, p,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
  }

  /** NOT NULL constraint (Delta's column constraint, distinct from
    * CHECK: SQL CHECK passes null, NOT NULL refuses it). Validated
    * against the current head first — which also catches the
    * evolution trap: a column added after old segments existed is
    * null-filled on read, so it can never become NOT NULL until those
    * segments are rewritten. Enforcement rides the same one-pass
    * aggregate as CHECK (`sum(col IS NULL)`); the LOGGED schema stays
    * nullable throughout (old-segment null-fill is a read-path
    * contract), the constraint governs what writers may land.
    */
  def addNotNull(spark: SparkSession, dir: String, colName: String): Unit = {
    val p = configPath(dir)
    require(Files.exists(p),
      s"no table config in $dir — reset first (constraints are table " +
        "properties)")
    requireStatLine(colName, colName)
    val lock = configLocks.computeIfAbsent(
      p.toAbsolutePath.toString, _ => new Object)
    lock.synchronized {
      // validated inside the config lock with a post-scan head
      // re-check, same rationale and residual contract as addCheck
      val head = version(dir)
      if (head >= 0) {
        val snap = readAsOf(spark, dir, head)
        require(snap.columns.exists(c =>
          spark.sessionState.analyzer.resolver(c, colName)),
          s"cannot add NOT NULL on unknown column '$colName'")
        val bad = snap.filter(col(colName).isNull).count()
        require(bad == 0L,
          s"cannot add NOT NULL on '$colName': $bad existing rows are null " +
            "(segments predating a column-add null-fill it — rewrite first)")
      }
      require(version(dir) == head,
        s"table advanced past v$head while validating NOT NULL " +
          s"'$colName' — the scan no longer proves the head is clean; retry")
      if (!notNullsOf(dir).contains(colName)) {
        val lines =
          Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq :+
            s"notnull\t$colName"
        val tmp = logDir(dir).resolve(s".config.tmp-${writerToken()}")
        Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, p,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
  }

  /** The table's NOT NULL columns, as recorded in the config. */
  def notNullsOf(dir: String): Seq[String] = {
    val p = configPath(dir)
    if (!Files.exists(p)) Nil
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .collect { case l if l.startsWith("notnull\t") => l.split('\t')(1) }
      .toSeq
  }

  /** The table's CHECK constraints, as recorded in the config. */
  def checksOf(dir: String): Seq[(String, String)] = {
    val p = configPath(dir)
    if (!Files.exists(p)) Nil
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .collect { case l if l.startsWith("check\t") =>
        val Array(_, n, e) = l.split('\t')
        (n, e)
      }.toSeq
  }

  /** The table's sidecar stats schema, as recorded at reset. */
  def statsColsOf(dir: String): Seq[(String, String)] = {
    val p = configPath(dir)
    if (!Files.exists(p)) Nil
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .collect { case l if l.startsWith("stat\t") =>
        val Array(_, n, e) = l.split('\t')
        (n, e)
      }.toSeq
  }

  private def manifestLines(dir: String, v: Int): Seq[String] = {
    val mf = logDir(dir).resolve(s"v$v.manifest")
    require(Files.exists(mf), s"no snapshot v$v in $dir")
    Files.readAllLines(mf, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty)
  }

  private def parseSeg(fields: Array[String]): Segment = fields match {
    case Array(p, mn, mx) => Segment(p, mn.toLong, mx.toLong, None)
    case Array(p, mn, mx, tag) =>
      Segment(p, mn.toLong, mx.toLong, Some(tag.toLong))
    case other =>
      throw new IllegalStateException(
        s"malformed manifest segment line: ${other.mkString("\t")}")
  }

  /** The raw segment list of v, resolving #base delta chains back to
    * the nearest full manifest (dataChange is applied by `segments`
    * from v's OWN compacted set — a base version's flags are its own).
    * Chain depth is bounded by the log's checkpoint interval.
    */
  private def rawSegments(dir: String, v: Int): Seq[Segment] = {
    val lines = manifestLines(dir, v)
    val base = lines.collectFirst {
      case l if l.startsWith("#base\t") => l.split('\t')(1).toInt
    }
    val own = lines.filterNot(_.startsWith("#"))
    base match {
      case None => own.map(l => parseSeg(l.split('\t')))
      case Some(b) =>
        // a corrupted or cyclic #base pointer must fail like every
        // other malformed-manifest shape — loudly, not by unbounded
        // recursion into a StackOverflowError
        if (b < 0 || b >= v)
          throw new IllegalStateException(
            s"malformed #base $b in manifest v$v of $dir")
        val removed = own.collect {
          case l if l.startsWith("-\t") => l.split('\t')(1)
        }.toSet
        val added = own.collect {
          case l if l.startsWith("+\t") => parseSeg(l.split('\t').drop(1))
        }
        rawSegments(dir, b).filterNot(s => removed(s.relPath)) ++ added
    }
  }

  def segments(dir: String, v: Int): Seq[Segment] = {
    val compacted = metaOf(manifestLines(dir, v)).compacted
    rawSegments(dir, v).map(s => s.copy(dataChange = !compacted(s.relPath)))
  }

  /** Resolved segment lists for every version in [fromV, toV] in ONE
    * forward pass: fromV resolves through its chain once, each later
    * delta applies against the running state — O(window) manifest
    * reads instead of the O(window × interval) per-version chain
    * re-resolution the readChanges/readCdc/vacuum walks would
    * otherwise pay on delta layouts. Index i holds version fromV + i,
    * with dataChange applied from that version's own compacted set.
    */
  private def segmentsWalk(dir: String, fromV: Int,
      toV: Int): IndexedSeq[Seq[Segment]] = {
    var cur: Seq[Segment] = null
    (fromV to toV).map { v =>
      val lines = manifestLines(dir, v)
      val base = lines.collectFirst {
        case l if l.startsWith("#base\t") => l.split('\t')(1).toInt
      }
      val own = lines.filterNot(_.startsWith("#"))
      val raw = base match {
        case Some(b) if cur != null && b == v - 1 =>
          val removed = own.collect {
            case l if l.startsWith("-\t") => l.split('\t')(1)
          }.toSet
          val added = own.collect {
            case l if l.startsWith("+\t") => parseSeg(l.split('\t').drop(1))
          }
          cur.filterNot(s => removed(s.relPath)) ++ added
        case _ => rawSegments(dir, v)
      }
      cur = raw
      val compacted = metaOf(lines).compacted
      raw.map(s => s.copy(dataChange = !compacted(s.relPath)))
    }
  }

  private def metaOf(lines: Seq[String]): ManifestMeta = {
    def vals(key: String): Seq[String] = lines.collect {
      case l if l.startsWith(s"#$key\t") =>
        l.split('\t')(1).split(',').toSeq.filter(_.nonEmpty)
    }.flatten
    ManifestMeta(vals("batches").map(_.toLong).toSet, vals("compacted").toSet,
      vals("cdcdel").toSet, vals("dvs").toSet,
      vals("cdcpre").toSet, vals("cdcpost").toSet,
      lines.collectFirst {
        case l if l.startsWith("#optype\t") => l.split('\t')(1)
      },
      lines.collectFirst {
        case l if l.startsWith("#cluster\t") => l.split('\t')(1)
      })
  }

  def meta(dir: String, v: Int): ManifestMeta = metaOf(manifestLines(dir, v))

  /** Snapshot SCHEMA as of version v — recorded in the manifest
    * (`#schema<TAB><json>`) at every commit, the Delta/Iceberg posture:
    * readers apply the logged schema instead of merging parquet
    * footers, so a snapshot read costs zero footer listing even when
    * segments were written under different (evolved) schemas, and time
    * travel sees the schema AS OF that version. Legacy manifests
    * (written before schema logging) return None and read with their
    * segments' own uniform schema.
    */
  def schemaOf(dir: String, v: Int): Option[org.apache.spark.sql.types.StructType] =
    manifestLines(dir, v).collectFirst {
      case l if l.startsWith("#schema\t") =>
        org.apache.spark.sql.types.DataType.fromJson(l.split('\t')(1))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
    }

  /** Add-only schema evolution gate: every column of the previous
    * snapshot must survive with the same type; columns the new frame
    * adds are appended (nullable — old segments null-fill them on
    * read). Returns the new snapshot schema. Drops and type changes
    * fail loudly: silently narrowing a 100 TB table's schema is how
    * downstream readers lose columns without an error anywhere.
    */
  private def evolvedSchema(prev: Option[org.apache.spark.sql.types.StructType],
      next: org.apache.spark.sql.types.StructType,
      resolver: (String, String) => Boolean)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.StructType
    val merged = prev match {
      case None => next
      case Some(ps) =>
        ps.fields.foreach { f =>
          // column names compare under the SESSION's resolution rules
          // (spark.sql.caseSensitive, default case-insensitive) — a
          // strict == here refused appends that only re-cased a column
          // name, a loud false positive inconsistent with how the rest
          // of the engine resolves the very same columns
          val nf = next.fields.find(n => resolver(n.name, f.name)).getOrElse(
            throw new IllegalArgumentException(
              s"append drops column '${f.name}' present in the previous " +
                "snapshot — snapshot-log schema evolution is add-only"))
          require(nf.dataType.catalogString == f.dataType.catalogString,
            s"append changes the type of '${f.name}': " +
              s"${f.dataType.catalogString} -> ${nf.dataType.catalogString}")
        }
        StructType(ps.fields ++
          next.fields.filterNot(f => ps.fields.exists(p => resolver(p.name, f.name))))
    }
    // nullable throughout: segments written before a column existed
    // null-fill it, so a non-null contract would be a lie on read
    // __graft_dv_* are the read path's reserved (file, row-index) key
    // names: a user column by that name would be silently overwritten
    // by applyDvs, corrupting the anti-join keys and touched-file
    // discovery — refuse it loudly at the schema gate every data-
    // landing op (append/merge/mergeMor, retry variants) passes through
    merged.fields.foreach { f =>
      require(!f.name.startsWith("__graft_dv_"),
        s"column '${f.name}' collides with the snapshot log's reserved " +
          "deletion-vector key namespace (__graft_dv_*) — rename it")
    }
    StructType(merged.fields.map(_.copy(nullable = true)))
  }

  /** The previous snapshot's schema for gating: the logged `#schema`
    * line when present; for LEGACY logs (persisted before schema
    * logging) it is derived from the prior snapshot's parquet footers
    * instead of treating the log as schemaless — otherwise the
    * add-only gate would accept ANY shape against a legacy log and
    * readAsOf would force-apply the new schema to carried legacy
    * segments, silently hiding columns they have that the new frame
    * lacks (the exact narrowing the gate exists to refuse). Costs a
    * footer read only on the legacy path; logs written by this code
    * always hit the manifest line.
    */
  private def gateSchema(spark: SparkSession, dir: String,
      prev: Int): Option[org.apache.spark.sql.types.StructType] =
    if (prev < 0) None
    else schemaOf(dir, prev).orElse(Some(readAsOf(spark, dir, prev).schema))

  /** == Stable column ids (round-17 — Delta's column-mapping `name`
    * mode, the ARCHITECTURE.md design note built) ==
    * Every column gets an integer id at first appearance; the id — not
    * the name — is the column's identity. A RENAME binds a new name to
    * an existing id: zero parquet bytes move, old versions keep
    * reading under their old names (each manifest pins its own
    * name↔id table), and segments keep the PHYSICAL names they were
    * written under, resolved per segment at read time.
    *
    * Persistence, all metadata-sized:
    *  - `#colids<TAB>id=n1>n2>...` in EVERY manifest: per id, the full
    *    name HISTORY (URL-encoded; first = the name at id creation,
    *    last = current). History length 1 for every id ⇒ no rename has
    *    ever happened ⇒ the read path takes today's exact fast path
    *    (zero overhead; the history also disambiguates a rename-back
    *    a>b>a, where cur == orig but mid-history segments exist).
    *  - `_colids` INSIDE each segment dir (one `id<TAB>physName` line
    *    per column, written beside `_zonestats` at segment-write
    *    time): the segment's physical names keyed by id. Written only
    *    once ids exist in the manifest — segments predating the
    *    introduction resolve by each id's CREATION name (their
    *    physical names are exactly the names current at introduction,
    *    since renames require ids).
    *
    * What renames deliberately do NOT touch: sidecar zone-map entries
    * key by STAT NAME (never by column name), so `renameColumn`
    * re-binds the stat EXPRESSIONS in the config and every recorded
    * range stays valid — merge discovery pruning keeps opening 1-of-N
    * on the renamed key (the orphaned-zone-map trap the design note's
    * step 4 warns about). External `spark.read.parquet` of segment
    * dirs sees stale physical names after a rename — Delta documents
    * the same caveat for column mapping; the manifest is the truth.
    */
  final case class ColId(id: Int, history: Seq[String]) {
    def cur: String = history.last
    def orig: String = history.head
  }

  private def encName(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def decName(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Case-insensitive name equality — the engine's default resolver
    * posture (colids must not depend on a live session, so the
    * default rule is pinned here rather than read from a config).
    */
  private def ciEq(a: String, b: String): Boolean = a.equalsIgnoreCase(b)

  private def colidsLine(ids: Seq[ColId]): String =
    "#colids\t" + ids.sortBy(_.id)
      .map(c => s"${c.id}=${c.history.map(encName).mkString(">")}")
      .mkString(",")

  /** The name↔id table as of version v — None on manifests written
    * before ids existed.
    */
  def colidsOf(dir: String, v: Int): Option[Seq[ColId]] =
    manifestLines(dir, v).collectFirst {
      case l if l.startsWith("#colids\t") =>
        l.split('\t')(1).split(',').toSeq.filter(_.nonEmpty).map { tok =>
          val eq = tok.indexOf('=')
          ColId(tok.substring(0, eq).toInt,
            tok.substring(eq + 1).split('>').toSeq.map(decName))
        }
    }

  /** Assign ids for `names` against the previous table: existing
    * (current-name) matches keep their id, new names get maxId+1,
    * maxId+2, … in `names` order. Deterministic given (prev, names) —
    * the per-segment writer and the manifest writer MUST agree, and
    * both derive new-column order from the written frame's column
    * order.
    */
  private def colIdsFor(prev: Option[Seq[ColId]],
      names: Seq[String]): Seq[ColId] = prev match {
    case None => names.zipWithIndex.map { case (n, i) => ColId(i, Seq(n)) }
    case Some(ids) =>
      val next = ids.map(_.id).maxOption.getOrElse(-1) + 1
      val added = names.filterNot(n => ids.exists(c => ciEq(c.cur, n)))
      ids ++ added.zipWithIndex.map { case (n, i) => ColId(next + i, Seq(n)) }
  }

  private def renamedEver(ids: Seq[ColId]): Boolean =
    ids.exists(_.history.size > 1)

  private val ColIdsFile = "_colids"

  /** Record a freshly written segment's physical column names keyed by
    * id. No-op until the manifest carries ids (pre-introduction
    * segments resolve by creation name). Reserved `__graft_dv_*` key
    * columns are never user-renamable and carry no entry.
    */
  private def writeSegColIds(dir: String, segPath: String,
      cols: Seq[String]): Unit = {
    val head = version(dir)
    if (head >= 0) colidsOf(dir, head).foreach { prev =>
      val user = cols.filterNot(_.startsWith("__graft_dv_"))
      val ids = colIdsFor(Some(prev), user)
      val lines = user.map { c =>
        val cid = ids.find(x => ciEq(x.cur, c)).get
        s"${cid.id}\t${encName(c)}"
      }
      Files.write(Paths.get(segPath, ColIdsFile),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
  }

  /** A segment's id→physicalName record, None for segments written
    * before ids existed.
    */
  private def readSegColIds(dir: String, rel: String): Option[Map[Int, String]] = {
    val p = Paths.get(dir, rel, ColIdsFile)
    if (!Files.exists(p)) None
    else Some(Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).map { l =>
        val t = l.indexOf('\t')
        l.substring(0, t).toInt -> decName(l.substring(t + 1))
      }.toMap)
  }

  /** For each field of the CURRENT schema (in order), the physical
    * name to request from this segment's parquet. A column the segment
    * predates maps to a reserved absent name (`__graft_absent_<id>`) —
    * parquet null-fills it, and the name can never collide with a
    * physical column. Legacy (no `_colids`) segments resolve by each
    * id's creation name; when two ids share a creation name (rename
    * away + re-add), only the OLDER id can physically exist in a
    * pre-introduction file, so later duplicates resolve absent.
    */
  private def segPhysNames(dir: String, rel: String, cids: Seq[ColId],
      schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    val fieldIds = schema.fields.toSeq.map { f =>
      cids.find(c => ciEq(c.cur, f.name)).getOrElse(
        throw new IllegalStateException(
          s"column '${f.name}' of the logged schema has no recorded id " +
            s"in $dir — the manifest is inconsistent"))
    }
    readSegColIds(dir, rel) match {
      case Some(m) =>
        fieldIds.map(c => m.getOrElse(c.id, s"__graft_absent_${c.id}"))
      case None =>
        val seen = scala.collection.mutable.Set.empty[String]
        val byId = fieldIds.sortBy(_.id).map { c =>
          val phys =
            if (seen.contains(c.orig.toLowerCase)) s"__graft_absent_${c.id}"
            else c.orig
          seen += c.orig.toLowerCase
          c.id -> phys
        }.toMap
        fieldIds.map(c => byId(c.id))
    }
  }

  /** Re-bind a config SQL expression from `oldName` to `newName`:
    * parse, rename every single-part attribute that resolves to the
    * old name, and render back to SQL. A shape whose rendered SQL does
    * not round-trip through the parser REFUSES the rename (before
    * anything publishes) — a silently broken stat expression would
    * poison every later write to the table.
    */
  private def rebindSql(spark: SparkSession, exprSql: String,
      oldName: String, newName: String): String = {
    val resolver = spark.sessionState.analyzer.resolver
    val parsed = spark.sessionState.sqlParser.parseExpression(exprSql)
    val rebound = parsed.transform {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts.size == 1 && resolver(a.nameParts.head, oldName) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
          Seq(newName))
    }
    val out = rebound.sql
    if (scala.util.Try(
        spark.sessionState.sqlParser.parseExpression(out)).isFailure)
      throw new IllegalArgumentException(
        s"cannot re-bind config expression '$exprSql' across the rename " +
          s"'$oldName' -> '$newName' (rendered form does not re-parse) — " +
          "drop to an equivalent simpler expression first")
    out
  }

  /** == RENAME COLUMN (round-17 — the design note's five steps,
    * built) ==
    * Bind a new name to the column's stable id in ONE metadata commit:
    * zero parquet bytes move, zero segments rewrite. Old versions keep
    * reading under their old names (each manifest pins its own
    * name↔id table); segments keep their physical names and the read
    * path resolves them per segment. The same commit re-binds every
    * config expression that references the old name — stat
    * expressions (sidecar zone-map entries key by STAT NAME, so every
    * recorded range stays valid and merge discovery keeps pruning on
    * the renamed key), CHECK expressions, and NOT NULL column names.
    * Everything is validated BEFORE the manifest publishes; the
    * config rewrite lands immediately after, under the config lock
    * (same single-writer-vs-in-flight contract as constraint adds).
    * Drops remain refused — a drop needs a retention story for the
    * bytes; rename needed none.
    */
  def renameColumn(spark: SparkSession, dir: String, oldName: String,
      newName: String): Int = {
    val prev = version(dir)
    require(prev >= 0, s"nothing to rename in $dir — commit first")
    require(oldName != newName, "rename to the identical name is a no-op")
    val resolver = spark.sessionState.analyzer.resolver
    val sc = schemaOf(dir, prev).getOrElse(
      throw new IllegalArgumentException(
        s"$dir predates schema logging — commit once under the current " +
          "engine before renaming (rename needs the logged schema)"))
    require(sc.fields.exists(f => resolver(f.name, oldName)),
      s"cannot rename unknown column '$oldName'")
    require(resolver(oldName, newName) ||
      !sc.fields.exists(f => resolver(f.name, newName)),
      s"cannot rename '$oldName' to '$newName' — the name is taken")
    require(!newName.startsWith("__graft_dv_"),
      s"'$newName' collides with the snapshot log's reserved " +
        "deletion-vector key namespace (__graft_dv_*)")
    require(!newName.contains('\t') && !newName.contains('\n'),
      "column names must be tab/newline-free")
    val ids = colidsOf(dir, prev).getOrElse(
      colIdsFor(None, sc.fields.toSeq.map(_.name)))
    val newIds = ids.map(c =>
      if (ciEq(c.cur, oldName)) c.copy(history = c.history :+ newName)
      else c)
    val newSchema = org.apache.spark.sql.types.StructType(sc.fields.map(f =>
      if (resolver(f.name, oldName)) f.copy(name = newName) else f))
    val p = configPath(dir)
    val lock = configLocks.computeIfAbsent(
      p.toAbsolutePath.toString, _ => new Object)
    lock.synchronized {
      // every config rewrite validates BEFORE the manifest publishes —
      // a refused rename must leave both the log and the config
      // exactly as they were
      val rewritten: Option[Seq[String]] =
        if (!Files.exists(p)) None
        else Some(Files.readAllLines(p, StandardCharsets.UTF_8).asScala
          .toSeq.map { l =>
            val f = l.split('\t')
            f(0) match {
              case "stat" =>
                s"stat\t${f(1)}\t${rebindSql(spark, f(2), oldName, newName)}"
              case "check" =>
                s"check\t${f(1)}\t${rebindSql(spark, f(2), oldName, newName)}"
              case "notnull" =>
                if (resolver(f(1), oldName)) s"notnull\t$newName" else l
              case "cluster" =>
                s"cluster\t${rebindSql(spark, f(1), oldName, newName)}"
              case _ => l
            }
          })
      val v = prev + 1
      val segs = segments(dir, prev)
      publish(dir, v, commitLines(dir, v, segs, segs,
        meta(dir, prev).carried.copy(opType = Some("rename")),
        Some(s"#schema\t${newSchema.json}"),
        colidsOverride = Some(newIds)))
      rewritten.foreach { lines =>
        val tmp = logDir(dir).resolve(s".config.tmp-${writerToken()}")
        Files.write(tmp,
          lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, p,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      v
    }
  }

  private def metaLines(m: ManifestMeta): Seq[String] =
    (if (m.batches.isEmpty) Nil
     else Seq(s"#batches\t${m.batches.toSeq.sorted.mkString(",")}")) ++
      (if (m.compacted.isEmpty) Nil
       else Seq(s"#compacted\t${m.compacted.toSeq.sorted.mkString(",")}")) ++
      (if (m.cdcDel.isEmpty) Nil
       else Seq(s"#cdcdel\t${m.cdcDel.toSeq.sorted.mkString(",")}")) ++
      (if (m.dvs.isEmpty) Nil
       else Seq(s"#dvs\t${m.dvs.toSeq.sorted.mkString(",")}")) ++
      (if (m.cdcPre.isEmpty) Nil
       else Seq(s"#cdcpre\t${m.cdcPre.toSeq.sorted.mkString(",")}")) ++
      (if (m.cdcPost.isEmpty) Nil
       else Seq(s"#cdcpost\t${m.cdcPost.toSeq.sorted.mkString(",")}")) ++
      m.opType.map(o => s"#optype\t$o").toSeq ++
      m.cluster.map(c => s"#cluster\t$c").toSeq

  /** Writer tags already committed (streaming idempotency: a replayed
    * micro-batch checks its batchId against the LOG, not local state —
    * correct across restarts). The union of current segment tags and
    * the carried-forward `#batches` metadata, so ids survive a
    * compaction that rewrote their segments away. Empty log → empty
    * set.
    */
  def committedBatches(dir: String): Set[Long] = {
    val v = version(dir)
    if (v < 0) Set.empty
    else segments(dir, v).flatMap(_.tag).toSet ++ meta(dir, v).batches
  }

  /** Publish `lines` as manifest v — atomically (hard-link of a fully
    * written temp file: readers never see a partial manifest) and
    * EXCLUSIVELY (the link fails if v already exists, so of two racing
    * writers exactly one wins and the loser fails loudly instead of
    * clobbering — the single-writer contract, enforced rather than
    * assumed).
    */
  /** A name fragment no two writers share — process id + thread id +
    * a random token. Thread id alone is NOT enough: two single-threaded
    * JVMs both run on thread 1, and a shared temp path would let the
    * loser's bytes be published under the winner's link.
    */
  private def writerToken(): String = {
    val pid = ProcessHandle.current().pid()
    val tid = Thread.currentThread().getId
    s"$pid-$tid-${java.util.UUID.randomUUID().toString.take(8)}"
  }

  private[graft] def publish(dir: String, v: Int, lines: Seq[String]): Unit = {
    val tmp = logDir(dir).resolve(s".v$v.manifest.tmp-${writerToken()}")
    // every commit stamps its wall-clock time (`#ts`, epoch millis) —
    // the single choke point, so timestamp time travel (`versionAt`)
    // works for every commit kind without each caller remembering to.
    // Readers ignore unknown # lines; vacuum's horizon materialization
    // preserves them. Write-side metadata only: no query output ever
    // derives from it (the engine's determinism rules are untouched).
    val stamped =
      if (lines.exists(_.startsWith("#ts\t"))) lines
      else lines :+ s"#ts\t${System.currentTimeMillis()}"
    Files.write(tmp, stamped.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val target = logDir(dir).resolve(s"v$v.manifest")
    try Files.createLink(target, tmp)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"snapshot v$v in $dir was committed by another writer", e)
      case _: UnsupportedOperationException =>
        // Filesystems without hard links (some FUSE/NFS/object-store
        // mounts) fall back to a no-replace move: still atomic and
        // loud on most filesystems, though the existence check is not
        // guaranteed atomic with the move everywhere — the documented
        // cluster posture (swap for a CAS service) covers those.
        try Files.move(tmp, target)
        catch {
          case e: java.nio.file.FileAlreadyExistsException =>
            throw new java.util.ConcurrentModificationException(
              s"snapshot v$v in $dir was committed by another writer", e)
        }
    } finally Files.deleteIfExists(tmp)
  }

  private def segLine(s: Segment): String =
    (Seq(s.relPath, s.min.toString, s.max.toString) ++
      s.tag.map(_.toString)).mkString("\t")

  /** Manifest lines for committing `newSegs` at v: a FULL list at
    * checkpoint versions (v % interval == 0, v0, interval 1), a DELTA
    * against v−1 otherwise. The delta is derived from the same
    * (prevSegs, newSegs) pair the caller already holds, and a
    * defensive resolution check falls back to a full manifest if
    * replaying the delta over prevSegs would not reproduce newSegs
    * exactly (order included) — a wrong delta must never be the thing
    * readers reconstruct state from.
    */
  private def commitLines(dir: String, v: Int, newSegs: Seq[Segment],
      prevSegs: Seq[Segment], m: ManifestMeta,
      schemaLine: Option[String],
      colidsOverride: Option[Seq[ColId]] = None): Seq[String] = {
    val interval = checkpointIntervalOf(dir)
    // the name↔id table rides EVERY schema-bearing manifest (full and
    // delta alike — meta lines are per-manifest, never inherited):
    // carried ids keep theirs, columns this commit adds get fresh ones
    // in frame order (the same order writeSegColIds derived them in)
    val colLine = schemaLine.map { sl =>
      val schema = org.apache.spark.sql.types.DataType
        .fromJson(sl.split('\t')(1))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      colidsLine(colidsOverride.getOrElse(colIdsFor(
        if (v == 0) None else colidsOf(dir, v - 1),
        schema.fields.toSeq.map(_.name))))
    }
    val fullLines = newSegs.map(segLine) ++ metaLines(m) ++
      schemaLine.toSeq ++ colLine.toSeq
    if (v == 0 || interval <= 1 || v % interval == 0) fullLines
    else {
      val prevSet = prevSegs.map(_.relPath).toSet
      val newSet = newSegs.map(_.relPath).toSet
      val removed = prevSegs.filterNot(s => newSet(s.relPath))
      val added = newSegs.filterNot(s => prevSet(s.relPath))
      val replay = prevSegs.filterNot(s =>
        removed.exists(_.relPath == s.relPath)) ++ added
      if (replay.map(segLine) != newSegs.map(segLine)) fullLines
      else Seq(s"#base\t${v - 1}") ++
        removed.map(s => s"-\t${s.relPath}") ++
        added.map(s => "+\t" + segLine(s)) ++
        metaLines(m) ++ schemaLine.toSeq ++ colLine.toSeq
    }
  }

  /** == Multi-column zone maps (round-13 follow-on) ==
    * The manifest's zone map covers ONE column (the commit's statsCol);
    * production formats keep per-file min/max for MANY columns (Delta's
    * first-32-columns stats, Iceberg's column metrics). Extra columns
    * ride an immutable per-segment SIDECAR (`_zonestats`, one tiny
    * text file of `name<TAB>min<TAB>max` lines INSIDE the segment dir —
    * underscore-prefixed, so Spark's file index ignores it) written at
    * segment-write time from the SAME persisted-parquet scan discipline
    * as the manifest zone map. No manifest format change: delta
    * manifests, vacuum (segment dirs delete wholesale) and optimize
    * (new segments get fresh sidecars) all compose for free, and a
    * segment with NO sidecar (or no entry for the asked column) is
    * simply never skipped — pruning stays safe under mixed histories.
    * All stats are long-quantized, the engine-wide zone-map currency
    * (cents / epoch seconds / epoch days).
    */
  private val ZoneStatsFile = "_zonestats"

  /** ONE stat pass per written segment: the primary zone-map min/max
    * AND every resolvable configured sidecar column compute in a
    * single aggregate over the persisted parquet (a second scan per
    * segment was q208's dominant overhead), the sidecar writes, and
    * the primary pair returns for the manifest line. Stats evaluate
    * over the WRITTEN parquet, never the input frame — a
    * non-deterministic or re-evaluated input (rand(), a source mutated
    * between jobs) would otherwise record zone maps disagreeing with
    * the rows actually written, and pruned reads would silently skip
    * matching segments. Configured stats whose expression does not
    * resolve against the segment's own schema are skipped (a column
    * added by later evolution starts recording once segments carry it
    * — absent stats only mean "never skipped", never a wrong skip).
    */
  /** Reserved sidecar entry: the segment's ROW COUNT, recorded by the
    * same one-pass stat aggregate every writer already runs (min = max
    * = count). Delta logs numRecords per file for exactly this —
    * `segmentHealth` reads table row counts as METADATA instead of
    * scanning, and only legacy segments (written before the entry
    * existed) fall back to a scan. Never a pruning stat; the "__"
    * namespace is refused for user stat names at reset/evolve.
    */
  private val RowsStatName = "__rows"

  /** Sidecar file beside `_zonestats`: base64 serialized Bloom filters
    * keyed by stat name, one per bloom-configured stat the segment
    * resolved (see the bloom scaladoc at `bloomSpecOf`).
    */
  private val BloomStatsFile = "_bloomstats"

  /** The one-pass segment stat aggregate, resolved against a frame
    * with the segment's schema: primary min/max/count, every resolved
    * sidecar stat's min/max, CHECK/NOT-NULL violation counters and
    * bloom sketches all ride ONE aggregate — zero extra scans beyond
    * whatever pass evaluates it (q208's rule).
    */
  private final case class SegStatPlan(
      resolved: Seq[(String, String)],
      checks: Seq[(String, String)],
      notNulls: Seq[String],
      blooms: Seq[(String, String)],
      aggs: Seq[Column])

  private def segStatPlan(spark: SparkSession, dir: String,
      schemaDf: DataFrame, statsCol: Column): SegStatPlan = {
    val resolved = statsColsOf(dir).filter { case (_, e) =>
      scala.util.Try(schemaDf.select(expr(e))).isSuccess
    }
    // bloom-configured stats ride the SAME one-row aggregate as one
    // more (binary) agg column each — zero extra scans
    val bloomSpec = bloomSpecOf(dir)
    val blooms = resolved.filter { case (n, _) => bloomSpec.contains(n) }
    if (blooms.nonEmpty) graft.functions.BloomAgg.ensureRegistered(spark)
    // CHECK constraints ride the SAME one-row aggregate — zero extra
    // scans; a check that cannot resolve fails loudly here (silently
    // skipping a constraint is how bad rows land unreported)
    val checks = checksOf(dir)
    // NOT NULL columns absent from this segment's schema are the
    // null-fill case the addNotNull head-scan refuses up front; a
    // segment written after the constraint always carries the column
    val notNulls = notNullsOf(dir).filter(c => schemaDf.columns.exists(
      spark.sessionState.analyzer.resolver(_, c)))
    val aggs = Seq(min(statsCol).cast("long").as("__mn"),
      max(statsCol).cast("long").as("__mx"),
      count(lit(1)).as("__cnt")) ++
      resolved.zipWithIndex.flatMap { case ((_, e), i) =>
        Seq(min(expr(e)).cast("long").as(s"__amn$i"),
          max(expr(e)).cast("long").as(s"__amx$i"))
      } ++
      checks.zipWithIndex.map { case ((_, e), i) =>
        // SQL CHECK semantics: only a row where the expression is
        // provably FALSE violates; null passes
        sum(when(expr(e).isNotNull && !expr(e), 1L).otherwise(0L))
          .as(s"__chk$i")
      } ++
      notNulls.zipWithIndex.map { case (c, i) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn$i")
      } ++
      blooms.zipWithIndex.map { case ((n, e), i) =>
        val (items, p) = bloomSpec(n)
        call_function(graft.functions.BloomAgg.name,
          xxhash64(expr(e)), lit(items), lit(p)).as(s"__bl$i")
      }
    SegStatPlan(resolved, checks, notNulls, blooms, aggs)
  }

  /** Constraint refusals + sidecar/col-id writes from the evaluated
    * stat aggregate (`v`: alias → value). Returns the primary
    * (min, max). Shared by the observe-fold write path and the grouped
    * per-bucket OPTIMIZE stats.
    */
  private def segStatFinish(dir: String, segPath: String,
      cols: Seq[String], p: SegStatPlan, v: String => Any): (Long, Long) = {
    def longAt(name: String): Option[Long] =
      Option(v(name)).map(_.asInstanceOf[Number].longValue())
    p.checks.zipWithIndex.foreach { case ((n, e), i) =>
      val bad = longAt(s"__chk$i").getOrElse(0L)
      if (bad > 0L)
        throw new IllegalArgumentException(
          s"CHECK constraint '$n' ($e) violated by $bad rows — the commit " +
            "is refused before any manifest publishes; the orphan segment " +
            "is reclaimed by vacuum")
    }
    p.notNulls.zipWithIndex.foreach { case (c, i) =>
      val bad = longAt(s"__nn$i").getOrElse(0L)
      if (bad > 0L)
        throw new IllegalArgumentException(
          s"CHECK constraint violated: NOT NULL column '$c' received " +
            s"$bad null rows — the commit is refused before any manifest " +
            "publishes")
    }
    val cnt = longAt("__cnt").getOrElse(0L)
    // a resolved-but-ALL-NULL stat records a SENTINEL line ("-") — the
    // segment DID record under the current spec, there is just no range
    // to prune on. Without it, coverage audits read the segment as
    // pre-evolution and a selection policy could rewrite it pointlessly
    // (round-15 advice); sidecarStats skips sentinels, so pruning never
    // sees a fake range.
    val lines = s"$RowsStatName\t$cnt\t$cnt" +:
      p.resolved.zipWithIndex.map { case ((n, _), i) =>
        (longAt(s"__amn$i"), longAt(s"__amx$i")) match {
          case (Some(mn), Some(mx)) => s"$n\t$mn\t$mx"
          case _ => s"$n\t-\t-"
        }
      }
    Files.write(Paths.get(segPath, ZoneStatsFile),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    if (p.blooms.nonEmpty) {
      val blines = p.blooms.zipWithIndex.map { case ((n, _), i) =>
        val bytes = v(s"__bl$i").asInstanceOf[Array[Byte]]
        s"$n\t${java.util.Base64.getEncoder.encodeToString(bytes)}"
      }
      Files.write(Paths.get(segPath, BloomStatsFile),
        blines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    writeSegColIds(dir, segPath, cols)
    (longAt("__mn"), longAt("__mx")) match {
      case (Some(mn), Some(mx)) => (mn, mx)
      case _ => (Long.MaxValue, Long.MinValue)
    }
  }

  /** Write `df` as a segment AND evaluate its stat aggregate in the
    * SAME pass via `observe` (CollectMetrics) — the round-17
    * optimization replacing the former write-then-re-read shape, which
    * paid a second full scan of every committed segment just to record
    * its sidecar (guide §1.2: remove unnecessary passes). Values are
    * identical by construction: the observed aggregate sees exactly
    * the rows the write persists, with the same expressions the
    * re-read aggregated. Refusals (CHECK/NOT NULL) still fire before
    * any manifest publishes — the segment data is on disk either way,
    * an orphan reclaimed by vacuum.
    */
  private def writeSegWithStats(df: DataFrame, dir: String,
      segPath: String, statsCol: Column): (Long, Long) = {
    val (mn, mx, _) = writeSegWithStatsN(df, dir, segPath, statsCol)
    (mn, mx)
  }

  /** `writeSegWithStats` that also returns the observed row count —
    * for callers (restore) that branch on an empty rewrite without
    * paying a separate count job.
    *
    * Deliberately NOT the `Observation` helper: Observation initializes
    * the session's `observationManager` lazy field, whose value is not
    * java-serializable — and Spark ML models keep their training
    * summary's SparkSession reference inside the scoring UDF closure,
    * so one Observation anywhere in the session made every LATER
    * ML-model transform die with Task not serializable (found by the
    * full-sweep verify: q173 poisoned q138). The string-named
    * `observe` overload plants the same CollectMetrics node without
    * ever touching the manager; metrics come back through a scoped
    * QueryExecutionListener keyed on a per-write unique name. Listener
    * delivery is async on the shared bus — if the row has not arrived
    * within the bound (never observed; belt-and-braces for a dropped
    * event), the stat aggregate falls back to the pre-round-17
    * two-pass re-read, which is slower but value-identical.
    */
  private def writeSegWithStatsN(df: DataFrame, dir: String,
      segPath: String, statsCol: Column): (Long, Long, Long) = {
    val spark = df.sparkSession
    val plan = segStatPlan(spark, dir, df, statsCol)
    val obsName =
      s"__graft_segstats_${java.util.UUID.randomUUID().toString.take(12)}"
    @volatile var metric: Option[org.apache.spark.sql.Row] = None
    val latch = new java.util.concurrent.CountDownLatch(1)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit =
        qe.observedMetrics.get(obsName).foreach { r =>
          metric = Some(r)
          latch.countDown()
        }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val observed =
      try {
        df.observe(obsName, plan.aggs.head, plan.aggs.tail: _*)
          .write.mode("overwrite").parquet(segPath)
        if (latch.await(60, java.util.concurrent.TimeUnit.SECONDS)) metric
        else None
      } finally spark.listenerManager.unregister(listener)
    observed match {
      case Some(r) =>
        val at = (n: String) => r.get(r.fieldIndex(n))
        val (mn, mx) = segStatFinish(dir, segPath, df.columns.toSeq, plan, at)
        (mn, mx, Option(at("__cnt"))
          .map(_.asInstanceOf[Number].longValue()).getOrElse(0L))
      case None =>
        // two-pass fallback: aggregate the written segment (the shape
        // every commit paid before round 17)
        val rdf = spark.read.parquet(segPath)
        val plan2 = segStatPlan(spark, dir, rdf, statsCol)
        val r = rdf.agg(plan2.aggs.head, plan2.aggs.tail: _*).head()
        val at = (n: String) => r.get(r.fieldIndex(n))
        val (mn, mx) =
          segStatFinish(dir, segPath, rdf.columns.toSeq, plan2, at)
        (mn, mx, Option(at("__cnt"))
          .map(_.asInstanceOf[Number].longValue()).getOrElse(0L))
    }
  }

  /** The Bloom sidecars of a segment — empty when none were recorded
    * (pre-config segments, or a table that never configured one);
    * absent blooms never skip, the zone-map rule.
    */
  def sidecarBloom(dir: String, rel: String): Map[String, Array[Byte]] = {
    val p = Paths.get(dir, rel, BloomStatsFile)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).map { l =>
        val Array(n, b) = l.split('\t')
        n -> java.util.Base64.getDecoder.decode(b)
      }.toMap
  }

  /** The sidecar stats of a segment — empty when none were recorded.
    * Sentinel ("-") lines — resolved-but-all-null stats — are skipped:
    * they carry coverage, never a prunable range (`sidecarCovered`
    * reads them).
    */
  def sidecarStats(dir: String, rel: String): Map[String, (Long, Long)] = {
    val p = Paths.get(dir, rel, ZoneStatsFile)
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(l => l.nonEmpty && !l.endsWith("\t-\t-"))
      .map { l =>
        val Array(n, mn, mx) = l.split('\t')
        n -> (mn.toLong, mx.toLong)
      }.toMap
  }

  /** The stat names a segment RECORDED under the spec it was written
    * with — real ranges AND all-null sentinels, minus the reserved
    * __rows entry. The coverage signal `segmentHealth` reports (a
    * recorded-but-all-null column must not read as pre-evolution).
    */
  def sidecarCovered(dir: String, rel: String): Set[String] = {
    val p = Paths.get(dir, rel, ZoneStatsFile)
    if (!Files.exists(p)) Set.empty
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty)
      .map(_.split('\t')(0))
      .filterNot(_ == RowsStatName)
      .toSet
  }

  /** Zone-map-pruned read on a SIDECAR column: segments whose recorded
    * [min, max] for `statName` misses [lo, hi] are skipped BEFORE any
    * file listing; segments without a recorded range are kept (safe).
    * `statExpr` re-applies exactly as the residual, so the answer is
    * independent of which segments carried stats. Returns
    * (frame, segmentsScanned, segmentsTotal) like `readAsOfFiltered`.
    */
  def readAsOfFilteredOn(spark: SparkSession, dir: String, v: Int,
      statName: String, statExpr: Column, lo: Long,
      hi: Long): (DataFrame, Int, Int) = {
    val segs = segments(dir, v)
    val hit = segs.filter { s =>
      sidecarStats(dir, s.relPath).get(statName) match {
        case Some((mn, mx)) => mn <= hi && mx >= lo
        case None => true
      }
    }
    val df =
      if (hit.isEmpty) readAsOf(spark, dir, v).limit(0)
      else {
        val dvs = meta(dir, v).dvs
        applyDvs(spark, dir, dvs,
          readSegs(spark, dir, v, hit.map(_.relPath),
            keepDvKeys = dvs.nonEmpty))
          .filter(statExpr >= lo && statExpr <= hi)
      }
    (df, hit.size, segs.size)
  }

  /** Commits `df` as a new immutable segment; the new snapshot is the
    * previous segment list plus this one, with batch-id and compaction
    * metadata carried forward. `statsCol` must evaluate to a long —
    * its min/max over the WRITTEN segment become the zone map (one
    * metadata-sized 1-row aggregate; the only driver action).
    * Returns the new version number.
    */
  def append(df: DataFrame, dir: String, statsCol: Column,
      batchTag: Option[Long] = None): Int = {
    val st = stageAppend(df, dir, statsCol, batchTag)
    publish(st.dir, st.v, st.lines)
    st.v
  }

  /** A fully prepared single-table commit — everything the op did
    * except the manifest publish. The segment data is already on disk
    * but INVISIBLE (nothing references it) until `lines` publish as
    * `v<v>.manifest`; an abandoned stage is an orphan segment dir,
    * reclaimed by vacuum like any publish-race loser. The multi-table
    * transaction (SnapshotTxn) stages every participant first, then
    * makes ONE atomic intent publish the cross-table commit point.
    */
  final case class StagedCommit(dir: String, v: Int, lines: Seq[String])

  /** `append` minus the publish (see StagedCommit). */
  def stageAppend(df: DataFrame, dir: String, statsCol: Column,
      batchTag: Option[Long] = None): StagedCommit = {
    Files.createDirectories(logDir(dir))
    val prev = version(dir)
    val v = prev + 1
    // schema gate BEFORE any data lands: a refused append must leave
    // neither a manifest nor an orphan segment directory behind
    val snapSchema = evolvedSchema(
      gateSchema(df.sparkSession, dir, prev), df.schema,
      df.sparkSession.sessionState.analyzer.resolver)
    // The segment name carries a per-writer token: the manifest link is
    // exclusive, but two racing appends that both computed version v
    // would otherwise BOTH write seg-<v> (mode overwrite) BEFORE the
    // publish race resolves — the loser's data would silently replace
    // the winner's committed rows under the winner's manifest and zone
    // map. Unique names make the manifest's exclusivity protect the
    // data too; the loser's orphan directory is reclaimed by vacuum.
    val rel = s"seg-$v-${writerToken()}"
    val segPath = Paths.get(dir, rel).toString
    // write + stat aggregate in ONE pass (observe-fold, guide §1.2)
    val (mn, mx) = writeSegWithStats(df, dir, segPath, statsCol)
    val carried = if (prev < 0) Nil else segments(dir, prev)
    // batches/compacted carry forward; cdcDel does NOT — it records
    // what its OWN version deleted, never standing state
    val carriedMeta = (if (prev < 0) ManifestMeta(Set.empty, Set.empty)
      else meta(dir, prev).carried).copy(opType = Some("append"))
    StagedCommit(dir, v, commitLines(dir, v,
      carried :+ Segment(rel, mn, mx, batchTag), carried, carriedMeta,
      Some(s"#schema\t${snapSchema.json}")))
  }

  /** == Deletion vectors (merge-on-read, round 14) ==
    * Copy-on-write `delete` prices a 10-row delete at a full rewrite
    * of every TOUCHED segment; `deleteMor` instead commits a
    * delete-sized tombstone segment of (file, row-index) pairs and
    * every snapshot read anti-joins it away — the Delta deletion-
    * vector / Iceberg positional-delete posture. Row positions come
    * from the parquet source's own `_metadata.row_index` (stable per
    * file) keyed by the file's dir-relative path, so a moved table
    * still resolves. Cost at 100 TB: the DV table is delete-sized and
    * broadcast by the planner, predicates on data columns still push
    * through the anti-join's left side into the scan, and the set is
    * bounded by compaction cadence — `compact`/`optimize` materialize
    * DVs into their rewrite and reset the set.
    */
  private val DvFileCol = "__graft_dv_file"
  private val DvPosCol = "__graft_dv_pos"

  /** A scanned row's dir-relative file path — the DV match key. */
  private def dvFileKey: Column =
    regexp_extract(col("_metadata.file_path"), "(seg-[^/]+/[^/]+)$", 1)

  /** Anti-join `df` (a raw multi-segment scan) against the active
    * deletion vectors. With `keepPos` the (file, row-index) key
    * columns stay on the result — delete/merge reuse them for touched-
    * file discovery (input_file_name() is refused above a multi-source
    * join; the metadata projection below the join is not).
    */
  private def applyDvs(spark: SparkSession, dir: String, dvs: Set[String],
      df: DataFrame, keepPos: Boolean = false): DataFrame = {
    if (dvs.isEmpty && !keepPos) df
    else {
      // a mapped (renamed-table) readSegs pre-attaches the key columns
      // per relation — _metadata does not resolve above its union
      val tagged =
        if (df.columns.contains(DvFileCol)) df
        else df
          .withColumn(DvFileCol, dvFileKey)
          .withColumn(DvPosCol, col("_metadata.row_index"))
      if (dvs.isEmpty) tagged
      else {
        val dvDf = spark.read
          .parquet(dvs.toSeq.sorted.map(r => absPath(dir, r)): _*)
          .select(col(DvFileCol), col(DvPosCol))
        val out = tagged.join(dvDf, Seq(DvFileCol, DvPosCol), "left_anti")
        if (keepPos) out else out.drop(DvFileCol, DvPosCol)
      }
    }
  }

  /** A version's commit wall-clock time (epoch ms): the `#ts` stamp
    * when present, the manifest file's mtime for legacy manifests
    * written before stamping (close enough for retention decisions;
    * note a vacuum's horizon materialization rewrites the file, so
    * legacy-mtime fidelity ends there — stamped logs are exact).
    */
  def commitTimeOf(dir: String, v: Int): Long =
    manifestLines(dir, v).collectFirst {
      case l if l.startsWith("#ts\t") => l.split('\t')(1).toLong
    }.getOrElse(
      Files.getLastModifiedTime(logDir(dir).resolve(s"v$v.manifest"))
        .toMillis)

  /** Timestamp time travel (Delta's `timestampAsOf`): the LATEST
    * version committed at or before `tsMillis` — what the table looked
    * like at a wall-clock instant, for reproducing a training run
    * pinned by date rather than by version number. Fails loudly when
    * every surviving version is newer (the instant predates the
    * retention horizon, or the log entirely) AND when the instant is
    * later than the newest commit — Delta's `timestampAsOf` contract:
    * a typo'd future date (wrong year) must error, not silently read
    * HEAD as if the table's state at that instant were known. Wall
    * clocks are not monotone across writers; max-version-at-or-before
    * is the standard resolution (Delta's), and a single-writer log is
    * exact.
    */
  def versionAt(dir: String, tsMillis: Long): Int = {
    val latest = version(dir)
    require(latest >= 0, s"no snapshots in $dir")
    val stamped = (0 to latest).filter { v =>
      Files.exists(logDir(dir).resolve(s"v$v.manifest"))
    }.map(v => v -> commitTimeOf(dir, v))
    require(stamped.exists(_._2 <= tsMillis),
      s"no snapshot in $dir at or before ts=$tsMillis " +
        "(predates the log or its retention horizon)")
    require(tsMillis <= stamped.map(_._2).max,
      s"ts=$tsMillis is after the latest commit " +
        s"(${stamped.map(_._2).max}) in $dir — a future instant has no " +
        "defined snapshot (Delta's timestampAsOf contract); read the " +
        "head version explicitly instead")
    stamped.filter(_._2 <= tsMillis).map(_._1).max
  }

  def readAsOfTimestamp(spark: SparkSession, dir: String,
      tsMillis: Long): DataFrame =
    readAsOf(spark, dir, versionAt(dir, tsMillis))

  /** The table exactly as of snapshot `v`, under the schema logged AT
    * v: segments written before a column was added null-fill it, no
    * parquet footer is ever opened for schema discovery, and v's
    * deletion vectors are anti-joined away.
    */
  def readAsOf(spark: SparkSession, dir: String, v: Int): DataFrame = {
    val segs = segments(dir, v)
    require(segs.nonEmpty, s"snapshot v$v is empty")
    val dvs = meta(dir, v).dvs
    applyDvs(spark, dir, dvs,
      readSegs(spark, dir, v, segs.map(_.relPath), keepDvKeys = dvs.nonEmpty))
  }

  /** Change-data feed: the rows ADDED in versions (fromV, toV],
    * collected by walking each version's manifest against its
    * predecessor and keeping only the DATA-CHANGE segments that
    * version introduced. Compaction segments carry dataChange = false
    * and never flow: they REWRITE rows that already streamed through
    * the feed, so a read spanning a compaction must not re-deliver the
    * table as inserts — and because the walk is per-version (not a
    * fromV-vs-toV set diff), an append committed BEFORE a later
    * compaction still surfaces even though the compacted manifest no
    * longer lists its segment. fromV = -1 means "delta from empty",
    * which IS the toV snapshot. The walk reads O(toV−fromV) manifests
    * — driver-side metadata; the rows themselves are plain pruned
    * parquet scans of exactly the appended segments, never a diff of
    * the full table (q162's content-diff is for when no log exists).
    * A range whose manifests were vacuumed away fails loudly. Empty
    * delta → empty frame with toV's schema.
    */
  def readChanges(spark: SparkSession, dir: String,
      fromV: Int, toV: Int): DataFrame = {
    if (fromV < 0) readAsOf(spark, dir, toV)
    else {
      require(toV >= fromV, s"readChanges range [$fromV, $toV] inverted")
      val walk = segmentsWalk(dir, fromV, toV)
      val delta = ((fromV + 1) to toV).flatMap { w =>
        val prevSet = walk(w - 1 - fromV).map(_.relPath).toSet
        walk(w - fromV).filter(_.dataChange).filterNot(s => prevSet(s.relPath))
      }.distinctBy(_.relPath)
      if (delta.isEmpty) readAsOf(spark, dir, toV).limit(0)
      else {
        // delta rows surface under toV's schema — an incremental
        // consumer reading across a column-add sees the evolved shape
        // (pre-add segments null-fill), matching what a readAsOf(toV)
        // of the same rows would return; across a RENAME the same
        // holds for names (readSegs resolves physical names per
        // segment via the id table)
        readSegs(spark, dir, toV, delta.map(_.relPath))
      }
    }
  }

  /** Compaction: commit a NEW version whose manifest lists ONE
    * rewritten segment holding the current snapshot — the small-file
    * fix for long append histories. Old versions still read their old
    * segments (nothing is deleted; `vacuum` reclaims). The rewritten
    * segment is marked `#compacted` (dataChange = false → the change
    * feed never re-delivers it) and the batch-id union of the prior
    * manifest carries forward as `#batches`, so a checkpoint-recovery
    * replay of an already-committed micro-batch still hits the
    * idempotency gate after compaction. Returns the new version.
    */
  def compact(spark: SparkSession, dir: String, statsCol: Column): Int = {
    val prev = version(dir)
    require(prev >= 0, s"nothing to compact in $dir")
    val v = prev + 1
    // same per-writer token as append: a racing committer must not be
    // able to overwrite this rewrite's files before the publish race
    val rel = s"seg-$v-${writerToken()}"
    val segPath = Paths.get(dir, rel).toString
    // rewrite + stat aggregate in ONE pass (observe-fold, guide §1.2)
    val (mn, mx) =
      writeSegWithStats(readAsOf(spark, dir, prev), dir, segPath, statsCol)
    // the rewrite materializes the evolved schema into the segment, and
    // the snapshot schema carries forward unchanged
    publish(dir, v, commitLines(dir, v, Seq(Segment(rel, mn, mx)),
      segments(dir, prev),
      ManifestMeta(committedBatches(dir), Set(rel),
        opType = Some("compact")),
      schemaOf(dir, prev).map(sc => s"#schema\t${sc.json}")))
    v
  }

  /** OPTIMIZE with multi-dimensional clustering — Delta's
    * `OPTIMIZE ... ZORDER BY (dims)` as a log commit: rewrite the
    * current snapshot into up to 2^bucketBits segments CLUSTERED on
    * `dims` (ZOrder Morton codes, bucketed by the code's TOP bits —
    * Morton-boundary-ALIGNED, so every segment's zone map bounds every
    * interleaved dimension by construction, the trade the ZOrder
    * scaladoc discusses: deterministic tight bounds over balanced file
    * sizes), so `readAsOfFiltered` prunes segments on dimensions the
    * append order never clustered. Content-identical — a compaction
    * variant: new segments carry dataChange = false (the change feed
    * never re-delivers them), batch ids carry forward, old versions
    * still read their old segments, vacuum reclaims them later.
    *
    * Cost shape at 100 TB: ONE data pass (range-repartition on the
    * Morton code + partitionBy write into per-bucket directories),
    * then per-bucket DIRECTORY MOVES into segment dirs (metadata, no
    * second copy) and one tiny min/max stat scan per segment. This is
    * the standard clustering rewrite every lakehouse pays, priced
    * write-once like `compact`.
    *
    * A CRASHED optimize leaves its hidden `.opt-*` staging dir behind;
    * `vacuum` reclaims those only past an AGE horizon
    * (`staleOptimizeAgeMs`) so a CONCURRENT optimize's live staging —
    * whose files are by definition freshly written — survives a vacuum
    * (the same timestamp-retention trade Delta's vacuum makes for its
    * own tombstones). Staging dirs are invisible to every read path
    * either way.
    */
  def optimize(spark: SparkSession, dir: String, statsCol: Column,
      dims: Seq[Column], bucketBits: Int = 2, bits: Int = 16): Int =
    optimizeImpl(spark, dir, statsCol, dims, bucketBits, bits, None)

  /** OPTIMIZE with no dims: applies the table's DECLARED clustering
    * spec (round-17 item 7) — re-clustering as a policy the table
    * carries, not an argument every maintenance job must know. The
    * commit records the spec it applied (`#cluster` manifest line,
    * surfaced by `history`).
    */
  def optimize(spark: SparkSession, dir: String, statsCol: Column): Int =
    optimizeDeclared(spark, dir, statsCol)

  def optimizeDeclared(spark: SparkSession, dir: String, statsCol: Column,
      bucketBits: Int = 2, bits: Int = 16): Int = {
    val spec = clusterByOf(dir)
    require(spec.nonEmpty,
      s"no declared clustering spec in $dir — setClusterBy first, or " +
        "pass dims explicitly")
    optimizeImpl(spark, dir, statsCol, spec.map(expr), bucketBits, bits,
      Some(spec.mkString(",")))
  }

  private def optimizeImpl(spark: SparkSession, dir: String,
      statsCol: Column, dims: Seq[Column], bucketBits: Int, bits: Int,
      declared: Option[String]): Int = {
    require(bucketBits >= 1 && bucketBits <= 8,
      s"bucketBits $bucketBits outside [1, 8]")
    val prev = version(dir)
    require(prev >= 0, s"nothing to optimize in $dir")
    val v = prev + 1
    val newSegs = clusterRewrite(spark, dir, v,
      readAsOf(spark, dir, prev), statsCol, dims, bucketBits, bits)
    // An EMPTY snapshot (e.g. after a delete-all, which leaves a
    // readable 0-row rewrite segment) yields zero bucket dirs; a
    // manifest with no segment lines would make readAsOf of the new
    // head throw even though the previous head read fine — a scheduled
    // OPTIMIZE must never render the table unreadable. Nothing to
    // cluster → skip the commit entirely.
    if (newSegs.isEmpty) return prev
    publish(dir, v, commitLines(dir, v, newSegs, segments(dir, prev),
      ManifestMeta(committedBatches(dir), newSegs.map(_.relPath).toSet,
        opType = Some("optimize"), cluster = declared),
      schemaOf(dir, prev).map(sc => s"#schema\t${sc.json}")))
    v
  }

  /** The clustering rewrite both OPTIMIZE flavors share: one data pass
    * (range-repartition on the Morton code + partitionBy write into a
    * hidden staging dir), per-bucket directory MOVES into segment dirs
    * (metadata, no second copy), one stat scan per segment. Returns
    * the new segments — empty when `df` had no rows (staging cleaned
    * either way; callers decide whether an empty rewrite still
    * commits).
    */
  private def clusterRewrite(spark: SparkSession, dir: String, v: Int,
      df: DataFrame, statsCol: Column, dims: Seq[Column], bucketBits: Int,
      bits: Int): Seq[Segment] = {
    val token = writerToken()
    val staging = Paths.get(dir, s".opt-$v-$token")
    val shift = dims.size * bits - bucketBits
    ZOrder.withZ(df, dims, bits)
      .withColumn("__zb", shiftright(col("__z"), shift))
      .repartitionByRange(1 << bucketBits, col("__zb"), col("__z"))
      .sortWithinPartitions(col("__zb"), col("__z"))
      .drop("__z")
      .write.partitionBy("__zb").mode("overwrite").parquet(staging.toString)
    val bucketDirs = listed(staging)(_.filter(
      _.getFileName.toString.startsWith("__zb=")).toSeq)
      .sortBy(_.getFileName.toString)
    // Per-bucket stats as ONE grouped aggregate over the staged output
    // (column-pruned parquet read of just the stat columns) instead of
    // one full stat job per bucket dir — 2^bucketBits jobs become one
    // (guide §2.4: fewer passes; the per-group agg values are identical
    // to the per-dir aggregates because partitionBy wrote exactly each
    // group's rows into its dir).
    val newSegs = if (bucketDirs.isEmpty) Seq.empty[Segment] else {
      val statDf = spark.read.parquet(staging.toString)
      val plan = segStatPlan(spark, dir, statDf.drop("__zb"), statsCol)
      val byBucket = statDf
        .groupBy(col("__zb").cast("string").as("__zbkey"))
        .agg(plan.aggs.head, plan.aggs.tail: _*)
        .collect().map(r => r.getString(0) -> r).toMap
      val segCols = statDf.drop("__zb").columns.toSeq
      bucketDirs.map { bd =>
        val b = bd.getFileName.toString.stripPrefix("__zb=")
        val rel = s"seg-$v-z$b-$token"
        Files.move(bd, Paths.get(dir, rel))
        val row = byBucket(b)
        val (mn, mx) = segStatFinish(dir, absPath(dir, rel), segCols, plan,
          name => row.get(row.fieldIndex(name)))
        Segment(rel, mn, mx)
      }
    }
    walked(staging)(_.toSeq).reverse.foreach(Files.deleteIfExists)
    newSegs
  }

  /** == Per-segment health (round-15 item 7) ==
    * The audit surface a maintenance policy reads: per live segment of
    * version `v`, its row count, on-disk bytes, active deletion-vector
    * tombstones, the resulting tombstone ratio, and how many of the
    * table's configured sidecar stats it actually recorded (pre-
    * evolution segments cover fewer — they are never wrongly skipped,
    * but they also never prune on the new dimension until rewritten).
    * Cost shape: ONE metadata-column scan of the snapshot (only
    * `_metadata.file_path` is projected — no data pages), one
    * delete-sized read of the DV segments, and driver-side file-size
    * listing; at 100 TB this is a metadata query, which is the point —
    * `optimizeIncremental`'s selection policy runs it before touching
    * any data.
    */
  final case class SegmentHealth(relPath: String, rows: Long, bytes: Long,
      dvRows: Long, tombstoneRatio: Double, statsCovered: Int,
      bloomsCovered: Int = 0)

  def segmentHealth(spark: SparkSession, dir: String,
      v: Int): Seq[SegmentHealth] = {
    val segs = segments(dir, v)
    val dvs = meta(dir, v).dvs
    def bySeg(df: DataFrame, fileCol: Column): Map[String, Long] =
      df.select(regexp_extract(fileCol, "(seg-[^/]+)/[^/]+$", 1).as("seg"))
        .groupBy(col("seg")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // row counts come from the sidecar's reserved __rows entry —
    // recorded by every writer's one-pass stat aggregate, so the
    // health scan is pure metadata at any table size; only LEGACY
    // segments (written before the entry) pay a column-free scan
    val sidecars = segs.map(s => s.relPath -> sidecarStats(dir, s.relPath))
      .toMap
    val legacy = segs.filterNot(s => sidecars(s.relPath).contains(RowsStatName))
    val scanned =
      if (legacy.isEmpty) Map.empty[String, Long]
      else bySeg(
        // the dv key column is the dir-relative file path — derived
        // per relation, so it survives the mapped path's union where
        // a bare _metadata reference would not resolve
        readSegs(spark, dir, v, legacy.map(_.relPath), keepDvKeys = true),
        col(DvFileCol))
    val dvBySeg =
      if (dvs.isEmpty) Map.empty[String, Long]
      else bySeg(
        spark.read.parquet(dvs.toSeq.sorted.map(r => absPath(dir, r)): _*),
        col(DvFileCol))
    segs.map { s =>
      val bytes = walked(Paths.get(dir, s.relPath))(
        _.filter(Files.isRegularFile(_)).map(Files.size).sum)
      val raw = sidecars(s.relPath).get(RowsStatName).map(_._1)
        .getOrElse(scanned.getOrElse(s.relPath, 0L))
      // tombstones only count against files the segment still owns
      // (stale DV entries for rewritten-away names match nothing)
      val dv = math.min(dvBySeg.getOrElse(s.relPath, 0L), raw)
      SegmentHealth(s.relPath, raw, bytes, dv,
        if (raw == 0) 0.0 else dv.toDouble / raw,
        sidecarCovered(dir, s.relPath).size,
        // bloom coverage is the maintenance signal for the bloom
        // config: a bloom-configured stat whose segments predate the
        // config reads as 0 here — the selection policy's cue that an
        // OPTIMIZE rewrite would arm point-key pruning on them
        sidecarBloom(dir, s.relPath).size)
    }
  }

  /** == Incremental OPTIMIZE (round-15 item 2) ==
    * `optimize` rewrites the ENTIRE snapshot per call — at 100 TB the
    * maintenance pass must pay for what it fixes, not for the table:
    * this variant SELECTS segments (small files and tombstone-heavy
    * first — Delta's OPTIMIZE file-selection posture), clusters ONLY
    * their live rows into fresh Morton-bucketed segments, and carries
    * every other segment by reference, byte-untouched and still bound
    * to its old layout (each segment prunes under the stats that wrote
    * it — the q213 mixed-history rule). Selected segments' deletion
    * vectors MATERIALIZE into the rewrite; DV segments that still
    * tombstone a kept file carry forward, while DV segments whose
    * every key points at replaced files are dropped from the active
    * set (their rent is gone; vacuum reclaims the bytes once no kept
    * manifest references them). dataChange = false throughout — the
    * change feed never re-delivers a maintenance rewrite. Cost ∝
    * selected bytes (ScaleStress prices it against the full rewrite).
    *
    * `optimizeIncremental` applies the default policy over
    * `segmentHealth`: rewrite segments under `smallBytes` OR at/above
    * `minTombstoneRatio`. The SIZE arm skips segments a clustering /
    * compaction rewrite already produced (`#compacted`) — otherwise a
    * scheduled maintenance job whose own output stays under the
    * threshold re-selects it forever, growing versions and vacuum debt
    * while doing zero useful work (Delta's optimize marks output files
    * for the same reason); rewritten segments re-enter the pool only
    * when tombstoned. So a maintenance loop CONVERGES: with no new
    * ingest and no new deletes, the second run selects nothing and
    * commits nothing. `optimizeSegments` takes the selection
    * explicitly (a production scheduler supplies its own policy) and
    * rewrites exactly what it is told. Returns the new (or unchanged)
    * version number.
    */
  def optimizeIncremental(spark: SparkSession, dir: String,
      statsCol: Column, dims: Seq[Column], bucketBits: Int = 2,
      bits: Int = 16, smallBytes: Long = 64L << 20,
      minTombstoneRatio: Double = 0.1): Int = {
    val prev = version(dir)
    require(prev >= 0, s"nothing to optimize in $dir")
    val compacted = meta(dir, prev).compacted
    // a bloom-configured table whose segment predates the config (or
    // a later-added bloom stat) reads bloomsCovered < configured —
    // rewriting it ARMS point-key pruning, the same
    // maintenance-fixes-metadata rule stats evolution established
    // (q213); never-rewritten big healthy segments with full coverage
    // stay untouched
    val wantBlooms = bloomSpecOf(dir).size
    val picked = segmentHealth(spark, dir, prev).filter(h =>
      (h.bytes < smallBytes && !compacted(h.relPath)) ||
        (h.dvRows > 0 && h.tombstoneRatio >= minTombstoneRatio) ||
        // no compacted-skip here: a segment compacted BEFORE the
        // bloom config still lacks blooms, and its rewrite heals the
        // very condition that selected it — convergence holds (the
        // next call reads it covered and leaves it alone)
        (wantBlooms > 0 && h.bloomsCovered < wantBlooms))
      .map(_.relPath).toSet
    optimizeSegments(spark, dir, statsCol, dims, picked, bucketBits, bits)
  }

  def optimizeSegments(spark: SparkSession, dir: String, statsCol: Column,
      dims: Seq[Column], selected: Set[String], bucketBits: Int = 2,
      bits: Int = 16): Int = {
    require(bucketBits >= 1 && bucketBits <= 8,
      s"bucketBits $bucketBits outside [1, 8]")
    val prev = version(dir)
    require(prev >= 0, s"nothing to optimize in $dir")
    val segs = segments(dir, prev)
    val sel = segs.filter(s => selected(s.relPath))
    require(sel.size == selected.size,
      s"selection names segments not in v$prev: " +
        s"${(selected -- segs.map(_.relPath)).mkString(",")}")
    val keep = segs.filterNot(s => selected(s.relPath))
    // explicit selection rewrites exactly what it is told; an empty
    // selection commits nothing (convergence for the POLICY layer
    // lives in optimizeIncremental's compacted-skip, not here)
    if (sel.isEmpty) return prev
    val prevMeta = meta(dir, prev)
    val v = prev + 1
    // the rewrite reads ONLY the selected segments, DV-applied — the
    // tombstones of selected files materialize out here
    val live = applyDvs(spark, dir, prevMeta.dvs,
      readSegs(spark, dir, prev, sel.map(_.relPath),
        keepDvKeys = prevMeta.dvs.nonEmpty))
    val newSegs = clusterRewrite(spark, dir, v, live, statsCol, dims,
      bucketBits, bits)
    // every selected row was tombstoned AND nothing is kept: an empty
    // manifest would be unreadable — skip, exactly like empty optimize
    if (newSegs.isEmpty && keep.isEmpty) return prev
    // DV retention: a DV segment stays active only while it tombstones
    // a file some KEPT segment still owns; ONE delete-sized read over
    // all DV segments decides — each key row carries its own DV
    // segment name (from _metadata) and its target segment (the key's
    // path prefix), so a single grouped aggregate classifies every DV
    // segment (stale entries are inert but cost read-side anti-join
    // rent — dropping fully-dead DV segments is the bounded-rent half
    // of the MoR design applied incrementally)
    val keptFiles = keep.map(_.relPath).toSet
    val liveDvs =
      if (prevMeta.dvs.isEmpty || keptFiles.isEmpty) Set.empty[String]
      else spark.read
        .parquet(prevMeta.dvs.toSeq.sorted.map(r => absPath(dir, r)): _*)
        .select(
          regexp_extract(col("_metadata.file_path"),
            "(seg-[^/]+)/[^/]+$", 1).as("dv_seg"),
          substring_index(col(DvFileCol), "/", 1).as("target_seg"))
        .groupBy(col("dv_seg"))
        .agg(max(col("target_seg")
          .isInCollection(keptFiles.toSeq).cast("int")).as("any_kept"))
        .collect()
        .collect { case r if r.getInt(1) == 1 => r.getString(0) }
        .toSet
    publish(dir, v, commitLines(dir, v, keep ++ newSegs, segs,
      ManifestMeta(
        prevMeta.batches ++ sel.flatMap(_.tag),
        (prevMeta.compacted intersect keptFiles) ++
          newSegs.map(_.relPath),
        Set.empty, liveDvs, opType = Some("optimize")),
      schemaOf(dir, prev).map(sc => s"#schema\t${sc.json}")))
    v
  }

  /** Read exactly the segments `rels` (dir-relative) under version
    * `v`'s logged schema (legacy manifests without one fall back to
    * footer-merged schema). With `keepDvKeys` the reserved
    * (`__graft_dv_file`, `__graft_dv_pos`) key columns ride along —
    * derived from `_metadata`, which only resolves directly above a
    * file relation, so they MUST be attached here when the mapped path
    * below unions relations (`applyDvs` reuses them when present).
    *
    * The mapped path engages only on tables where a column rename ever
    * happened (`#colids` history longer than 1 anywhere): segments
    * group by their per-segment physical-name resolution (via `_colids`
    * keyed by stable column id), each group reads under its physical
    * schema, aliases back to the current names in logged-schema order,
    * and the groups union. Group count is bounded by the number of
    * DISTINCT name-epochs among the read segments (1-2 in practice),
    * never data-sized; never-renamed tables take the single-relation
    * fast path byte-identical to the pre-rename engine.
    */
  private def readSegs(spark: SparkSession, dir: String, v: Int,
      rels: Seq[String], keepDvKeys: Boolean = false): DataFrame = {
    val sc = schemaOf(dir, v)
    val cids = sc.flatMap(_ => colidsOf(dir, v)).filter(renamedEver)
    def tag(df: DataFrame): DataFrame = df
      .withColumn(DvFileCol, dvFileKey)
      .withColumn(DvPosCol, col("_metadata.row_index"))
    (sc, cids) match {
      case (Some(schema), Some(ids)) =>
        val groups = rels.groupBy(rel => segPhysNames(dir, rel, ids, schema))
        val parts = groups.toSeq.sortBy(_._2.head).map { case (phys, grp) =>
          val physSchema = org.apache.spark.sql.types.StructType(
            schema.fields.zip(phys).map { case (f, p) => f.copy(name = p) })
          val base = tag(spark.read.schema(physSchema)
            .parquet(grp.map(r => absPath(dir, r)): _*))
          base.select(schema.fields.toSeq.zip(phys).map { case (f, p) =>
            col(s"`$p`").as(f.name)
          } ++ Seq(col(DvFileCol), col(DvPosCol)): _*)
        }
        val out = parts.reduce(_.unionByName(_))
        if (keepDvKeys) out else out.drop(DvFileCol, DvPosCol)
      case _ =>
        val paths = rels.map(r => absPath(dir, r))
        val base = sc match {
          case Some(s) => spark.read.schema(s).parquet(paths: _*)
          case None => spark.read.parquet(paths: _*)
        }
        if (keepDvKeys) tag(base) else base
    }
  }

  private def absPath(dir: String, rel: String): String =
    Paths.get(dir, rel).toString

  /** Row-level DELETE as a copy-on-write commit — the operation that
    * turns q170's purge audit into an actionable table op: rows
    * matching `predicate` leave the table at version prev+1, while
    * every earlier version still reads them (time travel is
    * unaffected; `vacuum` eventually reclaims the rewritten segments).
    *
    * Mechanics, sized for 100 TB:
    *  1. TOUCHED-SEGMENT DISCOVERY is one pruned scan: the RAW
    *     predicate pushes into the parquet scan (a filter drops
    *     null-valued rows anyway, matching SQL DELETE — wrapping it in
    *     coalesce() here made the whole scan non-pushable and read
    *     every segment, the round-11 advice finding) and only distinct
    *     file names come back (O(files), metadata-sized), so a delete
    *     whose predicate prunes to a few segments never reads the
    *     rest.
    *  2. Only touched segments rewrite — each of the two writes (the
    *     `#cdcdel` change segment holding the deleted rows for
    *     `readCdc`, and the survivor rewrite marked `#compacted`,
    *     dataChange = false, exactly compaction's contract) re-scans
    *     the touched segments with its own pushed filter: two pruned
    *     scans of touched data, the standard copy-on-write trade
    *     (caching the touched rows would pin predicate-selectivity ×
    *     table bytes of executor storage for no asymptotic win). The
    *     predicate must be DETERMINISTIC (enforced) so both scans
    *     classify every row identically — Spark's own DeleteFromTable
    *     makes the same demand.
    *  3. Untouched segments carry forward by reference — zero data
    *     movement, the Delta/Iceberg copy-on-write economy.
    *
    * NULL predicate rows are kept (a delete only removes rows the
    * predicate PROVES true — SQL DELETE semantics). Batch tags of
    * rewritten segments fold into `#batches`, so streaming idempotency
    * survives a delete just as it survives compaction. A predicate
    * matching nothing commits nothing and returns the current version.
    * Returns the new (or unchanged) version number.
    */
  def delete(spark: SparkSession, dir: String, predicate: Column,
      statsCol: Column): Int = {
    val prev = version(dir)
    require(prev >= 0, s"nothing to delete from in $dir")
    val v = prev + 1
    val segs = segments(dir, prev)
    val prevMeta = meta(dir, prev)
    // DV-applied scan (keepPos carries the file key for discovery):
    // a raw scan would re-count — and the rewrite would RESURRECT —
    // rows an earlier merge-on-read delete already tombstoned
    val all = applyDvs(spark, dir, prevMeta.dvs,
      readSegs(spark, dir, prev, segs.map(_.relPath), keepDvKeys = true),
      keepPos = true)
    // raw predicate: pushes to parquet (through the anti-join's left
    // side), and filter's null-drops ARE delete semantics for the hit
    // side
    val hits = all.filter(predicate)
    // the predicate is re-evaluated by the discovery scan, the
    // deleted-row write and the survivor write — a non-deterministic
    // one could classify a row differently per scan, losing or
    // duplicating rows inside one commit. Refuse it up front (Spark's
    // own DeleteFromTable makes the same demand). The flag is read off
    // the analyzed Filter since Column hides its expression in Spark 4.
    val deterministic = hits.queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.deterministic
    }.getOrElse(true)
    require(deterministic,
      "delete predicate must be deterministic — it is evaluated three " +
        "times (discovery scan, deleted-row write, survivor write)")
    // the DV file key is dir-relative ("seg-x/part-y"), so touched
    // segments resolve by prefix — input_file_name() would be refused
    // above the DV anti-join anyway
    val touchedFiles = hits
      .select(col(DvFileCol)).distinct()
      .collect().map(_.getString(0)).toSet
    val touched = segs.filter(s =>
      touchedFiles.exists(_.startsWith(s.relPath + "/")))
    if (touched.isEmpty) prev
    else {
      // both rewrite scans are DV-applied too: a tombstoned row must
      // neither land in the survivor segment nor re-surface as a
      // "deleted" CDC row it already was
      val touchedDf = applyDvs(spark, dir, prevMeta.dvs,
        readSegs(spark, dir, prev, touched.map(_.relPath),
          keepDvKeys = prevMeta.dvs.nonEmpty))
      val delRel = s"seg-$v-cdc-${writerToken()}"
      touchedDf.filter(predicate).write.mode("overwrite")
        .parquet(absPath(dir, delRel))
      writeSegColIds(dir, absPath(dir, delRel), touchedDf.columns.toSeq)
      val rewriteRel = s"seg-$v-${writerToken()}"
      val rewritePath = absPath(dir, rewriteRel)
      // survivors = NOT proven deleted — null-predicate rows stay, so
      // only this side needs the coalesce (¬null is null, and a bare
      // !predicate filter would drop the very rows SQL DELETE keeps)
      val (mn, mx) = writeSegWithStats(
        touchedDf.filter(!coalesce(predicate, lit(false))),
        dir, rewritePath, statsCol)
      val touchedSet = touched.map(_.relPath).toSet
      val untouched = segs.filterNot(s => touchedSet(s.relPath))
      // dvs carry forward: entries for the rewritten segments point at
      // files the new manifest no longer lists — inert, never wrong
      publish(dir, v, commitLines(dir, v,
        untouched :+ Segment(rewriteRel, mn, mx), segs,
        ManifestMeta(
          prevMeta.batches ++ touched.flatMap(_.tag),
          (prevMeta.compacted intersect untouched.map(_.relPath).toSet) +
            rewriteRel,
          Set(delRel), prevMeta.dvs, opType = Some("delete")),
        schemaOf(dir, prev).map(sc => s"#schema\t${sc.json}")))
      v
    }
  }

  /** Merge-on-read DELETE — the small-delete economy `delete`'s
    * copy-on-write cannot offer: instead of rewriting every touched
    * segment, ONE delete-sized tombstone segment commits, holding the
    * deleted rows (it doubles as the `#cdcdel` change segment, so the
    * CDC feed is identical to the copy-on-write path) plus their
    * (file, row-index) keys; every read of the new version anti-joins
    * the keys away. Cost: one predicate-pushed scan + one delete-sized
    * write, independent of how many segments the predicate touches —
    * vs copy-on-write's rewrite of all touched bytes. The read-side
    * rent (a broadcast anti-join of the tombstone set) is bounded by
    * compaction cadence: `compact`/`optimize` materialize DVs into
    * their rewrite and reset the set, and `vacuum` reclaims the DV
    * segments once no kept manifest references them. Semantics are
    * pinned identical to `delete` (q209's oracle): null-predicate rows
    * stay, time travel is unaffected, a predicate matching nothing
    * commits nothing. The predicate is evaluated in ONE scan here, but
    * the determinism demand stays — SQL DELETE's contract, and a
    * re-run under retry must classify identically.
    */
  def deleteMor(spark: SparkSession, dir: String, predicate: Column): Int = {
    val prev = version(dir)
    require(prev >= 0, s"nothing to delete from in $dir")
    val v = prev + 1
    val segs = segments(dir, prev)
    val prevMeta = meta(dir, prev)
    val all = applyDvs(spark, dir, prevMeta.dvs,
      readSegs(spark, dir, prev, segs.map(_.relPath), keepDvKeys = true),
      keepPos = true)
    val hits = all.filter(predicate)
    val deterministic = hits.queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.deterministic
    }.getOrElse(true)
    require(deterministic,
      "deleteMor predicate must be deterministic (SQL DELETE contract)")
    val dvRel = s"seg-$v-dv-${writerToken()}"
    val dvPath = absPath(dir, dvRel)
    hits.write.mode("overwrite").parquet(dvPath)
    // metadata-only count over the written tombstones: an empty delete
    // commits nothing and leaves no artifact
    if (spark.read.parquet(dvPath).count() == 0L) {
      walked(Paths.get(dvPath))(_.toSeq).reverse.foreach(Files.deleteIfExists)
      prev
    } else {
      writeSegColIds(dir, dvPath, hits.columns.toSeq)
      publish(dir, v, commitLines(dir, v, segs, segs,
        prevMeta.carried.copy(cdcDel = Set(dvRel),
          dvs = prevMeta.dvs + dvRel, opType = Some("delete")),
        schemaOf(dir, prev).map(sc => s"#schema\t${sc.json}")))
      v
    }
  }

  /** deleteMor with rebase-style retry: the tombstone write is
    * re-derived per attempt (a racing append's rows must be observable
    * to the predicate — same serializable posture as deleteWithRetry).
    */
  def deleteMorWithRetry(spark: SparkSession, dir: String,
      predicate: Column, maxAttempts: Int = 5): Int =
    commitWithRetry(maxAttempts)(deleteMor(spark, dir, predicate))

  /** Merge-on-read DELETE BY KEY SET (round-16): tombstone every row
    * whose `key` appears in `keys` (any frame carrying the key column)
    * — deleteMor's economy WITHOUT materializing the key list on the
    * driver. The CDC-apply and view-maintenance consumers hand
    * batch-derived key frames that at 100 TB can be delete-sized; an
    * `isInCollection` predicate would drag them through the driver,
    * this path keeps them distributed (a semi-join the planner
    * broadcasts when small). Two structural wins over the predicate
    * flavor: discovery PRUNES by key range when the table records a
    * key-only sidecar stat (`mergeCandidateSegs` — the merge rule
    * applied to deletes), and NULL keys never match (semi-join = SQL
    * IN semantics, same as the predicate form). `keys` must be
    * DETERMINISTIC (it is read once per attempt — parquet-backed CDC
    * batches are; a rand()-derived frame is the caller's bug, the
    * merge-src materialization caveat). An empty or non-overlapping
    * key set commits nothing. Returns the new (or unchanged) version.
    */
  def deleteMorKeys(spark: SparkSession, dir: String, keys: DataFrame,
      key: String): Int =
    deleteMorKeysMulti(spark, dir, keys, Seq(key))

  /** Composite-key variant — the (l_orderkey, l_linenumber)-class
    * natural keys, matching on every column of `keyCols`.
    */
  def deleteMorKeysMulti(spark: SparkSession, dir: String,
      keys: DataFrame, keyCols: Seq[String]): Int =
    stageDeleteMorKeysMulti(spark, dir, keys, keyCols) match {
      case None => version(dir)
      case Some((st, _)) => publish(st.dir, st.v, st.lines); st.v
    }

  /** `deleteMorKeysMulti` minus the publish (see StagedCommit): stages
    * the delete-sized tombstone segment and returns the prepared commit
    * plus the MATCHED ROWS (the written tombstone read back with the
    * positional key columns dropped — a delete-sized parquet read, never
    * a second pruned table scan), or None when no row matches (an empty
    * delete stages nothing and leaves no artifact, exactly like the
    * published form). The multi-table transaction's MOVE composes this
    * with a `stageAppend` of the returned rows on the destination log
    * (`SnapshotTxn.moveKeys`) so relocation is both-or-neither.
    */
  def stageDeleteMorKeysMulti(spark: SparkSession, dir: String,
      keys: DataFrame,
      keyCols: Seq[String]): Option[(StagedCommit, DataFrame)] = {
    require(keyCols.nonEmpty, "deleteMorKeys needs at least one key column")
    val prev = version(dir)
    require(prev >= 0, s"nothing to delete from in $dir")
    val v = prev + 1
    val prevMeta = meta(dir, prev)
    val keySet = keys.select(keyCols.map(col): _*).distinct()
    val candidates = mergeCandidateSegsKeys(spark, dir, prev, keyCols, keySet)
    if (candidates.isEmpty) return None
    val all = applyDvs(spark, dir, prevMeta.dvs,
      readSegs(spark, dir, prev,
        candidates.map(_.relPath), keepDvKeys = true),
      keepPos = true)
    val hits = all.join(keySet, keyCols, "left_semi")
    val dvRel = s"seg-$v-dv-${writerToken()}"
    val dvPath = absPath(dir, dvRel)
    hits.write.mode("overwrite").parquet(dvPath)
    if (spark.read.parquet(dvPath).count() == 0L) {
      walked(Paths.get(dvPath))(_.toSeq).reverse.foreach(Files.deleteIfExists)
      None
    } else {
      writeSegColIds(dir, dvPath, hits.columns.toSeq)
      val segs = segments(dir, prev)
      val moved = spark.read.parquet(dvPath).drop(DvFileCol, DvPosCol)
      Some((StagedCommit(dir, v, commitLines(dir, v, segs, segs,
        prevMeta.carried.copy(cdcDel = Set(dvRel),
          dvs = prevMeta.dvs + dvRel, opType = Some("delete")),
        schemaOf(dir, prev).map(sc => s"#schema\t${sc.json}"))), moved))
    }
  }

  /** deleteMorKeys with serializable re-run-on-conflict. */
  def deleteMorKeysWithRetry(spark: SparkSession, dir: String,
      keys: DataFrame, key: String, maxAttempts: Int = 5): Int =
    commitWithRetry(maxAttempts)(deleteMorKeys(spark, dir, keys, key))

  /** Merge-on-read MERGE — `merge`'s upsert with `deleteMor`'s
    * economy: src lands as one ordinary dataChange segment (inserts
    * flow through the change feed unchanged), and the REPLACED old
    * images are tombstoned instead of rewriting their segments — one
    * key-semi-join pruned scan writes a delete-sized DV segment
    * (doubling as `#cdcdel`, so readCdc's delete(old)+insert(new)
    * encoding is bit-identical to the copy-on-write path). Commit cost
    * is src + matched-rows, NEVER touched-segment bytes; the read rent
    * and its compaction bound are deleteMor's. Same contracts as
    * `merge`: add-only schema gate before any data lands, src
    * materialized once and every phase reads the written parquet back,
    * src must be key-unique. Returns the new version number.
    */
  def mergeMor(spark: SparkSession, src: DataFrame, dir: String,
      key: String, statsCol: Column): Int =
    mergeMorKeys(spark, src, dir, Seq(key), statsCol)

  /** Composite-key merge-on-read MERGE — `mergeKeys`' semantics at
    * `mergeMor`'s cost.
    */
  def mergeMorKeys(spark: SparkSession, src: DataFrame, dir: String,
      keys: Seq[String], statsCol: Column): Int = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val prev = version(dir)
    require(prev >= 0, s"nothing to merge into in $dir — append first")
    val v = prev + 1
    val segs = segments(dir, prev)
    val prevMeta = meta(dir, prev)
    val snapSchema = evolvedSchema(
      gateSchema(spark, dir, prev), src.schema,
      spark.sessionState.analyzer.resolver)
    val srcRel = s"seg-$v-${writerToken()}"
    val srcPath = absPath(dir, srcRel)
    val (smn, smx) = writeSegWithStats(src, dir, srcPath, statsCol)
    val srcM = spark.read.schema(src.schema).parquet(srcPath)
    val srcKeys = srcM.select(keys.map(col): _*).distinct()
    // old images of matched keys, DV-applied (a key merged twice
    // tombstones the FIRST merge's src row, not a ghost); the scan
    // opens only the key-range-overlapping candidates — a segment
    // whose recorded key range misses the src range cannot hold a
    // matched row (mergeCandidateSegsKeys)
    val candidates = mergeCandidateSegsKeys(spark, dir, prev, keys, srcM)
    val dvRel = s"seg-$v-dv-${writerToken()}"
    val dvPath = absPath(dir, dvRel)
    val anyMatched =
      if (candidates.isEmpty) false
      else {
        val all = applyDvs(spark, dir, prevMeta.dvs,
          readSegs(spark, dir, prev,
            candidates.map(_.relPath), keepDvKeys = true),
          keepPos = true)
        val matched = all.join(srcKeys, keys, "left_semi")
        matched.write.mode("overwrite").parquet(dvPath)
        val any = spark.read.parquet(dvPath).count() > 0L
        if (!any)
          walked(Paths.get(dvPath))(_.toSeq).reverse
            .foreach(Files.deleteIfExists)
        else writeSegColIds(dir, dvPath, matched.columns.toSeq)
        any
      }
    publish(dir, v, commitLines(dir, v,
      segs :+ Segment(srcRel, smn, smx), segs,
      prevMeta.carried.copy(
        cdcDel = if (anyMatched) Set(dvRel) else Set.empty,
        dvs = if (anyMatched) prevMeta.dvs + dvRel else prevMeta.dvs,
        opType = Some("merge")),
      Some(s"#schema\t${snapSchema.json}")))
    v
  }

  /** Stage ONE merge-on-read commit landing a RESOLVED CDC batch
    * (round-17 — the transactional APPLY's data half): `upserts` (new
    * images, key-unique per the merge contract) lands as the
    * dataChange segment, and ONE delete-sized DV tombstones BOTH the
    * replaced old images of upsert keys AND every row matching
    * `delKeys` — the merge + delete pair `applyCdcBatchKeys` used to
    * commit as TWO versions, folded into one stageable commit so the
    * multi-table transaction can land data + bookmark under one
    * intent (`SnapshotSource.applyCdcBatchTxnKeys`). Discovery prunes
    * by key range AND bloom over the UNION of upsert/delete keys; the
    * change feed reads identically to the merge encoding (delete(old
    * image / deleted row) + insert(new image)). Returns None when the
    * batch nets to nothing here (no upserts, no matched delete keys)
    * — an empty stage leaves no artifact; the caller's bookmark alone
    * still records the batch. Both inputs must be deterministic
    * (parquet-backed CDC batches are — the merge-src caveat).
    */
  def stageApplyMorKeys(spark: SparkSession, upserts: DataFrame,
      delKeys: DataFrame, dir: String, keys: Seq[String],
      statsCol: Column): Option[StagedCommit] = {
    require(keys.nonEmpty, "apply needs at least one key column")
    val prev = version(dir)
    require(prev >= 0, s"nothing to apply into in $dir — append first")
    val v = prev + 1
    val segs = segments(dir, prev)
    val prevMeta = meta(dir, prev)
    val hasUp = !upserts.isEmpty
    val srcStaged =
      if (!hasUp) None
      else {
        val snapSchema = evolvedSchema(gateSchema(spark, dir, prev),
          upserts.schema, spark.sessionState.analyzer.resolver)
        val srcRel = s"seg-$v-${writerToken()}"
        val srcPath = absPath(dir, srcRel)
        val (smn, smx) = writeSegWithStats(upserts, dir, srcPath, statsCol)
        Some((Segment(srcRel, smn, smx), snapSchema, srcPath,
          upserts.schema))
      }
    val tombKeys = (srcStaged match {
      case Some((_, _, p, sc)) => spark.read.schema(sc).parquet(p)
        .select(keys.map(col): _*)
        .unionByName(delKeys.select(keys.map(col): _*))
      case None => delKeys.select(keys.map(col): _*)
    }).distinct()
    val candidates = mergeCandidateSegsKeys(spark, dir, prev, keys, tombKeys)
    val dvRel = s"seg-$v-dv-${writerToken()}"
    val dvPath = absPath(dir, dvRel)
    val anyMatched =
      if (candidates.isEmpty) false
      else {
        val all = applyDvs(spark, dir, prevMeta.dvs,
          readSegs(spark, dir, prev,
            candidates.map(_.relPath), keepDvKeys = true),
          keepPos = true)
        val matched = all.join(tombKeys, keys, "left_semi")
        matched.write.mode("overwrite").parquet(dvPath)
        val any = spark.read.parquet(dvPath).count() > 0L
        if (!any)
          walked(Paths.get(dvPath))(_.toSeq).reverse
            .foreach(Files.deleteIfExists)
        else writeSegColIds(dir, dvPath, matched.columns.toSeq)
        any
      }
    if (srcStaged.isEmpty && !anyMatched) None
    else Some(StagedCommit(dir, v, commitLines(dir, v,
      segs ++ srcStaged.map(_._1), segs,
      prevMeta.carried.copy(
        cdcDel = if (anyMatched) Set(dvRel) else Set.empty,
        dvs = if (anyMatched) prevMeta.dvs + dvRel else prevMeta.dvs,
        opType = Some("merge")),
      srcStaged.map { case (_, sc, _, _) => s"#schema\t${sc.json}" }
        .orElse(schemaOf(dir, prev).map(sc => s"#schema\t${sc.json}")))))
  }

  /** mergeMor with serializable re-run-on-conflict. */
  def mergeMorWithRetry(spark: SparkSession, src: DataFrame, dir: String,
      key: String, statsCol: Column, maxAttempts: Int = 5): Int =
    commitWithRetry(maxAttempts)(mergeMor(spark, src, dir, key, statsCol))

  /** Composite-key retries. */
  def mergeKeysWithRetry(spark: SparkSession, src: DataFrame, dir: String,
      keys: Seq[String], statsCol: Column, maxAttempts: Int = 5): Int =
    commitWithRetry(maxAttempts)(mergeKeys(spark, src, dir, keys, statsCol))

  def mergeMorKeysWithRetry(spark: SparkSession, src: DataFrame,
      dir: String, keys: Seq[String], statsCol: Column,
      maxAttempts: Int = 5): Int =
    commitWithRetry(maxAttempts)(
      mergeMorKeys(spark, src, dir, keys, statsCol))

  /** == MERGE touched-key discovery pruning (round-16 item 1) ==
    * Both merge flavors used to open EVERY segment's key column to
    * find touched files even when the src keys span one day's
    * partitions — at 100 TB the one real scale defect the round-15
    * audit found. The engine already owns the fix: per-segment
    * sidecar zone maps (q208). When the table's stats spec records a
    * stat whose expression depends ONLY on the merge key, the frozen
    * src's [min, max] of that expression (one 1-row aggregate over
    * the already-materialized src segment) bounds every possibly-
    * matching key: equal keys give equal expression values, so a
    * segment whose recorded range cannot overlap the src range cannot
    * hold a matched row and is skipped BEFORE the discovery semi-join
    * ever lists its files (Delta prunes merge files against source
    * min/max exactly this way). Safety rules are zone-map law: a
    * segment with NO recorded range for the stat is never skipped; a
    * key with no matching recorded stat, a non-deterministic or
    * multi-column stat expression, or an all-null src range falls
    * back to full discovery. Pure optimization — the discovery
    * semi-join re-applies exact key equality, so the answer is
    * independent of which segments carried stats.
    *
    * Public so Round21OpsSpec can pin the skip decision itself; merge
    * and mergeMor scan exactly this candidate list.
    */
  def mergeCandidateSegs(spark: SparkSession, dir: String, v: Int,
      key: String, srcM: DataFrame): Seq[Segment] =
    mergeCandidateSegsKeys(spark, dir, v, Seq(key), srcM)

  /** Composite-key variant: a matching row must equal the src on
    * EVERY key column, so a segment whose recorded range misses the
    * src range on ANY ONE key-covered stat is skipped — the per-key
    * prunes intersect. Each key prunes independently under the same
    * safety rules as the single-key form.
    */
  /** Whether stat expression `e` is usable for key-based pruning over
    * the key columns `cols`: resolving against a keys-only projection
    * proves the stat depends on no other column, and the expression
    * must be deterministic for equal keys to imply equal stat values
    * (read off the analyzed Project — Column hides its expression in
    * Spark 4, the delete-predicate technique). Deterministic is NOT
    * sufficient alone: the current-time family
    * (current_date/current_timestamp/now/localtimestamp) is
    * deterministic=true yet drifts between segment-write time and
    * merge time — a stat like datediff(current_date(), key) records a
    * range that goes stale, and a stale range can wrongly SKIP a
    * segment holding matched keys, turning the merge into a silent
    * duplicate-key insert (round-17 advice). Reject any stat whose
    * analyzed expression contains one.
    */
  private def statUsableOn(srcM: DataFrame, cols: Seq[String],
      e: String): Boolean =
    scala.util.Try {
      srcM.select(cols.map(col): _*).select(expr(e)).queryExecution
        .analyzed
        .collectFirst {
          case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
            p.projectList.forall(ne => ne.deterministic && !ne.exists {
              case _: org.apache.spark.sql.catalyst.expressions
                .CurrentDate => true
              case _: org.apache.spark.sql.catalyst.expressions
                .CurrentTimestampLike => true // CurrentTimestamp + Now
              case _: org.apache.spark.sql.catalyst.expressions
                .LocalTimestamp => true
              case _: org.apache.spark.sql.catalyst.expressions
                .CurrentTime => true
              case _ => false
            })
        }.getOrElse(true)
    }.getOrElse(false)

  def mergeCandidateSegsKeys(spark: SparkSession, dir: String, v: Int,
      keys: Seq[String], srcM: DataFrame): Seq[Segment] = {
    val segs = segments(dir, v)
    val used = scala.collection.mutable.Set.empty[String]
    val perKey = keys.foldLeft(segs) { (acc, key) =>
      if (acc.isEmpty) acc
      else {
        val stat = statsColsOf(dir).find { case (_, e) =>
          statUsableOn(srcM, Seq(key), e)
        }
        stat match {
          case None => acc
          case Some((n, e)) =>
            used += n
            val r = srcM.agg(min(expr(e)).cast("long").as("mn"),
              max(expr(e)).cast("long").as("mx")).head()
            val ranged =
              if (r.isNullAt(0)) acc // all-null src keys: nothing to prune on
              else {
                val (lo, hi) = (r.getLong(0), r.getLong(1))
                acc.filter { s =>
                  sidecarStats(dir, s.relPath).get(n) match {
                    case Some((mn, mx)) => mn <= hi && mx >= lo
                    case None => true // absent stats never skip (q208 rule)
                  }
                }
              }
            bloomPruneCandidates(spark, dir, n, e, srcM, ranged)
        }
      }
    }
    // TUPLE-bloom phase (round-17 continuation): a composite natural
    // key whose every single column is unselective (each segment
    // spans the full range of l_orderkey AND of l_linenumber) defeats
    // per-column pruning entirely — but a bloom over a stat of the
    // WHOLE key tuple (e.g. `xxhash64(l_orderkey, l_linenumber)`)
    // prunes point tuple sets exactly. Probe every bloom-configured
    // stat the per-key fold did not already apply, provided it
    // depends only on the key tuple (same deterministic/non-time
    // qualification — equal tuples give equal probe hashes). Its
    // recorded RANGE is typically meaningless (a hash spans the full
    // long range) and correctly prunes nothing; the bloom is the
    // point. Single-key tables get the same bonus for any additional
    // bloom stat beyond the one the fold picked.
    val bloomCfg = bloomSpecOf(dir)
    if (perKey.isEmpty || bloomCfg.isEmpty) perKey
    else statsColsOf(dir)
      .filter { case (n, e) => bloomCfg.contains(n) && !used(n) &&
        statUsableOn(srcM, keys, e) }
      .foldLeft(perKey) { case (acc, (n, e)) =>
        if (acc.isEmpty) acc
        else bloomPruneCandidates(spark, dir, n, e, srcM, acc)
      }
  }

  /** Bloom stage of touched-key discovery (round-17; see the spec
    * scaladoc at `bloomSpecOf`): among range-surviving candidates,
    * drop every segment whose recorded bloom for stat `n` could not
    * contain ANY src key — ONE distributed aggregate over the src
    * keys probes every candidate's bloom map-side
    * (`bloom_might_contain` is codegen'd; the blooms ride the plan as
    * binary literals, driver memory bounded by candidate count x
    * filter bytes, manifest-sized). The stat already passed the
    * key-only/deterministic/non-time qualification, so equal keys
    * give equal probe hashes. Candidates without a bloom are kept
    * (pre-config segments — absent stats never skip); false positives
    * only KEEP candidates; the discovery semi-join downstream
    * re-applies exact equality, so answers are independent of this
    * stage. An empty src aggregates to null probes → everything kept
    * (the caller's empty-hit path handles it).
    */
  /** Key sets at or below this size probe the blooms ON THE DRIVER
    * (one hash collect, then in-memory mightContain loops) instead of
    * embedding every candidate's filter as a plan literal: the
    * distributed probe ships candidateCount x filterBytes inside
    * every task binary, which for a typical delete/merge key set
    * (thousands of keys) costs more than the probe itself. Larger
    * sets fall back to the distributed aggregate, where the literal
    * shipping amortizes over real row volume.
    */
  private val BloomDriverProbeKeys = 65536

  private def bloomPruneCandidates(spark: SparkSession, dir: String,
      n: String, e: String, srcM: DataFrame,
      cands: Seq[Segment]): Seq[Segment] = {
    if (cands.isEmpty || bloomSpecOf(dir).isEmpty) cands
    else {
      val withBloom = cands.flatMap(s =>
        sidecarBloom(dir, s.relPath).get(n).map(s.relPath -> _))
      if (withBloom.isEmpty) cands
      else {
        val hashes = srcM.select(xxhash64(expr(e)).as("__h"))
        val sample = hashes.limit(BloomDriverProbeKeys + 1).collect()
        val dead: Set[String] =
          if (sample.length <= BloomDriverProbeKeys) {
            withBloom.collect { case (rel, bytes) =>
              val f = org.apache.spark.util.sketch.BloomFilter.readFrom(
                new java.io.ByteArrayInputStream(bytes))
              rel -> sample.exists(r => f.mightContainLong(r.getLong(0)))
            }.collect { case (rel, hit) if !hit => rel }.toSet
          } else {
            graft.functions.BloomMightContain.ensureRegistered(spark)
            val probes = withBloom.zipWithIndex.map { case ((_, bytes), i) =>
              max(call_function(graft.functions.BloomMightContain.name,
                lit(bytes), col("__h")).cast("int")).as(s"__bm$i")
            }
            val r = hashes.agg(probes.head, probes.tail: _*).head()
            withBloom.zipWithIndex.collect {
              case ((rel, _), i) if !r.isNullAt(i) && r.getInt(i) == 0 => rel
            }.toSet
          }
        cands.filterNot(s => dead(s.relPath))
      }
    }
  }

  /** Point-lookup read (round-17 continuation): the SELECT-side twin
    * of merge/delete key discovery — read version `v` opening ONLY
    * the segments whose range zone map AND bloom sidecar admit at
    * least one of `keys` (`mergeCandidateSegsKeys` is the shared
    * pruning kernel). The exact key semi-join re-applies downstream,
    * so the answer equals the full snapshot read filtered to the keys
    * regardless of which segments carried stats or blooms — but a
    * point lookup on a scattered-key 100 TB table opens bloom-admitted
    * files instead of every file. Returns (frame, segmentsScanned,
    * segmentsTotal) like `readAsOfFilteredOn`.
    */
  def readAsOfKeys(spark: SparkSession, dir: String, v: Int,
      keyCols: Seq[String], keys: DataFrame): (DataFrame, Int, Int) = {
    require(keyCols.nonEmpty, "point lookup needs at least one key column")
    val segs = segments(dir, v)
    val keySet = keys.select(keyCols.map(col): _*).distinct()
    val cands = mergeCandidateSegsKeys(spark, dir, v, keyCols, keySet)
    if (cands.isEmpty) (readAsOf(spark, dir, v).limit(0), 0, segs.size)
    else {
      val m = meta(dir, v)
      val df = applyDvs(spark, dir, m.dvs,
        readSegs(spark, dir, v, cands.map(_.relPath),
          keepDvKeys = m.dvs.nonEmpty))
      (df.join(keySet, keyCols, "left_semi"), cands.size, segs.size)
    }
  }

  /** MERGE (upsert by key) as a copy-on-write commit — the operation
    * behind q189's CDC dedup gate becoming a real table write: every
    * `src` row whose `key` matches an existing row REPLACES it; the
    * rest insert. One commit, atomic like every other.
    *
    * Same copy-on-write economy as `delete`: a key-semi-join pruned
    * scan finds the touched segments (O(files) driver data), only
    * those rewrite (survivors → a `#compacted` rewrite segment;
    * replaced old rows → a `#cdcdel` change segment), untouched
    * segments carry by reference, and `src` itself lands as a normal
    * dataChange segment — so the change feed tells the truth
    * downstream: an update arrives as delete(old row) + insert(new
    * row), an insert as insert, and `readChanges`' insert-only
    * consumers see exactly the src rows. Schema evolution gates like
    * append (src must carry every existing column, may add nullable
    * ones). `src` must be key-unique — two src rows with one key would
    * both land (the standard MERGE multi-match contract violation;
    * dedupe upstream, q189's gate does exactly that).
    *
    * The src plan runs EXACTLY ONCE: its segment is written first and
    * every later phase (key extraction, touched-segment discovery,
    * both rewrite joins) reads the MATERIALIZED parquet back — a
    * non-deterministic or concurrently-mutating source re-evaluated
    * per phase could otherwise delete old rows whose replacement keys
    * never land in the written segment, silent row loss inside an
    * "atomic" commit (the same re-evaluation hazard `writtenStats`
    * documents; Delta materializes merge sources for this reason).
    * Returns the new version number.
    */
  def merge(spark: SparkSession, src: DataFrame, dir: String, key: String,
      statsCol: Column): Int =
    mergeKeys(spark, src, dir, Seq(key), statsCol)

  /** Composite-key MERGE (round-16): upsert matching on EVERY column
    * of `keys` — the natural-key case (e.g. lineitem's (l_orderkey,
    * l_linenumber)) a single-column API forces callers to synthesize
    * concatenated keys for, losing zone-map pruning in the process.
    * Same contracts as `merge`; `src` must be unique on the key
    * COMBINATION. Discovery prunes on every key column with a
    * key-covered sidecar stat (the prunes intersect).
    */
  def mergeKeys(spark: SparkSession, src: DataFrame, dir: String,
      keys: Seq[String], statsCol: Column): Int = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val prev = version(dir)
    require(prev >= 0, s"nothing to merge into in $dir — append first")
    val v = prev + 1
    val segs = segments(dir, prev)
    // schema gate BEFORE any data lands — a refused merge must leave no
    // orphan segment behind
    val snapSchema = evolvedSchema(
      gateSchema(spark, dir, prev), src.schema,
      spark.sessionState.analyzer.resolver)
    // materialize src ONCE; all phases below see this one frozen copy
    val srcRel = s"seg-$v-${writerToken()}"
    val srcPath = absPath(dir, srcRel)
    val (smn, smx) = writeSegWithStats(src, dir, srcPath, statsCol)
    val srcM = spark.read.schema(src.schema).parquet(srcPath)
    val srcKeys = srcM.select(keys.map(col): _*).distinct()
    val prevMeta = meta(dir, prev)
    // discovery opens ONLY the key-range-overlapping candidates (see
    // mergeCandidateSegsKeys — a non-overlapping segment cannot hold a
    // matched key, so it is untouched by construction); the file key
    // is projected BELOW the semi-join (input_file_name() is refused
    // above a multi-source plan) and the scan is DV-applied: a
    // tombstoned old row must not mark its segment touched, nor
    // resurrect into the rewrite below
    val candidates = mergeCandidateSegsKeys(spark, dir, prev, keys, srcM)
    val touchedFiles =
      if (candidates.isEmpty) Set.empty[String]
      else applyDvs(spark, dir, prevMeta.dvs,
        readSegs(spark, dir, prev,
          candidates.map(_.relPath), keepDvKeys = true),
        keepPos = true)
        .join(srcKeys, keys, "left_semi")
        .select(col(DvFileCol)).distinct()
        .collect().map(_.getString(0)).toSet
    val touched = segs.filter(s =>
      touchedFiles.exists(_.startsWith(s.relPath + "/")))
    val touchedSet = touched.map(_.relPath).toSet
    val untouched = segs.filterNot(s => touchedSet(s.relPath))

    val (rewriteSegs, cdcDel) =
      if (touched.isEmpty) (Nil, Set.empty[String])
      else {
        val touchedDf = applyDvs(spark, dir, prevMeta.dvs,
          readSegs(spark, dir, prev, touched.map(_.relPath),
            keepDvKeys = prevMeta.dvs.nonEmpty))
        val delRel = s"seg-$v-cdc-${writerToken()}"
        touchedDf.join(srcKeys, keys, "left_semi")
          .write.mode("overwrite").parquet(absPath(dir, delRel))
        writeSegColIds(dir, absPath(dir, delRel), touchedDf.columns.toSeq)
        val rewriteRel = s"seg-$v-rw-${writerToken()}"
        val rewritePath = absPath(dir, rewriteRel)
        val (mn, mx) = writeSegWithStats(
          touchedDf.join(srcKeys, keys, "left_anti"),
          dir, rewritePath, statsCol)
        (Seq(Segment(rewriteRel, mn, mx)), Set(delRel))
      }

    publish(dir, v, commitLines(dir, v,
      untouched ++ rewriteSegs :+ Segment(srcRel, smn, smx), segs,
      ManifestMeta(
        prevMeta.batches ++ touched.flatMap(_.tag),
        (prevMeta.compacted intersect untouched.map(_.relPath).toSet) ++
          rewriteSegs.map(_.relPath),
        cdcDel, prevMeta.dvs, opType = Some("merge")),
      Some(s"#schema\t${snapSchema.json}")))
    v
  }

  /** == First-class UPDATE (round-16 item 2) ==
    * `UPDATE SET col = expr WHERE pred` as a log commit — before this,
    * an updating user hand-built a merge source from `readAsOf`, and
    * the change feed could only encode the result as delete + insert.
    * Both flavors emit TYPED change rows: the replaced old images
    * surface in `readCdc` as `_change_type = update_preimage`, the new
    * images as `update_postimage` (Delta's four-valued column), so a
    * downstream view maintainer can tell a moved row from churn.
    *
    * Shared contracts: assignments target EXISTING columns only
    * (UPDATE never evolves schema — the expression casts back to the
    * column's recorded type, so the snapshot schema is bit-identical
    * before and after); predicate AND assignment expressions must be
    * deterministic (both are re-evaluated under retry, and the CoW
    * flavor re-scans the predicate per write phase — SQL UPDATE's
    * contract); NULL-predicate rows are untouched (an update only
    * rewrites rows the predicate PROVES true); a predicate matching
    * nothing commits nothing. New images derive from the WRITTEN
    * preimage segment, never a re-evaluated source scan — pre/post
    * pair 1:1 by construction.
    */
  private def updatePlan(spark: SparkSession, dir: String, prev: Int,
      set: Seq[(String, Column)]): DataFrame => DataFrame = {
    require(set.nonEmpty, "UPDATE needs at least one assignment")
    val resolver = spark.sessionState.analyzer.resolver
    val fields = gateSchema(spark, dir, prev)
      .getOrElse(readAsOf(spark, dir, prev).schema).fields.toSeq
    // cast targets widen container nullability: the RECORDED type may
    // say map value / array element / struct field non-null (the
    // encoder that first appended knew it), but parquet read-back
    // reports them nullable, and Catalyst refuses a nullable→non-null
    // container cast — so `SET mp = mp` on a map column failed as
    // "cannot cast MAP<..> to MAP<..>" (round-17 fix). Nullability is
    // a read-path looseness here, not identity: the logged #schema is
    // untouched and scalar casts are unchanged.
    def widenNullable(dt: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.types.DataType = dt match {
      case a: org.apache.spark.sql.types.ArrayType =>
        org.apache.spark.sql.types.ArrayType(
          widenNullable(a.elementType), containsNull = true)
      case m: org.apache.spark.sql.types.MapType =>
        org.apache.spark.sql.types.MapType(widenNullable(m.keyType),
          widenNullable(m.valueType), valueContainsNull = true)
      case s: org.apache.spark.sql.types.StructType =>
        org.apache.spark.sql.types.StructType(s.fields.map(f =>
          f.copy(dataType = widenNullable(f.dataType), nullable = true)))
      case other => other
    }
    val bound = set.map { case (c, e) =>
      val f = fields.find(fd => resolver(fd.name, c)).getOrElse(
        throw new IllegalArgumentException(
          s"UPDATE assigns to unknown column '$c' — updates never add " +
            "columns (append an evolved frame for that)"))
      (f.name, e.cast(widenNullable(f.dataType)))
    }
    require(bound.map(_._1).distinct.size == bound.size,
      "UPDATE assigns the same column twice")
    // ONE simultaneous projection, never a sequential withColumn fold:
    // SQL UPDATE evaluates every assignment against the OLD row, so
    // `SET a = b, b = a` must SWAP — a fold would feed the new `a`
    // into `b`'s expression (round-16 self-review fix)
    df => df.select(df.columns.map { c =>
      bound.collectFirst { case (n, e) if resolver(n, c) => e.as(c) }
        .getOrElse(col(c)): org.apache.spark.sql.Column
    }.toSeq: _*)
  }

  /** Both the filter predicate and every assignment projection must be
    * deterministic — read off the analyzed plan (Column hides its
    * expression in Spark 4).
    */
  private def requireDeterministicUpdate(hits: DataFrame,
      applied: DataFrame, what: String): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    val predDet = hits.queryExecution.analyzed.collectFirst {
      case f: Filter => f.condition.deterministic
    }.getOrElse(true)
    require(predDet, s"$what predicate must be deterministic — it is " +
      "re-evaluated per write phase and under retry (SQL UPDATE contract)")
    val setDet = applied.queryExecution.analyzed.collect {
      case p: Project => p.projectList.forall(_.deterministic)
    }.forall(identity)
    require(setDet, s"$what assignment expressions must be deterministic " +
      "(re-evaluated under retry)")
  }

  /** Copy-on-write UPDATE: touched-segment discovery is one pruned
    * DV-applied scan (delete's mechanics); touched segments rewrite
    * into a survivor segment (`#compacted`, dataChange = false) plus a
    * NEW-IMAGE segment — a live dataChange segment the feed tags
    * `update_postimage` via `#cdcpost` — while the old images land as
    * the `#cdcpre` change segment; untouched segments carry by
    * reference. Returns the new (or unchanged) version.
    */
  def update(spark: SparkSession, dir: String, predicate: Column,
      set: Seq[(String, Column)], statsCol: Column): Int = {
    val prev = version(dir)
    require(prev >= 0, s"nothing to update in $dir")
    val v = prev + 1
    val segs = segments(dir, prev)
    val prevMeta = meta(dir, prev)
    val applySet = updatePlan(spark, dir, prev, set)
    val all = applyDvs(spark, dir, prevMeta.dvs,
      readSegs(spark, dir, prev, segs.map(_.relPath), keepDvKeys = true),
      keepPos = true)
    val hits = all.filter(predicate)
    requireDeterministicUpdate(hits,
      applySet(hits.drop(DvFileCol, DvPosCol)), "update")
    val touchedFiles = hits
      .select(col(DvFileCol)).distinct()
      .collect().map(_.getString(0)).toSet
    val touched = segs.filter(s =>
      touchedFiles.exists(_.startsWith(s.relPath + "/")))
    if (touched.isEmpty) prev
    else {
      val touchedDf = applyDvs(spark, dir, prevMeta.dvs,
        readSegs(spark, dir, prev, touched.map(_.relPath),
          keepDvKeys = prevMeta.dvs.nonEmpty))
      val preRel = s"seg-$v-cdcpre-${writerToken()}"
      touchedDf.filter(predicate).write.mode("overwrite")
        .parquet(absPath(dir, preRel))
      writeSegColIds(dir, absPath(dir, preRel), touchedDf.columns.toSeq)
      // new images derive from the WRITTEN preimages — the predicate
      // never re-evaluates between pre and post, so the pair is exact
      val postRel = s"seg-$v-post-${writerToken()}"
      val postPath = absPath(dir, postRel)
      val (pmn, pmx) = writeSegWithStats(
        applySet(readSegs(spark, dir, prev, Seq(preRel))),
        dir, postPath, statsCol)
      val rwRel = s"seg-$v-rw-${writerToken()}"
      val rwPath = absPath(dir, rwRel)
      val (mn, mx) = writeSegWithStats(
        touchedDf.filter(!coalesce(predicate, lit(false))),
        dir, rwPath, statsCol)
      val touchedSet = touched.map(_.relPath).toSet
      val untouched = segs.filterNot(s => touchedSet(s.relPath))
      publish(dir, v, commitLines(dir, v,
        untouched :+ Segment(rwRel, mn, mx) :+ Segment(postRel, pmn, pmx),
        segs,
        ManifestMeta(
          prevMeta.batches ++ touched.flatMap(_.tag),
          (prevMeta.compacted intersect untouched.map(_.relPath).toSet) +
            rwRel,
          Set.empty, prevMeta.dvs,
          cdcPre = Set(preRel), cdcPost = Set(postRel),
          opType = Some("update")),
        schemaOf(dir, prev).map(sc => s"#schema\t${sc.json}")))
      v
    }
  }

  /** Merge-on-read UPDATE — deleteMor's economy for updates: ONE
    * predicate-pushed scan writes the matched old images as a
    * tombstone segment (doubling as `#cdcpre`), the new images —
    * derived from the written tombstones, so the predicate evaluates
    * exactly once — land as one update-sized dataChange segment
    * (`#cdcpost`), and every read anti-joins the tombstones away.
    * Commit cost ∝ matched rows, never touched-segment bytes; the
    * read rent and its compaction bound are deleteMor's. Returns the
    * new (or unchanged) version.
    */
  def updateMor(spark: SparkSession, dir: String, predicate: Column,
      set: Seq[(String, Column)], statsCol: Column): Int = {
    val prev = version(dir)
    require(prev >= 0, s"nothing to update in $dir")
    val v = prev + 1
    val segs = segments(dir, prev)
    val prevMeta = meta(dir, prev)
    val applySet = updatePlan(spark, dir, prev, set)
    val all = applyDvs(spark, dir, prevMeta.dvs,
      readSegs(spark, dir, prev, segs.map(_.relPath), keepDvKeys = true),
      keepPos = true)
    val hits = all.filter(predicate)
    requireDeterministicUpdate(hits,
      applySet(hits.drop(DvFileCol, DvPosCol)), "updateMor")
    val dvRel = s"seg-$v-dv-${writerToken()}"
    val dvPath = absPath(dir, dvRel)
    hits.write.mode("overwrite").parquet(dvPath)
    if (spark.read.parquet(dvPath).count() == 0L) {
      walked(Paths.get(dvPath))(_.toSeq).reverse.foreach(Files.deleteIfExists)
      prev
    } else {
      writeSegColIds(dir, dvPath, hits.columns.toSeq)
      // key columns ride at the END of the tombstone write (applyDvs
      // appends them), so dropping them restores the snapshot shape
      val pre = spark.read.parquet(dvPath).drop(DvFileCol, DvPosCol)
      val postRel = s"seg-$v-post-${writerToken()}"
      val postPath = absPath(dir, postRel)
      val (pmn, pmx) = writeSegWithStats(applySet(pre), dir, postPath,
        statsCol)
      publish(dir, v, commitLines(dir, v,
        segs :+ Segment(postRel, pmn, pmx), segs,
        prevMeta.carried.copy(
          cdcPre = Set(dvRel), cdcPost = Set(postRel),
          dvs = prevMeta.dvs + dvRel, opType = Some("update")),
        schemaOf(dir, prev).map(sc => s"#schema\t${sc.json}")))
      v
    }
  }

  /** update with serializable re-run-on-conflict. */
  def updateWithRetry(spark: SparkSession, dir: String, predicate: Column,
      set: Seq[(String, Column)], statsCol: Column,
      maxAttempts: Int = 5): Int =
    commitWithRetry(maxAttempts)(update(spark, dir, predicate, set, statsCol))

  /** updateMor with serializable re-run-on-conflict. */
  def updateMorWithRetry(spark: SparkSession, dir: String,
      predicate: Column, set: Seq[(String, Column)], statsCol: Column,
      maxAttempts: Int = 5): Int =
    commitWithRetry(maxAttempts)(
      updateMor(spark, dir, predicate, set, statsCol))

  /** Full change-data feed over (fromV, toV]: `readChanges`' inserts
    * PLUS the rows row-level deletes/merges removed, each row tagged
    * with `_change_type` ('insert' | 'delete' | 'update_preimage' |
    * 'update_postimage' — the typed pair comes from first-class
    * UPDATE commits; deletes/merges keep their delete+insert
    * encoding) AND `_commit_version`
    * (the version whose commit produced it). The version column is
    * what makes the by-key idempotent-apply contract real: a key
    * modified in more than one version inside the window (two merges
    * on one key) yields multiple delete/insert rows, and without an
    * ordering column a keyed sink cannot determine the final image —
    * order by `_commit_version` per key and the last change wins
    * (Delta's change feed ships `_commit_version` for exactly this).
    * An update (merge on an existing key) arrives as its delete + its
    * insert under ONE version — same-version delete-before-insert is
    * part of the apply contract. fromV = -1 means "delta from empty":
    * the toV snapshot as inserts (net state — rows deleted before toV
    * are already absent), all tagged with toV since the feed delivers
    * it as one synthetic snapshot commit, not a replayed history. All
    * rows surface under toV's schema, like readChanges; the walk costs
    * O(toV−fromV) manifest reads and the data side opens exactly the
    * per-version delta/#cdcdel segments, never standing history.
    */
  def readCdc(spark: SparkSession, dir: String,
      fromV: Int, toV: Int): DataFrame = {
    if (fromV < 0)
      readAsOf(spark, dir, toV)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(toV))
    else {
      require(toV >= fromV, s"readCdc range [$fromV, $toV] inverted")
      // per-version walk (not one batched read): each row's tag must be
      // the version that produced it. A segment surfaces at exactly the
      // version that introduced it — names are writer-unique, so no
      // cross-version dedup is needed. One forward segmentsWalk pass —
      // O(window) manifest reads on delta layouts.
      val walk = segmentsWalk(dir, fromV, toV)
      val perVersion = ((fromV + 1) to toV).flatMap { w =>
        val m = meta(dir, w)
        val prevSet = walk(w - 1 - fromV).map(_.relPath).toSet
        // an UPDATE's new-image segment is a live dataChange segment of
        // the snapshot, but the feed must tag it update_postimage, not
        // insert — exclude it from the plain-insert list (Delta's
        // four-valued _change_type column, round 16)
        val ins = walk(w - fromV).filter(_.dataChange)
          .filterNot(s => prevSet(s.relPath)).map(_.relPath)
          .filterNot(m.cdcPost)
        Seq(("insert", w, ins),
          ("delete", w, m.cdcDel.toSeq.sorted),
          ("update_preimage", w, m.cdcPre.toSeq.sorted),
          ("update_postimage", w, m.cdcPost.toSeq.sorted))
          .filter(_._3.nonEmpty)
      }
      if (perVersion.isEmpty)
        readAsOf(spark, dir, toV).limit(0)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(toV))
      else perVersion.map { case (ct, w, rels) =>
        // deleteMor/mergeMor tombstone segments double as #cdcdel but
        // carry the reserved (file, row-index) key columns; on a
        // SCHEMA-LESS legacy log the fallback footer-merged read would
        // leak them and poison the insert/delete unionByName below
        // (schema'd logs never select them — the drop is a no-op there)
        readSegs(spark, dir, toV, rels)
          .drop(DvFileCol, DvPosCol)
          .withColumn("_change_type", lit(ct))
          .withColumn("_commit_version", lit(w))
      }.reduce(_.unionByName(_))
    }
  }

  /** == RESTORE (round-15 continuation — Delta's
    * `RESTORE TABLE ... TO VERSION`) ==
    * Roll the table BACK to version `v` by committing a NEW version
    * whose content is exactly v's — the bad-write escape hatch that
    * loses no history: every version including the bad one still time
    * travels, and the restore itself is just another commit (vacuum
    * applies its normal retention later).
    *
    * Commit shape, sized like the change it undoes (never the table):
    * segments v and prev SHARE carry by reference; v-only segments'
    * LIVE content (DV-applied as of v) — plus the row images of any
    * tombstones prev added over v (those rows come back) —
    * materialize into ONE fresh dataChange segment, so the change
    * feed delivers the reappearing content as inserts; prev-only
    * segments' live content (DV-applied as of prev) is written as the
    * `#cdcdel` change segment, and any DV segments v carried beyond
    * prev are listed beside it — so the feed delivers what disappears
    * as deletes. The active DV set becomes v's, restricted to kept
    * files. Feed granularity is the FILE + DV diff (Delta's restore
    * posture): rows living in churned files re-assert themselves as
    * delete(image)+insert(image), so a KEYED idempotent apply
    * converges to v's state, while CONTENT equality — readAsOf(new) ≡
    * readAsOf(v) — is exact unconditionally (the spec pins it across
    * CoW deletes, MoR deletes and merges). The snapshot schema stays
    * PREV's (add-only evolution: restore never narrows a reader's
    * schema — the one documented divergence from Delta, which
    * restores the old schema too); v's rows null-fill columns added
    * after v. Restoring to the head is a no-op. Returns the new (or
    * unchanged) version.
    */
  def restore(spark: SparkSession, dir: String, v: Int,
      statsCol: Column): Int = {
    val prev = version(dir)
    require(prev >= 0, s"nothing to restore in $dir")
    require(v >= 0 && v <= prev, s"restore target v$v outside [0, $prev]")
    if (v == prev) return prev
    val vNew = prev + 1
    val segsV = segments(dir, v)
    val segsP = segments(dir, prev)
    val setV = segsV.map(_.relPath).toSet
    val setP = segsP.map(_.relPath).toSet
    val shared = segsV.filter(s => setP(s.relPath))
    val readded = segsV.filterNot(s => setP(s.relPath))
    val dropped = segsP.filterNot(s => setV(s.relPath))
    val sharedNames = shared.map(_.relPath)
    val dvsV = meta(dir, v).dvs
    val dvsP = meta(dir, prev).dvs
    val dvsComeBack = (dvsP -- dvsV).toSeq.sorted // prev-only tombstones
    val dvsGoAway = (dvsV -- dvsP).toSeq.sorted   // v-only tombstones
    val sc = schemaOf(dir, prev)
    val cids = colidsOf(dir, prev)
    // Row images of DV tombstones, RESTRICTED to entries targeting a
    // SHARED file: entries into re-added/dropped files are already
    // settled by those files' own materialization/removal, and
    // delivering them again would double-count (a re-added file's live
    // content is DV-applied at read, so its tombstoned rows never
    // surface twice).
    def dvImages(rels: Seq[String]): Option[DataFrame] =
      if (rels.isEmpty || sharedNames.isEmpty) None
      else {
        // RAW reads (footer schema): the key columns the filter needs
        // are exactly the ones the table schema excludes; after the
        // filter the images conform to prev's schema, null-filling
        // columns added after their era. Each DV segment reads under
        // its OWN footer and the set combines via unionByName with
        // allowMissingColumns — a single multi-path read adopts ONE
        // sampled footer, so DV segments straddling a schema evolution
        // would silently null-fill columns only some of them carry
        // (round-15 advice; per-segment footers make the invariant
        // structural instead of relying on shared-file luck)
        val raw = rels.map { r =>
            val own = spark.read.parquet(absPath(dir, r))
              .filter(substring_index(col(DvFileCol), "/", 1)
                .isInCollection(sharedNames))
              .drop(DvFileCol, DvPosCol)
            // physical → current names per DV segment (tombstones
            // written before a rename carry old names; conforming
            // by name alone would silently null-fill renamed columns)
            cids.filter(renamedEver) match {
              case Some(ids) =>
                val segIds = readSegColIds(dir, r)
                own.select(own.columns.toSeq.map { c =>
                  val curName = segIds match {
                    case Some(m) => m.collectFirst {
                      case (id, phys) if ciEq(phys, c) =>
                        ids.find(_.id == id).map(_.cur)
                    }.flatten.getOrElse(c)
                    case None =>
                      ids.filter(x => ciEq(x.orig, c))
                        .sortBy(_.id).headOption.map(_.cur).getOrElse(c)
                  }
                  col(s"`$c`").as(curName)
                }: _*)
              case None => own
            }
          }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
        Some(sc match {
          case Some(s) => raw.select(s.fields.toSeq.map { f =>
            if (raw.columns.contains(f.name)) col(f.name)
            else lit(null).cast(f.dataType).as(f.name)
          }: _*)
          case None => raw
        })
      }
    // the fresh INSERTS segment: v-only files' live content (DV-applied
    // as of v) + shared-file row images of tombstones prev added over v
    // — both under prev's schema, so evolution never narrows
    val insertParts =
      (if (readded.isEmpty) Nil
       else Seq(applyDvs(spark, dir, dvsV,
         readSegs(spark, dir, prev, readded.map(_.relPath),
           keepDvKeys = dvsV.nonEmpty)))) ++
        dvImages(dvsComeBack).toSeq
    val insertSeg = insertParts.reduceOption(_.unionByName(_)).flatMap { df =>
      val rel = s"seg-$vNew-${writerToken()}"
      val p = absPath(dir, rel)
      // write + stats + row count in ONE observed pass; a 0-row fresh
      // segment only matters when NOTHING else composes the manifest
      // (restoring to a delete-all state must stay readable); otherwise
      // drop it (its sidecars vanish with the dir)
      val (mn, mx, cnt) = writeSegWithStatsN(df, dir, p, statsCol)
      if (shared.nonEmpty && cnt == 0L) {
        walked(Paths.get(p))(_.toSeq).reverse.foreach(Files.deleteIfExists)
        None
      } else Some(Segment(rel, mn, mx))
    }
    // the DELETES (#cdcdel): prev-only files' live content (DV-applied
    // as of prev) + shared-file row images of tombstones v adds over
    // prev, as ONE change segment
    val deleteParts =
      (if (dropped.isEmpty) Nil
       else Seq(applyDvs(spark, dir, dvsP,
         readSegs(spark, dir, prev, dropped.map(_.relPath),
           keepDvKeys = dvsP.nonEmpty)))) ++
        dvImages(dvsGoAway).toSeq
    val delRel = deleteParts.reduceOption(_.unionByName(_)).flatMap { df =>
      val rel = s"seg-$vNew-cdc-${writerToken()}"
      val p = absPath(dir, rel)
      df.write.mode("overwrite").parquet(p)
      if (spark.read.parquet(p).count() == 0L) {
        walked(Paths.get(p))(_.toSeq).reverse.foreach(Files.deleteIfExists)
        None
      } else {
        writeSegColIds(dir, p, df.columns.toSeq)
        Some(rel)
      }
    }
    // active DVs: v's own set (shared-file entries live, the rest
    // inert) PLUS the comeback DVs — their shared-file copies were
    // re-delivered as images in the fresh segment, so the raw
    // duplicates still sitting in shared files must stay suppressed.
    // With nothing shared, everything was materialized: no DV applies.
    val liveDvs =
      if (sharedNames.isEmpty) Set.empty[String]
      else dvsV ++ dvsComeBack
    val newSegs = shared ++ insertSeg.toSeq
    require(newSegs.nonEmpty,
      s"restore to v$v of $dir yields an empty manifest")
    publish(dir, vNew, commitLines(dir, vNew, newSegs, segsP,
      ManifestMeta(
        meta(dir, prev).batches ++ dropped.flatMap(_.tag),
        // shared segments keep their dataChange flags AS OF v; the
        // fresh inserts segment is dataChange = true by omission
        metaOf(manifestLines(dir, v)).compacted intersect sharedNames.toSet,
        delRel.toSet, liveDvs, opType = Some("restore")),
      sc.map(s => s"#schema\t${s.json}")))
    vNew
  }

  /** == Shallow CLONE (round-16 item 3 — Delta's CLONE / Iceberg
    * snapshot refs) ==
    * A zero-copy table copy: the dev/test-against-prod workflow where
    * a writable replica of a 100 TB table must cost metadata, not
    * bytes. Segments are immutable, so the clone's v0 manifest lists
    * the source's segments (and active DVs) as of `asOfV` — but
    * instead of cross-directory path references, every segment FILE
    * HARD-LINKS into the clone's own directory: zero data copied
    * (links are O(files) metadata ops), yet the clone is fully
    * SELF-CONTAINED — vacuum on the source only unlinks its own
    * directory entries (the shared inodes survive through the
    * clone's links), vacuum on the clone likewise, and neither side
    * can ever dangle the other (the refcount the round-15 verdict
    * asked for, supplied by the filesystem's link count; an
    * object-store deployment swaps links for manifest refcounts, the
    * same CAS-service swap the commit path documents). Divergent
    * writes land in whichever log they are committed to — the logs
    * share no mutable state. Table properties (checkpoint interval,
    * stats spec) copy with the config, batch ids carry (a replayed
    * micro-batch skips on both sides), compaction flags and the DV
    * set carry as of `asOfV`, and the clone's feed starts with v0 as
    * the initial snapshot. Filesystems without hard links degrade to
    * a per-file copy — correct, just not zero-copy. Returns the
    * clone's version (always 0).
    */
  def cloneShallow(srcDir: String, dstDir: String, asOfV: Int = -1): Int = {
    val head = version(srcDir)
    require(head >= 0, s"nothing to clone in $srcDir")
    val v = if (asOfV < 0) head else asOfV
    require(v <= head, s"clone source version v$v outside [0, $head]")
    require(version(dstDir) < 0,
      s"clone target $dstDir already holds a log — clone only creates " +
        "fresh tables")
    Files.createDirectories(logDir(dstDir))
    if (Files.exists(configPath(srcDir)))
      Files.copy(configPath(srcDir), configPath(dstDir),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val m = meta(srcDir, v)
    val segs = segments(srcDir, v)
    // track everything this clone creates so a mid-walk failure can
    // unwind: the target-must-be-fresh precondition otherwise blocks a
    // retry against the partial, manifest-less dstDir (round-17 advice)
    val created = scala.collection.mutable.ArrayBuffer.empty[Path]
    def mkDirs(d: Path): Unit = {
      // record only dirs we newly create, outermost first
      val missing = Iterator.iterate(d)(_.getParent)
        .takeWhile(p => p != null && !Files.exists(p)).toSeq.reverse
      Files.createDirectories(d)
      created ++= missing
    }
    try {
      (segs.map(_.relPath) ++ m.dvs.toSeq.sorted).distinct.foreach { rel =>
        val from = Paths.get(srcDir, rel)
        val to = Paths.get(dstDir, rel)
        walked(from)(_.toSeq).foreach { p =>
          val t = to.resolve(from.relativize(p).toString)
          if (Files.isDirectory(p)) mkDirs(t)
          else {
            mkDirs(t.getParent)
            // hard links need same-filesystem support: FS without the
            // feature throws UnsupportedOperationException, but a
            // cross-device target (EXDEV) or a link-count-limited mount
            // surfaces as FileSystemException/IOException — all degrade
            // to the documented per-file copy (round-17 advice; the
            // pre-fix catch never engaged for the IOException family)
            try Files.createLink(t, p)
            catch {
              case _: UnsupportedOperationException | _: java.io.IOException =>
                Files.copy(p, t)
            }
            created += t
          }
        }
      }
      publish(dstDir, 0, commitLines(dstDir, 0, segs, Nil,
        ManifestMeta(segs.flatMap(_.tag).toSet ++ m.batches,
          m.compacted intersect segs.map(_.relPath).toSet,
          Set.empty, m.dvs, opType = Some("clone")),
        schemaOf(srcDir, v).map(sc => s"#schema\t${sc.json}"),
        // the clone carries the SOURCE's name↔id table as of asOfV —
        // a fresh identity table would lose the rename history its
        // hard-linked segments' _colids files resolve against
        colidsOverride = colidsOf(srcDir, v)))
    } catch {
      case e: Throwable =>
        // innermost first; only paths THIS call created — a
        // pre-existing (log-less) dstDir and its prior contents stay
        created.reverseIterator.foreach { p =>
          try Files.deleteIfExists(p) catch { case _: java.io.IOException => }
        }
        throw e
    }
    0
  }

  /** == DESCRIBE HISTORY (round-16 continuation — Delta's surface) ==
    * One row per SURVIVING version: the op that produced it (`#optype`,
    * None on pre-round-16 manifests), commit wall-clock, live segment
    * count, segments added/removed vs the predecessor, the number of
    * rows those added segments hold (from their `__rows` sidecar
    * entries — metadata, no data scan; None when any added segment
    * predates the entry), active DV count, and this version's change
    * segments (cdcDel/cdcPre/cdcPost counts). Cost: one forward
    * `segmentsWalk` + O(versions) manifest metas — driver-side
    * metadata at any table size, the same class as the audit ops
    * beside it. The earliest surviving version reports its FULL list
    * as added (its true predecessor is below the vacuum horizon).
    */
  final case class CommitInfo(version: Int, tsMillis: Long,
      opType: Option[String], segments: Int, segmentsAdded: Int,
      segmentsRemoved: Int, rowsAdded: Option[Long], dvCount: Int,
      cdcDelSegs: Int, cdcPreSegs: Int, cdcPostSegs: Int,
      clusterBy: Option[String] = None)

  def history(dir: String): Seq[CommitInfo] = {
    val latest = version(dir)
    require(latest >= 0, s"no snapshots in $dir")
    val lowest = (0 to latest).find(v =>
      Files.exists(logDir(dir).resolve(s"v$v.manifest"))).get
    val walk = segmentsWalk(dir, lowest, latest)
    (lowest to latest).map { v =>
      val cur = walk(v - lowest)
      val prevSet =
        if (v == lowest) Set.empty[String]
        else walk(v - 1 - lowest).map(_.relPath).toSet
      val curSet = cur.map(_.relPath).toSet
      val added = cur.filterNot(s => prevSet(s.relPath))
      val removed =
        if (v == lowest) 0 else prevSet.count(r => !curSet(r))
      val addedRows = added.map(s =>
        sidecarStats(dir, s.relPath).get(RowsStatName).map(_._1))
      val m = meta(dir, v)
      CommitInfo(v, commitTimeOf(dir, v), m.opType, cur.size, added.size,
        removed,
        if (addedRows.exists(_.isEmpty)) None
        else Some(addedRows.flatten.sum),
        m.dvs.size, m.cdcDel.size, m.cdcPre.size, m.cdcPost.size,
        m.cluster)
    }
  }

  /** What `vacuum(dir, horizon)` WOULD reclaim, without touching
    * anything (Delta's VACUUM DRY RUN): the doomed segment directory
    * names and the count of manifests that would drop. Runs the exact
    * keep-set computation the real vacuum runs.
    */
  def vacuumDryRun(dir: String, horizon: Int): (Seq[String], Int) = {
    val latest = version(dir)
    require(horizon >= 0 && horizon <= latest,
      s"horizon $horizon outside [0, $latest]")
    val keep = (segmentsWalk(dir, horizon, latest).flatMap(_.map(_.relPath)) ++
      (horizon to latest).flatMap { v =>
        val m = meta(dir, v); m.cdcDel ++ m.dvs ++ m.cdcPre ++ m.cdcPost
      }).toSet
    val doomed = listed(Paths.get(dir))(
      _.filter(p => p.getFileName.toString.startsWith("seg-")).toSeq)
      .map(_.getFileName.toString).filterNot(keep).sorted
    val mfs = (0 until horizon)
      .count(v => Files.exists(logDir(dir).resolve(s"v$v.manifest")))
    (doomed, mfs)
  }

  /** Retention enforcement: drop manifests BELOW `horizon` and delete
    * every segment directory no manifest ≥ horizon references. Time
    * travel to versions before the horizon is gone afterwards — the
    * documented retention trade every production log makes. Returns
    * (segment dirs deleted, manifests dropped).
    */
  /** Rewrite v's manifest in FULL form if it is a delta — vacuum calls
    * this on the horizon so surviving chains never dangle below it
    * (chains are strictly v → v−1, so a full horizon closes every
    * kept chain). In-place replace via atomic same-dir move: readers
    * see either the old delta (still resolvable pre-drop) or the new
    * full form, never a partial file.
    */
  private def materializeManifest(dir: String, v: Int): Unit = {
    val lines = manifestLines(dir, v)
    if (lines.exists(_.startsWith("#base\t"))) {
      val full = rawSegments(dir, v).map(segLine) ++
        lines.filter(l => l.startsWith("#") && !l.startsWith("#base\t"))
      val tmp = logDir(dir).resolve(s".v$v.manifest.full-${writerToken()}")
      Files.write(tmp, full.mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, logDir(dir).resolve(s"v$v.manifest"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Time-based retention (Delta's VACUUM ... RETAIN): the horizon is
    * the version that was CURRENT at `nowMillis - retainMs` — every
    * snapshot a reader could time-travel to within the retention
    * window stays readable, everything older goes. A cutoff predating
    * the log keeps everything; a cutoff after the newest commit keeps
    * only the head. `nowMillis` is explicit so retention decisions are
    * reproducible (and testable) — pass the wall clock in production.
    */
  def retentionHorizon(dir: String, retainMs: Long, nowMillis: Long): Int = {
    require(retainMs >= 0, s"retainMs must be >= 0, got $retainMs")
    val latest = version(dir)
    require(latest >= 0, s"no snapshots in $dir")
    val cutoff = nowMillis - retainMs
    val surviving = (0 to latest).filter(v =>
      Files.exists(logDir(dir).resolve(s"v$v.manifest")))
    val atOrBefore = surviving.filter(v => commitTimeOf(dir, v) <= cutoff)
    if (atOrBefore.isEmpty) surviving.min // cutoff predates the log
    else atOrBefore.max // the version current at the cutoff instant
  }

  def vacuumRetain(dir: String, retainMs: Long,
      nowMillis: Long = System.currentTimeMillis(),
      staleOptimizeAgeMs: Long = Long.MaxValue): (Int, Int) =
    vacuum(dir, retentionHorizon(dir, retainMs, nowMillis),
      staleOptimizeAgeMs)

  /** Clone as of a wall-clock instant (timestampAsOf composed with
    * cloneShallow): reproduce-the-table-your-job-saw-last-Tuesday.
    */
  def cloneShallowAtTimestamp(srcDir: String, dstDir: String,
      tsMillis: Long): Int =
    cloneShallow(srcDir, dstDir, versionAt(srcDir, tsMillis))

  /** `staleOptimizeAgeMs` additionally reclaims crashed-`optimize`
    * staging dirs (hidden `.opt-*`) whose NEWEST file is older than the
    * bound — a live concurrent optimize is actively writing, so its
    * staging stays younger than any sane age horizon (Delta's
    * tombstone-retention posture). The default never reclaims, the
    * pre-round-14 behavior.
    */
  def vacuum(dir: String, horizon: Int,
      staleOptimizeAgeMs: Long = Long.MaxValue): (Int, Int) = {
    val latest = version(dir)
    require(horizon >= 0 && horizon <= latest,
      s"horizon $horizon outside [0, $latest]")
    require(staleOptimizeAgeMs > 0,
      s"staleOptimizeAgeMs must be positive, got $staleOptimizeAgeMs")
    if (staleOptimizeAgeMs != Long.MaxValue) {
      val now = System.currentTimeMillis()
      val root0 = Paths.get(dir)
      listed(root0)(_.filter(p =>
        p.getFileName.toString.startsWith(".opt-") && Files.isDirectory(p))
        .toSeq).foreach { p =>
        // a LIVE optimize moves its bucket dirs out of staging while
        // we walk — paths legitimately vanish mid-stat. A vanished
        // entry means the dir is ACTIVE, the opposite of stale: skip
        // it rather than crash the whole vacuum (the exact concurrent
        // scenario the age horizon exists to tolerate).
        try {
          val newest = walked(p)(_.map { q =>
            try Files.getLastModifiedTime(q).toMillis
            catch { case _: java.io.IOException => now } // active → fresh
          }.foldLeft(0L)(math.max))
          if (now - newest > staleOptimizeAgeMs)
            walked(p)(_.toSeq).reverse.foreach(Files.deleteIfExists)
        } catch {
          case _: java.io.IOException => ()
          case _: java.io.UncheckedIOException => ()
        }
      }
    }
    // incremental manifests: the horizon must become self-contained
    // BEFORE anything below it is dropped
    materializeManifest(dir, horizon)
    // cdcDel change segments are referenced by meta lines, not segment
    // lines — they must survive exactly as long as their manifest does.
    // One forward walk resolves all kept versions' lists.
    // cdcDel/cdcPre AND deletion-vector segments are referenced by meta
    // lines, not segment lines — each must survive as long as a kept
    // manifest references it (cdcPost segments are live segment lines
    // and ride the walk)
    val keep = (segmentsWalk(dir, horizon, latest).flatMap(_.map(_.relPath)) ++
      (horizon to latest).flatMap { v =>
        val m = meta(dir, v); m.cdcDel ++ m.dvs ++ m.cdcPre ++ m.cdcPost
      }).toSet
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

  /** == Concurrent-writer retry (round-13 verdict item 3) ==
    * The loser of the manifest publish race gets
    * ConcurrentModificationException; production table formats resolve
    * it with commit-retry under conflict CLASSIFICATION rather than
    * making every caller hand-roll a loop:
    *
    *  - APPEND is a blind insert: it reads no table state, so it
    *    commutes with ANY winner and the loser REBASES — the data
    *    segment (already written, immutable) is kept and only the
    *    manifest re-publishes against the new head. The schema gate
    *    re-runs per attempt: a winner that evolved the schema can turn
    *    a rebase into a legitimate loud refusal (add-only violation),
    *    which must abort, not retry. A batch-tagged append also
    *    rechecks the idempotency gate per attempt — if the WINNER
    *    committed the same batchId (two recovering stream writers),
    *    the loser skips instead of double-landing the batch.
    *  - DELETE / MERGE / COMPACT are read-modify-write: their
    *    touched-segment discovery must OBSERVE the winner's rows for
    *    the outcome to be serializable, so the loser RE-RUNS the whole
    *    operation against the new head via `commitWithRetry` — a
    *    manifest-only rebase would let a delete miss rows a concurrent
    *    append landed (write-skew), the conflict Delta classifies as
    *    ConcurrentAppendException and likewise refuses to rebase.
    *
    * Orphan segment directories from lost attempts are unreferenced by
    * ANY manifest and reclaimed by `vacuum` — the same economy failed
    * single-shot commits already rely on. Backoff is deterministic
    * (linear, 5 ms × attempt): two writers cannot livelock because the
    * publish is an atomic link — every round has exactly one winner,
    * so maxAttempts bounds the loser's work, not the system's progress.
    */
  def commitWithRetry[A](maxAttempts: Int = 5)(op: => A): A = {
    var attempt = 0
    while (true) {
      try return op
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          Thread.sleep(5L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Append with rebase-on-conflict (see the classification above):
    * the segment writes ONCE; each attempt re-reads the head, re-gates
    * the schema, re-checks the batch-id idempotency gate, and
    * re-publishes. Returns the committed version — or the current
    * version unchanged when a racing writer landed the same batchTag
    * first (the streaming exactly-once contract under contention).
    */
  def appendWithRetry(df: DataFrame, dir: String, statsCol: Column,
      batchTag: Option[Long] = None, maxAttempts: Int = 5): Int = {
    Files.createDirectories(logDir(dir))
    var written: Option[(String, Long, Long)] = None
    var attempt = 0
    while (true) {
      val prev = version(dir)
      if (batchTag.exists(committedBatches(dir))) return prev
      val v = prev + 1
      val snapSchema = evolvedSchema(
        gateSchema(df.sparkSession, dir, prev), df.schema,
        df.sparkSession.sessionState.analyzer.resolver)
      val (rel, mn, mx) = written.getOrElse {
        val r = s"seg-$v-${writerToken()}"
        val p = absPath(dir, r)
        val (a, b) = writeSegWithStats(df, dir, p, statsCol)
        val t = (r, a, b)
        written = Some(t)
        t
      }
      val carried = if (prev < 0) Nil else segments(dir, prev)
      val carriedMeta = (if (prev < 0) ManifestMeta(Set.empty, Set.empty)
        else meta(dir, prev).carried).copy(opType = Some("append"))
      try {
        publish(dir, v, commitLines(dir, v,
          carried :+ Segment(rel, mn, mx, batchTag), carried, carriedMeta,
          Some(s"#schema\t${snapSchema.json}")))
        return v
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          Thread.sleep(5L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** delete with serializable re-run-on-conflict (the classification
    * above: read-modify-write must observe the winner's rows).
    */
  def deleteWithRetry(spark: SparkSession, dir: String, predicate: Column,
      statsCol: Column, maxAttempts: Int = 5): Int =
    commitWithRetry(maxAttempts)(delete(spark, dir, predicate, statsCol))

  /** merge with serializable re-run-on-conflict. */
  def mergeWithRetry(spark: SparkSession, src: DataFrame, dir: String,
      key: String, statsCol: Column, maxAttempts: Int = 5): Int =
    commitWithRetry(maxAttempts)(merge(spark, src, dir, key, statsCol))

  /** compact with re-run-on-conflict. */
  def compactWithRetry(spark: SparkSession, dir: String, statsCol: Column,
      maxAttempts: Int = 5): Int =
    commitWithRetry(maxAttempts)(compact(spark, dir, statsCol))

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
      else {
        val dvs = meta(dir, v).dvs
        applyDvs(spark, dir, dvs,
          readSegs(spark, dir, v, hit.map(_.relPath),
            keepDvKeys = dvs.nonEmpty))
          .filter(statsCol >= lo && statsCol <= hi)
      }
    (df, hit.size, segs.size)
  }
}
