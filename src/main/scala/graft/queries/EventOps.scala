package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.Fns._

/** Event-table operators: JSON extraction, event-time tumbling
  * windows (batch form), gaps-and-islands sessionization, and the
  * deterministic twin of the reference's rating-tier mapping
  * (imb_rating.py:116–124). The seeded-random synthesis itself lives
  * in graft.synth (not oracle-checkable — rand() differs per engine).
  */
object EventOps {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** PSI kernel shared by q163 and `GraftEngine.psiDrift` (the
    * funnelVerdict sharing rule): input is ANY tagged frame of
    * (grp, is_ref boolean, bkt int in [0, nBuckets)); output per grp
    * is the Laplace-smoothed Population Stability Index over the fixed
    * bucket grid plus the industry verdict (>0.1 watch, >0.25 act)
    * gated on the ROUNDED psi. The (grp × bucket) spine guarantees
    * empty bins exist on both sides; per-grp totals are a WINDOW over
    * the tiny grid (nBuckets rows per grp), never a second pass over
    * the input.
    */
  def psiByGroup(tagged: DataFrame, nBuckets: Int = 10): DataFrame = {
    val counts = tagged.groupBy(col("grp"), col("bkt"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("cb"))
    val spine = tagged.select(col("grp")).distinct()
      .crossJoin(broadcast(tagged.sparkSession
        .range(0, nBuckets).select(col("id").cast("int").as("bkt"))))
    val grid = spine.join(counts, Seq("grp", "bkt"), "left")
      .select(col("grp"), col("bkt"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val wt = Window.partitionBy(col("grp"))
    val half = nBuckets / 2.0
    grid
      .withColumn("na", sum(col("ca")).over(wt))
      .withColumn("nb", sum(col("cb")).over(wt))
      .withColumn("pa", (col("ca") + 0.5) / (col("na") + half))
      .withColumn("pb", (col("cb") + 0.5) / (col("nb") + half))
      .groupBy(col("grp"))
      .agg(max(col("na")).as("n_ref"), max(col("nb")).as("n_cur"),
        round(sum((col("pa") - col("pb")) * log(col("pa") / col("pb"))), 6)
          .as("psi"))
      .withColumn("verdict",
        when(col("psi") > 0.25, "act").when(col("psi") > 0.1, "watch")
          .otherwise("stable"))
  }

  /** Bucketed interval-containment join shared by q167 and
    * `GraftEngine.intervalJoin`: `rows` carry an integer-seconds
    * column `secCol` and a join key `rowKey`; `intervals` carry
    * (`intervalKey`, lo, hi) in the same units. Each interval explodes
    * into the `bucketSec`-wide buckets it overlaps and the containment
    * join runs as an EQUI-join on (key, bucket) with the exact BETWEEN
    * as a residual — the standard range-join decomposition: pick
    * bucketSec ≈ the typical interval width and each interval lands in
    * ≤2 buckets, hash-partitionable at any interval-table size.
    * `broadcastIntervals` pins the small-dim plan (default; pass false
    * when the interval table is itself corpus-scale).
    */
  def intervalJoin(rows: DataFrame, intervals: DataFrame,
      rowKey: String, intervalKey: String, secCol: String,
      bucketSec: Long = 3600L, broadcastIntervals: Boolean = true): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val iv = intervals.withColumn("__bkt",
      explode(sequence(expr(s"lo div $bucketSec"), expr(s"hi div $bucketSec"))))
    val ivb = if (broadcastIntervals) broadcast(iv) else iv
    rows.withColumn("__ebkt", expr(s"$secCol div $bucketSec"))
      .join(ivb, col(rowKey) === col(intervalKey)
        && col("__ebkt") === col("__bkt")
        && col(secCol).between(col("lo"), col("hi")))
      .drop("__ebkt", "__bkt")
  }

  /** Point-in-time enrichment against an SCD2 dimension (q168's
    * consumer, shared by `GraftEngine.pointInTimeEnrich` and
    * `StreamOps.scd2EnrichStream`): each fact row (user_id, sec, …)
    * joins the ONE dimension version whose [valid_from, valid_to]
    * interval contains its event time (open-ended current version =
    * null valid_to) — the leakage-free training-time feature lookup.
    * LEFT join so facts outside all versions survive with null
    * attributes. The dimension is change-point-sized (tiny next to
    * facts) and broadcasts; at a scale where it doesn't, q167's
    * bucketed interval decomposition applies unchanged.
    */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame): DataFrame = {
    val d = dim.select(col("user_id").as("d_user"),
      col("tier").as("pit_tier"), col("valid_from"), col("valid_to"))
    facts.join(broadcast(d),
        col("user_id") === col("d_user") &&
          col("sec") >= col("valid_from") &&
          (col("valid_to").isNull || col("sec") <= col("valid_to")),
        "left")
      .drop("d_user", "valid_from", "valid_to")
  }

  /** Memoized 20-row incident interval table for q167, keyed
    * (session, dir) and eagerly localCheckpoint'ed — the interval
    * table is a SESSION artifact (an ops team's incident list), not
    * per-query work, and the top-20 derivation re-scanned events in
    * every q167 invocation: the second consecutive >2× driver bench
    * flag on that row priced exactly this derivation inside the
    * serving join's window of exposure. Named build
    * `incident_intervals` under the bench accounting rule (the
    * warmPairKernel pattern), so the q167 row is deterministically
    * join-only. 20 checkpointed rows — memory-free for all practical
    * purposes; cleared by releaseCaches().
    */
  private val incidentMemo =
    new graft.KeyedMemo[(SparkSession, String), DataFrame]

  private[graft] def incidentIntervals(s: SparkSession, d: String): DataFrame =
    incidentMemo.getOrBuild((s, d)) {
      t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"),
          floor(col("ts").cast("double")).cast("long").as("sec"))
        .orderBy(col("value").desc, col("event_id")).limit(20)
        .select(col("event_id").as("incident_id"),
          col("event_type").as("itype"),
          (col("sec") - 1800L).as("lo"), (col("sec") + 1800L).as("hi"))
        .localCheckpoint()
    }

  /** Explicit bench/session setup for the memoized incident table. */
  def warmIncidents(s: SparkSession, d: String): Unit = {
    incidentIntervals(s, d); ()
  }

  def releaseCaches(): Unit = incidentMemo.clear()

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q200_stream_replay_audit",
      "Streaming exactly-once REPLAY audit (round-13 item 6): the snapshot sink's " +
        "batch-id idempotency claim, turned into a driver-visible CORRECTNESS row " +
        "instead of living only in StreamingSpec. The query drives the REAL sink " +
        "body (StreamOps.snapshotCommitBatch — the exact foreachBatch closure the " +
        "production stream runs) through an at-least-once delivery schedule into a " +
        "fresh log: batches 0, 1, 2 of events (event_id % 3 slices) land, then " +
        "batches 1 and 2 are RE-DELIVERED with the same ids — checkpoint recovery's " +
        "replay, where a naive sink double-counts. The audit is " +
        "interleaving-independent and fully recomputable by the oracle: per batch, " +
        "the attempt count (the delivery schedule), the segments carrying its tag " +
        "(must be 1 — a second tagged segment IS a double-land), the delta rows and " +
        "exact-cents value mass of its committed version (readChanges(v-1, v) — " +
        "version v is batch v precisely because the replays were skipped), and the " +
        "total version count (3 commits from 5 deliveries). The gate checks the " +
        "LOG, not writer-local state (committedBatches reads the manifest), so the " +
        "same verdict holds across restarts — the recipe a 100 TB streaming ingest " +
        "needs for exactly-once on top of at-least-once delivery.",
      (s, d) => {
        import graft.ext.SnapshotLog
        // pid in the path: two processes sharing /tmp must not race
        // each other's private log (the round-14 q207/q213 rule)
        val dir = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"),
          "graft-snaplog-replay-" + Integer.toHexString(d.hashCode) +
            s"-p${ProcessHandle.current().pid()}").toString
        SnapshotLog.reset(dir, checkpointInterval = 3)
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        def batch(b: Long): DataFrame =
          ev.filter(pmod(col("event_id"), lit(3L)) === b)
        // the at-least-once schedule: deliver 0,1,2 then REPLAY 1 and 2
        Seq(0L, 1L, 2L, 1L, 2L).foreach { b =>
          graft.streaming.StreamOps.snapshotCommitBatch(
            batch(b), dir, "event_id", b)
        }
        val latest = SnapshotLog.version(dir)
        val segs = SnapshotLog.segments(dir, latest)
        val attempts = Map(0L -> 1L, 1L -> 2L, 2L -> 2L)
        (0L to 2L).map { b =>
          SnapshotLog.readChanges(s, dir, b.toInt - 1, b.toInt)
            .agg(count(lit(1)).as("n_rows"),
              sum(cents(col("value"))).as("value_cents"))
            .select(lit(b).as("batch_id"),
              lit(attempts(b)).as("n_attempts"),
              lit(segs.count(_.tag.contains(b)).toLong).as("n_segments"),
              col("n_rows"), col("value_cents"),
              lit((latest + 1).toLong).as("n_versions"))
        }.reduce(_.unionByName(_)).orderBy(col("batch_id"))
      },
      Some("WITH s AS (SELECT event_id % 3 AS b, " +
        "CAST(round(value*100) AS BIGINT) AS c FROM events) " +
        "SELECT CAST(b AS BIGINT) AS batch_id, " +
        "CAST(CASE WHEN b = 0 THEN 1 ELSE 2 END AS BIGINT) AS n_attempts, " +
        "CAST(1 AS BIGINT) AS n_segments, " +
        "CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(sum(c) AS BIGINT) AS value_cents, " +
        "CAST(3 AS BIGINT) AS n_versions " +
        "FROM s GROUP BY b ORDER BY batch_id")),

    GraftQuery(
      "q217_stream_source_audit",
      "Streaming SOURCE exactly-once replay audit (round-15 item 1 — the q200 " +
        "pattern driven from the READ side): q200 proved the snapshot SINK's " +
        "batch-id gate; this query proves the new checkpointed log TAIL " +
        "(streaming/SnapshotSource — plan-offsets-durably, process, commit, the " +
        "MicroBatchExecution WAL recipe) delivers an append/compact/delete " +
        "history exactly once THROUGH a crash. Schedule: batch 0 tails the " +
        "initial snapshot (one appended events slice); a second slice lands " +
        "plus a compaction (dataChange = false), and the tail CRASHES after " +
        "its sink body ran but before the batch committed — the restart " +
        "replays the SAME version range under the SAME batch id into the " +
        "batch-id-keyed sink, which overwrites itself (exactly-once on top of " +
        "at-least-once); then the third slice plus a merge-on-read DELETE " +
        "land and the tail delivers insert AND delete rows tagged with their " +
        "commit versions. Every audited number is recomputable by the oracle " +
        "from base events: per batch the attempt count (the injected " +
        "schedule), insert/delete row counts and exact-cents masses, and the " +
        "distinct commit versions delivered (compaction contributes NONE — a " +
        "leak would both raise n_versions and double n_ins into a hash " +
        "mismatch; a replay double-land would double batch 1's rows the same " +
        "way). At 100 TB this is the tail a downstream training pipeline " +
        "hangs off the table: cost per trigger = the change volume, with " +
        "recovery semantics identical to Spark's own streaming engine.",
      (s, d) => {
        import graft.ext.SnapshotLog
        import graft.streaming.SnapshotSource
        // shared scratch recipe (pid-scoped path + full wipe): the
        // tail's checkpoint and sink must not survive into a second
        // in-session run against the freshly-reset log
        val base = Relational.freshScratch("graft-snapsrc", d)
        val dir = s"$base/log"; val ck = s"$base/ck"; val sink = s"$base/sink"
        SnapshotLog.reset(dir, checkpointInterval = 3)
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        def slice(b: Long): DataFrame =
          ev.filter(pmod(col("event_id"), lit(3L)) === b)
        def land(df: DataFrame, bid: Long): Unit =
          df.write.mode("overwrite").parquet(s"$sink/batch_id=$bid")
        SnapshotLog.append(slice(0), dir, col("event_id")) // v0
        SnapshotSource.run(s, dir, ck)(land) // batch 0: initial snapshot
        SnapshotLog.append(slice(1), dir, col("event_id")) // v1
        SnapshotLog.compact(s, dir, col("event_id")) // v2, silent
        // the crash: sink body lands batch 1, the commit never does
        try SnapshotSource.run(s, dir, ck) { (df, bid) =>
          land(df, bid)
          throw new RuntimeException("injected crash before commit")
        } catch { case e: RuntimeException
            if e.getMessage.contains("injected") => () }
        SnapshotSource.run(s, dir, ck)(land) // restart: replays batch 1
        SnapshotLog.append(slice(2), dir, col("event_id")) // v3
        SnapshotLog.deleteMor(s, dir,
          pmod(col("event_id"), lit(7L)) === 2) // v4
        SnapshotSource.run(s, dir, ck)(land) // batch 2: (2, 4]
        val attempts = when(col("batch_id") === 0, 1L)
          .when(col("batch_id") === 1, 2L).otherwise(1L)
        val isIns = col("_change_type") === "insert"
        s.read.parquet(sink)
          .groupBy(col("batch_id").cast("long").as("batch_id"))
          .agg(
            sum(when(isIns, 1L).otherwise(0L)).cast("long").as("n_ins"),
            sum(when(isIns, cents(col("value"))).otherwise(0L))
              .cast("long").as("ins_cents"),
            sum(when(!isIns, 1L).otherwise(0L)).cast("long").as("n_del"),
            sum(when(!isIns, cents(col("value"))).otherwise(0L))
              .cast("long").as("del_cents"),
            countDistinct(col("_commit_version")).cast("long")
              .as("n_versions"))
          .withColumn("n_attempts", attempts)
          .select(col("batch_id"), col("n_attempts"), col("n_ins"),
            col("ins_cents"), col("n_del"), col("del_cents"),
            col("n_versions"))
          .orderBy(col("batch_id"))
      },
      Some("WITH s AS (SELECT event_id % 3 AS b, event_id % 7 AS d7, " +
        "CAST(round(value*100) AS BIGINT) AS c FROM events), " +
        "i AS (SELECT b, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(c) AS BIGINT) AS cc FROM s GROUP BY b), " +
        "dl AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(c) AS BIGINT) AS cc FROM s WHERE d7 = 2) " +
        "SELECT CAST(0 AS BIGINT) AS batch_id, CAST(1 AS BIGINT) AS " +
        "n_attempts, n AS n_ins, cc AS ins_cents, CAST(0 AS BIGINT) AS " +
        "n_del, CAST(0 AS BIGINT) AS del_cents, CAST(1 AS BIGINT) AS " +
        "n_versions FROM i WHERE b = 0 " +
        "UNION ALL SELECT CAST(1 AS BIGINT), CAST(2 AS BIGINT), n, cc, " +
        "CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT) " +
        "FROM i WHERE b = 1 " +
        "UNION ALL SELECT CAST(2 AS BIGINT), CAST(1 AS BIGINT), i.n, " +
        "i.cc, dl.n, dl.cc, CAST(2 AS BIGINT) FROM i, dl WHERE i.b = 2 " +
        "ORDER BY batch_id")),

    GraftQuery(
      "q171_asof_native",
      "TWO-TABLE as-of join through the native plan node (guide preference (c): custom LogicalPlan + SparkStrategy + SparkPlan, registered via SparkSessionExtensions / experimental.extraStrategies): for each purchase, the same user's most recent click within a 1-hour tolerance — purchases and clicks as SEPARATE relations, where q38's same-table union+window trick would force both through one union-wide shuffle carrying the union schema. AsOfJoinExec instead clusters each side on user_id through its OWN exchange (EnsureRequirements co-partitions them exactly like a sort-merge join), sorts within partitions by (key, time[, event_id tiebreak]), and resolves every probe in ONE forward merge pass with two-row state: O(n_l + n_r) per partition, no window buffering, no per-row lookback. Ties on click time break to the highest click_id (the explicit tiebreak column); clicks older than the tolerance leave nulls — LEFT OUTER as-of. Integer epoch-second time on both engines.",
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            unix_timestamp(col("ts")).as("p_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            unix_timestamp(col("ts")).as("c_ts"))
        org.apache.spark.sql.graft.AsOfJoinApi.asof(
            purchases, clicks, Seq("user_id"), "p_ts", "c_ts",
            rightTiebreakCols = Seq("click_id"), toleranceSec = Some(3600L))
          .select(col("user_id"), col("purchase_id"), col("click_id"),
            (col("p_ts") - col("c_ts")).as("gap_s"))
          .orderBy(col("purchase_id"))
      },
      Some("WITH p AS (SELECT user_id, event_id AS purchase_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS p_ts FROM events WHERE event_type='purchase'), " +
        "c AS (SELECT user_id, event_id AS click_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS c_ts FROM events WHERE event_type='click') " +
        "SELECT p.user_id, p.purchase_id, x.click_id, x.gap_s " +
        "FROM p LEFT JOIN LATERAL (" +
        "SELECT c.click_id, p.p_ts - c.c_ts AS gap_s FROM c " +
        "WHERE c.user_id = p.user_id AND c.c_ts <= p.p_ts AND p.p_ts - c.c_ts <= 3600 " +
        "ORDER BY c.c_ts DESC, c.click_id DESC LIMIT 1) x ON TRUE " +
        "ORDER BY purchase_id")),

    GraftQuery(
      "q180_asof_forward",
      "FORWARD as-of join through the native plan node — q171's probe reversed in time: for each purchase, the same user's NEXT click at-or-after it within a 1-hour tolerance (the 'what did this action lead to' attribution probe; pandas merge_asof direction='forward'). Same AsOfJoinExec, same per-side exchanges and single O(n_l + n_r) forward merge — the only change is the candidate rule: the cursor stops at the first same-key right row at-or-after the probe time instead of holding the last one behind it, so equal-time rows match at distance 0 and ties break to the LOWEST click_id (first in (time, tiebreak) sort order — the mirror of backward's last-wins). Clicks beyond the tolerance leave nulls — LEFT OUTER as-of.",
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            unix_timestamp(col("ts")).as("p_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            unix_timestamp(col("ts")).as("c_ts"))
        org.apache.spark.sql.graft.AsOfJoinApi.asof(
            purchases, clicks, Seq("user_id"), "p_ts", "c_ts",
            rightTiebreakCols = Seq("click_id"), toleranceSec = Some(3600L),
            direction = org.apache.spark.sql.graft.AsOfJoinApi.Forward)
          .select(col("user_id"), col("purchase_id"), col("click_id"),
            (col("c_ts") - col("p_ts")).as("gap_s"))
          .orderBy(col("purchase_id"))
      },
      Some("WITH p AS (SELECT user_id, event_id AS purchase_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS p_ts FROM events WHERE event_type='purchase'), " +
        "c AS (SELECT user_id, event_id AS click_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS c_ts FROM events WHERE event_type='click') " +
        "SELECT p.user_id, p.purchase_id, x.click_id, x.gap_s " +
        "FROM p LEFT JOIN LATERAL (" +
        "SELECT c.click_id, c.c_ts - p.p_ts AS gap_s FROM c " +
        "WHERE c.user_id = p.user_id AND c.c_ts >= p.p_ts AND c.c_ts - p.p_ts <= 3600 " +
        "ORDER BY c.c_ts ASC, c.click_id ASC LIMIT 1) x ON TRUE " +
        "ORDER BY purchase_id")),

    GraftQuery(
      "q181_asof_nearest",
      "NEAREST as-of join through the native plan node — the third direction of the q171/q180 family (pandas merge_asof direction='nearest', the QuestDB/kdb temporal-join surface): for each purchase, the same user's click CLOSEST in absolute time within a 1-hour tolerance, whichever side of the purchase it falls on; an exact distance tie prefers the PRIOR click (the backward candidate — deterministic, and the convention that never looks into the future unless the future is strictly closer). One merge pass resolves both candidates with two-row state: the held row behind the cursor is the backward candidate and the cursor row itself is the forward one — no second scan, no window, same O(n_l + n_r) per co-partitioned pair as the other directions. gap_s is SIGNED (negative = click preceded the purchase) so a consumer can audit which side won.",
      (s, d) => {
        val ev = t(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            unix_timestamp(col("ts")).as("p_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            unix_timestamp(col("ts")).as("c_ts"))
        org.apache.spark.sql.graft.AsOfJoinApi.asof(
            purchases, clicks, Seq("user_id"), "p_ts", "c_ts",
            rightTiebreakCols = Seq("click_id"), toleranceSec = Some(3600L),
            direction = org.apache.spark.sql.graft.AsOfJoinApi.Nearest)
          .select(col("user_id"), col("purchase_id"), col("click_id"),
            (col("c_ts") - col("p_ts")).as("gap_s"))
          .orderBy(col("purchase_id"))
      },
      Some("WITH p AS (SELECT user_id, event_id AS purchase_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS p_ts FROM events WHERE event_type='purchase'), " +
        "c AS (SELECT user_id, event_id AS click_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS c_ts FROM events WHERE event_type='click') " +
        "SELECT p.user_id, p.purchase_id, x.click_id, x.gap_s " +
        "FROM p LEFT JOIN LATERAL (" +
        "SELECT c.click_id, c.c_ts - p.p_ts AS gap_s FROM c " +
        "WHERE c.user_id = p.user_id AND abs(c.c_ts - p.p_ts) <= 3600 " +
        "ORDER BY abs(c.c_ts - p.p_ts) ASC, " +
        "(CASE WHEN c.c_ts <= p.p_ts THEN 0 ELSE 1 END) ASC, " +
        "(CASE WHEN c.c_ts <= p.p_ts THEN -c.click_id ELSE c.click_id END) ASC " +
        "LIMIT 1) x ON TRUE " +
        "ORDER BY purchase_id")),

    GraftQuery(
      "q30_case_tiers",
      "F6's tier mapping as a deterministic when-chain over event value (reference imb_rating.py:116–124 tier table).",
      (s, d) => t(s, d, "events")
        .withColumn("tier",
          when(col("value") >= 180.0, 5)
            .when(col("value") >= 120.0, 4)
            .when(col("value") >= 60.0, 3)
            .when(col("value") >= 20.0, 2)
            .otherwise(1))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("value_cents"))
        .orderBy(col("tier")),
      Some("SELECT CASE WHEN value >= 180.0 THEN 5 WHEN value >= 120.0 THEN 4 WHEN value >= 60.0 THEN 3 " +
        "WHEN value >= 20.0 THEN 2 ELSE 1 END AS tier, CAST(count(*) AS BIGINT) AS cnt, " +
        "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents " +
        "FROM events GROUP BY tier ORDER BY tier")),

    GraftQuery(
      "q31_json_extract",
      "JSON field extraction from the events.props column (SURVEY.md §1 extension surface; get_json_object is codegen'd, no UDF).",
      (s, d) => t(s, d, "events")
        .withColumn("k_mod", (get_json_object(col("props"), "$.k").cast("int") % 10))
        .groupBy(col("k_mod"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("k_mod")),
      Some("SELECT CAST(json_extract_string(props,'$.k') AS INTEGER) % 10 AS k_mod, " +
        "CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY k_mod ORDER BY k_mod")),

    GraftQuery(
      "q32_tumbling_hour",
      "Event-time tumbling window aggregation, batch form of the streaming shape (window() group-by; readStream twin in graft.streaming).",
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("value_cents"))
        .select(unix_timestamp(col("w.start")).as("hour_start"),
          col("cnt"), col("value_cents"))
        .orderBy(col("hour_start")),
      Some("SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_start, " +
        "CAST(count(*) AS BIGINT) AS cnt, " +
        "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents " +
        "FROM events GROUP BY hour_start ORDER BY hour_start")),

    GraftQuery(
      "q33_sessionize",
      "Gaps-and-islands sessionization (30-min inactivity gap) via lag window — the batch twin of mapGroupsWithState session logic. One shuffle on user_id.",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, d, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
              .otherwise(0))
          .groupBy(col("user_id"))
          .agg(sum(col("new_sess")).cast("long").as("n_sessions"))
          .orderBy(col("user_id"))
      },
      Some("WITH e AS (SELECT user_id, ts, event_id, " +
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events) " +
        "SELECT user_id, CAST(sum(CASE WHEN prev_ts IS NULL OR " +
        "floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions " +
        "FROM e GROUP BY user_id ORDER BY user_id")),

    GraftQuery(
      "q35_sliding_window",
      "Sliding event-time windows (1h window, 30min slide): each event lands in exactly two epoch-aligned windows — the overlap shape tumbling windows can't express.",
      (s, d) => t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("value_cents"))
        .select(unix_timestamp(col("w.start")).as("ws"),
          col("cnt"), col("value_cents"))
        .orderBy(col("ws")),
      Some("WITH x AS (SELECT unnest([CAST(floor(floor(epoch(ts))/1800)*1800 AS BIGINT), " +
        "CAST(floor(floor(epoch(ts))/1800)*1800 - 1800 AS BIGINT)]) AS ws, value FROM events) " +
        "SELECT ws, CAST(count(*) AS BIGINT) AS cnt, " +
        "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents " +
        "FROM x GROUP BY ws ORDER BY ws")),

    GraftQuery(
      "q36_session_window",
      "Native session windows (session_window, 30-min gap) per user — Spark's built-in merging-interval state; the oracle derives the same sessions via gaps-and-islands SQL. New session iff the gap >= 30min (Spark's window end is exclusive).",
      (s, d) => t(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), unix_timestamp(col("w.start")).as("sess_start"),
          col("cnt"))
        .orderBy(col("user_id"), col("sess_start")),
      Some("WITH e AS (SELECT user_id, ts, event_id, " +
        "CASE WHEN lag(ts) OVER w IS NULL OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800 " +
        "THEN 1 ELSE 0 END AS ns FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "s AS (SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM e) " +
        "SELECT user_id, CAST(min(floor(epoch(ts))) AS BIGINT) AS sess_start, " +
        "CAST(count(*) AS BIGINT) AS cnt FROM s GROUP BY user_id, sid " +
        "ORDER BY user_id, sess_start")),

    GraftQuery(
      "q38_asof_join",
      "As-of join, composed scalably (guide preference (a)): for each purchase, the same user's most recent prior click — one sort per user key via last(ignoreNulls) over an unbounded-preceding frame, no range join and no per-row lookup. The custom-SparkPlan route is unnecessary because the union+window form already gives the merge-join execution an AsOfJoinExec would.",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, d, "events")
          .withColumn("click_id",
            last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
          .withColumn("click_ts_s",
            last(when(col("event_type") === "click", unix_timestamp(col("ts"))), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("click_id"),
            (unix_timestamp(col("ts")) - col("click_ts_s")).as("gap_s"))
          .orderBy(col("purchase_id"))
      },
      Some("SELECT user_id, event_id AS purchase_id, click_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) - click_ts_s AS gap_s FROM (" +
        "SELECT user_id, ts, event_id, event_type, " +
        "last_value(CASE WHEN event_type='click' THEN event_id END IGNORE NULLS) " +
        "OVER w AS click_id, " +
        "last_value(CASE WHEN event_type='click' THEN CAST(floor(epoch(ts)) AS BIGINT) END IGNORE NULLS) " +
        "OVER w AS click_ts_s FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) " +
        "WHERE event_type='purchase' ORDER BY purchase_id")),

    GraftQuery(
      "q37_event_funnel",
      "Ordered funnel (view → click → purchase): per-user first-occurrence times, conversion = each step strictly after the previous. One aggregation pass — no per-step re-scans or joins.",
      (s, d) => t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
        .select(col("user_id"),
          col("t_view").isNotNull.as("viewed"),
          (col("t_click") > col("t_view")).as("clicked_after_view"),
          (col("t_purchase") > col("t_click") && col("t_click") > col("t_view"))
            .as("full_funnel"))
        .orderBy(col("user_id")),
      Some("SELECT user_id, (t_view IS NOT NULL) AS viewed, " +
        "(t_click > t_view) AS clicked_after_view, " +
        "(t_purchase > t_click AND t_click > t_view) AS full_funnel FROM (" +
        "SELECT user_id, min(CASE WHEN event_type='view' THEN ts END) AS t_view, " +
        "min(CASE WHEN event_type='click' THEN ts END) AS t_click, " +
        "min(CASE WHEN event_type='purchase' THEN ts END) AS t_purchase " +
        "FROM events GROUP BY user_id) ORDER BY user_id")),

    GraftQuery(
      "q73_map_ops",
      "MapType surface: parse the JSON props column into map<string,int>, explode entries, aggregate per key — schema-on-read for semi-structured payloads.",
      (s, d) => t(s, d, "events")
        .select(explode(from_json(col("props"), lit("MAP<STRING, INT>")))
          .as(Seq("k", "v")))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("v_sum"),
          countDistinct(col("v")).as("v_distinct"))
        .orderBy(col("k")),
      Some("WITH kv AS (SELECT unnest(json_keys(props)) AS k, " +
        "CAST(json_extract_string(props, '$.' || unnest(json_keys(props))) AS INTEGER) AS v " +
        "FROM events) " +
        "SELECT k, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(v) AS BIGINT) AS v_sum, " +
        "CAST(count(DISTINCT v) AS BIGINT) AS v_distinct FROM kv GROUP BY k ORDER BY k"),
    ),

    GraftQuery(
      "q34_event_type_pivot",
      "Conditional aggregation (pivot shape): per-user counts of each event type in one pass — no per-type re-scans.",
      (s, d) => t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))
        .orderBy(col("user_id")),
      Some("SELECT user_id, " +
        "CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks, " +
        "CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS views, " +
        "CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases, " +
        "CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS errors " +
        "FROM events GROUP BY user_id ORDER BY user_id")),

    GraftQuery(
      "q98_cohort_retention",
      "Cohort retention matrix — the product-analytics standard: users cohort by the week of their first event (relative to the corpus's min day, a broadcast 1-row aggregate — the q69 pattern, nothing hits the driver), and each (cohort_week, week_offset) cell counts distinct users still active that many weeks later. Two shuffles on user_id (first-touch min, then the enrichment join — co-partitioned on the same key, so AQE plans one exchange each side) plus one on the ~25 cell keys. All date math is integer day arithmetic, so engines cannot disagree at week boundaries.",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val firstDay = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        val g0 = ev.agg(min(col("day")).as("g0"))
        ev.join(firstDay, Seq("user_id"))
          .crossJoin(broadcast(g0))
          .withColumn("cohort_week",
            floor(datediff(col("cohort_day"), col("g0")) / 7).cast("int"))
          .withColumn("week_offset",
            floor(datediff(col("day"), col("cohort_day")) / 7).cast("int"))
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "fd AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id), " +
        "g AS (SELECT min(day) AS g0 FROM ev) " +
        "SELECT CAST(date_diff('day', g0, cohort_day) // 7 AS INTEGER) AS cohort_week, " +
        "CAST(date_diff('day', cohort_day, day) // 7 AS INTEGER) AS week_offset, " +
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, " +
        "CAST(count(*) AS BIGINT) AS n_events " +
        "FROM ev JOIN fd USING (user_id), g " +
        "GROUP BY 1, 2 ORDER BY 1, 2")),

    GraftQuery(
      "q132_decay_weights",
      "Recency-decayed event mass per type — the weighting a training-data (or feature-store) pipeline applies when newer interactions should dominate: each event gets weight 2^(-age_days/30) (30-day half-life) measured against the corpus max timestamp (a broadcast 1-row aggregate, the q69 pattern), and the rollup reports raw vs effective counts and value mass. Age is floored to whole days BEFORE the exponential, so both engines exponentiate the same integer grid (sub-second ns-vs-us truncation differences cannot move a bucket), and the transcendental sums are rounded 4dp (sum order differs across engines; 60k-term double drift is ~1e-6). One scan, one shuffle on the handful of event types.",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), col("value"),
            floor(col("ts").cast("double")).cast("long").as("sec"))
        val mx = ev.agg(max(col("sec")).as("mx"))
        ev.crossJoin(broadcast(mx))
          .withColumn("age_days", floor((col("mx") - col("sec")) / 86400L))
          .withColumn("w",
            exp(lit(-0.6931471805599453) * col("age_days") / lit(30.0)))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("w")), 4).as("eff_n"),
            round(sum(col("w") * col("value")), 4).as("eff_value"))
          .orderBy(col("event_type"))
      },
      Some("WITH ev AS (SELECT event_type, value, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events), " +
        "m AS (SELECT max(sec) AS mx FROM ev), " +
        "w AS (SELECT event_type, value, " +
        "exp(-0.6931471805599453 * floor((mx - sec) / 86400.0) / 30.0) AS w " +
        "FROM ev, m) " +
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        "round(sum(w), 4) AS eff_n, round(sum(w * value), 4) AS eff_value " +
        "FROM w GROUP BY event_type ORDER BY event_type"))
  ,

    GraftQuery(
      "q163_psi_drift",
      "Population Stability Index drift monitor — the distribution-shift gate a continuously-ingesting pipeline runs between a reference window and the current one before letting new data into a training mix: events split at a fixed boundary (Jan 16) into period A/B, each period's value distribution buckets onto a FIXED grid (floor(value/50), capped at 9 — fixed-width bins, not engine-computed quantile edges, so both engines bucket identically), and per event_type PSI = sum over buckets of (pa-pb)*ln(pa/pb) with Laplace smoothing (+0.5 per bucket) so empty bins never produce ln(0). The (type x bucket) spine builds from a distinct-types cross join with a 10-row bucket grid — zero-count buckets exist on BOTH sides of the subtraction. The industry-standard reading is flagged from the ROUNDED psi (>0.1 watch, >0.25 act) so the verdict is engine-exact. One scan, one (type,bucket,period) rollup, a 10-bucket-per-type reduce: at 100 TB this is a map-side-combined two-level aggregation, no sort anywhere.",
      (s, d) => {
        val tagged = t(s, d, "events")
          .select(col("event_type").as("grp"),
            (floor(col("ts").cast("double")).cast("long") < 1705363200L)
              .as("is_ref"),
            least(floor(col("value") / 50.0), lit(9.0)).cast("int").as("bkt"))
        psiByGroup(tagged, 10)
          .withColumnRenamed("grp", "event_type")
          .orderBy(col("event_type"))
      },
      Some("WITH ev AS (SELECT event_type, " +
        "CAST(floor(epoch(ts)) AS BIGINT) < 1705363200 AS is_a, " +
        "CAST(least(floor(value / 50.0), 9.0) AS INT) AS bkt FROM events), " +
        "counts AS (SELECT event_type, bkt, " +
        "SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca, " +
        "SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb " +
        "FROM ev GROUP BY event_type, bkt), " +
        "spine AS (SELECT DISTINCT event_type, g.i AS bkt FROM ev, " +
        "(SELECT CAST(range AS INT) AS i FROM range(0, 10)) g), " +
        "grid AS (SELECT s.event_type, s.bkt, coalesce(c.ca, 0) AS ca, " +
        "coalesce(c.cb, 0) AS cb FROM spine s LEFT JOIN counts c " +
        "ON c.event_type = s.event_type AND c.bkt = s.bkt), " +
        "tots AS (SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb " +
        "FROM grid GROUP BY event_type), " +
        "p AS (SELECT g.event_type, (g.ca + 0.5) / (t.na + 5.0) AS pa, " +
        "(g.cb + 0.5) / (t.nb + 5.0) AS pb, t.na, t.nb " +
        "FROM grid g JOIN tots t ON t.event_type = g.event_type) " +
        "SELECT event_type, CAST(max(na) AS BIGINT) AS n_ref, " +
        "CAST(max(nb) AS BIGINT) AS n_cur, " +
        "round(SUM((pa - pb) * ln(pa / pb)), 6) AS psi, " +
        "CASE WHEN round(SUM((pa - pb) * ln(pa / pb)), 6) > 0.25 THEN 'act' " +
        "WHEN round(SUM((pa - pb) * ln(pa / pb)), 6) > 0.1 THEN 'watch' " +
        "ELSE 'stable' END AS verdict " +
        "FROM p GROUP BY event_type ORDER BY event_type")),

    GraftQuery(
      "q167_incident_join",
      "Batch INTERVAL join via bucket expansion — the missing sibling of q38's as-of (most-recent-prior) and the streaming interval join: an interval table (here the top-20 highest-value events, each spawning a [ts-30min, ts+30min] same-type incident window; any external interval table slots in — it is a SESSION artifact, memoized + checkpointed once per (session, dir) and priced as the bench's build:incident_intervals line) joins against the event stream on CONTAINMENT, not equality. The naive `t BETWEEN lo AND hi` join is a nested-loop cartesian at scale; instead each interval EXPLODES into the hour buckets it overlaps (<=2 for a 1-hour window) and the join runs as an EQUI-join on (event_type, hour_bucket) with the exact containment predicate as a residual filter — the standard bucketed range-join decomposition, shuffle-keyed and hash-joinable at any interval-table size (broadcast here: 20 intervals). All time arithmetic on integer epoch seconds, so bucket edges and containment gate identically in both engines. Per incident: matched events, value mass (integer cents), distinct users.",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"),
            floor(col("ts").cast("double")).cast("long").as("sec"))
        val incidents = incidentIntervals(s, d)
        intervalJoin(ev, incidents, "event_type", "itype", "sec")
          .groupBy(col("incident_id"), col("itype"))
          .agg(count(lit(1)).as("n_events"),
            sum(cents(col("value"))).as("value_cents"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("incident_id"))
      },
      Some("WITH ev AS (SELECT event_id, user_id, event_type, value, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events), " +
        "inc AS (SELECT event_id AS incident_id, event_type AS itype, " +
        "sec - 1800 AS lo, sec + 1800 AS hi FROM ev " +
        "ORDER BY value DESC, event_id LIMIT 20) " +
        "SELECT i.incident_id, i.itype, CAST(count(*) AS BIGINT) AS n_events, " +
        "CAST(sum(CAST(round(e.value*100) AS BIGINT)) AS BIGINT) AS value_cents, " +
        "CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users " +
        "FROM inc i JOIN ev e ON e.event_type = i.itype " +
        "AND e.sec BETWEEN i.lo AND i.hi " +
        "GROUP BY i.incident_id, i.itype ORDER BY i.incident_id"))
  ,

    GraftQuery(
      "q168_scd2_tiers",
      "Slowly-changing-dimension TYPE-2 build — the dimension-versioning op every warehouse (and every feature store that must answer 'what did we believe about this user at training time?') runs: each user's event stream maps to a value tier (low/mid/high), CONSECUTIVE equal tiers collapse, and each surviving change point becomes a versioned row with [valid_from, valid_to) — valid_to = the next change's start − 1, NULL for the current version (the classic open-ended row). Pure gaps-and-islands: one lag to find change points, one lead over the survivors to close intervals — two window passes over per-USER partitions (thousands of tiny frames, never a global sort; the q33 sessionization posture). The (sec, event_id) compound order makes the row sequence total, so both engines collapse identical runs; tier boundaries compare raw doubles, identical IEEE semantics in both engines. Training-time correctness consumer: join fact rows on user_id AND event-time BETWEEN valid_from AND valid_to (q167's bucketed decomposition at scale) to reconstruct point-in-time features without leakage.",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"),
            floor(col("ts").cast("double")).cast("long").as("sec"),
            when(col("value") < 50, "low").when(col("value") < 200, "mid")
              .otherwise("high").as("tier"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("sec"), col("event_id"))
        val changes = ev
          .withColumn("prev", lag(col("tier"), 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("tier"))
        changes
          .withColumn("valid_to", lead(col("sec"), 1).over(w) - 1L)
          .select(col("user_id"), col("tier"),
            col("sec").as("valid_from"), col("valid_to"))
          .orderBy(col("user_id"), col("valid_from"))
      },
      Some("WITH ev AS (SELECT user_id, event_id, " +
        "CAST(floor(epoch(ts)) AS BIGINT) AS sec, " +
        "CASE WHEN value < 50 THEN 'low' WHEN value < 200 THEN 'mid' " +
        "ELSE 'high' END AS tier FROM events), " +
        "ch AS (SELECT user_id, event_id, sec, tier, " +
        "lag(tier) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev " +
        "FROM ev), " +
        "cp AS (SELECT user_id, event_id, sec, tier FROM ch " +
        "WHERE prev IS NULL OR prev <> tier) " +
        "SELECT user_id, tier, sec AS valid_from, " +
        "lead(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) - 1 AS valid_to " +
        "FROM cp ORDER BY user_id, valid_from"))
  )
}
