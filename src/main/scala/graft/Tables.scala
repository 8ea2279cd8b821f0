package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table loaders (TESTDATA.md): parquet stand-ins for the
  * reference's PostgreSQL tables (SURVEY.md §2.1 S2,
  * reference data_loader.py:122–146).
  *
  * Scale posture: these are plain partitioned-parquet scans, so at
  * 100 TB Catalyst pushes filters (`PushedFilters`) and prunes columns
  * (`ReadSchema`) into the scan for free as long as callers filter and
  * select *before* any wide transform — every query in this library
  * does.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session conf every consumer of these fixtures should set ONCE at
    * session-build time (Bench/Verify/Plans/ScaleStress/SparkSpec do;
    * GraftEngine sets it at construction for library users): historical
    * events fixtures stored TIMESTAMP(NANOS), which Spark 4 has no native
    * type for; with this conf nanos scan as long and we truncate to
    * microseconds — the same ns→us truncation DuckDB applies. Harmless
    * when the fixture already stores timestamp[us].
    */
  val requiredConf: (String, String) = ("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Resolved-plan memo per (session, dir, table): `spark.read.parquet`
    * pays a driver-side file listing + footer schema inference on EVERY
    * call, and the registry's ~250 queries load fixture tables ~500
    * times per sweep — pure repeated metadata work (guide §5: the
    * driver should do almost no data work; §6: listing cost). The memo
    * holds only the resolved LOGICAL PLAN (a catalog entry, the S2
    * posture) — no rows, no cache: every action on the shared frame
    * still scans parquet from disk, so bench/oracle runs keep computing
    * from the inputs. Fixture files are immutable for a session's
    * lifetime, which is what makes the listing reusable.
    */
  private val loaded = new KeyedMemo[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Defensive for externally-built sessions (the SparkEntry driver
    // contract hands us a session our builders never saw): without this
    // conf a TIMESTAMP(NANOS) scan throws. The set is monotonic —
    // always "true", never unset — and deliberately OUTSIDE the memo:
    // the self-heal contract (IngestSpec pins it) is per CALL, because
    // an action on the shared frame re-reads the parquet and needs the
    // conf live even when the plan itself was memoized earlier.
    if (name == "events") spark.conf.set(requiredConf._1, requiredConf._2)
    loaded.getOrBuild((spark, dir, name))(loadUncached(spark, dir, name))
  }

  private def loadUncached(spark: SparkSession, dir: String,
      name: String): DataFrame =
    if (name == "events") {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // The fixture's physical `ts` encoding has changed across driver
      // regenerations; accept every layout seen so far and normalize to
      // session-zoned TIMESTAMP (the type every downstream query and
      // DuckDB oracle agrees on). Schema-driven like the reference's
      // loader (data_loader.py:122–128), not pinned to one layout.
      df.schema("ts").dataType match {
        case LongType => // legacy TIMESTAMP(NANOS) read as long via requiredConf
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => // current fixtures: plain timestamp[us]
          // epoch-based, session-TZ-INDEPENDENT: a bare cast to
          // TimestampType reinterprets the wall clock through the
          // session zone, so a non-UTC caller session would read
          // shifted instants vs both the legacy ns-as-long path
          // (epoch-based) and the DuckDB oracle (which treats naive
          // parquet timestamps as UTC). Diffing against the NTZ epoch
          // literal yields true epoch micros whatever the session zone.
          df.withColumn("ts", timestamp_micros(expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")))
        case _ => df // already TIMESTAMP — pass through
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
