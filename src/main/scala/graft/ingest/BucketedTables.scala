package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed external-table materialization — Spark's CO-LOCATED JOIN
  * primitive, wired as an engine op instead of living only in scaladoc
  * postures: a table written with `bucketBy(n, key).sortBy(key)`
  * records its hash-partitioning in the catalog, so a join between two
  * tables bucketed on the same key and bucket count satisfies both
  * sides' distribution requirements AT READ TIME — the sort-merge join
  * plans ZERO exchanges (Round18OpsSpec pins the plan shape). This is
  * the 100 TB answer for repeated fact-to-fact joins: pay the
  * clustering shuffle ONCE at ingest, never per query — the same
  * economy the doc_id-bucketed ShingleStore and the SnapshotLog
  * segment postures describe, here on the relational surface.
  *
  * Tables are EXTERNAL (path-backed): the parquet lives under the
  * caller's path, the catalog carries only the name → (path,
  * bucketing) binding, and re-materialization drops + overwrites
  * idempotently. Bucket-pruned point reads ride the same metadata
  * (Spark prunes bucket FILES for key = literal filters with
  * spark.sql.sources.bucketing.enabled, default true).
  */
object BucketedTables {

  /** Catalog names and paths are scoped PER PROCESS (pid suffix) and
    * the drop+create is serialized per name within the JVM: two
    * writers sharing a metastore otherwise clobber each other's
    * name → (path, bucketing) binding between the DROP and the
    * saveAsTable (the round-13 verdict's catalog-name race). Within a
    * process re-materialization stays idempotent — same pid, same
    * name, same path, deliberate overwrite.
    */
  private val pid = ProcessHandle.current().pid()
  private val nameLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The catalog name a `materialize(name, …)` call actually binds —
    * exposed so callers can drop it at cleanup time.
    */
  def scopedName(name: String): String = s"${name}_p$pid"

  /** The parquet PATH is the caller's contract (callers needing
    * cross-process path isolation scope it themselves — q207 does);
    * only the catalog binding is process-scoped here, because the
    * metastore is the genuinely shared namespace.
    */
  def materialize(spark: SparkSession, df: DataFrame, name: String,
      path: String, key: String, buckets: Int): DataFrame = {
    val sn = scopedName(name)
    val lock = nameLocks.computeIfAbsent(sn, _ => new Object)
    lock.synchronized {
      spark.sql(s"DROP TABLE IF EXISTS `$sn`")
      df.write
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(sn)
      spark.table(sn)
    }
  }
}
