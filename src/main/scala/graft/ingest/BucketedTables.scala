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

  def materialize(spark: SparkSession, df: DataFrame, name: String,
      path: String, key: String, buckets: Int): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(name)
    spark.table(name)
  }
}
