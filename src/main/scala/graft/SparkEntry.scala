package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All capability lives in the Registry; this object just adapts it.
  */
object SparkEntry {

  /** Flagship query (the reference's front-page "popular movies"
    * serving query, app.py:218–236) on sf0.001; driver smoke-checks
    * rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q01_popular").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (ALS/ML surface) → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
