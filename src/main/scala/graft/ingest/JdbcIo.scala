package graft.ingest

import java.util.Properties
import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Dataset, SparkSession}

/** Connection + tuning knobs of the reference's Postgres layer
  * (reference utils/data_loader.py:16–27): Spark consumes `batchsize`
  * and `numPartitions` itself (they size JDBC insert batches and
  * parallelism via JDBCOptions); the batch-rewrite and
  * prepared-statement knobs are translated to each vendor's property
  * spelling by `JdbcIo.vendorProps`.
  */
final case class JdbcConfig(
    url: String,
    user: String,
    password: String,
    driver: String = "org.postgresql.Driver",
    batchSize: Int = 10000,
    numPartitions: Int = 4,
    rewriteBatchedStatements: Boolean = true,
    prepStmtCacheSize: Int = 250,
    prepStmtCacheSqlLimit: Int = 2048)

/** S2/S6/S7 over a real database: the reference's entire storage layer
  * is Postgres via Spark JDBC (data_loader.py:144–146 writes,
  * user.py:105–123 predicate-pushdown reads, user.py:77–96 typed
  * appends). This wrapper carries the same tuned option surface on
  * Spark's `format("jdbc")` path. The sandbox has no database, so
  * everything here stays lazy: builders configure readers/writers and
  * nothing connects until the caller runs `load()`/`save()` — which is
  * also what makes the option plumbing unit-testable.
  *
  * Scale posture: reads parallelize either by `predicates` (one WHERE
  * clause per partition — the reference's point-lookup shape) or by
  * `partitionColumn` bounds; writes batch `batchSize` rows per
  * executemany with batched-insert rewriting collapsing them into
  * multi-row INSERTs (see `vendorProps` for the per-driver spelling).
  */
object JdbcIo {

  /** Vendor-correct spelling of the config's tuning intent. The
    * reference passes MySQL-flavored property names
    * (`rewriteBatchedStatements`, `prepStmtCacheSize/SqlLimit` —
    * data_loader.py:18–27) on a Postgres URL; pgjdbc silently ignores
    * unknown properties, so those knobs were inert in the reference.
    * We keep the intent — batched-insert rewriting + prepared-statement
    * caching — and emit the names each driver actually reads
    * (case-sensitive on the driver side; Spark's `JDBCOptions
    * .asConnectionProperties` forwards original-cased keys). Unknown
    * vendors get no tuning properties rather than inert ones.
    */
  def vendorProps(cfg: JdbcConfig): Map[String, String] =
    if (cfg.url.startsWith("jdbc:postgresql:"))
      Map(
        "reWriteBatchedInserts" -> cfg.rewriteBatchedStatements.toString,
        "preparedStatementCacheQueries" -> cfg.prepStmtCacheSize.toString)
    else if (cfg.url.startsWith("jdbc:mysql:") || cfg.url.startsWith("jdbc:mariadb:"))
      Map(
        "rewriteBatchedStatements" -> cfg.rewriteBatchedStatements.toString,
        "cachePrepStmts" -> "true",
        "prepStmtCacheSize" -> cfg.prepStmtCacheSize.toString,
        "prepStmtCacheSqlLimit" -> cfg.prepStmtCacheSqlLimit.toString)
    else Map.empty

  /** The reference's connection-property map, as Spark reader/writer
    * options (data_loader.py:18–27 plus the per-write batchsize
    * override at data_loader.py:145).
    */
  def options(cfg: JdbcConfig): Map[String, String] = Map(
    "url" -> cfg.url,
    "user" -> cfg.user,
    "password" -> cfg.password,
    "driver" -> cfg.driver,
    "batchsize" -> cfg.batchSize.toString,
    "numPartitions" -> cfg.numPartitions.toString) ++ vendorProps(cfg)

  /** The same map in `java.util.Properties` form, for the
    * `spark.read.jdbc(url, table, predicates, props)` overload.
    */
  def connectionProperties(cfg: JdbcConfig): Properties = {
    val p = new Properties()
    (options(cfg) - "url").foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Configured single-table reader (the data_loader read shape). Lazy:
    * Spark first connects when the caller runs `.load()`.
    */
  def reader(spark: SparkSession, cfg: JdbcConfig, table: String): DataFrameReader =
    spark.read.format("jdbc").options(options(cfg) + ("dbtable" -> table))

  def read(spark: SparkSession, cfg: JdbcConfig, table: String): DataFrame =
    reader(spark, cfg, table).load()

  /** Per-partition predicate pushdown (user.py:105–108,121–123): each
    * predicate string becomes one partition's WHERE clause, so a point
    * lookup scans a single partition and the database does the
    * filtering — no full-table pull into Spark.
    */
  def readWhere(spark: SparkSession, cfg: JdbcConfig, table: String,
      predicates: Seq[String]): DataFrame =
    spark.read.jdbc(cfg.url, table, predicates.toArray, connectionProperties(cfg))

  /** Configured writer (data_loader.py:144–146; user.py:77–96).
    * `createTableColumnTypes` pins the DDL types (VARCHAR widths,
    * REAL vs DOUBLE) Spark uses if it creates the table — the
    * reference's typed-append path.
    */
  def writer[T](ds: Dataset[T], cfg: JdbcConfig, table: String,
      mode: String = "append",
      createTableColumnTypes: Option[String] = None): DataFrameWriter[T] = {
    val base = ds.write.format("jdbc").mode(mode)
      .options(options(cfg) + ("dbtable" -> table))
    createTableColumnTypes.fold(base)(t => base.option("createTableColumnTypes", t))
  }

  def write[T](ds: Dataset[T], cfg: JdbcConfig, table: String,
      mode: String = "append",
      createTableColumnTypes: Option[String] = None): Unit =
    writer(ds, cfg, table, mode, createTableColumnTypes).save()
}
