package graft

import org.apache.spark.sql.execution.datasources.jdbc.JDBCOptions
import graft.ingest.{JdbcConfig, JdbcIo}

/** Minimal java.sql.Driver so Spark's JDBCOptions can resolve a driver
  * class without a real database jar in the sandbox. Never connects.
  */
class StubJdbcDriver extends java.sql.Driver {
  override def connect(url: String, info: java.util.Properties): java.sql.Connection =
    throw new java.sql.SQLException("stub driver never connects")
  override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:postgresql:")
  override def getPropertyInfo(url: String, info: java.util.Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}

/** Option plumbing for the JDBC source/sink wrapper. No database in the
  * sandbox, so nothing connects: the assertions feed the wrapper's
  * option map through Spark's OWN `JDBCOptions` parser — the exact
  * class the JDBC relation provider constructs from reader/writer
  * options — and through reflective inspection of the configured
  * DataFrameReader/Writer, proving the options land where Spark reads
  * them.
  */
class JdbcIoSpec extends SparkSpec {

  private val cfg = JdbcConfig(
    url = "jdbc:postgresql://localhost:5432/imdb_recommendation",
    user = "u", password = "p",
    driver = classOf[StubJdbcDriver].getName)

  /** extraOptions of a DataFrameReader/Writer, via reflection over the
    * class hierarchy (the field is private in Spark's api layer; its
    * CaseInsensitiveMap iterates lower-cased keys, so normalize).
    */
  private def extraOptions(o: AnyRef): Map[String, String] = {
    var c: Class[_] = o.getClass
    while (c != null) {
      c.getDeclaredFields.find(_.getName.endsWith("extraOptions")) match {
        case Some(f) =>
          f.setAccessible(true)
          return f.get(o).asInstanceOf[scala.collection.Map[String, String]]
            .map { case (k, v) => k.toLowerCase -> v }.toMap
        case None => c = c.getSuperclass
      }
    }
    fail("no extraOptions field found on " + o.getClass)
  }

  test("option map carries the reference's tuning intent in pgjdbc's spelling") {
    val opts = JdbcIo.options(JdbcConfig(url = "jdbc:postgresql://h/db",
      user = "u", password = "p"))
    assert(opts("batchsize") === "10000")
    assert(opts("numPartitions") === "4")
    // pgjdbc's actual knobs — NOT the MySQL names the reference passes
    // (which pgjdbc silently ignores, data_loader.py:18–27)
    assert(opts("reWriteBatchedInserts") === "true")
    assert(opts("preparedStatementCacheQueries") === "250")
    assert(!opts.contains("rewriteBatchedStatements"))
    assert(opts("driver") === "org.postgresql.Driver")
  }

  test("MySQL/MariaDB URLs get the Connector/J property spellings") {
    val opts = JdbcIo.options(JdbcConfig(url = "jdbc:mysql://h/db",
      user = "u", password = "p", driver = "com.mysql.cj.jdbc.Driver"))
    assert(opts("rewriteBatchedStatements") === "true")
    assert(opts("cachePrepStmts") === "true")
    assert(opts("prepStmtCacheSize") === "250")
    assert(opts("prepStmtCacheSqlLimit") === "2048")
    // unknown vendors get no inert tuning properties at all
    val other = JdbcIo.options(JdbcConfig(url = "jdbc:sqlite:mem",
      user = "u", password = "p", driver = "org.sqlite.JDBC"))
    assert(!other.exists(_._1.toLowerCase.contains("prep")))
  }

  test("Spark's JDBCOptions parses the map the way the source will") {
    val parsed = new JDBCOptions(
      JdbcIo.options(cfg) + (JDBCOptions.JDBC_TABLE_NAME -> "users"))
    assert(parsed.batchSize === 10000)
    assert(parsed.numPartitions === Some(4))
    assert(parsed.tableOrQuery === "users")
    // driver-forwarded properties survive into the connection Properties
    // with their original (vendor-significant) casing intact
    val p = parsed.asConnectionProperties
    assert(p.getProperty("reWriteBatchedInserts") === "true")
    assert(p.getProperty("preparedStatementCacheQueries") === "250")
  }

  test("reader carries url/dbtable/tuning options") {
    val opts = extraOptions(JdbcIo.reader(spark, cfg, "title_basics"))
    assert(opts("url") === cfg.url)
    assert(opts("dbtable") === "title_basics")
    assert(opts("batchsize") === "10000")
    assert(opts("numpartitions") === "4")
  }

  test("writer carries mode, table, and createTableColumnTypes DDL") {
    import spark.implicits._
    val ds = Seq(("u1", "tt001", 4.5f)).toDF("userId", "tconst", "rating")
    val ddl = "userId VARCHAR(50), tconst VARCHAR(20), rating REAL"
    val w = JdbcIo.writer(ds, cfg, "user_ratings",
      mode = "append", createTableColumnTypes = Some(ddl))
    val opts = extraOptions(w)
    assert(opts("dbtable") === "user_ratings")
    assert(opts("createtablecolumntypes") === ddl)
    // and Spark's parser accepts the DDL string for the write path
    val parsed = new JDBCOptions(opts + (JDBCOptions.JDBC_TABLE_NAME -> "user_ratings"))
    assert(parsed.createTableColumnTypes === Some(ddl))
  }

  test("predicate-pushdown properties mirror the option map") {
    val p = JdbcIo.connectionProperties(cfg)
    assert(p.getProperty("user") === "u")
    assert(p.getProperty("batchsize") === "10000")
    assert(p.getProperty("url") === null) // url goes as the arg, not a prop
  }
}
