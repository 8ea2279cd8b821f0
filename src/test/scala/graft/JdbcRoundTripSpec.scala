package graft

import java.sql.DriverManager
import graft.ingest.{JdbcConfig, JdbcIo}

/** CONNECTED JDBC tests over embedded Derby (in-JVM, in-memory — the
  * Derby jars ship with Spark itself, so no sandbox network is
  * needed): closes the one gap JdbcIoSpec's option-plumbing tests
  * leave open, that no test ever ran `JdbcIo.read/readWhere/write`
  * against a live database. The reference's storage layer is exactly
  * this surface (data_loader.py:144–146 writes, user.py:105–123
  * predicate reads, user.py:77–96 typed appends); a user pointing the
  * engine at real Postgres runs this code path with nothing changed
  * but the URL and vendor property spelling.
  */
class JdbcRoundTripSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb"

  private val cfg = JdbcConfig(
    url = s"$url;create=true",
    user = "u", password = "p",
    driver = "org.apache.derby.jdbc.EmbeddedDriver",
    numPartitions = 2)

  private def df() = {
    import spark.implicits._
    Seq((1L, "alice", 1.5f), (2L, "bob", 2.5f), (3L, "carol", 3.5f))
      .toDF("id", "name", "score")
  }

  test("write(create) → read round-trips rows and schema") {
    JdbcIo.write(df(), cfg, "people_rt", mode = "overwrite")
    val back = JdbcIo.read(spark, cfg, "people_rt")
    assert(back.columns.toSeq === Seq("id", "name", "score"))
    val rows = back.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"),
        r.getAs[Float]("score"))).toSet
    assert(rows === Set((1L, "alice", 1.5f), (2L, "bob", 2.5f), (3L, "carol", 3.5f)))
  }

  test("typed append honors createTableColumnTypes DDL (user.py:79–96)") {
    JdbcIo.write(df(), cfg, "people_ddl", mode = "append",
      createTableColumnTypes = Some("name VARCHAR(40), score REAL"))
    // inspect the DDL Derby actually ran, via JDBC metadata on a
    // direct embedded connection (same in-memory database)
    val conn = DriverManager.getConnection(url)
    try {
      // Spark sends the UNQUOTED table name (Derby folds it to upper
      // case) but QUOTES column identifiers (lower case preserved) —
      // the metadata lookup must follow both conventions
      val cols = conn.getMetaData.getColumns(null, null, "PEOPLE_DDL", null)
      var seen = Map.empty[String, (String, Int)]
      while (cols.next()) {
        seen += cols.getString("COLUMN_NAME") ->
          ((cols.getString("TYPE_NAME"), cols.getInt("COLUMN_SIZE")))
      }
      assert(seen("name")._1 === "VARCHAR")
      assert(seen("name")._2 === 40)
      assert(seen("score")._1 === "REAL")
    } finally conn.close()
    // append to the now-existing table goes through the INSERT path
    JdbcIo.write(df(), cfg, "people_ddl", mode = "append")
    assert(JdbcIo.read(spark, cfg, "people_ddl").count() === 6)
  }

  test("readWhere maps each predicate to one partition, DB-side filtered") {
    // typed DDL for the string column: Derby's default StringType
    // mapping is CLOB, which can't be compared in a WHERE clause —
    // the reference pins VARCHAR widths for the same reason
    // (user.py:79–96)
    JdbcIo.write(df(), cfg, "people_pred", mode = "overwrite",
      createTableColumnTypes = Some("name VARCHAR(40)"))
    // predicates are passed to the database verbatim: Spark created
    // the columns QUOTED (lower case), so the WHERE clauses must quote
    // too or Derby folds the bare identifier to 'ID' and errors —
    // exactly what a real Postgres user hits with mixed-case columns
    val parts = Seq("\"id\" <= 2", "\"id\" > 2")
    val got = JdbcIo.readWhere(spark, cfg, "people_pred", parts)
    assert(got.rdd.getNumPartitions === parts.size,
      "one JDBC partition per predicate (user.py:105–108 point-lookup shape)")
    assert(got.count() === 3)
    // a selective predicate list IS the filter — the database does it
    val one = JdbcIo.readWhere(spark, cfg, "people_pred", Seq("\"name\" = 'bob'"))
    assert(one.collect().map(_.getAs[Long]("id")).toSeq === Seq(2L))
  }

  test("overwrite replaces prior contents") {
    JdbcIo.write(df(), cfg, "people_ow", mode = "overwrite")
    JdbcIo.write(df().limit(1), cfg, "people_ow", mode = "overwrite")
    assert(JdbcIo.read(spark, cfg, "people_ow").count() === 1)
  }
}
