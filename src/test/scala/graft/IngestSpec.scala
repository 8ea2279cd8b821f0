package graft

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._
import graft.ingest.{Schemas, TsvIngest}

/** S1 ingest round-trip: gzipped TSV with IMDb's \N nulls → typed
  * DataFrame → parquet sink with the X1 repartition policy
  * (reference data_loader.py:115–158).
  */
class IngestSpec extends SparkSpec {

  private def writeTsvGz(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-ingest")
    val f = dir.resolve("title.ratings.tsv.gz")
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(Files.newOutputStream(f)), "UTF-8"))
    lines.foreach { l => w.write(l); w.newLine() }
    w.close()
    f.toString
  }

  test("events table loads on a session missing the nanos conf (driver contract)") {
    // The SparkEntry contract hands us externally-built sessions that
    // never ran our builders; Tables.load must self-heal the
    // TIMESTAMP(NANOS) legacy conf (monotonically) or every
    // events-backed query throws on such sessions.
    val key = Tables.requiredConf._1
    val prev = spark.conf.get(key)
    spark.conf.unset(key)
    try {
      val events = Tables.load(spark, sfDir, "events")
      assert(events.limit(1).count() === 1)
      assert(spark.conf.get(key) === "true")
    } finally spark.conf.set(key, prev)
  }

  test("gz TSV with explicit schema and \\N nulls (S1)") {
    val path = writeTsvGz(Seq(
      "tconst\taverageRating\tnumVotes",
      "tt0000001\t5.7\t2023",
      "tt0000002\t\\N\t271",
      "tt0000003\t6.5\t\\N"))
    val df = TsvIngest.readTsv(spark, path, Schemas.titleRatings)
    val rows = df.orderBy("tconst").collect()
    assert(rows.length === 3)
    assert(rows(0).getAs[Float]("averageRating") === 5.7f)
    assert(rows(1).isNullAt(rows(1).fieldIndex("averageRating")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("numVotes")))
  }

  test("parquet sink round-trip with size-based partitioning (S6/X1)") {
    val path = writeTsvGz(Seq(
      "tconst\taverageRating\tnumVotes",
      "tt0000001\t5.7\t2023",
      "tt0000002\t\\N\t271"))
    val df = TsvIngest.readTsv(spark, path, Schemas.titleRatings)
    val out = Files.createTempDirectory("graft-sink").toString + "/t"
    TsvIngest.writeParquet(df, out, rows = df.count())
    val back = spark.read.parquet(out)
    assert(back.count() === 2)
    assert(back.schema === Schemas.titleRatings)
    // small input → single output file (coalesce(1) branch)
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet")) === 1)
  }

  test("append sink accumulates rows (S7)") {
    val out = Files.createTempDirectory("graft-append").toString + "/t"
    import spark.implicits._
    val a = Seq(("u1", "tt1", 4.0f)).toDF("userId", "tconst", "rating")
    val b = Seq(("u1", "tt2", 5.0f)).toDF("userId", "tconst", "rating")
    TsvIngest.appendParquet(a, out)
    TsvIngest.appendParquet(b, out)
    assert(spark.read.parquet(out).count() === 2)
  }
}
