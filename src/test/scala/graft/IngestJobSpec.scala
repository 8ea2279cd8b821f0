package graft

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import graft.ingest.IngestJob

/** E1 ETL loop (data_loader.py:115–158): multi-file schema'd ingest
  * with per-file timing, parquet sink, cache clear.
  */
class IngestJobSpec extends SparkSpec {

  private def writeGz(dir: java.nio.file.Path, name: String, lines: Seq[String]): String = {
    val f = dir.resolve(name)
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(Files.newOutputStream(f)), "UTF-8"))
    lines.foreach { l => w.write(l); w.newLine() }
    w.close()
    f.toString
  }

  test("multi-file ETL: read → count → repartition → parquet, per-file timing") {
    val dir = Files.createTempDirectory("graft-etl")
    val basics = writeGz(dir, "title.basics.tsv.gz", Seq(
      "tconst\ttitleType\tprimaryTitle\toriginalTitle\tisAdult\tstartYear\tendYear\truntimeMinutes\tgenres",
      "tt0000001\tmovie\tAlpha\tAlpha\t0\t1995\t\\N\t92\tAction,Thriller",
      "tt0000002\ttvSeries\tBeta\tBeta\t0\t\\N\t2003\t\\N\tDrama"))
    val ratings = writeGz(dir, "title.ratings.tsv.gz", Seq(
      "tconst\taverageRating\tnumVotes",
      "tt0000001\t7.5\t120000",
      "tt0000002\t\\N\t500"))
    val out = dir.resolve("out").toString

    val results = IngestJob.loadAll(spark,
      Map("title_basics" -> basics, "title_ratings" -> ratings), out)

    assert(results.map(r => r.table -> r.rows).toMap ===
      Map("title_basics" -> 2L, "title_ratings" -> 2L))
    assert(results.forall(_.seconds > 0))
    val back = spark.read.parquet(s"$out/title_basics.parquet")
    assert(back.count() === 2)
    assert(back.filter("endYear IS NULL").count() === 1) // \N → null survived
    // the serving layer runs directly on the ETL output
    val popular = graft.app.MovieQueries.popularMovies(
      back, spark.read.parquet(s"$out/title_ratings.parquet"),
      minVotes = 100000)
    assert(popular.collect().map(_.getString(0)).toSeq === Seq("tt0000001"))
  }

  test("unknown table name is rejected") {
    intercept[IllegalArgumentException] {
      IngestJob.loadAll(spark, Map("nope" -> "/tmp/x"), "/tmp/y")
    }
  }
}
