package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** E1 batch ETL: the reference DataLoader's per-file loop
  * (utils/data_loader.py:115–158) — for each IMDb dump: schema'd
  * gz-TSV read, row count, size-based repartition, parquet write,
  * cache clear — with per-file timing returned instead of printed.
  *
  * Scale note vs the reference: its single 210 MB .tsv.gz reads on one
  * core (gzip is unsplittable). `fileMap` accepts glob paths, so a
  * sharded dump (or zstd) parallelizes the scan with no code change;
  * everything downstream of the read is already distributed.
  */
object IngestJob {

  /** The reference's seven IMDb files → their schemas
    * (data_loader.py:105–113).
    */
  val imdbFiles: Map[String, StructType] = Map(
    "title_basics" -> Schemas.titleBasics,
    "title_akas" -> Schemas.titleAkas,
    "title_ratings" -> Schemas.titleRatings,
    "title_principals" -> Schemas.titlePrincipals,
    "title_episode" -> Schemas.titleEpisode,
    "title_crew" -> Schemas.titleCrew,
    "name_basics" -> Schemas.nameBasics)

  final case class FileResult(table: String, rows: Long, seconds: Double)

  /** Run the ETL for the given table→path map; writes
    * `$outDir/<table>.parquet` and reports (rows, seconds) per file.
    */
  def loadAll(spark: SparkSession, paths: Map[String, String],
      outDir: String): Seq[FileResult] = {
    val results = paths.toSeq.sortBy(_._1).map { case (table, path) =>
      val schema = imdbFiles.getOrElse(table,
        throw new IllegalArgumentException(s"unknown table $table"))
      val t0 = System.nanoTime()
      val df = TsvIngest.readTsv(spark, path, schema)
      val rows = df.count()
      TsvIngest.writeParquet(df, s"$outDir/$table.parquet", rows)
      FileResult(table, rows, (System.nanoTime() - t0) / 1e9)
    }
    spark.catalog.clearCache() // data_loader.py:151
    results
  }
}
