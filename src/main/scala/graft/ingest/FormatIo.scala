package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink breadth beyond parquet/gz-TSV/JDBC: ORC (the second
  * columnar format Spark ships natively), JSON-lines, and CSV — with
  * the engine's schema discipline (explicit schema on read, never
  * inference) and LOSSLESS round-trips for the column types the text
  * formats cannot natively carry.
  *
  * The non-trivial part is not the `spark.read`/`write` call, it is
  * the type gap: CSV has no binary/array/struct representation at all,
  * and JSON-lines has no binary. A naive `df.write.csv` on the
  * `embeddings` or multimodal tables simply throws. `write`/`read`
  * close the gap with deterministic encodings — binary → base64,
  * array/struct/map → JSON string — applied symmetrically so
  * `read(write(df)) == df` column-for-column, and ONLY for formats
  * that need them (ORC keeps every type native; parquet callers use
  * Tables/TsvIngest).
  *
  * Scale: encodings are per-row codegen'd expressions (no UDFs).
  * JSON-lines stays line-splittable; CSV reads in multiLine mode
  * (free text embeds newlines), which is per-FILE parallel — the
  * partitioned write already emits many files, so a 100 TB export
  * still reads back wide. Contrast the gz-TSV single-task caveat
  * TsvIngest documents.
  *
  * AVRO is a CONTAINER LIMIT, not an omission (round-16 item 7): the
  * `avro`/`avro-mapred` jars in /opt/spark/jars are the serialization
  * library only — the `spark-avro` DataSource module is not shipped
  * and the sandbox resolves nothing beyond the local cache, so
  * `df.write.format("avro")` fails with DATA_SOURCE_NOT_FOUND here
  * (verified). On a cluster with the module on the classpath, Avro
  * slots into this object exactly like ORC (every engine type is
  * native to Avro except the same map-key caveats ORC has; add
  * "avro" to `Formats`, no encoding branch needed) — the same
  * documented-stub posture as the video codec in MediaOps.
  */
object FormatIo {

  val Formats: Seq[String] = Seq("orc", "json", "csv")

  /** Whether `format` can carry `dt` natively (no encoding needed). */
  private def native(format: String, dt: DataType): Boolean = (format, dt) match {
    case ("orc", _) => true
    case (_, _: BinaryType) => false
    case ("json", _) => true
    case ("csv", _: ArrayType | _: StructType | _: MapType) => false
    case _ => true
  }

  private def encoded(format: String, schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filterNot(f => native(format, f.dataType))

  private def enc(f: StructField): Column = f.dataType match {
    case _: BinaryType => base64(col(f.name)).as(f.name)
    case _ => to_json(col(f.name)).as(f.name)
  }

  private def dec(f: StructField): Column = f.dataType match {
    case _: BinaryType => unbase64(col(f.name)).as(f.name)
    case dt => from_json(col(f.name), dt).as(f.name)
  }

  /** Write `df` as `format`, text-encoding exactly the columns the
    * format cannot carry. Timestamps serialize with explicit
    * microsecond patterns so the read side cannot lose precision to a
    * default format.
    */
  def write(df: DataFrame, path: String, format: String): Unit = {
    require(Formats.contains(format), s"unsupported format: $format")
    val needs = encoded(format, df.schema).map(_.name).toSet
    val cols = df.schema.fields.toSeq.map { f =>
      if (needs(f.name)) enc(f) else col(f.name)
    }
    df.select(cols: _*).write.mode("overwrite")
      .options(textOptions(format))
      .format(format).save(path)
  }

  /** Read a `write` output back under the ORIGINAL schema: scans with
    * the encoded columns as strings (explicit schema — inference could
    * widen ints or mis-type timestamps), then decodes them back to the
    * declared types. Column pruning still works: unselected encoded
    * columns never decode.
    */
  def read(spark: SparkSession, path: String, format: String,
      schema: StructType): DataFrame = {
    require(Formats.contains(format), s"unsupported format: $format")
    val needs = encoded(format, schema)
    val scanSchema = StructType(schema.fields.map { f =>
      if (needs.exists(_.name == f.name)) f.copy(dataType = StringType) else f
    })
    val raw = spark.read.options(textOptions(format))
      .schema(scanSchema).format(format).load(path)
    val cols = schema.fields.toSeq.map { f =>
      if (needs.exists(_.name == f.name)) dec(f) else col(f.name)
    }
    raw.select(cols: _*)
  }

  /** Microsecond-exact timestamp patterns + CSV header, shared by both
    * directions. ORC is columnar and ignores them.
    */
  private def textOptions(format: String): Map[String, String] = format match {
    case "orc" => Map.empty
    case "json" => Map(
      "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
      "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    // multiLine: free text legally embeds newlines inside quoted CSV
    // fields; without it the reader splits records mid-document. This
    // costs splittability WITHIN one file — export many files (the
    // write is already partitioned) to keep read parallelism.
    case _ => Map(
      "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
      "timestampNTZFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
      "header" -> "true",
      "multiLine" -> "true")
  }
}
