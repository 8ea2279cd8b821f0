package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ingest.FormatIo

/** FormatIo's lossless-round-trip contract on the fixtures that
  * actually stress each format's type gap: `documents` (free text with
  * embedded newlines/quotes — CSV escaping), `embeddings`
  * (array<float> — unrepresentable in CSV natively), `events`
  * (microsecond timestamps + a JSON props string), and a binary
  * multimodal frame (unrepresentable in CSV *and* JSON). Equality is
  * exact row-set equality under the original schema.
  */
class FormatIoSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-formatio").toString

  private def canon(df: DataFrame, key: String): Seq[String] =
    df.orderBy(col(key)).collect().toSeq.map { r =>
      r.toSeq.map {
        case b: Array[Byte] => b.toSeq.toString
        case s: scala.collection.Seq[_] => s.toString
        case x => String.valueOf(x)
      }.mkString("|")
    }

  private def roundTrips(df: DataFrame, key: String): Unit = {
    val want = canon(df, key)
    for (f <- FormatIo.Formats) {
      val dir = s"${tmp()}/$f"
      FormatIo.write(df, dir, f)
      val back = FormatIo.read(spark, dir, f, df.schema)
      // nullability is file-format metadata (scans are nullable by
      // default); the contract is name + type
      def shape(s: org.apache.spark.sql.types.StructType) =
        s.fields.toSeq.map(x => (x.name, x.dataType))
      assert(shape(back.schema) === shape(df.schema), s"$f schema drift")
      assert(canon(back, key) === want, s"$f round-trip not lossless")
    }
  }

  test("documents round-trip (embedded newlines and quotes in CSV)") {
    roundTrips(Tables.load(spark, sfDir, "documents"), "doc_id")
  }

  test("embeddings round-trip (array<float> has no native CSV form)") {
    roundTrips(Tables.load(spark, sfDir, "embeddings"), "vec_id")
  }

  test("events round-trip (microsecond timestamps, JSON props)") {
    roundTrips(Tables.load(spark, sfDir, "events").limit(500), "event_id")
  }

  test("binary multimodal columns round-trip (base64 in text formats)") {
    import spark.implicits._
    val df = (1L to 64L).map { i =>
      (i, Array.tabulate(32)(j => ((i * 31 + j) % 251).toByte), s"img_$i.png")
    }.toDF("asset_id", "bytes", "name")
    roundTrips(df, "asset_id")
  }

  test("avro is a documented container limit: the DataSource module is absent") {
    // /opt/spark/jars ships avro/avro-mapred (the serialization lib)
    // but NOT spark-avro (the DataSource) and the sandbox resolves
    // nothing beyond the local cache — FormatIo's scaladoc documents
    // the limit; this pin notices if a future container adds the
    // module (then Avro joins Formats like ORC, no encoding branch)
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1L, "a")).toDF("k", "v").write.format("avro")
        .mode("overwrite").save(s"${tmp()}/avro")
    }
    assert(e.getMessage.contains("avro"),
      s"unexpected failure shape: ${e.getMessage.take(200)}")
  }

  test("encoded columns decode only when selected (pruning persists)") {
    val dir = s"${tmp()}/csv"
    val df = Tables.load(spark, sfDir, "embeddings")
    FormatIo.write(df, dir, "csv")
    val narrow = FormatIo.read(spark, dir, "csv", df.schema)
      .select("vec_id", "label")
    // the projection must not carry the decoded embedding
    assert(!narrow.queryExecution.optimizedPlan.toString.contains("from_json"))
    assert(narrow.count() === df.count())
  }
}
