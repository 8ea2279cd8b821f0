package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** First-line fixture contract: every driver-generated table must load
  * through `Tables.load` with rows and the expected time/key types.
  *
  * Exists because the driver regenerated `/root/testdata` mid-round-6 and
  * flipped `events.ts` from TIMESTAMP(NANOS)-as-long to plain
  * timestamp[us], which broke 14 queries across 5 suites with one cryptic
  * analysis error each. This suite turns the next such drift into a
  * single loudly-named failure, and pins that the loader accepts every
  * physical `ts` encoding seen so far (us, ns-as-long, and session-zoned).
  */
class FixtureContractSpec extends SparkSpec {

  test("all 10 fixture tables load with rows > 0") {
    Tables.all.foreach { name =>
      val df = Tables.load(spark, sfDir, name)
      assert(df.limit(1).count() == 1L, s"table $name is empty or unreadable")
    }
  }

  test("events.ts normalizes to session-zoned TIMESTAMP") {
    val events = Tables.load(spark, sfDir, "events")
    assert(events.schema("ts").dataType == TimestampType,
      s"events.ts is ${events.schema("ts").dataType}, expected TimestampType")
    // and it must be usable in timestamp arithmetic — the exact failure
    // mode of the round-6 drift was an analysis error here
    val r = events.agg(max(col("ts")).as("mx"), min(col("ts")).as("mn"))
      .select((col("mx") > col("mn")).as("ok")).head()
    assert(r.getBoolean(0), "events.ts range is degenerate")
  }

  test("orders/lineitem date columns are datetime-typed and comparable") {
    // The regenerated fixtures store these as timestamp[us] (was date32
    // in earlier drops); both work in date arithmetic and both hash-match
    // DuckDB, so the contract is "a datetime type", not one physical layout.
    val dateLike: Set[DataType] = Set(DateType, TimestampType, TimestampNTZType)
    val orders = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    assert(dateLike(orders.schema("o_orderdate").dataType),
      s"o_orderdate is ${orders.schema("o_orderdate").dataType}")
    assert(dateLike(lineitem.schema("l_shipdate").dataType),
      s"l_shipdate is ${lineitem.schema("l_shipdate").dataType}")
    // and date functions must analyze over them
    assert(orders.select(year(col("o_orderdate"))).limit(1).count() == 1L)
  }

  test("embeddings carry a non-empty float vector column") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val vecField = emb.schema.find(_.dataType.isInstanceOf[ArrayType])
    assert(vecField.isDefined, s"no array column in ${emb.schema.simpleString}")
    val n = emb.select(size(col(vecField.get.name)).as("d")).agg(min("d")).head().getInt(0)
    assert(n > 0, "embedding vectors are empty")
  }

  test("loader accepts all three historical ts encodings (us, ns-long, tz)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-fixture-enc")
    val base = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-06-01 12:00:00"), 11L, "view", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // (a) session-zoned TIMESTAMP (what our own sinks write)
    base.write.mode("overwrite").parquet(s"$tmp/tz/events.parquet")
    // (b) plain timestamp[us] / TIMESTAMP_NTZ (the driver's current fixtures)
    base.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$tmp/ntz/events.parquet")
    // (c) legacy TIMESTAMP(NANOS) surrogate: a long of epoch-nanos, the
    // shape the nanosAsLong conf yields from old fixtures
    base.withColumn("ts", (unix_micros(col("ts")) * lit(1000L)).cast(LongType))
      .write.mode("overwrite").parquet(s"$tmp/long/events.parquet")

    Seq("tz", "ntz", "long").foreach { enc =>
      val df = Tables.load(spark, s"$tmp/$enc", "events")
      assert(df.schema("ts").dataType == TimestampType, s"$enc: wrong type")
      val years = df.select(year(col("ts"))).as[Int].collect().toSet
      assert(years == Set(2024), s"$enc: ts values corrupted: $years")
    }

    // the NTZ branch must be SESSION-TZ-INDEPENDENT: the same parquet
    // read under any session zone yields the same epoch instants (a
    // bare NTZ→TIMESTAMP cast would shift them — the exact drift an
    // externally-built non-UTC session would feed every epoch-BIGINT
    // comparison and hour window)
    def epochs() = Tables.load(spark, s"$tmp/ntz", "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)].collect().toMap
    val utc = epochs()
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(epochs() === utc, "NTZ normalization depends on session zone")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
