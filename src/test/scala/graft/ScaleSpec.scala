package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.ext.SkewJoin

/** Scale-pattern proofs: bucketed co-located joins eliminate the join
  * shuffle; salted joins equal their plain equivalents.
  */
class ScaleSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf, set in SparkSpec's builder
    val o = Tables.load(spark, sfDir, "orders")
    val l = Tables.load(spark, sfDir, "lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      joined.collect() // force
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // only the final 3-group aggregation may shuffle; the join itself
      // reads co-located buckets
      assert(shuffles.size <= 1,
        s"expected bucket-co-located join, got ${shuffles.size} shuffles")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned writes prune partitions at scan time") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(out)

    val q = spark.read.parquet(out)
      .filter(col("day") === "2024-01-05")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    // the day predicate must be a partition filter (directory pruning),
    // not a row-level data filter over the full table
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.find(_.trim.startsWith("PartitionFilters:"))
    assert(pf.exists(_.contains("day")), s"no partition filter on day:\n$pf")
    val expected = ev.filter(col("day") === "2024-01-05").count()
    assert(q.agg(sum("n")).collect().head.getLong(0) === expected)
  }

  test("salted skew join equals the plain join") {
    val l = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey").as("k"), col("l_quantity"))
    val p = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey").as("k"), col("p_name"))
    val plain = l.join(p, Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    val salted = SkewJoin.saltedEquiJoin(l, p, "k", salt = 4)
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }
}
