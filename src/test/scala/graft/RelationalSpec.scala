package graft

import org.apache.spark.sql.functions._

/** Invariants for the relational sweep beyond the DuckDB oracle
  * (which is the primary gate — these cover cross-operator identities
  * the oracle can't see).
  */
class RelationalSpec extends SparkSpec {

  test("flagship q01 returns rows, ordered by total desc") {
    val rows = Registry.byName("q01_popular").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totals = rows.map(_.getAs[Double]("total"))
    assert(totals.zip(totals.tail).forall { case (a, b) => a >= b })
  }

  test("left_anti join is equivalent to isin-negation (P9)") {
    val c = Tables.load(spark, sfDir, "customer")
    val o = Tables.load(spark, sfDir, "orders")
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val withOrders = o.select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val expected = c.select("c_custkey").collect().map(_.getLong(0))
      .filterNot(withOrders).toSet
    assert(anti === expected)
  }

  test("semi + anti partition the customer table (J/P9 identity)") {
    val c = Tables.load(spark, sfDir, "customer")
    val o = Tables.load(spark, sfDir, "orders")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(semi + anti === c.count())
  }

  test("window top-k (W1) emits at most k rows per key, ranks 1..k") {
    val df = Registry.byName("q19_window_topk").fn(spark, sfDir)
    val perKey = df.groupBy("o_custkey").agg(count(lit(1)).as("n"),
      max(col("rn")).as("maxrn"), min(col("rn")).as("minrn")).collect()
    perKey.foreach { r =>
      assert(r.getAs[Long]("n") <= 3)
      assert(r.getAs[Int]("minrn") === 1)
      assert(r.getAs[Int]("maxrn") === r.getAs[Long]("n"))
    }
  }

  test("global top-k (T1) agrees with a full sort") {
    val topk = Registry.byName("q16_topk").fn(spark, sfDir)
      .collect().map(_.getAs[Long]("o_orderkey"))
    val full = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
      .orderBy(col("total").desc, col("o_orderkey"))
      .collect().map(_.getAs[Long]("o_orderkey")).take(500)
    assert(topk.toSeq === full.toSeq)
  }

  test("format_number display formatting (F8, app.py:332/377 f-strings)") {
    import spark.implicits._
    val r = Seq(1234567.891).toDF("x")
      .select(format_number(col("x"), 2).as("s"), round(col("x"), 1).as("r"))
      .collect().head
    assert(r.getString(0) === "1,234,567.89")
    assert(r.getDouble(1) === 1234567.9)
  }

  test("existence probe (S4/S9) is true on non-empty, false on empty match") {
    val t = Registry.byName("q22_exists_probe").fn(spark, sfDir).collect()
    assert(t.head.getAs[Boolean]("has_rows"))
    val none = Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") < -1)
      .agg((count(lit(1)) > 0).as("has_rows")).collect()
    assert(!none.head.getAs[Boolean]("has_rows"))
  }
}
