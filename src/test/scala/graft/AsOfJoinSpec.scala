package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AsOfJoinApi, AsOfJoinExec}

/** Native as-of join (custom LogicalPlan + Strategy + SparkPlan):
  * semantics against an independent window-composition reference,
  * plan shape, tolerance/null/missing-key edges, and partitioning
  * invariance.
  */
class AsOfJoinSpec extends SparkSpec {

  private def crafted: (DataFrame, DataFrame) = {
    import spark.implicits._
    val left = Seq(
      (1L, Option(100L), "p1"),
      (1L, Option(200L), "p2"),
      (1L, Option(200L), "p2b"),
      (2L, Option(50L), "p3"),
      (3L, Option(10L), "p4"),
      (1L, Option.empty[Long], "pn")
    ).toDF("k", "t", "pname")
    val right = Seq(
      (1L, Option(90L), "c1"),
      (1L, Option(100L), "c2"),
      (1L, Option(100L), "c3"),
      (1L, Option(150L), "c4"),
      (1L, Option.empty[Long], "cn"),
      (2L, Option(500L), "c5"),
      (4L, Option(1L), "c6")
    ).toDF("k", "rt", "cname")
    (left, right)
  }

  private def run(tol: Option[Long]): Map[String, Option[String]] = {
    val (l, r) = crafted
    AsOfJoinApi.asof(l, r, Seq("k"), "t", "rt",
        rightTiebreakCols = Seq("cname"), toleranceSec = tol)
      .select(col("pname"), col("cname"))
      .collect().map(x => x.getString(0) -> Option(x.getString(1))).toMap
  }

  test("crafted: latest time wins, ties break to last tiebreak, inclusive <=") {
    val got = run(None)
    assert(got("p1") === Some("c3"))  // rt=100 == t, tie c2/c3 -> c3
    assert(got("p2") === Some("c4"))
    assert(got("p2b") === Some("c4"))
    assert(got("p3") === None)        // only future right rows for k=2
    assert(got("p4") === None)        // key absent on the right
    assert(got("pn") === None)        // null probe time never matches
  }

  test("crafted: tolerance nullifies stale matches without stealing fresher ones") {
    val got = run(Some(5L))
    assert(got("p1") === Some("c3"))  // gap 0 within 5
    assert(got("p2") === None)        // best candidate gap 50 > 5
    assert(got("p2b") === None)
  }

  test("plan uses AsOfJoinExec") {
    val (l, r) = crafted
    staticPlan {
      val df = AsOfJoinApi.asof(l, r, Seq("k"), "t", "rt")
      val execs = df.queryExecution.executedPlan.collect { case e: AsOfJoinExec => e }
      assert(execs.nonEmpty)
    }
  }

  /** Independent reference: the union+window composition (the q38
    * trick generalized to two tables) — clicks sort before same-time
    * purchases so `<=` inclusivity matches the exec, tiebreaks by
    * click_id inside equal times, tolerance applied after the window.
    */
  private def windowReference(tolSec: Long): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val tagged = ev.filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("t"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("src"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("src"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("click_id",
        last(when(col("src") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("c_ts",
        last(when(col("src") === 0, col("t")), ignoreNulls = true).over(w))
      .filter(col("src") === 1)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        when(col("t") - col("c_ts") <= tolSec, col("click_id")).as("click_id"),
        when(col("t") - col("c_ts") <= tolSec, col("t") - col("c_ts")).as("gap_s"))
  }

  test("q171 equals the union+window composition on the events fixture") {
    val native = Registry.byName("q171_asof_native").fn(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val ref = windowReference(3600L)
      .orderBy(col("purchase_id")).collect().map(_.toSeq).toSet
    assert(native === ref)
    assert(native.nonEmpty)
  }

  test("result is shuffle-partitioning invariant") {
    val at = Seq("3", "7").map { n =>
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n)
      try Registry.byName("q171_asof_native").fn(spark, sfDir)
        .collect().map(_.toSeq).toSet
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(at(0) === at(1))
  }
}
