package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoinApi

/** Randomized cross-implementation equivalence for the custom
  * AsOfJoinExec: on seeded random datasets (dense key collisions,
  * duplicate timestamps, nulls, keys present on only one side), the
  * native merge must equal an in-memory reference model, with and
  * without tolerance, at several shuffle widths. The custom SparkPlan
  * is the one piece of the engine Catalyst can't type-check for us —
  * this suite is its armor.
  */
class AsOfJoinPropertySpec extends SparkSpec {

  /** Reference model: per left row, the (time, tiebreak)-max right row
    * with equal key, time ≤ left time, within tolerance. Driver-side,
    * O(n·m) per key — obviously-correct by construction.
    */
  private def model(
      left: Seq[(Long, Option[Long], Long)],
      right: Seq[(Long, Option[Long], Long)],
      tol: Option[Long]): Set[(Long, Long, Option[Long])] = {
    val byKey = right.groupBy(_._1)
    left.map { case (k, lt, lid) =>
      val m = lt.flatMap { t =>
        byKey.getOrElse(k, Nil)
          .collect { case (_, Some(rt), rid) if rt <= t &&
            tol.forall(x => t - rt <= x) => (rt, rid) }
          .sorted.lastOption.map(_._2)
      }
      (k, lid, m)
    }.toSet
  }

  private def run(seed: Int, nLeft: Int, nRight: Int, keySpace: Int,
      timeSpace: Int, tol: Option[Long], parts: String): Unit = {
    val rnd = new Random(seed)
    def gen(n: Int) = (0 until n).map { i =>
      (rnd.nextInt(keySpace).toLong,
        if (rnd.nextInt(20) == 0) Option.empty[Long]
        else Some(rnd.nextInt(timeSpace).toLong),
        i.toLong)
    }
    val l = gen(nLeft); val r = gen(nRight)
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      val got = AsOfJoinApi.asof(
          l.toDF("k", "t", "lid"), r.toDF("k", "t", "rid").withColumnRenamed("t", "rt"),
          Seq("k"), "t", "rt", rightTiebreakCols = Seq("rid"),
          toleranceSec = tol)
        .select(col("k"), col("lid"), col("rid"))
        .collect()
        .map(x => (x.getLong(0), x.getLong(1),
          if (x.isNullAt(2)) Option.empty[Long] else Some(x.getLong(2))))
        .toSet
      assert(got === model(l, r, tol),
        s"seed=$seed nL=$nLeft nR=$nRight keys=$keySpace tol=$tol parts=$parts")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("native as-of equals the reference model across 24 random datasets") {
    var seed = 1000
    for {
      keySpace <- Seq(1, 3, 17)          // hot single key .. spread
      timeSpace <- Seq(5, 1000)          // dense ties .. sparse
      tol <- Seq(None, Some(3L))
      parts <- Seq("3", "7")
    } {
      run(seed, nLeft = 120, nRight = 150, keySpace, timeSpace, tol, parts)
      seed += 1
    }
  }

  test("degenerate shapes: empty sides and all-null times") {
    import spark.implicits._
    val l = Seq((1L, Option(5L), 1L)).toDF("k", "t", "lid")
    val emptyR = Seq.empty[(Long, Option[Long], Long)].toDF("k", "rt", "rid")
    val gotEmpty = AsOfJoinApi.asof(l, emptyR, Seq("k"), "t", "rt")
      .select(col("rid")).collect()
    assert(gotEmpty.length === 1 && gotEmpty.head.isNullAt(0))

    val emptyL = Seq.empty[(Long, Option[Long], Long)].toDF("k", "t", "lid")
    val r = Seq((1L, Option(5L), 1L)).toDF("k", "rt", "rid")
    assert(AsOfJoinApi.asof(emptyL, r, Seq("k"), "t", "rt").count() === 0)

    val nullT = Seq((1L, Option.empty[Long], 1L), (1L, Option.empty[Long], 2L))
    val got = AsOfJoinApi.asof(
        nullT.toDF("k", "t", "lid"), nullT.toDF("k", "rt", "rid"),
        Seq("k"), "t", "rt")
      .select(col("rid")).collect()
    assert(got.length === 2 && got.forall(_.isNullAt(0)))
  }
}
