package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoinApi

/** Randomized cross-implementation equivalence for the custom
  * AsOfJoinExec: on seeded random datasets (dense key collisions,
  * duplicate timestamps, null times, NULL KEYS, keys present on only
  * one side), the native merge must equal an in-memory reference
  * model — for every direction (backward / forward / nearest), with
  * and without tolerance, at several shuffle widths. The custom
  * SparkPlan is the one piece of the engine Catalyst can't type-check
  * for us — this suite is its armor (it caught a real null-binding
  * defect in round 9 and pinned the null-key SQL-equality contract in
  * round 10).
  */
class AsOfJoinPropertySpec extends SparkSpec {

  /** Reference model. Driver-side, O(n·m) per key — obviously-correct
    * by construction. Null keys and null times match nothing (SQL
    * equality). backward: (time, tiebreak)-max right row ≤ t;
    * forward: (time, tiebreak)-min right row ≥ t; nearest: closer of
    * the two by |Δt|, tie → backward.
    */
  private def model(
      left: Seq[(Option[Long], Option[Long], Long)],
      right: Seq[(Option[Long], Option[Long], Long)],
      tol: Option[Long],
      direction: String): Set[(Option[Long], Long, Option[Long])] = {
    left.map { case (k, lt, lid) =>
      val m = (k, lt) match {
        case (Some(kk), Some(t)) =>
          val cands = right.collect {
            case (Some(rk), Some(rt), rid) if rk == kk => (rt, rid)
          }
          def back = cands
            .filter(c => c._1 <= t && tol.forall(x => t - c._1 <= x))
            .sorted.lastOption
          def fwd(strict: Boolean) = cands
            .filter(c => (if (strict) c._1 > t else c._1 >= t) &&
              tol.forall(x => c._1 - t <= x))
            .sorted.headOption
          direction match {
            case AsOfJoinApi.Backward => back.map(_._2)
            case AsOfJoinApi.Forward => fwd(strict = false).map(_._2)
            case AsOfJoinApi.Nearest => (back, fwd(strict = true)) match {
              case (Some(b), Some(f)) =>
                Some(if (t - b._1 <= f._1 - t) b._2 else f._2)
              case (b, f) => b.orElse(f).map(_._2)
            }
          }
        case _ => None
      }
      (k, lid, m)
    }.toSet
  }

  private def run(seed: Int, nLeft: Int, nRight: Int, keySpace: Int,
      timeSpace: Int, tol: Option[Long], parts: String,
      direction: String): Unit = {
    val rnd = new Random(seed)
    def gen(n: Int) = (0 until n).map { i =>
      (if (rnd.nextInt(20) == 0) Option.empty[Long]
       else Some(rnd.nextInt(keySpace).toLong),
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
          toleranceSec = tol, direction = direction)
        .select(col("k"), col("lid"), col("rid"))
        .collect()
        .map(x => (
          if (x.isNullAt(0)) Option.empty[Long] else Some(x.getLong(0)),
          x.getLong(1),
          if (x.isNullAt(2)) Option.empty[Long] else Some(x.getLong(2))))
        .toSet
      assert(got === model(l, r, tol, direction),
        s"seed=$seed nL=$nLeft nR=$nRight keys=$keySpace tol=$tol " +
          s"parts=$parts dir=$direction")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("native as-of equals the reference model across 72 random datasets") {
    var seed = 1000
    for {
      direction <- Seq(AsOfJoinApi.Backward, AsOfJoinApi.Forward,
        AsOfJoinApi.Nearest)
      keySpace <- Seq(1, 3, 17)          // hot single key .. spread
      timeSpace <- Seq(5, 1000)          // dense ties .. sparse
      tol <- Seq(None, Some(3L))
      parts <- Seq("3", "7")
    } {
      run(seed, nLeft = 120, nRight = 150, keySpace, timeSpace, tol, parts,
        direction)
      seed += 1
    }
  }

  test("null keys never match, in any direction") {
    import spark.implicits._
    // right has a null-keyed row at the perfect time; SQL equality
    // says it can never be the match (a natural-ordering comparison
    // would equate the two nulls — the bug this test pins out)
    val l = Seq((Option.empty[Long], Option(5L), 1L),
      (Option(1L), Option(5L), 2L)).toDF("k", "t", "lid")
    val r = Seq((Option.empty[Long], Option(5L), 9L),
      (Option(1L), Option(4L), 10L)).toDF("k", "rt", "rid")
    Seq(AsOfJoinApi.Backward, AsOfJoinApi.Forward, AsOfJoinApi.Nearest)
      .foreach { d =>
        val got = AsOfJoinApi.asof(l, r, Seq("k"), "t", "rt",
            rightTiebreakCols = Seq("rid"), direction = d)
          .select(col("lid"), col("rid")).collect()
          .map(x => x.getLong(0) ->
            (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
        assert(got(1L) === -1L, s"null-keyed left matched under $d")
        val expect2 = if (d == AsOfJoinApi.Forward) -1L else 10L
        assert(got(2L) === expect2, s"keyed left wrong under $d")
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

  test("equal-time rows match forward (distance 0) and win nearest ties backward") {
    import spark.implicits._
    val l = Seq((1L, Option(10L), 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, Option(10L), 7L), (1L, Option(12L), 8L))
      .toDF("k", "rt", "rid")
    def rid(d: String) = AsOfJoinApi.asof(l, r, Seq("k"), "t", "rt",
        rightTiebreakCols = Seq("rid"), direction = d)
      .select(col("rid")).head().getLong(0)
    assert(rid(AsOfJoinApi.Forward) === 7L)  // >= t, first wins
    assert(rid(AsOfJoinApi.Backward) === 7L)
    assert(rid(AsOfJoinApi.Nearest) === 7L)
  }
}
