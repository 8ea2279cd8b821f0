package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.BinaryExecNode
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** Native AS-OF join — the whole-operator extension tier (guide
  * preference (c)): a custom `LogicalPlan` + `Strategy` + `SparkPlan`
  * registered through `SparkSessionExtensions.injectPlannerStrategy`
  * (graft.GraftExtensions). Reference behavior: the "most recent prior
  * fact for each probe" lookup the reference's serving layer does
  * per-request in Postgres (app.py:218–236 reads the latest ratings
  * snapshot); here it is a distributed batch operator.
  *
  * Semantics (per `direction`, the pandas merge_asof surface):
  *   backward (default) — the single right row with equal join keys
  *     and the LARGEST right time ≤ the left row's time (ties broken
  *     by any extra right ordering columns, last wins), optionally
  *     subject to `left.time - right.time <= toleranceSec`;
  *   forward — the SMALLEST right time ≥ the left time (equal time
  *     matches; ties break to the first in (time, tiebreaks) order),
  *     tolerance bounds `right.time - left.time`;
  *   nearest — whichever of the backward/forward candidates sits
  *     closer in absolute time, tolerance bounding the absolute gap;
  *     an exact tie prefers the backward (prior) row.
  * Unmatched left rows keep nulls on the right — i.e. LEFT OUTER
  * AS-OF. Null left times never match; null right times are never
  * candidates; a NULL in any join-key field never matches (SQL
  * equality semantics — null ≠ null, unlike a naive natural-ordering
  * comparison which would cluster and equate null keys).
  *
  * Why a custom plan node instead of composition: the union+window
  * form (q38) expresses the same semantics but funnels BOTH tables
  * through ONE union-wide shuffle and window pass, paying the widest
  * schema for every row. This exec shuffles each side once on its own
  * keys (`ClusteredDistribution` — EnsureRequirements co-partitions
  * them exactly like a sort-merge join, and AQE still applies), sorts
  * within partitions by (keys, time), and then streams BOTH sides in
  * ONE forward merge pass per partition: O(n_left + n_right) per
  * partition, no per-row lookback, no cross-schema union, no window
  * buffering. At 100 TB each side carries only its own columns through
  * its own exchange, and the merge state is two rows.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    toleranceSec: Option[Long],
    direction: String = AsOfJoinApi.Backward)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical merge as-of join. Requires both children clustered on the
  * join keys (EnsureRequirements inserts compatible hash exchanges,
  * identical to a shuffled join) and sorted by (keys, time[, extra
  * right tiebreaks]) — so the per-partition pass is a single forward
  * merge with O(1) state: the current right row plus the latest
  * matching candidate ("held") for the current key run.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightTiebreaks: Seq[Attribute],
    toleranceSec: Option[Long],
    direction: String)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTiebreaks)).map(SortOrder(_, Ascending)))

  // Rows stream out in left order, left partitioning: the operator
  // neither re-partitions nor re-orders the probe side.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOut = left.output
    val rightOut = right.output
    val lTimeOrd = leftOut.indexWhere(_.exprId == leftTime.exprId)
    val rTimeOrd = rightOut.indexWhere(_.exprId == rightTime.exprId)
    require(lTimeOrd >= 0 && rTimeOrd >= 0, "as-of time column not in child output")
    val lKeys = leftKeys
    val rKeys = rightKeys
    val tol = toleranceSec
    val dir = direction
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)
      // Bind the projection against NULLABLE right attributes: binding
      // against the raw child output would mark the right fields
      // non-null, and codegen'd BoundReferences then skip the null
      // check and read garbage zeros from the null-match row (caught
      // by AsOfJoinPropertySpec).
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))

      // Current un-consumed right row. Child iterators reuse their row
      // buffers, so anything held across next() is copied — one copy
      // per RIGHT row only; probe rows stream through uncopied.
      var rRow: InternalRow = null
      def advanceRight(): Unit =
        rRow = if (rIter.hasNext) rIter.next().copy() else null
      advanceRight()

      // Latest right row whose key equals the current left key run and
      // whose time ≤ the current left time (monotone within the run).
      var held: InternalRow = null
      var heldKey: InternalRow = null
      var heldTime: Long = 0L

      // Forward probes must NOT consume an equal-time right row past
      // the cursor (it is the forward candidate); backward/nearest
      // consume it into `held` (equal time is a distance-0 backward
      // match, which also settles nearest's tie-prefers-backward).
      val consumeEqual = dir != AsOfJoinApi.Forward

      lIter.map { lRow =>
        numOutputRows += 1
        val lKey = lKeyProj(lRow)
        // SQL equality: a null in any key field matches nothing. Left
        // rows sort nulls-first, so no held state exists to preserve.
        if (lRow.isNullAt(lTimeOrd) || lKey.anyNull) {
          resultProj(joined(lRow, nullRight))
        } else {
          if (heldKey != null && keyOrd.compare(heldKey, lKey) != 0) {
            held = null; heldKey = null
          }
          val lT = lRow.getLong(lTimeOrd)
          // Drop right runs for keys before this probe key (null-keyed
          // right rows sort first and fall out here — never candidates).
          var cmp = if (rRow == null) 1 else keyOrd.compare(rKeyProj(rRow), lKey)
          while (rRow != null && cmp < 0) {
            advanceRight()
            cmp = if (rRow == null) 1 else keyOrd.compare(rKeyProj(rRow), lKey)
          }
          // Consume same-key right rows behind the probe time; the last
          // one (largest (time, tiebreaks) ≤/< lT) becomes the backward
          // candidate. After the loop, rRow — if still on this key — is
          // the FIRST right row ahead of the probe: the forward candidate.
          while (rRow != null && cmp == 0 &&
              (rRow.isNullAt(rTimeOrd) || rRow.getLong(rTimeOrd) < lT ||
                (consumeEqual && rRow.getLong(rTimeOrd) == lT))) {
            if (!rRow.isNullAt(rTimeOrd)) {
              held = rRow
              heldKey = lKey.copy()
              heldTime = rRow.getLong(rTimeOrd)
            }
            advanceRight()
            cmp = if (rRow == null) 1 else keyOrd.compare(rKeyProj(rRow), lKey)
          }
          val bOk = held != null && heldKey != null &&
            keyOrd.compare(heldKey, lKey) == 0 &&
            tol.forall(t => lT - heldTime <= t)
          val fOk = dir != AsOfJoinApi.Backward &&
            rRow != null && cmp == 0 && !rRow.isNullAt(rTimeOrd) &&
            tol.forall(t => rRow.getLong(rTimeOrd) - lT <= t)
          val chosen: InternalRow = dir match {
            case AsOfJoinApi.Backward => if (bOk) held else null
            case AsOfJoinApi.Forward => if (fOk) rRow else null
            case AsOfJoinApi.Nearest =>
              if (bOk && fOk) {
                // tie → backward (held) wins
                if (lT - heldTime <= rRow.getLong(rTimeOrd) - lT) held else rRow
              } else if (bOk) held else if (fOk) rRow else null
          }
          if (chosen != null) {
            numMatched += 1
            resultProj(joined(lRow, chosen))
          } else resultProj(joined(lRow, nullRight))
        }
      }
    }
  }
}

/** Planner strategy for [[AsOfJoin]]; injected by graft.GraftExtensions. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, dir) =>
      // Right tiebreaks: every right key/time attribute is already in
      // the ordering; deterministic last-wins needs the REST of the
      // right row ordered too when times tie. The API threads explicit
      // tiebreak columns by putting them right after the time column
      // in the right child's projection — recover them positionally.
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
        AsOfJoinApi.tiebreaksFor(r, rt), tol, dir) :: Nil
    case _ => Nil
  }
}

/** Public engine surface: `AsOfJoinApi.asof(left, right, ...)`.
  * Lives in the sql package only to reach `Dataset.ofRows` (the
  * supported way third-party plan nodes become DataFrames); all logic
  * is standard extension API.
  */
object AsOfJoinApi {

  /** Marker prefixes on the RIGHT side while the custom node is in
    * flight: `__asof_tb_*` columns are explicit ordering tiebreaks
    * after the time column; `__asof_k_*` are the (duplicated) join
    * keys, dropped from the result. Both exist only between `asof`'s
    * internal projections — callers never see them.
    */
  private val TbPrefix = "__asof_tb_"
  private val KeyPrefix = "__asof_k_"

  /** The supported match directions (the pandas merge_asof surface). */
  val Backward = "backward"
  val Forward = "forward"
  val Nearest = "nearest"

  private[graft] def tiebreaksFor(r: LogicalPlan, rt: Attribute): Seq[Attribute] =
    r.output.filter(_.name.startsWith(TbPrefix))

  /** Left-outer as-of join. `keys` must exist on both sides;
    * `leftTimeCol`/`rightTimeCol` must be LongType (cast timestamps to
    * epoch seconds/micros first — exact integer time comparison, no
    * unit ambiguity inside the operator). `rightTiebreakCols` breaks
    * equal-time ties deterministically (backward: last in ascending
    * order wins; forward: first wins). `direction` is one of
    * `Backward` (default, most recent prior), `Forward` (next at-or-
    * after), `Nearest` (closer of the two; tie → prior). Right-side
    * non-key column names must not collide with left-side names —
    * rename before the call, exactly as with `join`.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTiebreakCols: Seq[String] = Nil,
      toleranceSec: Option[Long] = None,
      direction: String = Backward): DataFrame = {
    require(Set(Backward, Forward, Nearest)(direction),
      s"unknown as-of direction '$direction'")
    val spark = left.sparkSession.asInstanceOf[CSparkSession]
    // Runtime registration for sessions built without GraftExtensions
    // (the driver contract hands us a foreign session): idempotent,
    // and redundant-but-harmless when the extension already injected
    // the strategy at session build.
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    import org.apache.spark.sql.functions.col
    val rightNonKey = right.columns.filterNot(keys.contains)
    val clash = rightNonKey.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"rename right-side columns before asof: $clash")
    // Re-alias both sides through fresh Projects: every attribute gets
    // a new exprId, so self-joins (left and right reading the same
    // table) can never produce the duplicate-attribute plans the
    // analyzer rejects for unknown binary nodes. Right keys/tiebreaks
    // pick up their marker names here.
    val l = left.select(left.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val r0 = right.select(right.columns.map { c =>
      val n = if (keys.contains(c)) KeyPrefix + c
        else if (rightTiebreakCols.contains(c)) TbPrefix + c
        else c
      col(c).as(n)
    }.toIndexedSeq: _*)
    val lp = l.queryExecution.analyzed
    val rp = r0.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val lt = attr(lp, leftTimeCol)
    val rt = attr(rp, rightTimeCol)
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"as-of time columns must be LongType, got ${lt.dataType}/${rt.dataType}")
    val joinedPlan = AsOfJoin(lp, rp,
      keys.map(attr(lp, _)), keys.map(n => attr(rp, KeyPrefix + n)),
      lt, rt, toleranceSec, direction)
    val out: DataFrame = CDataset.ofRows(spark, joinedPlan)
    // Drop the duplicated right keys, un-mark the tiebreak names.
    val cols = l.columns.map(c => out(c)) ++
      r0.columns.filterNot(_.startsWith(KeyPrefix)).map { c =>
        if (c.startsWith(TbPrefix)) out(c).as(c.substring(TbPrefix.length))
        else out(c)
      }
    out.select(cols.toIndexedSeq: _*)
  }
}
