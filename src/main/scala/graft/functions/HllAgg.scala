package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** HyperLogLog distinct-count aggregate over pre-hashed 64-bit keys
  * (callers pass `xxhash64(col)` — codegen'd, engine-stable): the
  * 100 TB distinct path when exactness isn't required.
  *
  * Why it matters at scale: exact `COUNT(DISTINCT x)` shuffles every
  * distinct value (Spark plans it as an Expand + two aggregates whose
  * partial state is the value set itself). This sketch keeps a FIXED
  * 4 KiB register array per group regardless of cardinality, and
  * partial/merge composes by elementwise max — so map-side combine
  * sends 4 KiB per partition, not the values, and merging is
  * order-independent (estimates are partitioning-invariant, proven in
  * HllAggSpec).
  *
  * Standard HLL (Flajolet et al.): p=12 → m=4096 registers, stores
  * max(leading-zero rank) of the suffix per bucket; estimate is the
  * bias-corrected harmonic mean with linear counting for the small
  * range. Relative standard error 1.04/sqrt(m) ≈ 1.6%. With a 64-bit
  * hash the large-range collision correction is unnecessary.
  * Deterministic: same inputs → same registers → same estimate, on
  * every engine and any partitioning.
  */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import HllAgg.{M, P}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT hash key (use xxhash64(col)), got $t")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h >>> (64 - P)).toInt
      val w = h << P
      // rank of the first 1-bit in the remaining 64-P bits, 1-based;
      // all-zero suffix gets the maximum rank 64-P+1
      val rho = (if (w == 0L) 64 - P + 1
                 else java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
      if (rho > buf(idx)) buf(idx) = rho
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.pow(2.0, -buf(i).toDouble)
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val raw = alpha * M.toDouble * M.toDouble / invSum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllAgg {
  /** Register-index bits / register count: 2^12 = 4096 → ~1.6% rse. */
  val P = 12
  val M: Int = 1 << P

  val name = "hll_distinct"
  val info = new ExpressionInfo(classOf[HllAgg].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(c) => HllAgg(c)
    case other => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}
