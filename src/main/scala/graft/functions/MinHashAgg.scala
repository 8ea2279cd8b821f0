package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Native MinHash signature aggregate: all `numPerms` permutation
  * minima in ONE pass over a group's 64-bit shingle keys.
  *
  * The composable alternative (explode a perm index 0..P-1, then
  * groupBy(doc, perm).min) multiplies every row P× before the shuffle;
  * this TypedImperativeAggregate keeps one long[] buffer per group and
  * shuffles only P longs per doc — the partial/merge path Spark gives
  * every ImperativeAggregate for free (map-side combine included).
  *
  * Permutation family: h0 = sk mod prime (nonneg), hv_p = (A_p·h0 +
  * B_p) mod prime with ~31-bit multipliers A_p (MinHashAgg.A/B),
  * prime = 2^31-1. The multipliers MUST be large: with small ones
  * (e.g. 2p+1) the product never wraps the prime for typical min
  * values, every "permutation" is monotone in h0, all perms pick the
  * same argmin shingle, and banded LSH degenerates to single-hash
  * matching (observed as a recall miss on a 0.95-jaccard pair).
  * A_p·h0 stays < 2^62, so no Long overflow under ANSI mode.
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int = 16,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val Prime = 2147483647L

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT shingle key, got $t")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sk = v.asInstanceOf[Long]
      val h0 = java.lang.Math.floorMod(sk, Prime)
      var p = 0
      while (p < numPerms) {
        val hv = java.lang.Math.floorMod(
          MinHashAgg.A(p) * h0 + MinHashAgg.B(p), Prime)
        if (hv < buf(p)) buf(p) = hv
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerms) { if (b(p) < a(p)) a(p) = b(p); p += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  private val Prime = 2147483647L

  /** Per-permutation affine constants: large (~31-bit) multipliers so
    * A·h0 wraps the prime many times — a genuine scramble, not a
    * monotone map. Derived from Knuth's multiplicative constant.
    */
  val A: Array[Long] = Array.tabulate(16) { p =>
    val a = java.lang.Math.floorMod(2654435761L * (p + 1) + 1013904223L, Prime)
    if (a == 0) 1L else a
  }
  val B: Array[Long] = Array.tabulate(16) { p =>
    java.lang.Math.floorMod(40503L * (p + 7) + 69069L * p, Prime)
  }

  val name = "minhash_sig"
  val info = new ExpressionInfo(classOf[MinHashAgg].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(c) => MinHashAgg(c)
    case other => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}
