package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch frequency aggregate over pre-hashed 64-bit keys
  * (callers pass `xxhash64(col)`, as with hll_distinct) — the 100 TB
  * point-frequency path: exact per-key counts shuffle every distinct
  * key, while this keeps a FIXED depth×width counter grid per group
  * whose partials merge by elementwise addition in any order
  * (partitioning-invariant, map-side combine sends the grid, never
  * the keys). Estimates only ever OVER-count (collisions add), with
  * err <= eps·N at the chosen confidence — the classic Cormode/
  * Muthukrishnan guarantee.
  *
  * Output is the serialized sketch (binary); probe it with
  * `cms_estimate`. eps=1e-3 / conf=0.99 → 7×2000 longs ≈ 110 KiB per
  * aggregation buffer.
  */
case class CmsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT hash key (use xxhash64(col)), got $t")
  }

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(CmsAgg.Eps, CmsAgg.Confidence, CmsAgg.Seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buf.addLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = {
    a.mergeInPlace(b)
    a
  }

  override def eval(buf: CountMinSketch): Any = serialize(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CmsAgg {
  /** err <= Eps·N with prob >= Confidence → width 2e3, depth 7. */
  val Eps = 1e-3
  val Confidence = 0.99
  val Seed = 42

  val name = "cms_sketch"
  val info = new ExpressionInfo(classOf[CmsAgg].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(c) => CmsAgg(c)
    case other => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}

/** Point-frequency probe against a `cms_sketch` binary: the sketch
  * deserializes PER ROW, which is fine exactly where a sketch point
  * query belongs — a small probe side (dashboard keys, an alert list)
  * against a sketch aggregated from the big side. For bulk scoring of
  * millions of probes, pin the sketch as a foldable literal instead
  * (the BloomMightContain route) so it deserializes once.
  */
case class CmsEstimate(sketch: Expression, key: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = sketch
  override def right: Expression = key
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (sketch.dataType, key.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, bigint hash key), got ($l, $r)")
    }

  override def nullSafeEval(b: Any, k: Any): Any =
    CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(b.asInstanceOf[Array[Byte]]))
      .estimateCount(k.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketch = newLeft, key = newRight)
}

object CmsEstimate {
  val name = "cms_estimate"
  val info = new ExpressionInfo(classOf[CmsEstimate].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(s, k) => CmsEstimate(s, k)
    case other => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}
