package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter BUILD aggregate over pre-hashed 64-bit keys (callers
  * pass `xxhash64(col)`, the q86 probe's convention) — the build half
  * of the engine's bloom pair: `bloom_build` produces the serialized
  * `org.apache.spark.util.sketch.BloomFilter` that `bloom_might_contain`
  * (BloomMightContain) probes, so a sketch built DISTRIBUTED inside an
  * ordinary aggregate slots straight into the existing map-side prune.
  *
  * Why an aggregate and not `df.stat.bloomFilter`: the DataFrame helper
  * runs its own job — a second full scan of whatever it sketches. As a
  * TypedImperativeAggregate the sketch rides an EXISTING aggregate pass
  * (the snapshot log's one-pass segment stat aggregate adds it as one
  * more agg column — zero extra scans, the q208 rule), with fixed-size
  * partial state (the m-bit array) per partition and order-independent
  * bitwise-OR merge: same inputs → same bits → same bytes, on any
  * partitioning (partitioning invariance pinned in BloomAggSpec).
  *
  * `expectedItems`/`fpp` are foldable literals fixed at build time;
  * oversubscribing a filter (more distinct keys than expectedItems)
  * only degrades its false-positive rate — never a false negative, so
  * consumers that treat "might contain" as "cannot rule out" stay
  * exact (zone-map law: a saturated bloom keeps candidates, never
  * drops one).
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Expression,
    fpp: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child, expectedItems, fpp)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, expectedItems.dataType, fpp.dataType) match {
      case (LongType, LongType | IntegerType, DoubleType)
          if expectedItems.foldable && fpp.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, _, _)
          if !(expectedItems.foldable && fpp.foldable) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects FOLDABLE (expectedItems, fpp) literals")
      case (t, _, _) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BIGINT hash key (use xxhash64(col)), got $t")
    }

  @transient private lazy val nExpected: Long =
    expectedItems.eval(null).asInstanceOf[Number].longValue()
  @transient private lazy val fppValue: Double =
    fpp.eval(null).asInstanceOf[Number].doubleValue()

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(nExpected, fppValue)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b)
    a
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), expectedItems = newChildren(1),
      fpp = newChildren(2))
}

object BloomAgg {
  val name = "bloom_build"
  val info = new ExpressionInfo(classOf[BloomAgg].getName, name)
  val builder: Seq[Expression] => Expression = {
    case Seq(c, n, p) => BloomAgg(c, n, p)
    case other => throw new IllegalArgumentException(
      s"$name expects 3 arguments (hashKey, expectedItems, fpp), " +
        s"got ${other.size}")
  }

  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}
