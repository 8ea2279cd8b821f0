package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Predicate}
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over pre-hashed 64-bit keys — the
  * runtime-filter half of the decontamination pattern (q86): a sketch
  * built on the TINY side (a benchmark/eval set) is embedded in the
  * plan as a binary literal and probed map-side while the 100 TB
  * corpus streams by, so the expensive exact join only ever sees the
  * few rows the sketch could not rule out. No false negatives, so
  * (bloom-prune → exact-verify) is exactly equal to the plain join.
  *
  * `bloom` must be a foldable BINARY (the serialized
  * `org.apache.spark.util.sketch.BloomFilter`): the filter
  * deserializes ONCE per expression instance, never per row, and
  * codegen pins it as a reference object — the same shape Spark's own
  * injected runtime bloom joins use (public Catalyst API throughout).
  */
case class BloomMightContain(bloom: Expression, value: Expression)
    extends BinaryExpression with Predicate {

  override def left: Expression = bloom
  override def right: Expression = value
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (bloom.dataType, value.dataType) match {
      case (BinaryType, LongType) if bloom.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a FOLDABLE binary bloom (a serialized sketch literal)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, bigint hash key), got ($l, $r)")
    }

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloom.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(bytes)
  }

  override def nullSafeEval(b: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The deserialized filter ships to executors in the codegen
    // references array (BloomFilterImpl is Serializable); the probe
    // stays inside whole-stage codegen as one virtual call per row.
    val ref = ctx.addReferenceObj("bloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bloom = newLeft, value = newRight)
}

object BloomMightContain {
  val name = "bloom_might_contain"

  val info = new ExpressionInfo(classOf[BloomMightContain].getName, name)

  val builder: Seq[Expression] => Expression = {
    case Seq(b, v) => BloomMightContain(b, v)
    case other => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${other.size}")
  }

  /** Runtime registration (idempotent), mirroring CosineSimilarity:
    * callers invoke via `call_function(name, lit(bytes), keyCol)`.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)

  /** Serialize a built sketch for embedding as a plan literal. */
  def toBytes(f: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    f.writeTo(out)
    out.toByteArray
  }
}
