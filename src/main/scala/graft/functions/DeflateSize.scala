package graft.functions

import java.util.zip.Deflater
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DEFLATE-compressed byte size of a
  * string column — the primitive behind compression-ratio quality
  * filtering (highly repetitive machine-generated text compresses far
  * better than natural prose, so compressed/raw size is a classic
  * cheap quality/boilerplate signal in large-corpus curation
  * pipelines).
  *
  * Level 6 (the zlib default) with the zlib header, no dictionary:
  * DEFLATE at a fixed level with one implementation is deterministic
  * for identical input bytes, so results are stable across reruns,
  * partitionings, and executor counts (all executors run the same JRE
  * zlib). No DuckDB twin exists (it ships no deflate scalar), so
  * consumers register rows-only and pin equality against a direct
  * java.util.zip recomputation in scalatest instead.
  *
  * Codegen calls the same static helper `nullSafeEval` uses — the
  * expression stays inside whole-stage codegen (no UDF dispatch, no
  * Row boxing); the per-call Deflater is short-lived and `end()`ed so
  * no native memory outlives the call.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got $t")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any =
    DeflateSize.compressedSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateSize.compressedSize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSize {
  val name = "deflate_size"

  /** Deterministic DEFLATE(level 6) output size of the UTF-8 bytes.
    * Static so generated code and interpreted eval share one body.
    */
  def compressedSize(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  val info = new ExpressionInfo(classOf[DeflateSize].getName, name)

  val builder: Seq[Expression] => Expression = {
    case Seq(c) => DeflateSize(c)
    case other => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${other.size}")
  }

  /** Idempotent runtime registration (the CosineSimilarity pattern). */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}
