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
  * Row boxing). The Deflater is a per-task-thread ThreadLocal
  * `reset()` between rows: allocating and `end()`ing a fresh native
  * zlib stream per row dominated cost on the one-pass-over-the-corpus
  * workload this expression exists for, and `reset()` restores the
  * exact initial stream state (same implementation, same level), so
  * output bytes are unchanged. One lingering native stream per
  * executor thread is bounded and reclaimed by Deflater's cleaner at
  * thread death.
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

  /** One reusable native stream per task thread — see class doc. */
  private val localDeflater: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() => new Deflater(Deflater.DEFAULT_COMPRESSION))

  /** Scratch output buffer, also per-thread: deflate only needs the
    * byte COUNT, so one 8 KiB window is repeatedly overwritten.
    */
  private val localBuf: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))

  /** Deterministic DEFLATE(level 6) output size of the UTF-8 bytes.
    * Static so generated code and interpreted eval share one body.
    */
  def compressedSize(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = localDeflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = localBuf.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
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
