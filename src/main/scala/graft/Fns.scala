package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level helpers. All are built from codegen'd native
  * functions — no UDFs anywhere in the engine (SURVEY.md §2.10 U1:
  * the reference's Python-UDF barrier is deliberately not reproduced).
  */
object Fns {

  /** Money-safe aggregate input: fixed-point cents as BIGINT so that
    * distributed double-summation order cannot perturb results. A
    * 1000-executor sum of doubles is non-deterministic in the last
    * bits; a sum of longs is exact at any scale (SURVEY.md §7 "hard
    * parts" / determinism).
    */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Whitespace tokenizer — split keeps trailing empties in both Spark
    * and DuckDB, so the twins agree on token counts.
    */
  def toks(c: Column): Column = split(c, " ")

  /** Element-wise promotion to double before any arithmetic: float
    * math would round differently from the DuckDB oracle's doubles.
    */
  def asDouble(arr: Column): Column = transform(arr, x => x.cast("double"))

  /** Sequential left-fold dot product in double precision. The fold
    * order is the array order on both engines, so results are
    * bit-identical and safe to hash-compare. Codegen-friendly
    * (higher-order functions, no UDF).
    */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity = dot/(|a||b|), all in double. */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))

  /** Word n-gram shingles of a token array, 1-based slices. Caller
    * must guarantee size >= n (Spark's `sequence(1,0)` would descend),
    * and should pass a MATERIALIZED token column (`.as("tk")` in a
    * prior projection), never an inline `toks(text)`: the argument
    * embeds in the lambda body, and interpreted HOF eval re-runs it
    * per element — inlined split(text) makes this O(tokens²) per doc.
    */
  def shingles(tokArr: Column, n: Int): Column =
    transform(sequence(lit(1), size(tokArr) - (n - 1)),
      i => concat_ws(" ", slice(tokArr, i, lit(n))))
}
