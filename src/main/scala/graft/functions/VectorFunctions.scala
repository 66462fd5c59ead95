package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` columns, built from codegen'd built-ins
  * (`zip_with` / `aggregate`) — no UDFs, so whole-stage codegen stays
  * intact and the DuckDB oracle can reproduce results bit-for-bit.
  *
  * Determinism note: `aggregate` is a strict LEFT fold over the array, the
  * same evaluation order as DuckDB's `list_reduce` — float→double products
  * are IEEE-exact (24-bit mantissas fit in 53), and summing them in
  * identical order gives bit-identical doubles across both engines. That
  * is what lets cosine scores hash-match the oracle instead of needing a
  * tolerance.
  */
object VectorFunctions {

  /** Left-fold sum of an array<double> column. */
  def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** dot(a, b) with per-element double promotion — native Catalyst
    * expression (codegen'd primitive loop), same left-to-right sum as the
    * lambda fold it replaces.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(VecDot(
      org.apache.spark.sql.GraftSqlBridge.toExpression(a),
      org.apache.spark.sql.GraftSqlBridge.toExpression(b)))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero norms (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n =!= 0.0, d / n)
  }
}
