package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** Morton (Z-order) interleaving of k pre-scaled long columns: bit j of
  * input i lands at output position j·k + i, so a sort by the result
  * clusters ALL dimensions simultaneously — each output file of a
  * range-partitioned rewrite covers a small hyper-rectangle, and
  * parquet min/max row-group stats prune on ANY of the interleaved
  * columns (a single-column sort only prunes its own column).
  *
  * Inputs must already be scaled to [0, 2^bits) — Layout.compactZOrder
  * does the min/max normalization; k·bits ≤ 63. Null inputs sort first
  * (treated as 0). CodegenFallback: this runs on the layout-rewrite
  * write path, once per row per maintenance job — not in query plans.
  */
case class ZOrderExpr(children: Seq[Expression], bits: Int)
    extends Expression with CodegenFallback {

  require(children.nonEmpty && bits > 0 && children.size * bits <= 63,
    s"zorder: need k*bits <= 63, got ${children.size} * $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zorder"

  override def eval(input: InternalRow): Any = {
    val k = children.size
    var out = 0L
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      val x = if (v == null) 0L else v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        out |= ((x >>> j) & 1L) << (j * k + i)
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderExpr =
    copy(children = newChildren)
}
