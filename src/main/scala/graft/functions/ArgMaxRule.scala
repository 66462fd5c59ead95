package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
  ShortType}

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
  *  - the ordering is expressible as an aggregate comparison: all keys
  *    ASC NULLS FIRST (→ min_by over the keys), or a mix of
  *    DESC NULLS LAST keys (used as-is) and ASC NULLS FIRST integral
  *    keys (encoded as the pair `(IsNull(k), -cast(k as long))` so the
  *    max ranks nulls first and flips the comparison) → max_by. These
  *    null encodings coincide with struct-comparison semantics exactly;
  *  - partition and sort expressions are deterministic.
  *
  * Among fully-tied duplicate rows both forms pick one winner
  * arbitrarily; the rewrite only changes WHICH arbitrary winner when
  * inputs are exact duplicates on every sort key — the same class of
  * nondeterminism row_number itself has.
  *
  * The filter's `rn` output column is preserved as a literal 1 under the
  * original exprId, so parent operators that reference it still resolve.
  *
  * KNOWN COST ASYMMETRY: the win assumes groups ≪ rows (map-side
  * partial collapse). When the partition keys are ~unique — a dedup
  * over an already-near-unique key, e.g. r_asof_native's orders
  * (custkey, orderdate) at 149.6k groups / 150k rows — the rewrite
  * trades one group-limit window for two struct-buffer SortAggregates
  * and measured 2.5× SLOWER at sf0.1. Catalyst has no ndv estimate
  * here without CBO stats, so the rule cannot self-gate; workloads in
  * that regime disable it with
  * `spark.graft.argmaxRewrite.enabled = false` (session conf, read per
  * query) or express the dedup with `rank()`, which the pattern
  * deliberately leaves alone.
  */
object ArgMaxWindowToMaxBy extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.argmaxRewrite.enabled"

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString(EnabledKey, "true").toBoolean

  /** The rank-1 selection as an aggregate ordering, when expressible:
    *  - all keys ASC NULLS FIRST → min_by over struct(keys) — any
    *    orderable types;
    *  - otherwise max_by, where each DESC NULLS LAST key contributes
    *    itself and each ASC NULLS FIRST *integral* key contributes the
    *    pair (IsNull(k), -k): the null flag ranks nulls above all
    *    values (= NULLS FIRST wins rank 1) and the negation flips the
    *    comparison; ints/shorts/bytes are widened to long so the
    *    negation cannot overflow. Non-integral ASC keys in a mixed
    *    ordering → None (no rewrite).
    */
  private def ordering(order: Seq[SortOrder])
      : Option[(Boolean, Seq[Expression])] = {
    if (order.isEmpty) return None
    if (order.forall(s =>
        s.direction == Ascending && s.nullOrdering == NullsFirst))
      return Some((false, order.map(_.child)))
    val comps = order.foldLeft(Option(Seq.empty[Expression])) {
      case (None, _) => None
      case (Some(acc), s) => (s.direction, s.nullOrdering) match {
        case (Descending, NullsLast) => Some(acc :+ s.child)
        case (Ascending, NullsFirst) => s.child.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            Some(acc ++ Seq(IsNull(s.child),
              UnaryMinus(Cast(s.child, LongType))))
          case _ => None
        }
        case _ => None
      }
    }
    comps.map((true, _))
  }

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

  /** Split a conjunctive filter into (found rn = 1?, residual predicates
    * not referencing rn). None when no rn = 1 conjunct exists or a
    * residual references the rn column (a non-equality use means the
    * caller wants real ranks — don't touch).
    */
  private def splitCond(cond: Expression, rn: ExprId)
      : Option[Seq[Expression]] = {
    val parts = splitConjunctivePredicates(cond)
    val (rnParts, residual) = parts.partition(isRnEqOne(_, rn))
    if (rnParts.isEmpty) None
    else if (residual.exists(_.exists {
      case a: AttributeReference => a.exprId == rn
      case _ => false
    })) None
    else Some(residual)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan else plan.transform {
    case Filter(cond, Window(
          Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
          part, order, child, _))
        if splitCond(cond, alias.exprId).isDefined &&
          isRowNumberFrame(spec) &&
          ordering(order).isDefined &&
          part.forall(_.deterministic) &&
          order.forall(_.child.deterministic) =>
      val residual = splitCond(cond, alias.exprId).get
      val (useMax, comps) = ordering(order).get
      val payload = CreateStruct(child.output)
      val ordKey = CreateStruct(comps.toIndexedSeq)
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
      val rewritten = Project(fields :+ rnOut, agg)
      // post-selection predicates apply to the rank-1 row, exactly as
      // they did above the window
      if (residual.isEmpty) rewritten
      else Filter(residual.reduce(And), rewritten)
  }
}
