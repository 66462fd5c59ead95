package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native ASOF JOIN — the one reference-adjacent operator Spark's
  * relational algebra cannot express as a single node (DuckDB has
  * `ASOF JOIN`, see the r_asof_join oracle). The library's default
  * formulation composes built-ins (TimeSeries.asofJoinLast: union +
  * running `last()` window — one shuffle, linear); this custom plan is
  * the step past composition on the extension ladder: a whole-operator
  * LogicalPlan + Strategy + SparkPlan registered through
  * SparkSessionExtensions.
  *
  * Physical shape: both sides hash-clustered on the key and sorted by
  * (key, time) — exactly a sort-merge join's requirements, so Catalyst
  * inserts the same exchanges/sorts it would for SMJ and AQE reuses
  * them — then a streaming two-pointer merge per partition: for each
  * left row, the latest right row with equal key and time ≤ left time.
  * O(|L|+|R|) per partition, zero memory beyond one buffered right row
  * (vs. the window form, which unions both sides into one wider sort
  * and carries the running-last state through the window operator).
  *
  * Left-outer semantics: unmatched left rows pad nulls; NULL keys and
  * NULL times never match (SQL equality).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Pass through every child column (the node re-emits both outputs),
  // so ColumnPruning must not strip unreferenced child attributes.
  override lazy val references: AttributeSet = inputSet

  override lazy val resolved: Boolean = childrenResolved &&
    Seq(leftKey, rightKey, leftTime, rightTime).forall(_.resolved) &&
    leftKey.dataType == rightKey.dataType &&
    leftTime.dataType == rightTime.dataType

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // cursor over the right side; rows with null key/time are skipped
      var rRow: InternalRow = null
      var rK: Any = null
      var rT: Any = null
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && rIter.hasNext) {
          val c = rIter.next()
          val k = rKey.eval(c)
          val t = rTime.eval(c)
          if (k != null && t != null) { rRow = c; rK = k; rT = t }
        }
      }
      advanceRight()
      // latest right row consumed for the current key
      var lastKey: Any = null
      var lastMatch: InternalRow = null
      lIter.map { l =>
        val lk = lKey.eval(l)
        val lt = lTime.eval(l)
        if (lk == null || lt == null) proj(joiner(l, nullRight))
        else {
          var scan = rRow != null
          while (scan) {
            val c = keyOrd.compare(rK, lk)
            if (c < 0 || (c == 0 && timeOrd.compare(rT, lt) <= 0)) {
              if (c == 0) { lastKey = rK; lastMatch = rRow.copy() }
              advanceRight()
              scan = rRow != null
            } else scan = false
          }
          if (lastMatch != null && lastKey != null &&
              keyOrd.compare(lastKey, lk) == 0) proj(joiner(l, lastMatch))
          else proj(joiner(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical AsOfJoin into its streaming-merge exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
