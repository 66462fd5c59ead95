package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
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

/** Broadcast variant: when the right (reference) side is small — the
  * common shape, e.g. as-of joining a 100 TB event stream against a
  * rates/dimension history — broadcast it whole and answer each left
  * row with a per-key binary search. The big side is never shuffled or
  * sorted: a pure map over the probe stream, the as-of analog of
  * BroadcastHashJoin vs SortMergeJoin.
  */
case class BroadcastAsOfJoinExec(left: SparkPlan, right: SparkPlan,
                                 leftKey: Expression, rightKey: Expression,
                                 leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val rightWidth = right.output.size
    val outAttrs = output
    // Build the per-key time-sorted index ONCE on the driver and
    // broadcast the index itself (as Spark broadcasts HashedRelation) —
    // rebuilding it per partition would repeat |R| work × partitions.
    val byKey = new java.util.HashMap[Any, Array[(Any, InternalRow)]]()
    locally {
      val tmp = new java.util.HashMap[Any, scala.collection.mutable
        .ArrayBuffer[(Any, InternalRow)]]()
      right.executeBroadcast[Array[InternalRow]]().value.foreach { r =>
        val k = rKey.eval(r)
        val t = rTime.eval(r)
        if (k != null && t != null) {
          var buf = tmp.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer
              .empty[(Any, InternalRow)]
            tmp.put(k, buf)
          }
          buf += ((t, r))
        }
      }
      tmp.forEach { (k, b) =>
        byKey.put(k, b.sortInPlaceBy(_._1)(timeOrd).toArray)
      }
    }
    val idxBc = sparkContext.broadcast(byKey)
    left.execute().mapPartitions { lIter =>
      val byKey = idxBc.value
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      lIter.map { l =>
        val lk = lKey.eval(l)
        val lt = lTime.eval(l)
        val m: InternalRow = if (lk == null || lt == null) null else {
          val buf = byKey.get(lk)
          if (buf == null) null
          else {
            // binary search: last entry with time <= lt
            var lo = 0
            var hi = buf.length - 1
            var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrd.compare(buf(mid)._1, lt) <= 0) {
                ans = mid; lo = mid + 1
              } else hi = mid - 1
            }
            if (ans >= 0) buf(ans)._2 else null
          }
        }
        proj(joiner(l, if (m == null) nullRight else m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical AsOfJoin: broadcast the right side when its stats
  * fit under the session's autoBroadcastJoinThreshold (the same policy
  * Spark applies to equi-joins), else the shuffled streaming merge.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      val threshold = org.apache.spark.sql.internal.SQLConf.get
        .autoBroadcastJoinThreshold
      if (threshold > 0 && r.stats.sizeInBytes <= threshold)
        BroadcastAsOfJoinExec(planLater(l), planLater(r),
          lk, rk, lt, rt) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
