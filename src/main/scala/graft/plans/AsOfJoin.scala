package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, GenerateOrdering, GenerateUnsafeProjection, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

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
  *
  * Ties: when several right rows share the winning (key, time), WHICH
  * of them is returned is unspecified (the merge variant takes the last
  * in its sort order, the broadcast variant the last in broadcast
  * order — either may differ run to run). Pre-deduplicate the right
  * side on (key, time) when tie identity matters, as r_asof_native
  * does.
  *
  * When to use which (measured at sf0.1, see r_asof_broadcast vs
  * r_asof_native): the union+window composition costs ONE shuffle of
  * |L|+|R| and wins whenever the sides are comparable; the broadcast
  * variant never touches the probe side (zero shuffle) but pays a
  * fixed BroadcastExchange job (~0.2 s locally), so it wins once |L|
  * outgrows ~1M rows against a small |R| — the 100 TB-stream-vs-
  * dimension-history shape it exists for. The shuffled merge variant
  * covers big-|R| cases where neither broadcast nor a single unioned
  * sort fits.
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

/** Shared executor-side machinery for the two as-of variants: codegen'd
  * (key, time) projections and generated (non-boxing) orderings over
  * the projected 2-field UnsafeRows — the interpreted `eval` +
  * `getInterpretedOrdering` per-row path costs ~4× at sf0.1 and worse
  * at scale.
  */
private[plans] object AsOfRuntime {
  /** UnsafeProjection to a compact (key, time) row. Built inside the
    * task (codegen classes are process-local); Spark's codegen cache
    * dedupes compilation across tasks.
    */
  def ktProjection(key: Expression, time: Expression,
                   input: Seq[Attribute]): UnsafeProjection =
    UnsafeProjection.create(Seq(key, time), input)

  /** Lexicographic (key, time) ordering over projected rows. */
  def fullOrdering(keyType: DataType, timeType: DataType): BaseOrdering =
    GenerateOrdering.generate(Seq(
      SortOrder(BoundReference(0, keyType, nullable = true), Ascending),
      SortOrder(BoundReference(1, timeType, nullable = true), Ascending)))

  /** Key-only ordering over projected (key, time) rows. */
  def keyOrdering(keyType: DataType): BaseOrdering =
    GenerateOrdering.generate(Seq(
      SortOrder(BoundReference(0, keyType, nullable = true), Ascending)))

  /** Time-only ordering over projected (key, time) rows. */
  def timeOrdering(timeType: DataType): BaseOrdering =
    GenerateOrdering.generate(Seq(
      SortOrder(BoundReference(1, timeType, nullable = true), Ascending)))
}

/** Serializable factory for the streaming-merge cursor: ships the key/
  * time expressions to executors; the cursor builds its codegen'd
  * projections and orderings task-side (generated classes are
  * process-local).
  */
final class AsOfMergeSupport(
    val lKey: Expression, val lTime: Expression, val lOut: Seq[Attribute],
    val rKey: Expression, val rTime: Expression, val rOut: Seq[Attribute])
    extends Serializable {
  /** `it` is typed Object so generated Java never names the Scala
    * iterator type parameters.
    */
  def cursor(it: Object): AsOfMergeCursor =
    new AsOfMergeCursor(this, it.asInstanceOf[Iterator[InternalRow]])
}

/** Per-partition two-pointer merge state over the (key, time)-sorted
  * right side: for each left row (fed in the left's sort order), the
  * latest right row with equal key and time ≤ left time, else null.
  * Shared by the interpreted path and the generated whole-stage loop.
  */
final class AsOfMergeCursor(s: AsOfMergeSupport,
                            rIter: Iterator[InternalRow]) {
  private val lkt = AsOfRuntime.ktProjection(s.lKey, s.lTime, s.lOut)
  private val rkt = AsOfRuntime.ktProjection(s.rKey, s.rTime, s.rOut)
  private val fullOrd =
    AsOfRuntime.fullOrdering(s.lKey.dataType, s.lTime.dataType)
  private val keyOrd = AsOfRuntime.keyOrdering(s.lKey.dataType)
  // cursor over the right side; rows with null key/time are skipped.
  // rKT aliases rkt's reused buffer (and rRow the sorter's reused
  // row), valid only until the next advance — anything retained
  // across advances MUST be copied (see lastKT/lastMatch below).
  private var rRow: InternalRow = null
  private var rKT: UnsafeRow = null
  private def advanceRight(): Unit = {
    rRow = null
    while (rRow == null && rIter.hasNext) {
      val c = rIter.next()
      val kt = rkt(c)
      if (!kt.isNullAt(0) && !kt.isNullAt(1)) { rRow = c; rKT = kt }
    }
  }
  advanceRight()
  // latest right row consumed for the current key — COPIES: both the
  // sort iterator's row and the projection's output buffer are reused,
  // so buffer-backed key types (strings, binary, structs) would go
  // stale after the next advanceRight() otherwise.
  private var lastKT: UnsafeRow = null
  private var lastMatch: InternalRow = null

  /** The as-of match for `l`, or null (no match / null key / null
    * time). Left rows MUST arrive in (key, time) order.
    */
  def next(l: InternalRow): InternalRow = {
    val lKT = lkt(l)
    if (lKT.isNullAt(0) || lKT.isNullAt(1)) return null
    // advance while right (key, time) ≤ left (key, time)
    // lexicographically; remember the row only on equal keys
    var scan = rRow != null
    while (scan) {
      if (fullOrd.compare(rKT, lKT) <= 0) {
        if (keyOrd.compare(rKT, lKT) == 0) {
          lastKT = rKT.copy()
          lastMatch = rRow.copy()
        }
        advanceRight()
        scan = rRow != null
      } else scan = false
    }
    if (lastMatch != null && keyOrd.compare(lastKT, lKT) == 0) lastMatch
    else null
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  private def mergeSupport: AsOfMergeSupport = new AsOfMergeSupport(
    leftKey, leftTime, left.output, rightKey, rightTime, right.output)

  override protected def doExecute(): RDD[InternalRow] = {
    val support = mergeSupport
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val cursor = support.cursor(rIter)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      lIter.map { l =>
        val m = cursor.next(l)
        proj(joiner(l, if (m == null) nullRight else m))
      }
    }
  }

  // ---------- whole-stage codegen (SortMergeJoin-style boundary) ------
  // Both sorted children are consumed as iterators (inputs[0]/[1], the
  // two-input WholeStageCodegen mechanism SMJ uses); the generated loop
  // streams the left side, asks the compiled cursor for the as-of
  // match, and emits left ++ (matched | nulls) column variables straight
  // into the downstream span — no JoinedRow, no output projection, no
  // per-row iterator between the join and its parent. doExecute()
  // remains the interpreted fallback. Measured at sf0.1 the two paths
  // are at parity (0.60 vs 0.53 s — the cursor's virtual call dominates
  // either way); the codegen value is downstream fusion: parents
  // consume column variables instead of re-reading an UnsafeRow.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];")
    val supportRef = ctx.addReferenceObj("asofMergeSupport", mergeSupport,
      classOf[AsOfMergeSupport].getName)
    val cursor = ctx.addMutableState(classOf[AsOfMergeCursor].getName,
      "asofCursor", v => s"$v = $supportRef.cursor($rightInput);")
    val leftRow = ctx.freshName("asofLeftRow")
    val matched = ctx.freshName("asofMatched")
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    // right-side column variables: read from the matched row, nulls on
    // no match (same shape as the broadcast variant)
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofVal")
      val javaType = CodeGenerator.javaType(a.dataType)
      val cd =
        code"""
           |boolean $isNull = true;
           |$javaType $value = ${CodeGenerator.defaultValue(a.dataType)};
           |if ($matched != null && !$matched.isNullAt($i)) {
           |  $isNull = false;
           |  $value = ${CodeGenerator.getValue(matched, a.dataType, i.toString)};
           |}
         """.stripMargin
      ExprCode(cd, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    val numOutput = metricTerm(ctx, "numOutputRows")
    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  InternalRow $matched = $cursor.next($leftRow);
       |  $numOutput.add(1);
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
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
    extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val rKeyE = rightKey
    val rTimeE = rightTime
    val lKeyE = leftKey
    val lTimeE = leftTime
    val lOut = left.output
    val rOut = right.output
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val rightWidth = right.output.size
    val outAttrs = output
    // The rows ride the one BroadcastExchange (IdentityBroadcastMode —
    // BroadcastExchangeExec only sizes HashedRelation/Array results, so
    // a custom index-building BroadcastMode is off the table); the
    // per-key time-sorted index is built from them ONCE PER EXECUTOR
    // and memoized on the broadcast id — no per-partition rebuild, and
    // no second driver-side broadcast of the index.
    val rowsBc = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      val index = BroadcastAsOfJoinExec.indexFor(rowsBc, rKeyE, rTimeE,
        rOut, keyType, timeType)
      val lkt = AsOfRuntime.ktProjection(lKeyE, lTimeE, lOut)
      val lkey = UnsafeProjection.create(Seq(lKeyE), lOut)
      val timeOrd = AsOfRuntime.timeOrdering(timeType)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      lIter.map { l =>
        val lKT = lkt(l)
        val m: InternalRow =
          if (lKT.isNullAt(0) || lKT.isNullAt(1)) null
          else {
            val e = index.get(lkey(l))
            if (e == null) null
            else {
              // binary search: last entry with time <= left time
              val kts = e.kts
              var lo = 0
              var hi = kts.length - 1
              var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (timeOrd.compare(kts(mid), lKT) <= 0) {
                  ans = mid; lo = mid + 1
                } else hi = mid - 1
              }
              if (ans >= 0) e.rows(ans) else null
            }
          }
        proj(joiner(l, if (m == null) nullRight else m))
      }
    }
  }

  // ---------- whole-stage codegen (probe side is a pure map) ----------
  // The probe fuses into the streamed side's WholeStageCodegen span:
  // the generated loop evaluates (key, time) from the child's column
  // variables, hash-probes the executor-local index, binary-searches
  // the per-key time run, and emits left ++ (matched | nulls) — no
  // per-row iterator or projection objects between the scan and the
  // join. doExecute() above remains the interpreted fallback (codegen
  // compile failures, spark.sql.codegen.wholeStage=false).

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    left.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def needCopyResult: Boolean = false

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
                         row: ExprCode): String = {
    val holder = new BroadcastAsOfJoinExec.AsOfIndexHolder(
      right.executeBroadcast[Array[InternalRow]](), rightKey, rightTime,
      right.output, leftKey.dataType, leftTime.dataType)
    val holderRef = ctx.addReferenceObj("asofIndexHolder", holder,
      classOf[BroadcastAsOfJoinExec.AsOfIndexHolder].getName)
    val idxTerm = ctx.addMutableState("java.util.HashMap", "asofIndex",
      v => s"$v = $holderRef.get();")
    val probeHolder = new BroadcastAsOfJoinExec.AsOfProbeSupport(
      leftTime.dataType)
    val probeRef = ctx.addReferenceObj("asofProbe", probeHolder,
      classOf[BroadcastAsOfJoinExec.AsOfProbeSupport].getName)
    // evaluate (key, time) from the child's current column variables
    ctx.currentVars = input
    ctx.INPUT_ROW = null
    val boundKey = BindReferences.bindReference(leftKey, left.output)
    val boundTime = BindReferences.bindReference(leftTime, left.output)
    val ktEv = GenerateUnsafeProjection.createCode(ctx,
      Seq(boundKey, boundTime))
    val keyEv = GenerateUnsafeProjection.createCode(ctx, Seq(boundKey))
    val matched = ctx.freshName("asofMatched")
    val entry = ctx.freshName("asofEntry")
    val ktRow = ctx.freshName("asofKt")
    // right-side column variables: read from the matched row, nulls on
    // no match (the genBuildSideVars pattern of BroadcastHashJoin)
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofVal")
      val javaType = CodeGenerator.javaType(a.dataType)
      val cd =
        code"""
           |boolean $isNull = true;
           |$javaType $value = ${CodeGenerator.defaultValue(a.dataType)};
           |if ($matched != null && !$matched.isNullAt($i)) {
           |  $isNull = false;
           |  $value = ${CodeGenerator.getValue(matched, a.dataType, i.toString)};
           |}
         """.stripMargin
      ExprCode(cd, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }
    val numOutput = metricTerm(ctx, "numOutputRows")
    s"""
       |${ktEv.code}
       |${keyEv.code}
       |UnsafeRow $ktRow = ${ktEv.value};
       |InternalRow $matched = null;
       |if (!$ktRow.isNullAt(0) && !$ktRow.isNullAt(1)) {
       |  Object $entry = $idxTerm.get(${keyEv.value});
       |  if ($entry != null) {
       |    $matched = $probeRef.probe($entry, $ktRow);
       |  }
       |}
       |$numOutput.add(1);
       |${consume(ctx, input ++ rightVars)}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOfJoinExec {
  /** Per-key entry: (key,time) rows for the time binary search plus the
    * full right rows, both time-ascending (ties in broadcast order).
    */
  final class AsOfEntry(val kts: Array[UnsafeRow],
                        val rows: Array[InternalRow])

  /** Serializable handle the generated code initializes its mutable
    * index state from — resolves to the executor-memoized index.
    */
  final class AsOfIndexHolder(bc: Broadcast[Array[InternalRow]],
      rKey: Expression, rTime: Expression, rOut: Seq[Attribute],
      keyType: DataType, timeType: DataType) extends Serializable {
    def get(): java.util.HashMap[UnsafeRow, AsOfEntry] =
      indexFor(bc, rKey, rTime, rOut, keyType, timeType)
  }

  /** Serializable probe: the time ordering is (re)generated lazily on
    * each executor (generated BaseOrdering classes don't serialize).
    */
  final class AsOfProbeSupport(timeType: DataType) extends Serializable {
    @transient private lazy val timeOrd = AsOfRuntime.timeOrdering(timeType)

    /** Last right row with time ≤ the probe's, else null. `e` is typed
      * Object so generated Java never names the Scala nested class.
      */
    def probe(e: Object, kt: UnsafeRow): InternalRow = {
      val entry = e.asInstanceOf[AsOfEntry]
      val kts = entry.kts
      var lo = 0
      var hi = kts.length - 1
      var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (timeOrd.compare(kts(mid), kt) <= 0) { ans = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      if (ans >= 0) entry.rows(ans) else null
    }
  }

  // Executor-local memo of built indexes, keyed by broadcast id PLUS
  // the bound-canonicalized (key, time) extraction expressions: one
  // IdentityBroadcastMode exchange canonicalizes identically no matter
  // which as-of node consumes it, so ReuseExchange can hand the SAME
  // broadcast (same bc.id) to two BroadcastAsOfJoinExec nodes that
  // extract DIFFERENT right columns — keyed on bc.id alone, the second
  // node would probe the first node's index and silently return wrong
  // matches. Binding to ordinals first makes the key structural: equal
  // ordinals ⇒ genuinely the same index (still shared), different
  // ordinals ⇒ distinct entries.
  // SoftReferences let the JVM reclaim an index under memory pressure
  // (it is rebuilt from the still-held broadcast rows on next use);
  // compute() serializes concurrent first builds per key.
  private final case class IndexKey(bcId: Long, key: Expression,
                                    time: Expression)

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    IndexKey, java.lang.ref.SoftReference[java.util.HashMap[UnsafeRow, AsOfEntry]]]()

  private[plans] def indexFor(bc: Broadcast[Array[InternalRow]],
      rKey: Expression, rTime: Expression, rOut: Seq[Attribute],
      keyType: DataType, timeType: DataType)
      : java.util.HashMap[UnsafeRow, AsOfEntry] = {
    val memoKey = IndexKey(bc.id,
      BindReferences.bindReference(rKey, rOut).canonicalized,
      BindReferences.bindReference(rTime, rOut).canonicalized)
    var out: java.util.HashMap[UnsafeRow, AsOfEntry] = null
    while (out == null) {
      val ref = cache.compute(memoKey, (_, old) =>
        if (old != null && old.get != null) old
        else new java.lang.ref.SoftReference(
          build(bc.value, rKey, rTime, rOut, keyType, timeType)))
      out = ref.get
    }
    out
  }

  private def build(rows: Array[InternalRow], rKey: Expression,
      rTime: Expression, rOut: Seq[Attribute], keyType: DataType,
      timeType: DataType): java.util.HashMap[UnsafeRow, AsOfEntry] = {
    val rkt = AsOfRuntime.ktProjection(rKey, rTime, rOut)
    val rkey = UnsafeProjection.create(Seq(rKey), rOut)
    val fullOrd = AsOfRuntime.fullOrdering(keyType, timeType)
    val keyOrd = AsOfRuntime.keyOrdering(keyType)
    // One pass to project (key,time) rows, ONE global (key,time) sort,
    // then slice per-key runs — instead of a HashMap of per-key
    // growable buffers (for mostly-unique keys that is one ArrayBuffer
    // + tuple boxing per row, which dominates the build).
    val n = rows.length
    val kts = new Array[UnsafeRow](n)
    val rws = new Array[InternalRow](n)
    var m = 0
    var i = 0
    while (i < n) {
      val kt = rkt(rows(i))
      if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
        kts(m) = kt.copy() // projection reuses its buffer
        rws(m) = rows(i)   // broadcast rows are materialized (stable)
        m += 1
      }
      i += 1
    }
    val idx = Array.range(0, m)
    // stable sort: ties on (key,time) keep broadcast order
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed,
      (a: Integer, b: Integer) => fullOrd.compare(kts(a), kts(b)))
    val out = new java.util.HashMap[UnsafeRow, AsOfEntry](m * 2)
    var lo = 0
    while (lo < m) {
      var hi = lo + 1
      while (hi < m && keyOrd.compare(kts(boxed(lo)), kts(boxed(hi))) == 0)
        hi += 1
      val eKts = new Array[UnsafeRow](hi - lo)
      val eRows = new Array[InternalRow](hi - lo)
      var j = lo
      while (j < hi) {
        eKts(j - lo) = kts(boxed(j))
        eRows(j - lo) = rws(boxed(j))
        j += 1
      }
      out.put(rkey(eRows(0)).copy(), new AsOfEntry(eKts, eRows))
      lo = hi
    }
    out
  }
}

/** Plans the logical AsOfJoin: broadcast the right side when its stats
  * fit under the session's autoBroadcastJoinThreshold (the same policy
  * Spark applies to equi-joins), else the shuffled streaming merge.
  *
  * Float/double keys are wrapped in NormalizeNaNAndZero on BOTH sides
  * here (the analyzer's NormalizeFloatingNumbers rule does not visit
  * custom nodes), so -0.0 vs 0.0 and NaN keys join under SQL equality
  * in either physical variant — the broadcast index compares keys
  * bytewise, the merge exec through generated orderings.
  */
object AsOfJoinStrategy extends SparkStrategy {
  private def norm(e: Expression): Expression = e.dataType match {
    case FloatType | DoubleType => NormalizeNaNAndZero(e)
    case _ => e
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk0, rk0, lt, rt) =>
      val (lk, rk) = (norm(lk0), norm(rk0))
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
