package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan linter: the CI gate that keeps 100 TB jobs from
  * silently regressing into cartesian products, unpruned scans, or
  * shuffle storms when someone edits a query.
  *
  * Plan ASSERTIONS (not benchmarks) are the cheap, deterministic way to
  * pin scale properties: a shuffle count or a no-nested-loop invariant
  * is checkable in milliseconds on sf0.001 and holds at any scale,
  * whereas a runtime regression is only visible once the big run is
  * already paying for it. This repo's own PlanAssertionsSpec applies
  * the technique to the shipped queries; PlanLint packages it for
  * users' pipelines: `PlanLint.assertBudget(df, Budget(maxShuffles=2))`
  * next to the tests, `PlanLint.report(df)` for inspection.
  *
  * Works on adaptive plans: traversal descends into AQE query stages
  * (a plain `plan.collect` stops at QueryStageExec leaves and reads 0
  * shuffles on ANY adaptive plan). Before an action the report
  * reflects the initial plan; after an action, the final re-optimized
  * one.
  */
object PlanLint {

  /** Every physical node, descending into AQE stages. */
  def nodes(plan: SparkPlan): Seq[SparkPlan] = plan match {
    case a: AdaptiveSparkPlanExec => plan +: nodes(a.executedPlan)
    case q: QueryStageExec => plan +: nodes(q.plan)
    case _ => plan +: plan.children.flatMap(nodes)
  }

  def nodes(df: DataFrame): Seq[SparkPlan] =
    nodes(df.queryExecution.executedPlan)

  /** One scan's pruning posture: columns read vs columns available,
    * and whether any data filter reached the format (partition-only
    * scans legitimately push nothing).
    */
  final case class ScanInfo(table: String, colsRead: Int, colsTotal: Int,
                            pushedFilters: Boolean) {
    def unpruned: Boolean = colsTotal > 2 && colsRead == colsTotal
  }

  final case class Report(shuffles: Int, sorts: Int, broadcasts: Int,
                          cartesians: Int, scans: Seq[ScanInfo],
                          globalWindows: Int = 0, windows: Int = 0) {
    def unprunedScans: Seq[ScanInfo] = scans.filter(_.unpruned)
  }

  def analyze(df: DataFrame): Report = {
    val ns = nodes(df)
    val scans = ns.collect { case s: FileSourceScanExec =>
      ScanInfo(
        s.tableIdentifier.map(_.unquotedString)
          .getOrElse(s.relation.location.rootPaths.headOption
            .map(_.getName).getOrElse("?")),
        s.requiredSchema.size,
        s.relation.dataSchema.size,
        s.dataFilters.nonEmpty)
    }
    Report(
      shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec]),
      sorts = ns.count(_.isInstanceOf[SortExec]),
      broadcasts = ns.count(_.isInstanceOf[BroadcastExchangeExec]),
      cartesians = ns.count(n => n.isInstanceOf[CartesianProductExec] ||
        n.isInstanceOf[BroadcastNestedLoopJoinExec]),
      scans = scans,
      // a window with NO partition spec funnels the whole input through
      // one task — the single-reducer sort that kills 100 TB jobs
      globalWindows = ns.count {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          w.partitionSpec.isEmpty
        case w: org.apache.spark.sql.execution.window
            .WindowGroupLimitExec => w.partitionSpec.isEmpty
        case _ => false
      },
      // ANY window — a partitioned window over FEW large strata (e.g.
      // per-language) is still one reducer per stratum; the partition
      // spec being non-empty is invisible to the globalWindows check,
      // so operators that promise a distributed rank pin windows == 0
      windows = ns.count(n =>
        n.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.window
            .WindowGroupLimitExec]))
  }

  /** The report as a DataFrame — joinable with run metadata, writable
    * next to job output for fleet-wide plan regression tracking.
    */
  def report(df: DataFrame): DataFrame = {
    val r = analyze(df)
    val spark = df.sparkSession
    import spark.implicits._
    val metrics = Seq(
      ("shuffles", r.shuffles.toLong, ""),
      ("sorts", r.sorts.toLong, ""),
      ("broadcast_exchanges", r.broadcasts.toLong, ""),
      ("cartesian_or_nested_loop", r.cartesians.toLong, ""),
      ("global_windows", r.globalWindows.toLong, ""),
      ("windows", r.windows.toLong, "")) ++
      r.scans.map(s => ("scan_columns_read", s.colsRead.toLong,
        s"${s.table}: ${s.colsRead}/${s.colsTotal}" +
          (if (s.unpruned) " UNPRUNED" else "")))
    metrics.toDF("metric", "value", "detail")
  }

  /** Scale-property budget for [[assertBudget]]. Defaults allow
    * everything except cartesian/nested-loop joins — the one shape
    * that is almost never survivable at 100 TB.
    */
  final case class Budget(maxShuffles: Int = Int.MaxValue,
                          maxSorts: Int = Int.MaxValue,
                          maxBroadcasts: Int = Int.MaxValue,
                          allowCartesian: Boolean = false,
                          allowUnprunedScan: Boolean = true,
                          allowGlobalWindow: Boolean = true,
                          maxWindows: Int = Int.MaxValue)

  /** Fail fast (IllegalStateException naming every violation, with the
    * offending plan attached) when the plan exceeds its budget. Run it
    * in CI on sf-tiny inputs — the plan shape, unlike the runtime, is
    * the same one the production scale gets.
    */
  def assertBudget(df: DataFrame, budget: Budget): Report = {
    val r = analyze(df)
    val violations = Seq(
      (r.shuffles > budget.maxShuffles) ->
        s"shuffles ${r.shuffles} > ${budget.maxShuffles}",
      (r.sorts > budget.maxSorts) ->
        s"sorts ${r.sorts} > ${budget.maxSorts}",
      (r.broadcasts > budget.maxBroadcasts) ->
        s"broadcast exchanges ${r.broadcasts} > ${budget.maxBroadcasts}",
      (!budget.allowCartesian && r.cartesians > 0) ->
        s"${r.cartesians} cartesian/nested-loop join(s)",
      (!budget.allowUnprunedScan && r.unprunedScans.nonEmpty) ->
        s"unpruned scan(s): ${r.unprunedScans.map(_.table).mkString(", ")}",
      (!budget.allowGlobalWindow && r.globalWindows > 0) ->
        (s"${r.globalWindows} global (no-partition) window(s) — " +
          "single-task sort of the whole input"),
      (r.windows > budget.maxWindows) ->
        s"windows ${r.windows} > ${budget.maxWindows}")
      .collect { case (true, msg) => msg }
    if (violations.nonEmpty)
      throw new IllegalStateException(
        s"plan budget violated: ${violations.mkString("; ")}\n" +
          df.queryExecution.executedPlan.toString().take(4000))
    r
  }
}
