package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt's built-in schema-test family as engine-native checks
  * (the reference wires `not_null` tests through `dbt build`,
  * `dbt/models/intermediate/_int_open_meteo.yml:10-16`; dbt also ships
  * unique / accepted_values / relationships — a replacement engine needs
  * all four).
  *
  * Each check returns the VIOLATING rows (empty = pass) so callers can
  * either `require(isEmpty)` like `dbt build`, or route violations to a
  * quarantine sink. All are single-pass, aggregation-shaped plans — no
  * collects.
  */
object Checks {

  final case class CheckResult(name: String, violations: Long) {
    def passed: Boolean = violations == 0
  }

  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.where(cols.map(col(_).isNull).reduce(_ || _))

  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_dups"))
      .where(col("n_dups") > 1)

  def acceptedValues(df: DataFrame, column: String,
                     values: Seq[String]): DataFrame =
    df.where(!col(column).isin(values: _*) || col(column).isNull)

  /** FK check: child keys with no parent (dbt `relationships`).
    * Broadcast-anti when the parent key set is small.
    */
  def relationships(child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String): DataFrame =
    child.where(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")

  /** dbt-build style gate: run all checks, fail fast with a summary. */
  def runAll(checks: Map[String, DataFrame]): Seq[CheckResult] = {
    val results = checks.toSeq.sortBy(_._1).map { case (name, bad) =>
      CheckResult(name, bad.limit(1000).count())
    }
    val failed = results.filterNot(_.passed)
    require(failed.isEmpty,
      s"schema checks failed: ${failed.map(r => s"${r.name}(${r.violations})").mkString(", ")}")
    results
  }
}
