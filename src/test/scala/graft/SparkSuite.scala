package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite, UTC, small shuffle. */
trait SparkSuite extends AnyFunSuite {
  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(): Unit
  }

  lazy val spark: SparkSession = {
    // fresh warehouse per JVM: the metastore is in-memory but managed
    // table dirs persist on disk across runs and break saveAsTable
    rmrf(new java.io.File(
      s"/tmp/graft-warehouse-${getClass.getSimpleName}"))
    SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      s"/tmp/graft-warehouse-${getClass.getSimpleName}")
    .getOrCreate()
  }

  val sf0001 = "/root/testdata/sf0.001"

  /** Every physical node of an EXECUTED plan, descending into AQE query
    * stages — plain `plan.collect` stops at QueryStageExec leaves and
    * silently misses the exchanges inside them (a shuffle count taken
    * that way reads 0 on any adaptive plan). Delegates to the shipped
    * linter's traversal.
    */
  def physicalNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    graft.pipeline.PlanLint.nodes(df)
}
