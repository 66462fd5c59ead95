package graft.tools

import org.apache.spark.sql.SparkSession

/** One-line PlanLint report per shipped query — the calibration input
  * for QueryPlanBudgetSpec's budgets. Local tool, not a driver surface.
  */
object PlanSurvey {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val r = graft.pipeline.PlanLint.analyze(fn(spark, sfDir))
        println(f"PLAN $name%-28s shuffles=${r.shuffles}%2d " +
          f"sorts=${r.sorts}%2d bcasts=${r.broadcasts}%2d " +
          f"cartesians=${r.cartesians}%2d " +
          s"unpruned=${r.unprunedScans.map(_.table).mkString(",")}")
      } catch {
        case e: Throwable => println(s"PLAN $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
