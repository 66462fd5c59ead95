package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe main (contents vary across sessions). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val qs = graft.SparkEntry.queries
    // drive PlanLint over shipped queries: report + budget assertion
    for (q <- Seq("q_join_dims", "r_bucketed_join", "x_skipping_scan")) {
      val df = qs(q)(spark, d)
      df.collect()
      println(s"== $q ==")
      graft.pipeline.PlanLint.report(df).show(20, truncate = false)
    }
    val agg = graft.queries.ParityQueries.t(spark, d, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
    agg.collect()
    val r = graft.pipeline.PlanLint.assertBudget(agg,
      graft.pipeline.PlanLint.Budget(maxShuffles = 1,
        allowUnprunedScan = false))
    println(s"budget ok: $r")
    spark.stop()
  }
}
