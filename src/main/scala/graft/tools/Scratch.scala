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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 5)).toDF("id", "g")
    val w = org.apache.spark.sql.expressions.Window.orderBy($"id")
    val global = df.withColumn("rn", row_number().over(w))
    println(global.queryExecution.executedPlan.toString)
    println("nodes:")
    graft.pipeline.PlanLint.nodes(global)
      .foreach(n => println("  " + n.getClass.getName))
    println(graft.pipeline.PlanLint.analyze(global))
    spark.stop()
  }
}
