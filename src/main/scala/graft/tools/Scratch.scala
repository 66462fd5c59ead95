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
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    graft.queries.ParityQueries.t(spark, "/root/testdata/sf0.01", "events")
      .withColumn("dt", to_date($"ts")).drop("ts")
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dimDir = java.nio.file.Files.createTempDirectory("dim").toString
    Seq(("2024-01-03", "target"), ("2024-01-05", "other"))
      .toDF("dt_s", "tag").select(to_date($"dt_s").as("dt"), $"tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    for (useStats <- Seq("true", "false")) {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", useStats)
      val joined = fact.join(dim.where($"tag" === "target"), Seq("dt"))
      val opt = joined.queryExecution.optimizedPlan.toString
      println(s"useStats=$useStats optHasDPP=" + opt.toLowerCase.contains("dynamicpruning"))
    }
    // also try with ns->date column already typed and a repartitioned dim (non-broadcast path off)
    spark.stop()
  }
}
