package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe main (contents vary across sessions). */
object Scratch {
  def main(args: Array[String]): Unit = {
    // dump the LSH oracle SQL + run the Spark side for comparison
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/lsh_neardup.sql"),
      graft.queries.TrainingQueries.oracleSql("x_embed_lsh_neardup")
        .getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/lsh_clusters.sql"),
      graft.queries.TrainingQueries.oracleSql("x_embed_lsh_clusters")
        .getBytes("UTF-8"))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.01")) {
      val d = s"/root/testdata/sf$sf"
      graft.queries.TrainingQueries.queries("x_embed_lsh_neardup")(spark, d)
        .write.mode("overwrite").parquet("/tmp/lsh_neardup_spark")
      graft.queries.TrainingQueries.queries("x_embed_lsh_clusters")(spark, d)
        .write.mode("overwrite").parquet("/tmp/lsh_clusters_spark")
    }
    spark.stop()
  }
}
