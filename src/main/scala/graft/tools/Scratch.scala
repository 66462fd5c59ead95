package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe main (contents vary across sessions). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val e = graft.queries.ParityQueries.t(spark, d, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val cents = graft.operators.Similarity.fitCentroids(e, k = 16, iters = 3)
      val exact = graft.operators.Similarity.bruteForcePairs(e, 0.42)
        .count()
      for (p <- Seq(1, 2, 3, 4)) {
        val found = graft.operators.Dedup.semDedupPairs(e, cents, 0.42,
          probes = p).count()
        println(s"SEMDEDUP $sf probes=$p found=$found exact=$exact")
      }
    }
    spark.stop()
  }
}
