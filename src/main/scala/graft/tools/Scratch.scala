package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.queries.ParityQueries.t

/** Ad-hoc probe main (contents vary across sessions). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val e = t(spark, d, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = Similarity.bruteForcePairs(e, 0.42)
    q.explain("formatted")
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      q.count()
      println(f"neardup ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
