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
    val d = "/root/testdata/sf0.1"
    val qs = graft.SparkEntry.queries
    for (q <- Seq("x_cc_chain", "x_dedup_clusters", "x_embed_clusters")) {
      qs(q)(spark, d).count()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); qs(q)(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$q%-22s min=${times.min}%.2f  " +
        times.map(x => f"$x%.2f").mkString(" "))
    }
    spark.stop()
  }
}
