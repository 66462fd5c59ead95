package graft.tools

import org.apache.spark.sql.SparkSession

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
    val d = "/root/testdata/sf0.1"
    val qs = graft.SparkEntry.queries
    for (q <- Seq("x_image_meta", "x_incremental_overwrite", "x_audio_meta",
        "x_video_meta", "x_decon_bloom", "x_line_dedup", "x_line_dedup_shuffle")) {
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        qs(q)(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $q%-24s " + times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
