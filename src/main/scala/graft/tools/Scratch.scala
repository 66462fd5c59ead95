package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe main (contents vary across sessions). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val media = (0L until 48L).map(id =>
      (id, if (id % 11 == 0) graft.operators.Multimodal.syntheticMp4(id).take(12)
           else graft.operators.Multimodal.syntheticMp4(id - id % 4)))
      .toDF("media_id", "payload")
    val pairs = graft.operators.Multimodal
      .videoFrameDupPairs(media, frameBytes = 64, minShared = 1)
      .select($"id_a", $"id_b", $"shared_frames")
      .as[(Long, Long, Long)].collect()
    val (same, cross) = pairs.partition { case (a, b, _) =>
      a - a % 4 == b - b % 4 }
    println("SAMEBASE shared min/max: " + same.map(_._3).min + "/" + same.map(_._3).max)
    println("CROSS shared min/max: " + cross.map(_._3).min + "/" + cross.map(_._3).max)
    println("payload len: " + graft.operators.Multimodal.syntheticMp4(1).length)
    spark.stop()
  }
}
