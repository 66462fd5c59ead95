package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import scala.collection.mutable

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer[(Int, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.taskMetrics.jvmGCTime, si.taskMetrics.executorCpuTime / 1000000))
      }
    })
    val d = "/root/testdata/sf0.1"
    val pre = Seq("x_approx_distinct","x_cosine_ann","x_cosine_topk",
      "x_dedup_exact","x_dedup_keep_first","x_fingerprint","x_lang_id")
    pre.foreach { q => (1 to 3).foreach { _ =>
      SparkEntry.queries(q)(spark, d).count() } }
    def time(tag: String)(f: => Long): Unit = {
      stages.clear()
      val t0 = System.nanoTime(); val n = f
      val wall = (System.nanoTime()-t0)/1e9
      val stageSum = stages.map(_._2).sum
      val gcSum = stages.map(_._3).sum
      val cpuSum = stages.map(_._4).sum
      println(f"$tag: wall=$wall%.2f s stageSum=${stageSum}ms gc=${gcSum}ms cpu=${cpuSum}ms driverGap=${(wall*1000-stageSum).toInt}ms")
      stages.sortBy(-_._2).take(4).foreach { case (id, dur, gc, cpu) =>
        println(f"   stage $id%4d dur=${dur}ms gc=${gc}ms cpu=${cpu}ms")
      }
    }
    for (i <- 1 to 3)
      time(s"x_minhash_pairs #$i")(SparkEntry.queries("x_minhash_pairs")(spark, d).count())
    spark.stop()
  }
}
