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
    val bc = qs("r_asof_broadcast")
    val win = qs("r_asof_broadcast_win")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val bcDf = bc(spark, d)
    bcDf.collect()
    val plan = bcDf.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    println("plan head:\n" + plan.linesIterator.take(8).mkString("\n"))
    println("WSCG over BroadcastAsOfJoin: " +
      plan.contains("*") + " / " +
      plan.linesIterator.exists(l => l.contains("BroadcastAsOfJoin")
        && l.contains("*")))
    win(spark, d).count()
    val times = (1 to 5).flatMap { _ =>
      val t0 = System.nanoTime(); bc(spark, d).count()
      val tb = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); win(spark, d).count()
      val tw = (System.nanoTime() - t1) / 1e9
      Seq(("bc", tb), ("win", tw))
    }
    val b = times.filter(_._1 == "bc").map(_._2)
    val w = times.filter(_._1 == "win").map(_._2)
    println(f"bc  min=${b.min}%.3f  ${b.map(x => f"$x%.2f").mkString(" ")}")
    println(f"win min=${w.min}%.3f  ${w.map(x => f"$x%.2f").mkString(" ")}")
    val nat = qs("r_asof_native")
    nat(spark, d).count()
    val n = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); nat(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"native min=${n.min}%.3f  ${n.map(x => f"$x%.2f").mkString(" ")}")
    spark.stop()
  }
}
