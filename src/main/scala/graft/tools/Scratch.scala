package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.ParityQueries.t

/** Ad-hoc probe main (contents vary across sessions). */
object Scratch {
  def main(args: Array[String]): Unit = {
    for (aqe <- Seq("true", "false")) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.ui.enabled", "false")
        .appName(s"scratch-$aqe")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val d = "/root/testdata/sf0.1"
      val q = Dedup.ngramJaccardPairs(t(spark, d, "documents"),
          col("doc_id"), col("text"), n = 3, leftFilter = _ < 100)
        .orderBy(col("jac").desc, col("da"), col("db")).limit(20)
      q.count()
      val plan = q.queryExecution.executedPlan.toString
      println(s"aqe=$aqe scans=" + "FileScan".r.findAllIn(plan).length +
        " reused=" + "ReusedExchange".r.findAllIn(plan).length)
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        q.count()
        println(f"aqe=$aqe run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
  }
}
