package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe main (contents vary across sessions). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.sql("""WITH RECURSIVE t(n) AS (
        SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 10)
        SELECT sum(n) AS s FROM t""").show()
      println("RECURSIVE-OK")
    } catch { case e: Throwable => println("RECURSIVE-FAIL " + e.getMessage.take(200)) }
    spark.stop()
  }
}
