package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
    val li = t(spark, d, "lineitem")

    // window form (current q_argmax_lineitem shape)
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_quantity").desc, col("l_linenumber").desc)
    val windowForm = li
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

    // algebraic form: max_by with a composite ordering struct
    val maxbyForm = li.groupBy(col("l_orderkey"))
      .agg(max_by(
        struct(col("l_linenumber"), col("l_quantity")),
        struct(col("l_quantity"), col("l_linenumber"))).as("m"))
      .select(col("l_orderkey"), col("m.l_linenumber"), col("m.l_quantity"))

    for ((name, df) <- Seq(("window", windowForm), ("maxby", maxbyForm))) {
      df.count() // warm
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.count()
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
