package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.queries.ParityQueries.t

/** Ad-hoc probe main (contents vary across sessions). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val e = t(spark, d, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = e.where(col("id") < 10)
      val bf = Similarity.bruteForceTopK(q, e, k = 5).select(col("qa"), col("vb"))
      for ((tables, mp) <- Seq((8, 1), (12, 1), (16, 1))) {
        val ann = Similarity.lshTopK(q, e, k = 5, planes = 8,
          tables = tables, multiprobe = mp).select(col("qa"), col("vb"))
        val hits = bf.join(ann, Seq("qa", "vb"))
          .groupBy(col("qa")).agg(count(lit(1)).as("hits"))
          .orderBy(col("qa")).collect()
          .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
        println(s"sf=$sf tables=$tables mp=$mp  $hits")
      }
    }
    spark.stop()
  }
}
