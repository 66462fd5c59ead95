package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    import graft.operators.Curation
    val d = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(d + "/documents.parquet")

    // 1) bloom decon == exact decon
    val train = docs.where(col("doc_id") % 97 =!= 0)
    val ev = docs.where(col("doc_id") % 97 === 0)
    val exact = Curation.decontaminate(train, ev, col("doc_id"), col("text"), 3)
    val bloom = Curation.decontaminateBloom(train, ev, col("doc_id"), col("text"), 3)
    val diff = exact.as("a").join(bloom.as("b"), Seq("id"), "full_outer")
      .where(not(col("a.n_shared") <=> col("b.n_shared"))).count()
    println(s"BLOOM exact=${exact.count()} bloom=${bloom.count()} diff=$diff")
    // tiny sketch (heavy false positives) still exact
    val tiny = Curation.decontaminateBloom(train, ev, col("doc_id"), col("text"), 3,
      expectedGrams = 10L, numBits = 64L)
    val diff2 = exact.as("a").join(tiny.as("b"), Seq("id"), "full_outer")
      .where(not(col("a.n_shared") <=> col("b.n_shared"))).count()
    println(s"BLOOM tiny diff=$diff2")
    // empty eval
    println("BLOOM empty-eval rows=" + Curation.decontaminateBloom(
      train, ev.where(lit(false)), col("doc_id"), col("text"), 3).count())

    // 2) dropFrequentLines both arms
    val synth = docs.select(col("doc_id"),
      concat_ws("\n", col("text"), lit("subscribe to our newsletter"),
        when(col("doc_id") % 7 === 0, lit("follow us on social media"))
          .otherwise(concat(lit("doc "), col("doc_id"))),
        concat(lit("ref "), col("doc_id"))).as("text"))
    val narrow = Curation.dropFrequentLines(synth, col("doc_id"), col("text"), 20)
    val rel = Curation.dropFrequentLines(synth, col("doc_id"), col("text"), 20,
      inlineLimit = 0)
    val ld = narrow.as("a").join(rel.as("b"), Seq("id"), "full_outer")
      .where(not(col("a.text") <=> col("b.text"))).count()
    println(s"LINES narrow=${narrow.count()} rel=${rel.count()} diff=$ld")
    narrow.orderBy(col("id")).show(3, 200)
    spark.stop()
  }
}
