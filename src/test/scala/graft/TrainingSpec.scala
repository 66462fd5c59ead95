package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Training

class TrainingSpec extends SparkSuite {

  test("withPrefixSum matches the single-partition global window") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, (i * 7 + 3) % 13)).toDF("id", "v")
    val got = Training.withPrefixSum(df, Seq(col("id")), col("v"), "cum",
        parts = 7)
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    val expect = df.withColumn("cum", coalesce(
        sum(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  test("packBins: bins are contiguous in order and cut every budget") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, 10L)).toDF("id", "toks")
    val got = Training.packBins(df, Seq(col("id")), col("toks"), 25L)
      .select(col("id"), col("bin")).as[(Long, Long)].collect().sorted
    // 10 tokens each, budget 25: bins of sizes ceil — exclusive prefix
    // sums 0,10,20,30,... → bin = cum div 25 → 0,0,0,1,1,2,2,(2?)...
    assert(got.take(6).map(_._2).toSeq == Seq(0L, 0L, 0L, 1L, 1L, 2L))
    // bin ids non-decreasing in order
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted)
  }

  test("shuffleOrder: a permutation, deterministic across runs") {
    import spark.implicits._
    val df = (0L until 64L).toDF("id")
    val a = Training.shuffleOrder(df, col("id"))
      .select(col("id"), col("pos")).as[(Long, Long)].collect().toMap
    val b = Training.shuffleOrder(df, col("id"))
      .select(col("id"), col("pos")).as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.toSeq.sorted == (0L until 64L))
    // hash order must differ from natural order (else it's not a shuffle)
    assert((0L until 64L).exists(i => a(i) != i))
  }

  test("stratifiedEveryK keeps ceil(n/k) per stratum incl. rare strata") {
    import spark.implicits._
    val df = ((0L until 20L).map(i => (i, "big")) ++ Seq((100L, "rare")))
      .toDF("id", "g")
    val got = Training.stratifiedEveryK(df, col("g"), col("id"), 5)
      .groupBy(col("g")).count().as[(String, Long)].collect().toMap
    assert(got == Map("big" -> 4L, "rare" -> 1L))
  }
}
