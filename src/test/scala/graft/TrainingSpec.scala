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

  test("percentileGate keeps floor(n*pct/100) best per group with a " +
      "deterministic tiebreak") {
    import spark.implicits._
    // group a: scores 0..9 (10 rows); group b: all-tied scores (4 rows)
    val df = ((0L until 10L).map(i => (i, "a", i.toDouble)) ++
      (10L until 14L).map(i => (i, "b", 1.0))).toDF("id", "g", "sc")
    val got = Training.percentileGate(df, col("g"), col("sc"),
        col("id"), keepPct = 50)
      .select(col("id")).as[Long].collect().toSet
    // a: top 5 scores = ids 5..9; b: ties broken by id asc -> 10, 11
    assert(got == Set(5L, 6L, 7L, 8L, 9L, 10L, 11L))
    // keepPct 0 drops everything, 100 keeps everything
    assert(Training.percentileGate(df, col("g"), col("sc"),
      col("id"), 0).count() == 0)
    assert(Training.percentileGate(df, col("g"), col("sc"),
      col("id"), 100).count() == 14)
  }
}
