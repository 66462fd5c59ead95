package graft

import org.apache.spark.sql.functions._
import graft.pipeline.PlanLint
import graft.queries.ParityQueries.t

class PlanLintSpec extends SparkSuite {

  test("assertBudget flags a cartesian join and names it") {
    import spark.implicits._
    val a = (1 to 10).toDF("x")
    val b = (1 to 10).toDF("y")
    val cross = a.crossJoin(b)
    val ex = intercept[IllegalStateException] {
      PlanLint.assertBudget(cross, PlanLint.Budget())
    }
    assert(ex.getMessage.contains("cartesian"), ex.getMessage.take(200))
    // the same plan passes when explicitly allowed
    val r = PlanLint.assertBudget(cross,
      PlanLint.Budget(allowCartesian = true))
    assert(r.cartesians >= 1)
  }

  test("global (no-partition) windows are flagged; partitioned " +
      "windows pass") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 5)).toDF("id", "g")
    val w = org.apache.spark.sql.expressions.Window.orderBy($"id")
    val global = df.withColumn("rn", row_number().over(w))
    val ex = intercept[IllegalStateException] {
      PlanLint.assertBudget(global,
        PlanLint.Budget(allowGlobalWindow = false))
    }
    assert(ex.getMessage.contains("global"), ex.getMessage.take(200))
    val part = df.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy($"g")
        .orderBy($"id")))
    val r = PlanLint.assertBudget(part,
      PlanLint.Budget(allowGlobalWindow = false))
    assert(r.globalWindows == 0)
  }

  test("shuffle budget counts exchanges inside AQE stages") {
    val agg = t(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
    agg.collect() // finalize the adaptive plan
    val r = PlanLint.assertBudget(agg, PlanLint.Budget(maxShuffles = 1))
    assert(r.shuffles == 1, r.toString)
    val ex = intercept[IllegalStateException] {
      PlanLint.assertBudget(agg, PlanLint.Budget(maxShuffles = 0))
    }
    assert(ex.getMessage.contains("shuffles 1 > 0"))
  }

  test("unpruned full-width scans are reported; projected scans pass") {
    val wide = t(spark, sf0001, "lineitem") // all 16 columns
      .where(col("l_quantity") > 0)
    val narrow = t(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    assert(PlanLint.analyze(wide).unprunedScans.nonEmpty)
    assert(PlanLint.analyze(narrow).unprunedScans.isEmpty)
    intercept[IllegalStateException] {
      PlanLint.assertBudget(wide,
        PlanLint.Budget(allowUnprunedScan = false))
    }
    PlanLint.assertBudget(narrow,
      PlanLint.Budget(allowUnprunedScan = false)): Unit
  }

  test("report emits one row per metric plus one per scan") {
    val joined = t(spark, sf0001, "orders")
      .join(t(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"))
    val rep = PlanLint.report(joined)
    assert(rep.columns.toSeq == Seq("metric", "value", "detail"))
    val metrics = rep.select(col("metric"))
      .collect().map(_.getString(0)).toSeq
    assert(metrics.count(_ == "scan_columns_read") == 2)
    assert(Seq("shuffles", "sorts", "broadcast_exchanges",
      "cartesian_or_nested_loop").forall(metrics.contains))
  }

  test("a shipped bucketed query passes a zero-extra-shuffle budget") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("r_bucketed_join")(spark, sf0001)
      df.collect()
      // join + agg on the bucket key: only the presentation orderBy
      PlanLint.assertBudget(df, PlanLint.Budget(maxShuffles = 1)): Unit
    } finally spark.conf.set(
      "spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
