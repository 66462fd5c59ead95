package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.Skew
import graft.queries.ParityQueries.t

/** Scale-layout evidence: salting equivalence, bucketed co-located joins
  * (no shuffle), partitioned writes with partition pruning.
  */
class ScaleLayoutSpec extends SparkSuite {
  import spark.implicits._

  test("saltedSumCount ≡ plain groupBy aggregation") {
    val li = t(spark, sf0001, "lineitem")
    val plain = li.groupBy($"l_returnflag".as("key"))
      .agg(sum($"l_quantity").as("sum_value"), count(lit(1)).as("n_rows"))
    val salted = Skew.saltedSumCount(li, $"l_returnflag",
      $"l_orderkey", $"l_quantity", salts = 8)
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("saltedJoin ≡ plain join") {
    val li = t(spark, sf0001, "lineitem").select($"l_orderkey", $"l_quantity")
    val o = t(spark, sf0001, "orders").select($"o_orderkey", $"o_totalprice")
    val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey",
      $"l_quantity", salts = 4)
      .select($"l_orderkey", $"l_quantity", $"o_orderkey", $"o_totalprice")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
  }

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force AQE final plan
    physicalNodes(df).count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("bucketed tables join without a shuffle") {
    val base = java.nio.file.Files.createTempDirectory("bkt").toString
    graft.operators.Layout.writeBucketed(
      t(spark, sf0001, "lineitem"), "b_lineitem", s"$base/lineitem",
      buckets = 8, bucketCols = Seq("l_orderkey"),
      sortCols = Seq("l_orderkey"))
    graft.operators.Layout.writeBucketed(
      t(spark, sf0001, "orders"), "b_orders", s"$base/orders",
      buckets = 8, bucketCols = Seq("o_orderkey"),
      sortCols = Seq("o_orderkey"))
    val joined = graft.operators.Layout.readBucketed(spark, "b_lineitem")
      .join(graft.operators.Layout.readBucketed(spark, "b_orders"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    // only the final single-key aggregation may shuffle — the join itself
    // must be co-located on bucket layout
    val joinOnly = spark.table("b_lineitem")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey",
        "inner")
      .where($"l_quantity" > 0)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(countShuffles(joinOnly) == 0)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert(joined.count() > 0)
  }

  test("the unbucketed twin of the same join shuffles BOTH sides") {
    // the contrast case licensing writeBucketed: identical join over
    // raw parquet pays one Exchange per side every run
    val li = t(spark, sf0001, "lineitem").select($"l_orderkey", $"l_quantity")
    val o = t(spark, sf0001, "orders").select($"o_orderkey", $"o_orderdate")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = li.join(o, $"l_orderkey" === $"o_orderkey")
        .where($"l_quantity" > 0)
      assert(countShuffles(j) == 2)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("appendBucketed: layout survives appends — the join is still " +
      "exchange-free and content is the union") {
    val base = java.nio.file.Files.createTempDirectory("bktapp").toString
    val orders = t(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_totalprice")
    graft.operators.Layout.writeBucketed(
      orders.where($"o_orderkey" % 2 === 0), "b_orders_app",
      s"$base/orders", buckets = 4, bucketCols = Seq("o_orderkey"))
    graft.operators.Layout.appendBucketed(
      orders.where($"o_orderkey" % 2 =!= 0), "b_orders_app",
      buckets = 4, bucketCols = Seq("o_orderkey"))
    val li = t(spark, sf0001, "lineitem").select($"l_orderkey")
    graft.operators.Layout.writeBucketed(li, "b_li_app",
      s"$base/lineitem", buckets = 4, bucketCols = Seq("l_orderkey"))
    // full content back: nothing lost or doubled by the append
    assert(spark.table("b_orders_app").count() == orders.count())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_li_app").join(spark.table("b_orders_app"),
        $"l_orderkey" === $"o_orderkey")
      assert(countShuffles(j) == 0)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("writeBucketed writes one file per bucket (sort-eliminating layout)") {
    val base = java.nio.file.Files.createTempDirectory("bkt1f").toString
    graft.operators.Layout.writeBucketed(
      t(spark, sf0001, "orders"), "b_orders_1f", s"$base/orders",
      buckets = 4, bucketCols = Seq("o_orderkey"),
      sortCols = Seq("o_orderkey"))
    val files = new java.io.File(s"$base/orders").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
    assert(files.length == 4, files.map(_.getName).mkString(","))
  }

  test("dynamic partition pruning: dim filter prunes the fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    t(spark, sf0001, "events")
      .withColumn("dt", to_date($"ts"))
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim must be file-backed with a filter on an INDEPENDENT data
    // column: a LocalRelation dim gets its filter constant-folded away
    // (ConvertToLocalRelation) before the PartitionPruning rule looks
    // for a selective predicate, and a filter expressible in dt would
    // be statically propagated — in both cases no DPP is needed
    val dimDir = java.nio.file.Files.createTempDirectory("dppdim").toString
    Seq(("2024-01-03", "target"), ("2024-01-05", "other"))
      .toDF("dt_s", "tag").select(to_date($"dt_s").as("dt"), $"tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "true")
    val joined = fact.join(dim.where($"tag" === "target"), Seq("dt"))
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("dynamicpruning"),
      plan.take(1200))
    assert(joined.count() > 0)
  }

  test("partitioned write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    t(spark, sf0001, "events")
      .withColumn("dt", to_date($"ts"))
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .where($"dt" === "2024-01-03")
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(pruned.count() > 0)
    // the file index must carry the partition filter, not a post-filter
    val explained = pruned.queryExecution.toString()
    assert(explained.contains("PartitionFilters") &&
      explained.contains("dt"), s"no partition pruning:\n$explained")
  }
}
