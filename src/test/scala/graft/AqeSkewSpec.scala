package graft

import org.apache.spark.sql.functions._

/** AQE runtime re-planning: a skewed shuffle join gets its hot
  * partition split by OptimizeSkewedJoin (no manual salting needed —
  * `Skew.saltedJoin` remains for engines/paths where AQE can't see the
  * skew, e.g. aggregations).
  */
class AqeSkewSpec extends SparkSuite {
  import spark.implicits._

  test("AQE splits a skewed join partition (skew=true in final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // 100k rows on ONE key vs a uniform right side: the hot hash
      // partition dwarfs the others
      val left = spark.range(100000).select(lit(7L).as("k"),
        col("id").as("payload"))
        .union(spark.range(1000).select((col("id") % 100).as("k"),
          col("id").as("payload")))
      val right = spark.range(100).select(col("id").as("k"),
        (col("id") * 10).as("dim"))
      val joined = left.join(right, "k")
      // execute THIS dataset's queryExecution so AQE finalizes it
      // (count() would plan and execute a separate aggregate query)
      assert(joined.collect().length == 101000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
