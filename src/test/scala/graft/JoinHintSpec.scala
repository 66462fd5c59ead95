package graft

import org.apache.spark.sql.functions._
import graft.queries.ParityQueries.t

/** Join-strategy control: at 100 TB the optimizer's size estimates are
  * sometimes wrong (post-filter selectivity, UDF-opaque columns); the
  * hint surface must reliably override the physical strategy.
  */
class JoinHintSpec extends SparkSuite {

  private def planOf(hint: Option[String]): String = {
    val li = t(spark, sf0001, "lineitem")
    val ord = t(spark, sf0001, "orders")
    val o = hint.map(ord.hint(_)).getOrElse(ord)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString()
  }

  test("broadcast / merge / shuffle_hash hints pick their physical join") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(planOf(Some("broadcast")).contains("BroadcastHashJoin"))
      assert(planOf(Some("merge")).contains("SortMergeJoin"))
      assert(planOf(Some("shuffle_hash")).contains("ShuffledHashJoin"))
      // and without a hint, the disabled threshold forces a shuffle join
      val bare = planOf(None)
      assert(!bare.contains("BroadcastHashJoin"), bare.take(400))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
