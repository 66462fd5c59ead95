package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Checks
import graft.queries.ParityQueries.t

class ChecksRulesSpec extends SparkSuite {
  import spark.implicits._

  test("notNull / unique / acceptedValues / relationships checks") {
    val df = Seq((1L, "a", "X"), (2L, null: String, "Y"), (2L, "c", "Z"))
      .toDF("id", "name", "tag")
    assert(Checks.notNull(df, Seq("name")).count() == 1)
    assert(Checks.unique(df, Seq("id")).count() == 1)
    assert(Checks.acceptedValues(df, "tag", Seq("X", "Y")).count() == 1)
    val parent = Seq(1L, 2L).toDF("pid")
    val child = Seq(1L, 3L).toDF("cid")
    assert(Checks.relationships(child, "cid", parent, "pid")
      .as[Long].collect().toSeq == Seq(3L))
  }

  test("runAll passes on the real star schema's FK integrity") {
    val results = Checks.runAll(Map(
      "nation_fk_region" -> Checks.relationships(
        t(spark, sf0001, "nation"), "n_regionkey",
        t(spark, sf0001, "region"), "r_regionkey"),
      "customer_fk_nation" -> Checks.relationships(
        t(spark, sf0001, "customer"), "c_nationkey",
        t(spark, sf0001, "nation"), "n_nationkey"),
      "orders_pk_unique" -> Checks.unique(
        t(spark, sf0001, "orders"), Seq("o_orderkey")),
      "orders_not_null" -> Checks.notNull(
        t(spark, sf0001, "orders"), Seq("o_orderkey", "o_custkey"))))
    assert(results.forall(_.passed))
  }

  test("runAll fails fast with a summary on violations") {
    val dup = Seq(1L, 1L).toDF("k")
    val e = intercept[IllegalArgumentException] {
      Checks.runAll(Map("dup_check" -> Checks.unique(dup, Seq("k"))))
    }
    assert(e.getMessage.contains("dup_check"))
  }

  test("optimizer rule folds octet_length(encode(s, utf-8)) to octet_length(s)") {
    spark // init shared context
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      import s2.implicits._
      val df = Seq("héllo", "world").toDF("s")
        .select(octet_length(encode($"s", "UTF-8")).as("n"))
      val optimized = df.queryExecution.optimizedPlan.toString()
      assert(!optimized.contains("encode"), optimized)
      assert(df.as[Int].collect().sorted.toSeq == Seq(5, 6))
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
