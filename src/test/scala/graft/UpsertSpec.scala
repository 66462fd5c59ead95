package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert

class UpsertSpec extends SparkSuite {
  import spark.implicits._

  test("mergeByKey: updates win, untouched carry over, new keys insert") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val updates = Seq((2L, "b2", 25.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val merged = Upsert.mergeByKey(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(merged == Seq((1L, "a", 10.0), (2L, "b2", 25.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("mergeIntoTable is idempotent across re-runs") {
    spark.sql("DROP TABLE IF EXISTS up_t")
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
      .write.saveAsTable("up_t")
    val updates = Seq((2L, 9.0), (3L, 3.0)).toDF("k", "v")
    val n1 = Upsert.mergeIntoTable(spark, "up_t", updates, Seq("k"))
    val n2 = Upsert.mergeIntoTable(spark, "up_t", updates, Seq("k"))
    assert(n1 == 3 && n2 == 3)
    val rows = spark.table("up_t").orderBy("k")
      .as[(Long, Double)].collect().toSeq
    assert(rows == Seq((1L, 1.0), (2L, 9.0), (3L, 3.0)))
  }
}
