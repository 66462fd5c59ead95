package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSuite {

  test("compact collapses a fragmented table and preserves content") {
    import spark.implicits._
    val base = s"/tmp/graft-layout-${System.nanoTime()}"
    val frag = s"$base/frag"
    val dest = s"$base/compact"
    // simulate 40 micro-batch appends of 25 rows each
    (0 until 40).foreach { b =>
      (0 until 25).map(i => (b * 25L + i, s"v${b * 25 + i}"))
        .toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(frag)
    }
    assert(Layout.dataFileCount(frag) >= 40)
    val n = Layout.compact(spark, frag, dest, filesOut = 4,
      clusterBy = Seq("id"))
    assert(n == 1000L)
    assert(Layout.dataFileCount(dest) == 4)
    val before = spark.read.parquet(frag).as[(Long, String)]
      .collect().toSet
    val after = spark.read.parquet(dest).as[(Long, String)]
      .collect().toSet
    assert(after == before)
  }

  test("clustered rewrite enables row-group skipping on range scans") {
    import spark.implicits._
    val base = s"/tmp/graft-layout-${System.nanoTime()}"
    val dest = s"$base/clustered"
    (0L until 10000L).map(i => ((i * 7919) % 10000, i))
      .toDF("k", "payload").write.parquet(s"$base/raw")
    Layout.compact(spark, s"$base/raw", dest, filesOut = 8,
      clusterBy = Seq("k"))
    // range-clustered: each file covers a disjoint k range, so a
    // narrow predicate reads back correctly and the scan pushes it
    val scan = spark.read.parquet(dest).where(col("k") < 100)
    assert(scan.count() == 100)
    assert(scan.queryExecution.executedPlan.toString
      .contains("PushedFilters: [IsNotNull(k), LessThan(k,100)"))
  }
}
