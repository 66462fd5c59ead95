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
    assert(Layout.dataFileCount(spark, frag) >= 40)
    val n = Layout.compact(spark, frag, dest, filesOut = 4,
      clusterBy = Seq("id"))
    assert(n == 1000L)
    assert(Layout.dataFileCount(spark, dest) == 4)
    val before = spark.read.parquet(frag).as[(Long, String)]
      .collect().toSet
    val after = spark.read.parquet(dest).as[(Long, String)]
      .collect().toSet
    assert(after == before)
  }

  test("z-order rewrite tightens per-file ranges on BOTH dimensions; " +
      "linear sort only on its own") {
    import spark.implicits._
    val base = s"/tmp/graft-layout-${System.nanoTime()}"
    // 2-d uniform grid, row order scrambled
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle(
      (for (x <- 0L until 128L; y <- 0L until 128L) yield (x, y)).toVector)
    rows.toDF("x", "y").write.parquet(s"$base/raw")
    val n = Layout.compactZOrder(spark, s"$base/raw", s"$base/z",
      filesOut = 16, cols = Seq("x", "y"), bits = 8)
    assert(n == 128L * 128L)
    Layout.compact(spark, s"$base/raw", s"$base/linear",
      filesOut = 16, clusterBy = Seq("x"))
    def avgSpan(dir: String, c: String): Double = {
      val spans = Option(new java.io.File(dir).listFiles()).toSeq.flatten
        .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
        .map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min(col(c)), max(col(c))).head
          (r.getLong(1) - r.getLong(0)).toDouble
        }
      spans.sum / spans.size
    }
    // both dims clustered under z-order: per-file spans well under the
    // global 127; the linear sort leaves y spanning ~everything
    assert(avgSpan(s"$base/z", "x") < 64, s"zx=${avgSpan(s"$base/z", "x")}")
    assert(avgSpan(s"$base/z", "y") < 64, s"zy=${avgSpan(s"$base/z", "y")}")
    assert(avgSpan(s"$base/linear", "y") > 100,
      s"lin-y=${avgSpan(s"$base/linear", "y")}")
    // content preserved
    assert(spark.read.parquet(s"$base/z").as[(Long, Long)]
      .collect().toSet == rows.toSet)
  }

  test("footer-stats manifest: clustered layout makes narrow ranges " +
      "skippable; write-order layout is not") {
    import spark.implicits._
    val base = s"/tmp/graft-layout-${System.nanoTime()}"
    (0L until 10000L).map(i => ((i * 7919) % 10000, i))
      .toDF("k", "payload").write.parquet(s"$base/raw")
    Layout.compact(spark, s"$base/raw", s"$base/clustered", filesOut = 8,
      clusterBy = Seq("k"))
    val stats = graft.operators.Stats
      .parquetFileStats(spark, s"$base/clustered")
    // the manifest accounts for every row of the column
    assert(stats.where($"column" === "k")
      .agg(sum($"rows")).head.getLong(0) == 10000L)
    // a 1%-of-domain predicate skips (nearly) all clustered files —
    // range boundaries are sample-based, so allow one straddle
    val skipClustered = graft.operators.Stats
      .skippableFiles(spark, s"$base/clustered", "k", 0, 99).count()
    assert(skipClustered >= 6, s"clustered skippable: $skipClustered/8")
    // the same predicate skips nothing on the scrambled write order
    val skipRaw = graft.operators.Stats
      .skippableFiles(spark, s"$base/raw", "k", 0, 99).count()
    assert(skipRaw == 0, s"raw skippable: $skipRaw")
  }

  test("readSkipping reads only surviving files on a clustered layout " +
      "and is layout-independent in its result") {
    import spark.implicits._
    val base = s"/tmp/graft-layout-${System.nanoTime()}"
    (0L until 10000L).map(i => ((i * 7919) % 10000, i))
      .toDF("k", "payload").write.parquet(s"$base/raw")
    Layout.compact(spark, s"$base/raw", s"$base/clustered", filesOut = 8,
      clusterBy = Seq("k"))
    val expected = spark.read.parquet(s"$base/raw")
      .where($"k" >= 0 && $"k" <= 99).as[(Long, Long)].collect().toSet
    // clustered: at most the 1-2 straddling files are opened
    val pruned = graft.operators.Stats
      .readSkipping(spark, s"$base/clustered", "k", 0, 99)
    assert(pruned.inputFiles.length <= 2,
      s"clustered pruned scan opened ${pruned.inputFiles.length} files")
    assert(pruned.as[(Long, Long)].collect().toSet == expected)
    // write-order: nothing prunable, but the result is identical
    val full = graft.operators.Stats
      .readSkipping(spark, s"$base/raw", "k", 0, 99)
    assert(full.as[(Long, Long)].collect().toSet == expected)
    // every file pruned -> schema-preserving empty result
    val none = graft.operators.Stats
      .readSkipping(spark, s"$base/clustered", "k", 20000, 30000)
    assert(none.columns.toSeq == Seq("k", "payload"))
    assert(none.count() == 0)
  }

  test("readSkippingEq prunes a string-clustered layout down to the " +
      "matching category's files") {
    import spark.implicits._
    val base = s"/tmp/graft-layout-${System.nanoTime()}"
    val langs = Seq("de", "en", "es", "fr")
    val rnd = new scala.util.Random(7)
    rnd.shuffle((0L until 8000L).map(i => (i, langs((i % 4).toInt))))
      .toDF("id", "lang").write.parquet(s"$base/raw")
    Layout.compact(spark, s"$base/raw", s"$base/bylang", filesOut = 8,
      clusterBy = Seq("lang"))
    val expected = spark.read.parquet(s"$base/raw")
      .where($"lang" === "en").as[(Long, String)].collect().toSet
    val pruned = graft.operators.Stats
      .readSkippingEq(spark, s"$base/bylang", "lang", "en")
    // 4 uniform categories over 8 files: at most 2 boundary files
    // beyond the category's own 2
    assert(pruned.inputFiles.length <= 4,
      s"opened ${pruned.inputFiles.length} of 8 files")
    assert(pruned.inputFiles.length < 8)
    assert(pruned.as[(Long, String)].collect().toSet == expected)
    // absent category -> everything prunable on the clustered layout
    val none = graft.operators.Stats
      .readSkippingEq(spark, s"$base/bylang", "lang", "zz")
    assert(none.count() == 0)
  }

  test("footer-stats manifest lists partitioned layouts recursively") {
    import spark.implicits._
    val base = s"/tmp/graft-layout-${System.nanoTime()}"
    (0L until 1000L).map(i => (i % 4, i))
      .toDF("dt", "v").write.partitionBy("dt").parquet(s"$base/part")
    val stats = graft.operators.Stats.parquetFileStats(spark, s"$base/part")
    assert(stats.where($"column" === "v")
      .agg(sum($"rows")).head.getLong(0) == 1000L)
  }

  test("compactZOrder fails descriptively on an all-null z-order column") {
    import spark.implicits._
    val base = s"/tmp/graft-layout-${System.nanoTime()}"
    Seq((1L, None: Option[Double]), (2L, None))
      .toDF("id", "zc").write.parquet(s"$base/raw")
    val ex = intercept[IllegalArgumentException] {
      Layout.compactZOrder(spark, s"$base/raw", s"$base/z",
        filesOut = 2, cols = Seq("zc", "id"))
    }
    assert(ex.getMessage.contains("zc"), ex.getMessage)
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
