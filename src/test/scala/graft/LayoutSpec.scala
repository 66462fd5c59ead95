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

  test("persisted manifest: incremental refresh reads footers only " +
      "for NEW files, drops vanished ones, and prunes reads") {
    import spark.implicits._
    val base = s"/tmp/graft-layout-${System.nanoTime()}"
    val dir = s"$base/data"
    val mp = s"$base/manifest"
    // batch 1: two clustered files over k=0..4999 / 5000..9999
    (0L until 10000L).map(i => (i, i * 2))
      .toDF("k", "payload").repartitionByRange(2, $"k")
      .write.parquet(dir)
    graft.operators.Stats.writeManifest(spark, dir, mp)
    val m1 = spark.read.parquet(mp)
    val files1 = m1.select($"file").distinct().as[String].collect().toSet
    assert(files1.size == 2)
    // materialize BEFORE the refresh overwrites the manifest files
    val victimRows1 = m1.where($"file" === files1.head &&
      $"column" === "k").select($"rows").as[Long].collect().toSeq
    // overwrite one existing data file IN PLACE with different content
    // (violating immutability on purpose): a refresh must NOT re-read
    // it — name-keyed carry-over is the proof of incrementality
    val victim = files1.head
    val tmpSmall = s"$base/small"
    Seq((999999L, 0L)).toDF("k", "payload").coalesce(1)
      .write.parquet(tmpSmall)
    val smallPart = new java.io.File(tmpSmall).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    java.nio.file.Files.copy(smallPart,
      java.nio.file.Paths.get(new java.net.URI(victim)),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // append batch 2: new file over k=20000..20999
    (20000L until 21000L).map(i => (i, i)).toDF("k", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    graft.operators.Stats.refreshManifest(spark, dir, mp)
    val m2 = spark.read.parquet(mp)
    // carried verbatim: the overwritten file still shows its ORIGINAL
    // stats (footer not re-read), so rows for k still sum to 10000+1000
    val oldRows = m2.where($"file" === victim && $"column" === "k")
      .select($"rows").as[Long].collect()
    assert(oldRows.toSeq == victimRows1)
    val files2 = m2.select($"file").distinct().as[String].collect().toSet
    assert(files2.size == 3 && files1.subsetOf(files2))
    // vanished files drop out on the next refresh
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(new java.net.URI(victim)))
    graft.operators.Stats.refreshManifest(spark, dir, mp)
    val files3 = spark.read.parquet(mp).select($"file").distinct()
      .as[String].collect().toSet
    assert(files3 == files2 - victim)
    // manifest-routed read prunes: k in [20000, 20999] touches ONLY
    // the appended file (both remaining batch-1 ranges are disjoint)
    val pruned = graft.operators.Stats.readSkippingManifest(
      spark, dir, "k", 20000.0, 20999.0, mp)
    assert(pruned.inputFiles.length == 1,
      s"expected 1 file, read ${pruned.inputFiles.length}")
    assert(pruned.count() == 1000L)
    // a file the manifest does not cover is NEVER pruned: append one
    // more batch without refreshing — its rows still arrive
    (30000L until 30100L).map(i => (i, i)).toDF("k", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    val unseen = graft.operators.Stats.readSkippingManifest(
      spark, dir, "k", 30000.0, 30099.0, mp)
    assert(unseen.count() == 100L)
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

  test("compaction + refreshManifest: rewritten layout swaps into the " +
      "manifest atomically from the consumer's view; pruning follows " +
      "the NEW clustering") {
    import spark.implicits._
    val base = s"/tmp/graft-layout-${System.nanoTime()}"
    val dir = s"$base/t"
    val mp = s"$base/manifest"
    // scrambled write order: nothing prunable
    (0L until 10000L).map(i => ((i * 7919) % 10000, i))
      .toDF("k", "payload").repartition(8).write.parquet(dir)
    graft.operators.Stats.writeManifest(spark, dir, mp)
    assert(graft.operators.Stats
      .skippableFilesFrom(spark.read.parquet(mp), "k", 0, 99)
      .count() == 0)
    // OPTIMIZE: compact in place (write clustered to a side dir, swap)
    val side = s"$base/side"
    Layout.compact(spark, dir, side, filesOut = 8, clusterBy = Seq("k"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.rename(new org.apache.hadoop.fs.Path(side),
      new org.apache.hadoop.fs.Path(dir))
    spark.catalog.refreshByPath(dir)
    // one refresh: every old file dropped, every new file added
    graft.operators.Stats.refreshManifest(spark, dir, mp)
    val m = spark.read.parquet(mp)
    assert(m.where($"column" === "k").agg(sum($"rows")).head.getLong(0)
      == 10000L)
    // pruning now follows the clustered layout: a 1% predicate opens
    // at most the straddling file(s)
    val pruned = graft.operators.Stats.readSkippingManifest(
      spark, dir, "k", 0, 99, mp)
    assert(pruned.inputFiles.length <= 2,
      s"opened ${pruned.inputFiles.length}")
    assert(pruned.count() == 100L)
  }

  test("readSkippingAndManifest: on a z-ordered layout BOTH conjuncts " +
      "prune files; result equals the plain conjunctive filter") {
    import spark.implicits._
    val base = s"/tmp/graft-layout-${System.nanoTime()}"
    val rnd = new scala.util.Random(13)
    val rows = rnd.shuffle(
      (for (x <- 0L until 128L; y <- 0L until 128L) yield (x, y)).toVector)
    rows.toDF("x", "y").write.parquet(s"$base/raw")
    Layout.compactZOrder(spark, s"$base/raw", s"$base/z",
      filesOut = 16, cols = Seq("x", "y"), bits = 8): Unit
    val mp = s"$base/manifest"
    graft.operators.Stats.writeManifest(spark, s"$base/z", mp)
    val stats = spark.read.parquet(mp)
    // an eighth-of-domain square: each single dimension prunes files
    // on the z layout (per-file hyper-rectangles), and the union
    // strictly beats either alone
    def skips(c: String) = graft.operators.Stats
      .skippableFilesFrom(stats, c, 0, 15).select("file")
      .as[String].collect().toSet
    val (sx, sy) = (skips("x"), skips("y"))
    assert(sx.nonEmpty && sy.nonEmpty, s"x=${sx.size} y=${sy.size}")
    assert((sx ++ sy).size > math.max(sx.size, sy.size))
    val nFiles = Layout.dataFileCount(spark, s"$base/z")
    val pruned = graft.operators.Stats.readSkippingAndManifest(spark,
      s"$base/z", Seq(("x", 0, 15), ("y", 0, 15)), mp)
    // opens exactly the non-skippable files — fewer than either
    // single-dimension prune would leave
    assert(pruned.inputFiles.length == nFiles - (sx ++ sy).size)
    assert(pruned.inputFiles.length < nFiles - math.max(sx.size, sy.size))
    assert(pruned.as[(Long, Long)].collect().toSet ==
      (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)).toSet)
  }
}
