package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Stats}

/** File-accounting for the graph incremental stores: a batch's store
  * scan must OPEN strictly fewer files than the store holds (footer
  * manifests over the id-/comp-clustered layouts), while results stay
  * ≡ from-scratch — the BandedStoreSpec contract applied to the
  * triangle, k-core, and CC stores.
  */
class GraphStorePruneSpec extends SparkSuite {
  import spark.implicits._

  private def allStoreFiles(dir: String): Seq[String] = {
    val dirs = Stats.committedViewDirs(spark, dir)
    dirs.flatMap { d =>
      val p = new java.io.File(new java.net.URI(
        if (d.startsWith("file:")) d else "file://" + d).getPath)
      p.listFiles().filter(f => f.getName.endsWith(".parquet") &&
        f.length() > 0).map(_.toString)
    }
  }

  private def keptFor(dir: String, key: String,
                      probes: org.apache.spark.sql.DataFrame): Seq[String] =
    Stats.touchedKeysKeptFilesUnder(spark,
      Stats.committedViewDirs(spark, dir), dir + "_manifest", key, probes)

  test("triangle store: a narrow batch opens strictly fewer store " +
      "files than the store holds; counts stay ≡ from-scratch") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-triprune-").toString + "/tri"
    // 20 disjoint triangles spread over ids 0..59, clustered into 8
    // id-ranged files
    val oldE = (0 until 20).flatMap { i =>
      val (x, y, z) = (3L * i, 3L * i + 1, 3L * i + 2)
      Seq((x, y), (y, z), (x, z))
    }
    Graph.writeTriangleStore(oldE.toDF("a", "b"), col("a"), col("b"),
      dir, filesOut = 8)
    val total = allStoreFiles(dir)
    assert(total.size >= 8, s"fixture wants a multi-file store: $total")
    // batch touches only the LOW end of the id range: edges 0-3 and
    // 0-4 close triangle (0, 3, 4) through old edge 3-4
    val new1 = Seq((0L, 3L), (0L, 4L))
    val probes = Seq(0L, 3L, 4L).toDF("id")
    val kept = keptFor(dir, "id", probes)
    assert(kept.size < total.size,
      s"pruned scan must skip files: kept ${kept.size} of ${total.size}")
    val all1 = oldE ++ new1
    val got = Graph.triangleCountsIncremental(all1.toDF("a", "b"),
        col("a"), col("b"), new1.toDF("a", "b"), col("a"), col("b"),
        dir, batchId = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Graph.triangleCounts(all1.toDF("a", "b"), col("a"),
        col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got(0L) == 2L && got(3L) == 2L && got(4L) == 2L
      && got(59L) == 1L)
    // the store append refreshed the manifest footer-only: the new
    // batch's files are covered too (prunable on the next round)
    val keptAfter = keptFor(dir, "id", Seq(59L).toDF("id"))
    assert(keptAfter.size < allStoreFiles(dir).size)
  }

  test("k-core store: membership probes open strictly fewer files " +
      "than the store holds; members stay ≡ from-scratch") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kcprune-").toString + "/kc"
    // 8 disjoint K4s over ids 0..59 (every node a 3-core member),
    // clustered into 8 id-ranged files
    val oldE = (0 until 8).flatMap { i =>
      val ids = (0 until 4).map(j => 8L * i + j)
      for (x <- ids; y <- ids if x < y) yield (x, y)
    }
    Graph.writeKCoreStore(oldE.toDF("a", "b"), col("a"), col("b"),
      k = 3, dir, filesOut = 8)
    val total = allStoreFiles(dir)
    assert(total.size >= 8, s"fixture wants a multi-file store: $total")
    // batch attaches node 100 to K4 #0 with degree 3 → flips in; the
    // compute's membership probes stay in the low id range
    val new1 = Seq((0L, 100L), (1L, 100L), (2L, 100L))
    val probes = Seq(0L, 1L, 2L, 100L).toDF("id")
    val kept = keptFor(dir, "id", probes)
    assert(kept.size < total.size,
      s"pruned scan must skip files: kept ${kept.size} of ${total.size}")
    val all1 = oldE ++ new1
    // both regimes, same batch id (overwrite-idempotent retries):
    // first the default SMALL arm (staged member set, zero per-round
    // prune jobs), then the forced BIG arm (per-probe manifest-pruned
    // reads — the 100 TB shape this spec exists to exercise)
    def inc(ssb: Long): Set[Long] =
      Graph.kCoreIncremental(all1.toDF("a", "b"), col("a"),
          col("b"), new1.toDF("a", "b"), col("a"), col("b"), k = 3, dir,
          batchId = 1L, smallStoreBytes = ssb)
        .as[Long].collect().toSet
    val want = Graph.kCore(all1.toDF("a", "b"), col("a"), col("b"),
        k = 3)
      .as[Long].collect().toSet
    val gotSmall = inc(32L << 20)
    val gotBig = inc(0L)
    assert(gotSmall == want && gotBig == want)
    assert(want.contains(100L) && want.size == 33)
  }

  test("CC store: the losers lookup probes the comp-clustered " +
      "projection (strictly fewer files) and confirms through the " +
      "id store; compaction folds the projection's stale rows away") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ccprune-").toString + "/cc"
    val byComp = dir + "_bycomp"
    // 32 two-node components (2i, 2i+1) — comp label 2i — clustered
    // into 8 files in BOTH layouts
    val oldE = (0 until 32).map(i => (2L * i, 2L * i + 1))
    Graph.writeCCStore(oldE.toDF("a", "b"), col("a"), col("b"), dir,
      filesOut = 8)
    val totalId = allStoreFiles(dir)
    val totalComp = allStoreFiles(byComp)
    assert(totalId.size >= 8 && totalComp.size >= 8,
      s"fixture wants multi-file stores: $totalId / $totalComp")
    // batch 1: bridge 0-2 → comp 2 loses to comp 0; the loser-comp
    // probe opens only comp-2-range projection files, the confirm
    // opens only id-{2,3}-range store files
    val keptProj = keptFor(byComp, "comp", Seq(2L).toDF("comp"))
    assert(keptProj.size < totalComp.size,
      s"projection probe must skip files: ${keptProj.size} of " +
        s"${totalComp.size}")
    val keptId = keptFor(dir, "id", Seq(2L, 3L).toDF("id"))
    assert(keptId.size < totalId.size)
    // forced BIG regime: the projection-probe + manifest arms are
    // what this spec exercises (the default small regime reads the
    // store whole; its equality is pinned below via an idempotent
    // batch-1 retry)
    def inc(nw: Seq[(Long, Long)], bid: Long,
            ssb: Long = 0L): Map[Long, Long] =
      Graph.connectedComponentsIncremental(nw.toDF("a", "b"), col("a"),
          col("b"), dir, bid, smallStoreBytes = ssb)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
      Graph.connectedComponents(edges.toDF("a", "b"), col("a"),
          col("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val new1 = Seq((0L, 2L))
    // small regime first, then the big-arm retry of the SAME batch —
    // overwrite-idempotent, so both regimes must answer identically
    val got1Small = inc(new1, 1L, ssb = 32L << 20)
    val got1 = inc(new1, 1L)
    assert(got1 == cc(oldE ++ new1) && got1Small == got1)
    // the projection mirrored the delta: comp-0 rows now include the
    // relabeled ids 2 and 3
    val projRows = spark.read
      .parquet(Stats.committedViewDirs(spark, byComp): _*)
      .select("id", "comp").as[(Long, Long)].collect().toSet
    assert(projRows.contains((2L, 0L)) && projRows.contains((3L, 0L)))
    // batch 2 merges ANOTHER component into comp 0 through the
    // relabeled node 3 — the projection's comp-2 rows for ids 2, 3
    // are now STALE, and comp 2 can never be probed again (no current
    // members); the multi-batch projection union still finds comp 50's
    // members exactly
    val new2 = Seq((3L, 50L))
    val got2 = inc(new2, 2L)
    assert(got2 == cc(oldE ++ new1 ++ new2))
    assert(got2(50L) == 0L && got2(51L) == 0L)
    // OPTIMIZE: both stores fold; the projection's stale (2→2, 3→2)
    // rows are evicted by the per-id newest-wins fold
    assert(Graph.compactCCStore(spark, dir).contains(2L))
    val folded = spark.read
      .parquet(Stats.committedViewDirs(spark, byComp): _*)
      .select("id", "comp").as[(Long, Long)].collect().toSet
    assert(!folded.contains((2L, 2L)) && !folded.contains((3L, 2L)))
    assert(folded.contains((50L, 0L)) && folded.contains((2L, 0L)))
    // and a post-compaction batch still answers ≡ from-scratch
    val new3 = Seq((51L, 8L))
    val got3 = inc(new3, 3L)
    assert(got3 == cc(oldE ++ new1 ++ new2 ++ new3))
  }
}
