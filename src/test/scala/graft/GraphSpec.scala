package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends SparkSuite {

  test("connectedComponents: two components + a chain resolve to min ids") {
    import spark.implicits._
    // component {1,2,3,4} as a chain (diameter 3 — forces >1 round),
    // component {10, 11}, self-loop 20-20 (dropped: no edges to others)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 20L))
      .toDF("a", "b")
    val got = Graph.connectedComponents(edges, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: long path converges (diameter > 3)") {
    import spark.implicits._
    val n = 12L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == n.toInt && got.values.forall(_ == 1L))
  }

  test("connectedComponents: labels near Long.MaxValue don't overflow " +
      "the convergence sum") {
    import spark.implicits._
    // A Long sum over these ids wraps; the decimal(38,0) convergence
    // aggregate must still detect the fixpoint (and under ANSI mode a
    // Long sum would throw instead — either way, a regression fails).
    val m = Long.MaxValue
    val edges = Seq((m, m - 1), (m - 1, m - 2), (m - 5, m - 6))
      .toDF("a", "b")
    val got = Graph.connectedComponents(edges, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(m -> (m - 2), (m - 1) -> (m - 2), (m - 2) -> (m - 2),
      (m - 5) -> (m - 6), (m - 6) -> (m - 6)))
  }

  test("star contraction: 1024-chain converges in <= log2(n) rounds " +
      "with correct labels") {
    import spark.implicits._
    val n = 1024L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Graph.starRounds(edges, col("a"), col("b"))
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == n.toInt && got.values.forall(_ == 1L))
    assert(rounds <= 10, s"took $rounds rounds on a 1024-chain") // log2
  }

  test("star contraction: mixed components, ids near Long.MaxValue") {
    import spark.implicits._
    val m = Long.MaxValue
    val edges = (Seq((m, m - 1), (m - 1, m - 2)) ++ // chain at the top
      (1L until 50L).map(i => (i, i + 1)) ++        // 50-chain
      Seq((100L, 200L), (200L, 100L), (300L, 300L)) // dup edge + self
      ).toDF("a", "b")
    val got = Graph.connectedComponentsStar(edges, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    assert((1L to 50L).forall(got(_) == 1L))
    assert(got(m) == m - 2 && got(m - 1) == m - 2 && got(m - 2) == m - 2)
    assert(got(100L) == 100L && got(200L) == 100L)
    assert(!got.contains(300L)) // self-loop only ⇒ isolated, not emitted
  }

  test("hybrid: propagation hands a long chain to star contraction " +
      "and labels stay exact") {
    import spark.implicits._
    val n = 300L
    val edges = ((1L until n).map(i => (i, i + 1)) ++
      Seq((5000L, 6000L))).toDF("a", "b")
    val got = Graph.connectedComponents(edges, col("a"), col("b"),
        switchAfter = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.size == n.toInt + 2)
    assert((1L to n).forall(got(_) == 1L))
    assert(got(5000L) == 5000L && got(6000L) == 5000L)
  }

  test("maxIter <= switchAfter: clamped star budget — exact labels or a " +
      "loud failure, never silent duplicates") {
    import spark.implicits._
    // 64-chain, budget exhausted mid-propagation: the star fallback
    // used to get 0 rounds and label straight off unconverged edges
    // (duplicate ids with conflicting comps)
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    try {
      val rows = Graph.connectedComponents(edges, col("a"), col("b"),
          maxIter = 3, switchAfter = 3)
        .as[(Long, Long)].collect()
      assert(rows.map(_._1).distinct.length == rows.length,
        "duplicate vertex ids emitted")
      assert(rows.length == 64 && rows.forall(_._2 == 1L))
    } catch {
      case e: IllegalArgumentException =>
        assert(e.getMessage.contains("not converged"), e.getMessage)
    }
  }

  test("reliable-checkpoint mode: same labels under a set checkpoint " +
      "dir, superseded round files deleted") {
    import spark.implicits._
    val edges = ((1L until 120L).map(i => (i, i + 1)) ++
      Seq((500L, 600L))).toDF("a", "b")
    val plain = Graph.connectedComponents(edges, col("a"), col("b"))
      .as[(Long, Long)].collect().toMap
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    try {
      val reliable = Graph.connectedComponents(edges, col("a"), col("b"))
        .as[(Long, Long)].collect().toMap
      assert(reliable == plain)
      // the reliable path actually engaged...
      val ckRoot = new java.io.File(ckDir).listFiles().head
      val rddDirs = Option(ckRoot.listFiles()).toSeq.flatten
        .filter(_.getName.startsWith("rdd-"))
      assert(rddDirs.nonEmpty, "no reliable checkpoints written")
      // ...and superseded rounds were deleted, not accumulated (the
      // chain forces several propagation rounds plus the star fallback)
      assert(rddDirs.length <= 4,
        s"leaked checkpoints: ${rddDirs.map(_.getName).mkString(",")}")
    } finally
      // unset (Option(null) = None) — the context is shared across
      // suites and must not leak reliable mode into later tests
      spark.sparkContext.setCheckpointDir(null)
  }

  test("dedupClusters: keep flag marks exactly the min member") {
    import spark.implicits._
    val edges = Seq((5L, 6L), (6L, 7L), (9L, 8L)).toDF("a", "b")
    val got = Graph.dedupClusters(edges, col("a"), col("b"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((5L, 5L, true), (6L, 5L, false), (7L, 5L, false),
      (8L, 8L, true), (9L, 8L, false)))
  }

  test("hits: hand-computed scaled-integer hubs/authorities; " +
      "deterministic under repartitioning") {
    import spark.implicits._
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val got = Graph.hits(edges, col("s"), col("d"), iters = 5)
      .as[(Long, Long, Long)].collect().toSet
    // pure hubs 1,2 at full scale; 3 is the sole authority (max-
    // normalized to scale); the 3->4 tail halves per half-step:
    // after 5 rounds hub(3) = auth(4) = scale / 32
    val s = 1000000L
    assert(got == Set((1L, s, 0L), (2L, s, 0L),
      (3L, s / 32, s), (4L, 0L, s / 32)))
    val re = Graph.hits(edges.repartition(5), col("s"), col("d"),
      iters = 5).as[(Long, Long, Long)].collect().toSet
    assert(re == got)
  }

  test("randomWalks: hops replay the fingerprint rule; dead ends " +
      "truncate; deterministic under repartitioning") {
    import spark.implicits._
    // 1 -> {2, 3}; 2 -> {3}; 3 dead end
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "d")
    val got = Graph.randomWalks(edges, col("s"), col("d"),
        walksPerNode = 2, len = 3)
      .as[(Long, Int, Int, Long)].collect().toSet
    // replay the rule in plain Scala
    def fp(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    val nbrs = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L))
    val want = scala.collection.mutable.Set[(Long, Int, Int, Long)]()
    for (start <- Seq(1L, 2L, 3L); w <- 0 to 1) {
      var node = start
      want += ((start, w, 0, node))
      var t = 1
      var alive = true
      while (t <= 3 && alive) {
        nbrs.get(node) match {
          case Some(ns) =>
            node = ns((fp(s"${start}_${w}_${t}_$node") % ns.size).toInt)
            want += ((start, w, t, node))
          case None => alive = false
        }
        t += 1
      }
    }
    assert(got == want.toSet)
    // at least one walk actually took the hash-dependent branch from
    // node 1 (both neighbors reachable across the 4 walk contexts)
    val firstHops = got.filter(r => r._1 == 1L && r._3 == 1).map(_._4)
    assert(firstHops.nonEmpty)
    val re = Graph.randomWalks(edges.repartition(5), col("s"),
        col("d"), walksPerNode = 2, len = 3)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(re == got)
  }

  test("landmarkDistances: layered multi-source BFS yields exact " +
      "shortest distances within the depth bound; deterministic " +
      "under repartitioning") {
    import spark.implicits._
    // undirected path 1-2-3-4-5 (fed directed; the operator
    // symmetrizes); landmarks = 2 smallest ids; depth cap 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = Graph.landmarkDistances(edges, col("a"), col("b"),
        landmarks = 2, maxDepth = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0), (2L, 1L, 1), (3L, 1L, 2),
      (2L, 2L, 0), (1L, 2L, 1), (3L, 2L, 1), (4L, 2L, 2)))
    val re = Graph.landmarkDistances(edges.repartition(5), col("a"),
        col("b"), landmarks = 2, maxDepth = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(re == got)
    // early-exit: a full-depth run on this component stops by itself
    val full = Graph.landmarkDistances(edges, col("a"), col("b"),
        landmarks = 1, maxDepth = 100)
      .as[(Long, Long, Int)].collect().toSet
    assert(full == Set((1L, 1L, 0), (2L, 1L, 1), (3L, 1L, 2),
      (4L, 1L, 3), (5L, 1L, 4)))
  }

  test("stronglyConnectedComponents: hand-built SCCs (3-cycle, " +
      "2-cycle behind a chain, trivial nodes, multi-round recolor); " +
      "deterministic under repartitioning") {
    import spark.implicits._
    // SCCs: {1,2,3} (cycle), {4,5} (cycle reached from 3), {6}, {7}
    // (a plain chain). 4,5 take color 1 in round 1 (1 reaches them)
    // but cannot reach 1 → they must survive to a SECOND outer round.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 4L), (6L, 7L)).toDF("s", "d")
    val got = Graph.stronglyConnectedComponents(edges, col("s"),
        col("d")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 4L, 6L -> 6L, 7L -> 7L), s"got $got")
    val re = Graph.stronglyConnectedComponents(edges.repartition(5),
        col("s"), col("d")).as[(Long, Long)].collect().toMap
    assert(re == got)
    // a directed chain is all-trivial SCCs (the adversarial shape:
    // every node its own component)
    val chain = (1L to 6L).sliding(2)
      .map(p => (p.head, p.last)).toSeq.toDF("s", "d")
    val ch = Graph.stronglyConnectedComponents(chain, col("s"),
        col("d")).as[(Long, Long)].collect().toMap
    assert(ch == (1L to 6L).map(i => i -> i).toMap)
  }

  test("sccIncremental: contract-through-stored-assignment ≡ " +
      "from-scratch over the union; delta holds only merged members " +
      "and new nodes; stale condensation labels map at read; retry " +
      "idempotent; compaction preserves the view") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sccstore-").toString + "/scc"
    val hist = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 4L), (6L, 7L)).toDF("s", "d")
    Graph.writeSccStore(hist, col("s"), col("d"), dir)
    assert(Graph.sccStoreAssign(spark, dir)
      .as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
        6L -> 6L, 7L -> 7L))
    // batch 1: (5,1) merges {1,2,3}+{4,5}; (7,6) closes {6,7}; new
    // 2-cycle {8,9}; (5,8) adds a cross-SCC edge to the new cycle
    val b1 = Seq((5L, 1L), (7L, 6L), (8L, 9L), (9L, 8L), (5L, 8L))
      .toDF("s", "d")
    val got1 = Graph.sccIncremental(b1, col("s"), col("d"), dir, 1L)
      .as[(Long, Long)].collect().toMap
    val scratch1 = Graph.stronglyConnectedComponents(
        hist.unionByName(b1), col("s"), col("d"))
      .as[(Long, Long)].collect().toMap
    assert(got1 == scratch1, s"$got1 vs $scratch1")
    assert(Graph.sccStoreAssign(spark, dir)
      .as[(Long, Long)].collect().toMap == scratch1)
    // delta accounting: only merged-SCC members (4, 5 → 1; 7 → 6)
    // and the new nodes (8, 9) rewrote
    val delta = spark.read.parquet(s"$dir/assign/batch=1")
      .select($"id", $"scc").as[(Long, Long)].collect().toMap
    assert(delta == Map(4L -> 1L, 5L -> 1L, 7L -> 6L, 8L -> 8L,
      9L -> 8L), s"delta $delta")
    // condensation view: one cross edge {1..5} → {8,9}
    assert(Graph.sccStoreCondensation(spark, dir)
      .as[(Long, Long)].collect().toSet == Set((1L, 8L)))
    // batch 2: (9,2) merges {8,9} into the giant SCC — the stored
    // (1,8) condensation edge goes stale and must self-loop away
    val b2 = Seq((9L, 2L)).toDF("s", "d")
    val got2 = Graph.sccIncremental(b2, col("s"), col("d"), dir, 2L)
      .as[(Long, Long)].collect().toMap
    val scratch2 = Graph.stronglyConnectedComponents(
        hist.unionByName(b1).unionByName(b2), col("s"), col("d"))
      .as[(Long, Long)].collect().toMap
    assert(got2 == scratch2, s"$got2 vs $scratch2")
    assert(Graph.sccStoreCondensation(spark, dir)
      .as[(Long, Long)].collect().toSet == Set.empty[(Long, Long)])
    // retry: same batch id recomputes against the strictly-before
    // view and rewrites the same delta
    val retry = Graph.sccIncremental(b2, col("s"), col("d"), dir, 2L)
      .as[(Long, Long)].collect().toMap
    assert(retry == scratch2)
    // OPTIMIZE folds both stores; the view is unchanged
    assert(Graph.compactSccStore(spark, dir).contains(2L))
    assert(Graph.sccStoreAssign(spark, dir)
      .as[(Long, Long)].collect().toMap == scratch2)
    assert(Graph.sccStoreCondensation(spark, dir)
      .as[(Long, Long)].collect().toSet == Set.empty[(Long, Long)])
    // a later batch still reads correctly through the generation
    val b3 = Seq((20L, 21L), (21L, 20L)).toDF("s", "d")
    val got3 = Graph.sccIncremental(b3, col("s"), col("d"), dir, 3L)
      .as[(Long, Long)].collect().toMap
    assert(got3 == scratch2 ++ Map(20L -> 20L, 21L -> 20L))
    // store-backed condensation levels ≡ from-scratch over the union
    val gotLvl = Graph.sccStoreLevels(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    val wantLvl = Graph.sccCondensation(
        hist.unionByName(b1).unionByName(b2).unionByName(b3),
        col("s"), col("d"))
      .as[(Long, Long, Long)].collect().toSet
    assert(gotLvl == wantLvl, s"$gotLvl vs $wantLvl")
  }

  test("rebuildTriangleStore: node-takedown recount ≡ from-scratch " +
      "over survivors; counts DECREASE; later batches continue above " +
      "the generation") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tridel-").toString + "/tri"
    // K4 on {1,2,3,4}: every node closes 3 triangles
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = k4.toDF("a", "b")
    Graph.writeTriangleStore(edges, col("a"), col("b"), dir)
    assert(Graph.triangleStoreCounts(spark, dir)
      .as[(Long, Long)].collect().toMap ==
      (1L to 4L).map(_ -> 3L).toMap)
    // delete node 4 → K3 remains: one triangle, count 1 each
    val surv = edges.where(col("a") =!= 4L && col("b") =!= 4L)
    val tok = Graph.rebuildTriangleStore(surv, col("a"), col("b"), dir)
    assert(Graph.triangleStoreCounts(spark, dir)
      .as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // post-rebuild incremental batch continues above the generation
    val b1 = Seq((1L, 5L), (2L, 5L)).toDF("a", "b") // (1,2,5) closes
    val got = Graph.triangleCountsIncremental(
        surv.unionByName(b1), col("a"), col("b"), b1, col("a"),
        col("b"), dir, batchId = tok + 1L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 5L -> 1L),
      s"got $got")
    // a batch at or below the generation is rejected loudly
    intercept[IllegalArgumentException] {
      Graph.triangleCountsIncremental(surv.unionByName(b1), col("a"),
        col("b"), b1, col("a"), col("b"), dir, batchId = tok)
    }
  }

  test("rebuildCCStore: node-takedown rebuild ≡ from-scratch over " +
      "survivors including a component SPLIT; vanished nodes drop; " +
      "later incremental batches continue above the generation") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ccdel-").toString + "/cc"
    // path 1-2-3-4 (2 is a cut vertex) + pair 10-11
    val hist = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a", "b")
    Graph.writeCCStore(hist, col("a"), col("b"), dir)
    assert(Graph.ccStoreLabels(spark, dir)
      .as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L,
        11L -> 10L))
    // takedown of node 2 SPLITS {1,2,3,4}: 1 loses every edge (and
    // must DISAPPEAR, not linger as a stale newest-wins row)
    val surv = hist.where(col("a") =!= 2L && col("b") =!= 2L)
    val tok = Graph.rebuildCCStore(surv, col("a"), col("b"), dir)
    val got = Graph.ccStoreLabels(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 3L, 4L -> 3L, 10L -> 10L, 11L -> 10L),
      s"got $got")
    // later batches continue ABOVE the superseding generation
    val got2 = Graph.connectedComponentsIncremental(
        Seq((4L, 10L)).toDF("a", "b"), col("a"), col("b"), dir,
        batchId = tok + 1L)
      .as[(Long, Long)].collect().toMap
    val scratch2 = Graph.connectedComponents(
        surv.unionByName(Seq((4L, 10L)).toDF("a", "b")), col("a"),
        col("b")).as[(Long, Long)].collect().toMap
    assert(got2 == scratch2 && got2(11L) == 3L, s"$got2 vs $scratch2")
    // a batch at or below the generation is rejected loudly
    intercept[IllegalArgumentException] {
      Graph.connectedComponentsIncremental(
        Seq((4L, 10L)).toDF("a", "b"), col("a"), col("b"), dir,
        batchId = tok)
    }
  }

  test("rebuildSccStore: node-takedown rebuild ≡ from-scratch over " +
      "survivors INCLUDING an SCC split; supersedes prior state; " +
      "later incremental batches continue above the generation") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sccdel-").toString + "/scc"
    // {1,2,3} cycle + 4→5
    val hist = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L))
      .toDF("s", "d")
    Graph.writeSccStore(hist, col("s"), col("d"), dir)
    assert(Graph.sccStoreAssign(spark, dir)
      .as[(Long, Long)].collect().toMap
      .view.filterKeys(Set(1L, 2L, 3L)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // takedown of node 2 SPLITS the 3-cycle into trivial SCCs — the
    // case insertion-monotone maintenance cannot absorb
    val surv = hist.where(col("s") =!= 2L && col("d") =!= 2L)
    val tok = Graph.rebuildSccStore(surv, col("s"), col("d"), dir)
    val got = Graph.sccStoreAssign(spark, dir)
      .as[(Long, Long)].collect().toMap
    val scratch = Graph.stronglyConnectedComponents(surv, col("s"),
        col("d")).as[(Long, Long)].collect().toMap
    assert(got == scratch && !got.contains(2L), s"$got vs $scratch")
    assert(got == Map(1L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
    // the condensation view rebuilt too (3→1 is the only cross edge)
    assert(Graph.sccStoreCondensation(spark, dir)
      .as[(Long, Long)].collect().toSet == Set((3L, 1L), (4L, 5L)))
    // later batches continue ABOVE the superseding generation: (1,3)
    // re-closes the {1,3} cycle through the rebuilt state
    val got2 = Graph.sccIncremental(Seq((1L, 3L)).toDF("s", "d"),
        col("s"), col("d"), dir, batchId = tok + 1L)
      .as[(Long, Long)].collect().toMap
    val scratch2 = Graph.stronglyConnectedComponents(
        surv.unionByName(Seq((1L, 3L)).toDF("s", "d")), col("s"),
        col("d")).as[(Long, Long)].collect().toMap
    assert(got2 == scratch2 && got2(3L) == 1L)
    // a batch at or below the generation is rejected loudly
    intercept[IllegalArgumentException] {
      Graph.sccIncremental(Seq((1L, 3L)).toDF("s", "d"),
        col("s"), col("d"), dir, batchId = tok)
    }
  }

  test("harmonicCloseness: hand-computed bounded-radius integer sums; " +
      "the landmark estimator matches the frozen-pivot arithmetic; " +
      "pivot-unreachable nodes keep 0 rows") {
    import spark.implicits._
    // path 1-2-3-4-5 plus the disconnected pair 10-11, radius 3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L)).toDF("a", "b")
    val got = Graph.harmonicCloseness(edges, col("a"), col("b"),
        maxDepth = 3)
      .as[(Long, Long)].collect().toMap
    // hc(3) = 2·⌊1e6/1⌋ + 2·⌊1e6/2⌋; ends see 1+1/2+1/3 within
    // radius (d = 4 truncated); the pair sees only each other
    assert(got == Map(1L -> 1833333L, 2L -> 2833333L, 3L -> 3000000L,
      4L -> 2833333L, 5L -> 1833333L, 10L -> 1000000L,
      11L -> 1000000L), s"got $got")
    // estimator from the 2 smallest pivots {1, 2}: d(u, lm) sums
    // only — 5 sees pivot 2 at d=3 (pivot 1 is out of radius), the
    // 10-11 pair sees neither pivot and keeps a 0 row
    val sketch = Graph.landmarkDistances(edges, col("a"), col("b"),
      landmarks = 2, maxDepth = 3)
    val nodes = edges.select(col("a").as("id"))
      .union(edges.select(col("b").as("id"))).distinct()
    val est = Graph.harmonicClosenessLandmark(sketch, nodes)
      .as[(Long, Long)].collect().toMap
    assert(est == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1500000L,
      4L -> 833333L, 5L -> 333333L, 10L -> 0L, 11L -> 0L),
      s"got $est")
  }

  test("rebuildLandmarkStore: deletion grows distances past the " +
      "stored sketch — stale-small rows vanish with the view flip; " +
      "later incremental batches continue above the generation") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lmdel-").toString + "/lm"
    // path 1-2-3-4-5; landmarks (2 smallest) = {1, 2}, depth 3
    val hist = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    Graph.writeLandmarkStore(hist, col("a"), col("b"),
      landmarks = 2, maxDepth = 3, dir)
    assert(Graph.landmarkStoreDistances(spark, dir)
      .as[(Long, Long, Int)].collect().toSet ==
      Set((1L, 1L, 0), (2L, 1L, 1), (3L, 1L, 2), (4L, 1L, 3),
        (2L, 2L, 0), (1L, 2L, 1), (3L, 2L, 1), (4L, 2L, 2),
        (5L, 2L, 3)))
    // takedown of cut vertex 3: 4 and 5 leave both depth-3 balls —
    // their stored rows are exactly what a skipped re-BFS would keep
    val surv = hist.where(col("a") =!= 3L && col("b") =!= 3L)
    val tok = Graph.rebuildLandmarkStore(surv, col("a"), col("b"),
      dir, deletedNodes = Some(Seq(3L).toDF("id")), maxDepth = 3)
    assert(Graph.landmarkStoreDistances(spark, dir)
      .as[(Long, Long, Int)].collect().toSet ==
      Set((1L, 1L, 0), (2L, 1L, 1), (2L, 2L, 0), (1L, 2L, 1)))
    // a later insertion batch relaxes ABOVE the generation: bridge
    // (2,4) pulls 4 and 5 back inside both balls
    val b1 = Seq((2L, 4L)).toDF("a", "b")
    val union = surv.unionByName(b1)
    val got = Graph.landmarkDistancesIncremental(union, col("a"),
        col("b"), b1, col("a"), col("b"), dir, batchId = tok + 1L,
        maxDepth = 3)
      .as[(Long, Long, Int)].collect().toSet
    val want = Graph.landmarkDistances(union, col("a"), col("b"),
        maxDepth = 3, pivots = Some(Seq(1L, 2L).toDF("lm")))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want && got.contains((5L, 2L, 2)), s"$got vs $want")
    // a batch at or below the generation is rejected loudly
    intercept[IllegalArgumentException] {
      Graph.landmarkDistancesIncremental(union, col("a"), col("b"),
        b1, col("a"), col("b"), dir, batchId = tok, maxDepth = 3)
    }
    // retracting a PIVOT drops its whole BFS column
    val surv2 = surv.where(col("a") =!= 2L && col("b") =!= 2L)
    Graph.rebuildLandmarkStore(surv2, col("a"), col("b"), dir,
      deletedNodes = Some(Seq(2L, 3L).toDF("id")), maxDepth = 3): Unit
    assert(Graph.landmarkStoreDistances(spark, dir)
      .as[(Long, Long, Int)].collect().toSet == Set((1L, 1L, 0)))
  }

  test("rebuildKCoreStore: deletion shrink CASCADES past the deleted " +
      "nodes — the direction the monotone member-delta union cannot " +
      "express; later incremental batches continue above the " +
      "generation") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kcdel-").toString + "/kc"
    // square 1-2-3-4-1: the 2-core is all four nodes
    val hist = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("a", "b")
    Graph.writeKCoreStore(hist, col("a"), col("b"), k = 2, dir)
    assert(Graph.kCoreStoreMembers(spark, dir)
      .as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    // takedown of node 1: survivors 2, 3, 4 drop to a path — every
    // one CASCADES out of the 2-core though none was deleted
    val surv = hist.where(col("a") =!= 1L && col("b") =!= 1L)
    val tok = Graph.rebuildKCoreStore(surv, col("a"), col("b"),
      k = 2, dir)
    assert(Graph.kCoreStoreMembers(spark, dir)
      .as[Long].collect().isEmpty)
    // a later batch re-closes the cycle through the rebuilt state
    val b1 = Seq((2L, 4L)).toDF("a", "b")
    val got = Graph.kCoreIncremental(surv.unionByName(b1), col("a"),
        col("b"), b1, col("a"), col("b"), k = 2, dir,
        batchId = tok + 1L)
      .as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L), s"got $got")
    intercept[IllegalArgumentException] {
      Graph.kCoreIncremental(surv.unionByName(b1), col("a"),
        col("b"), b1, col("a"), col("b"), k = 2, dir, batchId = tok)
    }
  }

  test("rebuildPageRankStore / rebuildHitsStore / rebuildLouvainStore: " +
      "value-iteration stores rebuild COLD over survivors (a warm " +
      "seed would carry the deleted edges' influence forever); " +
      "vanished nodes drop; warm batches continue above the " +
      "generation") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-videl-").toString
    // two directed cycles bridged through node 3
    val hist = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 3L)).toDF("s", "d")
    val surv = hist.where(col("s") =!= 3L && col("d") =!= 3L)
    // PageRank
    val pr = s"$base/pr"
    Graph.writePageRankStore(hist, col("s"), col("d"), iters = 3, pr)
    val prTok = Graph.rebuildPageRankStore(surv, col("s"), col("d"),
      iters = 3, pr)
    val gotPr = Graph.pageRankStoreRanks(spark, pr)
      .as[(Long, Long)].collect().toMap
    val wantPr = Graph.pageRank(surv, col("s"), col("d"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(gotPr == wantPr && !gotPr.contains(3L), s"$gotPr vs $wantPr")
    Graph.pageRankWarm(surv, col("s"), col("d"), pr,
      batchId = prTok + 1L, rounds = 1): Unit
    intercept[IllegalArgumentException] {
      Graph.pageRankWarm(surv, col("s"), col("d"), pr,
        batchId = prTok, rounds = 1)
    }
    // HITS
    val ht = s"$base/hits"
    Graph.writeHitsStore(hist, col("s"), col("d"), iters = 3, ht)
    val htTok = Graph.rebuildHitsStore(surv, col("s"), col("d"),
      iters = 3, ht)
    val gotHt = Graph.hitsStoreScores(spark, ht)
      .as[(Long, Long, Long)].collect().toSet
    val wantHt = Graph.hits(surv, col("s"), col("d"), iters = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(gotHt == wantHt && !gotHt.exists(_._1 == 3L))
    intercept[IllegalArgumentException] {
      Graph.hitsWarm(surv, col("s"), col("d"), ht, batchId = htTok,
        rounds = 1)
    }
    // Louvain
    val lv = s"$base/lv"
    Graph.writeLouvainStore(hist, col("s"), col("d"), rounds = 2, lv)
    val lvTok = Graph.rebuildLouvainStore(surv, col("s"), col("d"),
      rounds = 2, lv)
    val gotLv = Graph.louvainStoreCommunities(spark, lv)
      .as[(Long, Long)].collect().toMap
    val wantLv = Graph.louvain(surv, col("s"), col("d"), rounds = 2)
      .select(col("id"), col("community"))
      .as[(Long, Long)].collect().toMap
    assert(gotLv == wantLv && !gotLv.contains(3L))
    intercept[IllegalArgumentException] {
      Graph.louvainWarm(surv, col("s"), col("d"), lv,
        batchId = lvTok, rounds = 1)
    }
  }

  test("rebuildLabelState: the k-round vote history rebuilds over " +
      "surviving edges and seeds — a deleted node's seed label is " +
      "forgotten data; later incremental batches continue above the " +
      "generation") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lbdel-").toString + "/lb"
    // path 1-2-3 seeded A at 1; pair 10-11 seeded B at 10
    val hist = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val seeds = Seq((1L, "A"), (10L, "B")).toDF("id", "label")
    Graph.writeLabelState(hist, col("a"), col("b"), seeds, col("id"),
      col("label"), iters = 2, dir)
    assert(Graph.labelStoreLabels(spark, dir, round = 2)
      .as[(Long, String)].collect().toMap ==
      Map(1L -> "A", 2L -> "A", 3L -> "A", 10L -> "B", 11L -> "B"))
    // takedown of seed node 1: its seed label is forgotten with it —
    // 2 and 3 must come back UNLABELED, not stale-A
    val surv = hist.where(col("a") =!= 1L && col("b") =!= 1L)
    val survSeeds = seeds.where(col("id") =!= 1L)
    val tok = Graph.rebuildLabelState(surv, col("a"), col("b"),
      survSeeds, col("id"), col("label"), iters = 2, dir)
    val got = Graph.labelStoreLabels(spark, dir, round = 2)
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(2L -> None, 3L -> None, 10L -> Some("B"),
      11L -> Some("B")), s"got $got")
    // a later batch bridges 11-2: B flows into the orphaned path
    val b1 = Seq((11L, 2L)).toDF("a", "b")
    val got2 = Graph.labelPropagationIncremental(
        surv.unionByName(b1), col("a"), col("b"), b1, col("a"),
        col("b"), survSeeds, col("id"), col("label"), iters = 2,
        dir, batchId = tok + 1L)
      .as[(Long, Option[String])].collect().toMap
    assert(got2(2L) == Some("B"), s"got $got2")
    intercept[IllegalArgumentException] {
      Graph.labelPropagationIncremental(surv.unionByName(b1),
        col("a"), col("b"), b1, col("a"), col("b"), survSeeds,
        col("id"), col("label"), iters = 2, dir, batchId = tok)
    }
  }

  test("sccCondensation: collapsed cycles, cross-SCC DAG edges, " +
      "longest-path levels, member counts") {
    import spark.implicits._
    // condensation of the SCC fixture: 1(×3) → 4(×2); 6 → 7
    // plus a 2-hop tail 4 → 8 → 9 to force a level-2+ node
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 4L), (6L, 7L), (4L, 8L), (8L, 9L))
      .toDF("s", "d")
    val got = Graph.sccCondensation(edges, col("s"), col("d"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 3L), (4L, 1L, 2L), (6L, 0L, 1L),
      (7L, 1L, 1L), (8L, 2L, 1L), (9L, 3L, 1L)), s"got $got")
  }

  test("landmarkDistancesIncremental: relaxation from new-edge " +
      "endpoints ≡ from-scratch over the union with the frozen " +
      "pivots; delta holds only improved keys; retry-idempotent; " +
      "compaction preserves the view") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lmstore-").toString + "/lm"
    // history: path 1-2-3-4-5-6-7; landmarks = {1, 2}, depth 3
    val hist = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L)).toDF("a", "b")
    Graph.writeLandmarkStore(hist, col("a"), col("b"),
      landmarks = 2, maxDepth = 3, dir)
    val stored = Graph.landmarkStoreDistances(spark, dir)
      .as[(Long, Long, Int)].collect().toSet
    assert(stored.contains((4L, 1L, 3)) && !stored.exists(_._3 > 3))
    // batch: a shortcut (1,5) shrinks the tail, (7,8) brings a NEW
    // node into range-of-nothing (still > depth 3 of both landmarks),
    // (5,9) brings a new node INTO range, and (2,3) is re-sent
    val batch = Seq((1L, 5L), (7L, 8L), (5L, 9L), (2L, 3L))
      .toDF("a", "b")
    val union = hist.unionByName(batch)
    def run() = Graph.landmarkDistancesIncremental(union, col("a"),
      col("b"), batch, col("a"), col("b"), dir, batchId = 1L,
      maxDepth = 3)
    val got = run().as[(Long, Long, Int)].collect().toSet
    val scratch = Graph.landmarkDistances(union, col("a"), col("b"),
        maxDepth = 3,
        pivots = Some(Seq(1L, 2L).toDF("lm")))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == scratch, s"warm $got vs scratch $scratch")
    // the shortcut pulled 5 to dist 1 of lm 1 and 9 to dist 2; 8
    // stays out of range of both landmarks
    assert(got.contains((5L, 1L, 1)) && got.contains((9L, 1L, 2)))
    assert(!got.exists(_._1 == 8L))
    // delta accounting: only IMPROVED keys in batch=1 (never a row
    // restating a stored distance)
    val delta = spark.read.parquet(s"$dir/batch=1")
      .select(col("id"), col("lm"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    assert(delta.nonEmpty)
    delta.foreach { case (i, l, dv) =>
      val old = stored.find(r => r._1 == i && r._2 == l).map(_._3)
      assert(old.forall(dv < _), s"unimproved delta row ($i,$l,$dv)")
    }
    // retry (same batchId) overwrites identically
    val retry = run().as[(Long, Long, Int)].collect().toSet
    assert(retry == got)
    // store view ≡ returned sketch, before and after compaction
    assert(Graph.landmarkStoreDistances(spark, dir)
      .as[(Long, Long, Int)].collect().toSet == got)
    assert(Graph.compactLandmarkStore(spark, dir).isDefined)
    assert(Graph.landmarkStoreDistances(spark, dir)
      .as[(Long, Long, Int)].collect().toSet == got)
    // a second batch extends the compacted store: (8,2) pulls 8 into
    // range of both landmarks
    val b2 = Seq((8L, 2L)).toDF("a", "b")
    val union2 = union.unionByName(b2)
    val got2 = Graph.landmarkDistancesIncremental(union2, col("a"),
        col("b"), b2, col("a"), col("b"), dir, batchId = 2L,
        maxDepth = 3)
      .as[(Long, Long, Int)].collect().toSet
    val scratch2 = Graph.landmarkDistances(union2, col("a"), col("b"),
        maxDepth = 3, pivots = Some(Seq(1L, 2L).toDF("lm")))
      .as[(Long, Long, Int)].collect().toSet
    assert(got2 == scratch2)
    assert(got2.contains((8L, 2L, 1)))
  }

  test("node2vecWalks: biased hops replay the cumulative-weight " +
      "fingerprint rule; uniform first step; deterministic under " +
      "repartitioning") {
    import spark.implicits._
    // 1 -> {2, 3}; 2 -> {1, 3}; 3 -> {1}: from state (prev=1, cur=2)
    // candidate 1 is a return (w=1), candidate 3 has edge 1->3 (w=4)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L))
      .toDF("s", "d")
    val (wr, wc, we) = (1L, 4L, 2L)
    val got = Graph.node2vecWalks(edges, col("s"), col("d"),
        walksPerNode = 2, len = 3, wr, wc, we)
      .as[(Long, Int, Int, Long)].collect().toSet
    def fp(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    val nbrs = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L))
    val adj = Set((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L))
    val want = scala.collection.mutable.Set[(Long, Int, Int, Long)]()
    for (start <- Seq(1L, 2L, 3L); w <- 0 to 1) {
      var prev = -1L
      var node = start
      want += ((start, w, 0, node))
      for (t <- 1 to 3) {
        val cands = nbrs(node)
        val ws = cands.map { c =>
          if (t == 1) 1L
          else if (c == prev) wr
          else if (adj((prev, c))) wc
          else we
        }
        val tot = ws.sum
        val draw = fp(s"${start}_${w}_${t}_${prev}_$node") % tot
        val cums = ws.scanLeft(0L)(_ + _)
        val pick = cands.indices
          .find(i => draw >= cums(i) && draw < cums(i) + ws(i)).get
        prev = node
        node = cands(pick)
        want += ((start, w, t, node))
      }
    }
    assert(got == want.toSet, s"$got vs $want")
    val re = Graph.node2vecWalks(edges.repartition(5), col("s"),
        col("d"), walksPerNode = 2, len = 3, wr, wc, we)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(re == got)
  }

  test("skipGramPairs: window-2 ordered pairs over one walk, counted") {
    import spark.implicits._
    val walks = Seq((1L, 0, 0, 10L), (1L, 0, 1, 20L),
      (1L, 0, 2, 30L), (1L, 0, 3, 40L))
      .toDF("start", "walk", "step", "node")
    val got = Graph.skipGramPairs(walks, window = 2)
      .as[(Long, Long, Long)].collect().toSet
    val want = Set((10L, 20L), (10L, 30L), (20L, 10L), (20L, 30L),
      (20L, 40L), (30L, 10L), (30L, 20L), (30L, 40L), (40L, 20L),
      (40L, 30L)).map { case (a, b) => (a, b, 1L) }
    assert(got == want)
  }

  private def k4(base: Long): Seq[(Long, Long)] =
    (for {
      i <- 0 until 4; j <- (i + 1) until 4
    } yield (base + i, base + j)).toSeq

  test("louvain: two bridged 4-cliques resolve to the planted " +
      "partition in 3 synchronous rounds; deterministic under " +
      "repartitioning") {
    import spark.implicits._
    val edges = (k4(0L) ++ k4(4L) :+ ((3L, 4L))).toDF("a", "b")
    val got = Graph.louvain(edges, col("a"), col("b"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    val groups = got.groupBy(_._2).values.map(_.keySet).toSet
    assert(groups == Set(Set(0L, 1L, 2L, 3L), Set(4L, 5L, 6L, 7L)),
      s"got $got")
    val re = Graph.louvain(edges.repartition(7), col("a"), col("b"),
      rounds = 3).as[(Long, Long)].collect().toMap
    assert(re == got)
  }

  test("louvain: convergence early-exit is bit-identical to the " +
      "fixed-round run and executes strictly fewer rounds") {
    import spark.implicits._
    val edges = (k4(0L) ++ k4(4L) :+ ((3L, 4L))).toDF("a", "b")
    // on a converged fixture, 6 requested rounds early-exit after the
    // first no-mover round; the all-rounds run is the ground truth
    val (fullDf, fullN) = Graph.louvainRounds(edges, col("a"),
      col("b"), rounds = 6, earlyExit = false)
    val full = fullDf.as[(Long, Long)].collect().toMap
    val (exitDf, exitN) = Graph.louvainRounds(edges, col("a"),
      col("b"), rounds = 6, earlyExit = true)
    val exit = exitDf.as[(Long, Long)].collect().toMap
    assert(fullN == 6)
    assert(exitN < 6, s"expected an early exit, executed $exitN")
    assert(exit == full)
  }

  test("louvain: duplicate rows fold to edge weights — bit-equal to " +
      "the same graph expressed as an explicit weight column") {
    import spark.implicits._
    // the bridged cliques with the bridge sent 3 times: weight 3
    val dup = (k4(0L) ++ k4(4L) ++ Seq.fill(3)((3L, 4L)))
      .toDF("a", "b")
    val g1 = Graph.louvain(dup, col("a"), col("b"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    val w = (k4(0L) ++ k4(4L)).map { case (a, b) => (a, b, 1L) } :+
      ((3L, 4L, 3L))
    val g2 = Graph.louvain(w.toDF("a", "b", "w"), col("a"), col("b"),
        rounds = 3, weight = Some(col("w")))
      .as[(Long, Long)].collect().toMap
    assert(g2 == g1)
  }

  test("contractGraph: weights fold per community pair, internal " +
      "mass becomes self-loops; 2m invariant through the quotient") {
    import spark.implicits._
    val edges = (k4(0L) ++ k4(4L) :+ ((3L, 4L))).toDF("a", "b")
    val asg = (0L to 3L).map((_, 0L)) ++ (4L to 7L).map((_, 5L))
    val q = Graph.contractGraph(edges, col("a"), col("b"),
        asg.toDF("id", "c"), col("id"), col("c"))
      .as[(Long, Long, Long)].collect().toSet
    // each K4's 6 internal edges fold to a self-loop of weight 6
    assert(q == Set((0L, 0L, 6L), (0L, 5L, 1L), (5L, 5L, 6L)))
    // 2m invariance: Σ inter-weight·2 + self-weight·2 both levels
    val m2l1 = 2L * (6 + 6 + 1)
    val m2l2 = q.toSeq.map { case (u, v, w) =>
      if (u == v) 2L * w else 2L * w
    }.sum
    assert(m2l2 == m2l1)
  }

  test("negativeSamples: draws replay the fingerprint rule over the " +
      "id-ordered index; own-pair collisions dropped; deterministic " +
      "under repartitioning") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 1L), (2L, 5L)).toDF("c", "x")
    val got = Graph.negativeSamples(pairs, col("c"), col("x"), k = 3)
      .as[(Long, Long, Int, Long)].collect().toSet
    // replay: nodes sorted = (1, 2, 5) with idx (0, 1, 2)
    def fp(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    val nodes = Seq(1L, 2L, 5L)
    val want = (for {
      (c, x) <- Seq((1L, 2L), (2L, 1L), (2L, 5L))
      j <- 0 to 2
      neg = nodes((fp(s"${c}_${x}_$j") % 3).toInt)
      if neg != c && neg != x
    } yield (c, x, j, neg)).toSet
    assert(got == want && got.nonEmpty, s"$got vs $want")
    // every emitted draw is a genuine negative
    assert(got.forall { case (c, x, _, n) => n != c && n != x })
    val re = Graph.negativeSamples(pairs.repartition(5), col("c"),
      col("x"), k = 3).as[(Long, Long, Int, Long)].collect().toSet
    assert(re == got)
  }

  test("louvainWarm: one warm round absorbs a new node into its " +
      "clique's stored community and preserves the partition; retry " +
      "idempotent; compaction preserves the view") {
    import spark.implicits._
    val hist = k4(0L) ++ k4(4L) :+ ((3L, 4L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-louvwarm-").toString + "/lv"
    Graph.writeLouvainStore(hist.toDF("a", "b"), col("a"), col("b"),
      rounds = 3, dir)
    val stored = Graph.louvainStoreCommunities(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(stored.groupBy(_._2).values.map(_.keySet).toSet ==
      Set(Set(0L, 1L, 2L, 3L), Set(4L, 5L, 6L, 7L)))
    // delta: node 8 wired into clique A
    val union = (hist ++ Seq((8L, 0L), (8L, 1L))).toDF("a", "b")
    def run() = Graph.louvainWarm(union, col("a"), col("b"), dir,
        batchId = 1L, rounds = 1)
      .as[(Long, Long)].collect().toMap
    val warm = run()
    assert(warm(8L) == warm(0L), s"got $warm")
    assert(warm.groupBy(_._2).values.map(_.keySet).toSet ==
      Set(Set(0L, 1L, 2L, 3L, 8L), Set(4L, 5L, 6L, 7L)), s"got $warm")
    assert(run() == warm)
    assert(Graph.louvainStoreCommunities(spark, dir)
      .as[(Long, Long)].collect().toMap == warm)
    assert(Graph.compactLouvainStore(spark, dir).isDefined)
    assert(Graph.louvainStoreCommunities(spark, dir)
      .as[(Long, Long)].collect().toMap == warm)
  }

  test("modularity: hand-computed numerators on the planted " +
      "partition; singleton partition pays -d^2 per node") {
    import spark.implicits._
    val edges = (k4(0L) ++ k4(4L) :+ ((3L, 4L))).toDF("a", "b")
    val asg = ((0L to 3L).map((_, 0L)) ++ (4L to 7L).map((_, 5L)))
      .toDF("id", "c")
    val got = Graph.modularity(edges, col("a"), col("b"), asg,
        col("id"), col("c"))
      .select(col("community"), col("in_w2"), col("deg_sum"),
        col("q_num").cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // 2m = 26; per clique: in = 12, D = 13, q_num = 26*12 - 169 = 143
    assert(got == Set((0L, 12L, 13L, 143L), (5L, 12L, 13L, 143L)))
    // all-singletons on a triangle: in = 0, d = 2 → q_num = -4 each
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val single = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "c")
    val gt = Graph.modularity(tri, col("a"), col("b"), single,
        col("id"), col("c"))
      .select(col("community"), col("in_w2"),
        col("q_num").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(gt == Set((1L, 0L, -4L), (2L, 0L, -4L), (3L, 0L, -4L)))
  }
}
