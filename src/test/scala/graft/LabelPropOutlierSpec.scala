package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Outliers}

/** Label propagation and MAD outliers: hand-computed fixpoints,
  * determinism properties, and the degenerate cases the Scaladocs
  * promise.
  */
class LabelPropOutlierSpec extends SparkSuite {
  import spark.implicits._

  private def lp(edges: Seq[(Long, Long)], seeds: Seq[(Long, String)],
                 iters: Int): Map[Long, String] =
    Graph.labelPropagation(
        edges.toDF("a", "b"), col("a"), col("b"),
        seeds.toDF("id", "l"), col("id"), col("l"), iters)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap

  test("labelPropagation: majority wins; ties go to the max label") {
    // node 0 has neighbors: two 'en' seeds, one 'de' seed → majority en.
    // node 10 has one 'en' and one 'de' neighbor → tie → max label 'en'.
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (10L, 1L), (10L, 4L))
    val seeds = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de"))
    val got = lp(edges, seeds, 1)
    assert(got(0L) == "en")
    assert(got(10L) == "en") // tie 1-1 → max("de","en") = "en"
  }

  test("labelPropagation: a node seeded twice keeps the MAX label — " +
      "the same direction as the neighbor-vote tie-break") {
    val edges = Seq((1L, 2L))
    val seeds = Seq((1L, "de"), (1L, "en"), (1L, "aa"))
    val got = lp(edges, seeds, 1)
    assert(got(1L) == "en")
    assert(got(2L) == "en")
  }

  test("labelPropagation: seeds never change; unreached nodes stay null") {
    // 5-6-7 chain seeded at 5 with 'fr'; node 9 isolated in a 9-8 pair
    // with no seed anywhere → null forever.
    val edges = Seq((5L, 6L), (6L, 7L), (8L, 9L))
    val seeds = Seq((5L, "fr"), (6L, "xx"))
    val got = lp(edges, seeds, 2)
    assert(got(5L) == "fr" && got(6L) == "xx")
    // 7's only neighbor is the 'xx' seed
    assert(got(7L) == "xx")
    assert(got(8L) == null && got(9L) == null)
  }

  test("labelPropagation: labels spread one hop per round over a chain") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val seeds = Seq((0L, "en"))
    assert(lp(edges, seeds, 1)(2L) == null)
    assert(lp(edges, seeds, 2)(2L) == "en")
    assert(lp(edges, seeds, 4)(4L) == "en")
  }

  test("labelPropagation: isolated seeds appear in the output; " +
      "result is independent of partitioning") {
    val edges = Seq((1L, 2L))
    val seeds = Seq((99L, "zz"), (1L, "aa"))
    val got = lp(edges, seeds, 3)
    assert(got(99L) == "zz")
    val edgesSkewed = spark.createDataFrame(
      Seq((1L, 2L), (2L, 1L), (1L, 2L))).toDF("a", "b").repartition(7)
    val again = Graph.labelPropagation(edgesSkewed, col("a"), col("b"),
        Seq((99L, "zz"), (1L, "aa")).toDF("id", "l"),
        col("id"), col("l"), 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
  }

  test("labelPropagationIncremental ≡ from-scratch over the union " +
      "graph; store deltas hold only the frontier; retries idempotent") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lpinc-").toString + "/state"
    // old graph: chain 0-1-2-3-4 seeded 'en' at 0; far pair 10-11
    // seeded 'de' at 10. New edges extend the chain: 4-5, 5-6.
    val oldE = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val newE = Seq((4L, 5L), (5L, 6L))
    val seeds = Seq((0L, "en"), (10L, "de"))
    Graph.writeLabelState(oldE.toDF("a", "b"), col("a"), col("b"),
      seeds.toDF("id", "l"), col("id"), col("l"), iters = 3, dir)
    def runInc() = Graph.labelPropagationIncremental(
        (oldE ++ newE).toDF("a", "b"), col("a"), col("b"),
        newE.toDF("a", "b"), col("a"), col("b"),
        seeds.toDF("id", "l"), col("id"), col("l"),
        iters = 3, dir, batchId = 1L)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val inc = runInc()
    val full = lp(oldE ++ newE, seeds, 3)
    assert(inc == full && full(3L) == "en" && full(11L) == "de"
      && full(5L) == null)
    // the delta batch holds ONLY frontier nodes (within 3 hops of a
    // new edge): 0, 1, 10, 11 stay clean and never re-enter the store
    val delta = spark.read.parquet(s"$dir/batch=1")
      .select("id").distinct().as[Long].collect().toSet
    assert(delta.subsetOf(Set(2L, 3L, 4L, 5L, 6L)) &&
      Set(5L, 6L).subsetOf(delta), s"delta = $delta")
    // a retried batch (same id) reproduces the same result
    assert(runInc() == inc)
    // OPTIMIZE fold, then a SECOND batch chained through the compacted
    // generation: still ≡ the from-scratch run over the extended graph
    assert(Graph.compactLabelState(spark, dir).contains(1L))
    val newE2 = Seq((6L, 7L), (2L, 20L))
    val inc2 = Graph.labelPropagationIncremental(
        (oldE ++ newE ++ newE2).toDF("a", "b"), col("a"), col("b"),
        newE2.toDF("a", "b"), col("a"), col("b"),
        seeds.toDF("id", "l"), col("id"), col("l"),
        iters = 3, dir, batchId = 2L)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(inc2 == lp(oldE ++ newE ++ newE2, seeds, 3))
  }

  private def triCounts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("a", "b"), col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangleCountsIncremental ≡ from-scratch; multi-new-edge " +
      "triangles count once; deltas touch only affected nodes") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-trinc-").toString + "/tri"
    // old graph: square 1-2-3-4 (no triangles) + lone edge 5-6 + far
    // triangle 20-21-22 (must never be re-enumerated or re-counted)
    val oldE = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (5L, 6L),
      (20L, 21L), (21L, 22L), (20L, 22L))
    Graph.writeTriangleStore(oldE.toDF("a", "b"), col("a"), col("b"),
      dir)
    // batch 1: the diagonal 1-3 (two new triangles through old edges)
    // plus 5-7 AND 6-7 (ONE new triangle with TWO new edges — the
    // double-count trap) plus an all-new triangle 8-9-10
    val new1 = Seq((1L, 3L), (5L, 7L), (6L, 7L),
      (8L, 9L), (8L, 10L), (9L, 10L))
    val all1 = oldE ++ new1
    def runInc(all: Seq[(Long, Long)], nw: Seq[(Long, Long)],
               bid: Long): Map[Long, Long] =
      Graph.triangleCountsIncremental(all.toDF("a", "b"), col("a"),
          col("b"), nw.toDF("a", "b"), col("a"), col("b"), dir, bid)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc1 = runInc(all1, new1, 1L)
    val full1 = triCounts(all1)
    assert(inc1 == full1, s"$inc1 vs $full1")
    assert(full1(1L) == 2L && full1(7L) == 1L && full1(5L) == 1L
      && full1(8L) == 1L && full1(20L) == 1L && full1(2L) == 1L)
    // the delta batch holds only touched nodes — the far triangle and
    // the untouched square corner never re-enter the store
    val delta = spark.read.parquet(s"$dir/batch=1")
      .select("id").as[Long].collect().toSet
    assert(!delta(20L) && !delta(21L) && !delta(22L), s"$delta")
    // retry idempotence
    assert(runInc(all1, new1, 1L) == inc1)
    // OPTIMIZE fold, then a second batch through the generation
    assert(Graph.compactTriangleStore(spark, dir).contains(1L))
    val new2 = Seq((4L, 2L)) // second diagonal: two more triangles
    val inc2 = runInc(all1 ++ new2, new2, 2L)
    assert(inc2 == triCounts(all1 ++ new2))
  }

  test("kCoreIncremental ≡ from-scratch: frontier flips in, cascades, " +
      "peel-aways, and re-sent historical edges are harmless") {
    def kc(edges: Seq[(Long, Long)]): Set[Long] =
      Graph.kCore(edges.toDF("a", "b"), col("a"), col("b"), k = 3)
        .as[Long].collect().toSet
    def inc(dir: String, all: Seq[(Long, Long)], nw: Seq[(Long, Long)],
            bid: Long): Set[Long] =
      Graph.kCoreIncremental(all.toDF("a", "b"), col("a"), col("b"),
          nw.toDF("a", "b"), col("a"), col("b"), k = 3, dir, bid)
        .as[Long].collect().toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kcinc-").toString + "/kc"
    // old graph: K4 on 1-4 (the 3-core) + path 5-6-7 (peels away)
    val oldE = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L), (6L, 7L))
    Graph.writeKCoreStore(oldE.toDF("a", "b"), col("a"), col("b"),
      k = 3, dir)
    // batch 1: a mutual two-node cascade — 8 and 9 each reach degree 3
    // only if BOTH survive (1,2 core + each other)
    val new1 = Seq((1L, 8L), (2L, 8L), (8L, 9L), (1L, 9L), (2L, 9L))
    val all1 = oldE ++ new1
    val got1 = inc(dir, all1, new1, 1L)
    assert(got1 == kc(all1) && got1 == Set(1L, 2L, 3L, 4L, 8L, 9L))
    // retry idempotence
    assert(inc(dir, all1, new1, 1L) == got1)
    // OPTIMIZE fold, then: a batch of only peel-away edges (5-7 closes
    // a path triangle but degrees stay 2) INCLUDING a re-sent
    // historical edge — membership unchanged
    assert(Graph.compactKCoreStore(spark, dir).contains(1L))
    val new2 = Seq((5L, 7L), (1L, 2L))
    val got2 = inc(dir, all1 ++ Seq((5L, 7L)), new2, 2L)
    assert(got2 == got1 && got2 == kc(all1 ++ Seq((5L, 7L))))
  }

  test("connectedComponentsIncremental ≡ from-scratch: bridges, new " +
      "pairs, attachments; only losing components rewrite") {
    def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
      Graph.connectedComponents(edges.toDF("a", "b"), col("a"),
          col("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def inc(dir: String, nw: Seq[(Long, Long)],
            bid: Long): Map[Long, Long] =
      Graph.connectedComponentsIncremental(nw.toDF("a", "b"),
          col("a"), col("b"), dir, bid)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ccinc-").toString + "/cc"
    // old components: {1,2,3}, {10,11}, {20,21,22}
    val oldE = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L))
    Graph.writeCCStore(oldE.toDF("a", "b"), col("a"), col("b"), dir)
    // batch 1: a bridge merging two old components, an all-new pair,
    // and a new node attaching to an old component
    val new1 = Seq((3L, 10L), (30L, 31L), (40L, 22L))
    val got1 = inc(dir, new1, 1L)
    assert(got1 == cc(oldE ++ new1))
    assert(got1(11L) == 1L && got1(40L) == 20L && got1(31L) == 30L)
    // ONLY the losing component's members and the new nodes are in
    // the delta — winners ({1,2,3}, {20,21,22}) never rewrite
    val delta = spark.read.parquet(s"$dir/batch=1")
      .select("id").as[Long].collect().toSet
    assert(delta == Set(10L, 11L, 30L, 31L, 40L), s"$delta")
    // retry idempotence
    assert(inc(dir, new1, 1L) == got1)
    // OPTIMIZE fold, then a second batch: a merge of two previously-
    // touched components plus a pure-internal no-op edge
    assert(Graph.compactCCStore(spark, dir).contains(1L))
    val new2 = Seq((22L, 31L), (1L, 2L))
    val got2 = inc(dir, new2, 2L)
    assert(got2 == cc(oldE ++ new1 ++ new2) && got2(31L) == 20L)
    val delta2 = spark.read.parquet(s"$dir/batch=2")
      .select("id").as[Long].collect().toSet
    assert(delta2 == Set(30L, 31L), s"$delta2")
  }

  test("profileTable: hostile column names (quotes, spaces, reserved " +
      "words) never reach the SQL parser") {
    val df = Seq(("x", 1L, "q"), (null, 2L, "q"))
      .toDF("it's", "a b", "select")
    val prof = graft.operators.Stats
      .profileTable(df, Seq("it's", "a b", "select"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(prof == Map(
      "it's" -> ((2L, 1L, 1L)),
      "a b" -> ((2L, 0L, 2L)),
      "select" -> ((2L, 0L, 1L))))
  }

  test("profileTable/profileDrift: exact counts incl. nulls; drift " +
      "joins per column") {
    val a = Seq(("en", 10L), ("en", 20L), (null, 30L))
      .toDF("lang", "n")
    val b = Seq(("en", 10L), ("de", 10L), ("fr", 40L), (null, 50L))
      .toDF("lang", "n")
    val prof = graft.operators.Stats.profileTable(a, Seq("lang", "n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(prof == Map("lang" -> ((3L, 1L, 1L)), "n" -> ((3L, 0L, 3L))))
    val drift = graft.operators.Stats.profileDrift(a, b, Seq("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(6))).toSet
    // (column, n_a, ndv_a, n_b, ndv_b)
    assert(drift == Set(("lang", 3L, 1L, 4L, 3L)))
  }

  test("pageRankPersonalized: hand-computed scaled-integer ranks; " +
      "teleport mass returns only to seeds") {
    def ppr(iters: Int): Map[Long, Long] =
      Graph.pageRankPersonalized(
          Seq((1L, 2L), (2L, 3L)).toDF("s", "d"), col("s"), col("d"),
          Seq(Tuple1(1L)).toDF("id"), col("id"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seeds start with ALL the mass: r0(1) = 10^6
    assert(ppr(0) == Map(1L -> 1000000L, 2L -> 0L, 3L -> 0L))
    // round 1: seed keeps base 150000; 2 inherits 85% of 1's mass
    assert(ppr(1) == Map(1L -> 150000L, 2L -> 850000L, 3L -> 0L))
    // round 2: the walk moves one more hop; only 1 gets teleport mass
    assert(ppr(2) == Map(1L -> 150000L, 2L -> 127500L, 3L -> 722500L))
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("a", "b"), col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRankWarm: warm rounds from a stored fixed point land at " +
      "least as close to the converged union ranks as a cold run of " +
      "the same length; idempotent under same-batch retry") {
    import org.apache.spark.sql.functions.col
    // history: a 20-node directed ring with chords; the delta adds a
    // hub node feeding and drawing from the ring
    val hist = (0L until 20L).map(i => (i, (i + 1) % 20)) ++
      (0L until 20L by 4L).map(i => (i, (i + 7) % 20))
    val delta = Seq((100L, 3L), (100L, 11L), (5L, 100L), (17L, 100L))
    val union = (hist ++ delta).toDF("a", "b")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-prwarm-").toString + "/pr"
    Graph.writePageRankStore(hist.toDF("a", "b"), col("a"), col("b"),
      iters = 8, dir)
    def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("id"), col("rank")).as[(Long, Long)]
        .collect().toMap
    val ref = ranksOf(Graph.pageRank(union, col("a"), col("b"),
      iters = 16))
    def dist(m: Map[Long, Long]): Long =
      ref.map { case (k, v) => math.abs(m.getOrElse(k, 0L) - v) }.max
    val warm = ranksOf(Graph.pageRankWarm(union, col("a"), col("b"),
      dir, batchId = 1L, rounds = 3))
    val cold = ranksOf(Graph.pageRank(union, col("a"), col("b"),
      iters = 3))
    assert(dist(warm) <= dist(cold),
      s"warm ${dist(warm)} worse than cold ${dist(cold)}")
    // a hub insertion shifts every node's teleport base (n 20 → 21)
    // AND reroutes mass: 3 warm rounds land within 1% of scale of the
    // 16-round fixed point on this adversarial delta
    assert(dist(warm) <= 10000L,
      s"3 warm rounds still ${dist(warm)} ulp from converged")
    // retry of the same batch id is overwrite-idempotent, and the
    // store view now serves the warm ranks
    val retry = ranksOf(Graph.pageRankWarm(union, col("a"), col("b"),
      dir, batchId = 1L, rounds = 3))
    assert(retry == warm)
    assert(ranksOf(Graph.pageRankStoreRanks(spark, dir)) == warm)
  }

  test("hitsWarm: warm rounds from stored hubs land at least as " +
      "close to the converged union scores as a cold run of the same " +
      "length; idempotent retry; compaction preserves the view") {
    import org.apache.spark.sql.functions.col
    // same ring-with-chords history and hub-insertion delta as the
    // pageRankWarm spec — the adversarial case where the new node
    // rewires mass through the whole graph
    val hist = (0L until 20L).map(i => (i, (i + 1) % 20)) ++
      (0L until 20L by 4L).map(i => (i, (i + 7) % 20))
    val delta = Seq((100L, 3L), (100L, 11L), (5L, 100L), (17L, 100L))
    val union = (hist ++ delta).toDF("a", "b")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hitswarm-").toString + "/hits"
    Graph.writeHitsStore(hist.toDF("a", "b"), col("a"), col("b"),
      iters = 8, dir)
    def scoresOf(df: org.apache.spark.sql.DataFrame)
        : Map[Long, (Long, Long)] =
      df.select(col("id"), col("hub"), col("auth"))
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
    val ref = scoresOf(Graph.hits(union, col("a"), col("b"),
      iters = 12))
    def dist(m: Map[Long, (Long, Long)]): Long =
      ref.map { case (k, (h, a)) =>
        val (gh, ga) = m.getOrElse(k, (0L, 0L))
        math.max(math.abs(gh - h), math.abs(ga - a))
      }.max
    val warm = scoresOf(Graph.hitsWarm(union, col("a"), col("b"),
      dir, batchId = 1L, rounds = 2))
    val cold = scoresOf(Graph.hits(union, col("a"), col("b"),
      iters = 2))
    assert(dist(warm) <= dist(cold),
      s"warm ${dist(warm)} worse than cold ${dist(cold)}")
    // retry of the same batch id is overwrite-idempotent, and the
    // store view serves the warm scores
    val retry = scoresOf(Graph.hitsWarm(union, col("a"), col("b"),
      dir, batchId = 1L, rounds = 2))
    assert(retry == warm)
    assert(scoresOf(Graph.hitsStoreScores(spark, dir)) == warm)
    // compaction folds batches without changing the view
    assert(Graph.compactHitsStore(spark, dir).isDefined)
    assert(scoresOf(Graph.hitsStoreScores(spark, dir)) == warm)
  }

  test("pprForwardPush: hand-computed star pushes; locality — the " +
      "eps threshold freezes the frontier strictly inside the graph") {
    import org.apache.spark.sql.functions.col
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val seed = Seq(Tuple1(0L)).toDF("sid")
    def stateOf(df: org.apache.spark.sql.DataFrame)
        : Map[Long, (Long, Long)] =
      df.select(col("id"), col("p"), col("r"))
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
    // round 1: seed pushes — ar=150000, keep=425000, give=141666
    val one = stateOf(Graph.pprForwardPush(star, col("a"), col("b"),
      seed, col("sid"), rounds = 1, epsNum = 0))
    assert(one == Map(
      0L -> ((150000L, 425000L)), 1L -> ((0L, 141666L)),
      2L -> ((0L, 141666L)), 3L -> ((0L, 141666L))))
    // round 2: center ar=63750 keep=180625 give=60208; leaves
    // ar=21249 keep=60208 give=60209 back to the center
    val two = stateOf(Graph.pprForwardPush(star, col("a"), col("b"),
      seed, col("sid"), rounds = 2, epsNum = 0))
    assert(two == Map(
      0L -> ((213750L, 180625L + 3 * 60209L)),
      1L -> ((21249L, 120416L)), 2L -> ((21249L, 120416L)),
      3L -> ((21249L, 120416L))))
    // locality: on a 40-node path with a real threshold, residuals
    // decay geometrically per hop and freeze BELOW deg·eps·scale —
    // the far side of the graph is never touched, rounds to spare
    val path = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val local = stateOf(Graph.pprForwardPush(path, col("a"), col("b"),
      seed, col("sid"), rounds = 12, epsNum = 1, epsDen = 100))
    assert(local.keys.max < 12L,
      s"frontier reached ${local.keys.max} — eps bound not local")
    assert(local.size < 15 && local.contains(0L))
    // mass only leaks downward: total p + r never exceeds the seed
    assert(local.values.map(v => v._1 + v._2).sum <= 1000000L)
    // ranking sanity: closer to the seed = more settled mass
    assert(local(0L)._1 > local(1L)._1 && local(1L)._1 > local(2L)._1)
  }

  test("triangleCounts: hand graphs — triangle, path, K4, star") {
    assert(tri(Seq((1L, 2L), (2L, 3L), (1L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(tri(Seq((1L, 2L), (2L, 3L))) ==
      Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
    // K4: every vertex sits in C(3,2) = 3 triangles
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    assert(tri(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val star = (2L to 6L).map(i => (1L, i))
    assert(tri(star) == (1L to 6L).map(_ -> 0L).toMap)
  }

  test("triangleCounts: parallel/reversed/self edges collapse; " +
      "result independent of partitioning") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L), (4L, 5L))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L)
    assert(tri(messy) == want)
    val skewed = Graph.triangleCounts(
        messy.toDF("a", "b").repartition(7), col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(skewed == want)
  }

  test("triangleCounts: hub + closures — orientation caps the wedge " +
      "fanout at the hub but counts stay exact") {
    // hub 1 connects to 2..9; only (2,3) and (4,5) close
    val edges = (2L to 9L).map(i => (1L, i)) ++
      Seq((2L, 3L), (4L, 5L))
    val got = tri(edges)
    assert(got(1L) == 2L && got(2L) == 1L && got(3L) == 1L &&
      got(4L) == 1L && got(5L) == 1L && got(6L) == 0L)
  }

  private def core(edges: Seq[(Long, Long)], k: Int): Set[Long] =
    Graph.kCore(edges.toDF("a", "b"), col("a"), col("b"), k)
      .collect().map(_.getLong(0)).toSet

  test("kCore: paths peel to empty, cycles survive, cliques survive " +
      "at k = m−1, pendants peel off a clique") {
    val path = (1L to 7L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(core(path, 2) == Set.empty)
    val cycle = path :+ ((7L, 1L))
    assert(core(cycle, 2) == (1L to 7L).toSet)
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    assert(core(k4, 3) == Set(1L, 2L, 3L, 4L))
    assert(core(k4, 4) == Set.empty)
    // clique + pendant chain: the chain peels over several rounds,
    // the clique stays
    val chained = k4 ++ Seq((4L, 10L), (10L, 11L), (11L, 12L))
    assert(core(chained, 2) == Set(1L, 2L, 3L, 4L))
  }

  test("kCore: deterministic under partitioning and messy edges") {
    val k4 = (for { i <- 1L to 4L; j <- (i + 1) to 4L }
      yield (i, j)) ++ Seq((2L, 1L), (3L, 3L), (4L, 10L))
    val a = core(k4, 3)
    val b = Graph.kCore(k4.toDF("a", "b").repartition(7), col("a"),
      col("b"), 3).collect().map(_.getLong(0)).toSet
    assert(a == Set(1L, 2L, 3L, 4L) && a == b)
  }

  test("madOutliers: hand-computed medians, MADs, and survivors") {
    // group g1: values 10,10,10,10,100 → med=10 (rank (5-1)/2=2 0-based),
    // devs 0,0,0,0,90 → mad=0 → every off-median row flags (k*0=0 < 90).
    // group g2: 1..7 → med=4, devs 3,2,1,0,1,2,3 sorted 0,1,1,2,2,3,3
    // → mad=2; k=1 → dev>2 flags values 1 and 7.
    val df = (Seq.fill(4)(10L) :+ 100L).zipWithIndex
      .map { case (v, i) => ("g1", v, i.toLong) }
      .++((1L to 7L).zipWithIndex.map { case (v, i) =>
        ("g2", v, (10 + i).toLong) })
      .toDF("g", "v", "id")
    val got = Outliers.madOutliers(df, col("g"), col("v"),
        Seq(col("id")), k = 1L)
      .select(col("g"), col("v"), col("med"), col("mad"), col("dev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      ("g1", 100L, 10L, 0L, 90L),
      ("g2", 1L, 4L, 2L, 3L),
      ("g2", 7L, 4L, 2L, 3L)))
  }

  test("madOutliers: k scales the fence; even-count groups use the " +
      "lower median") {
    // 1,2,3,4: lower med = 2 (0-based rank 1), devs 1,0,1,2 sorted
    // 0,1,1,2 → mad = 1 (0-based rank 1)
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L),
      ("g", 4L, 4L)).toDF("g", "v", "id")
    val k1 = Outliers.madOutliers(df, col("g"), col("v"),
      Seq(col("id")), k = 1L).collect()
    assert(k1.map(_.getAs[Long]("v")).toSet == Set(4L))
    val k2 = Outliers.madOutliers(df, col("g"), col("v"),
      Seq(col("id")), k = 2L).collect()
    assert(k2.isEmpty)
  }

  test("discreteQuantiles: PERCENTILE_DISC ranks, hand-checked; " +
      "q = 1.0 is the max; no window in the plan") {
    // group g: 10,20,30,40 → q=0.25→rank 1→10; 0.5→rank 2→20;
    // 0.75→rank 3→30; 1.0→rank 4→40. group h: 7 → every q→7.
    val df = Seq(("g", 10L, 1L), ("g", 20L, 2L), ("g", 30L, 3L),
      ("g", 40L, 4L), ("h", 7L, 5L)).toDF("g", "v", "id")
    val res = Outliers.discreteQuantiles(df, col("g"), col("v"),
      Seq(col("id")), Seq(0.25, 0.5, 0.75, 1.0))
    val got = res.collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("g", 0.25) -> 10L, ("g", 0.5) -> 20L, ("g", 0.75) -> 30L,
      ("g", 1.0) -> 40L,
      ("h", 0.25) -> 7L, ("h", 0.5) -> 7L, ("h", 0.75) -> 7L,
      ("h", 1.0) -> 7L))
    val windows = physicalNodes(res).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty)
  }

  test("madClip: values clamp to [med − k·mad, med + k·mad]; " +
      "in-fence rows pass through unchanged") {
    // 1,2,3,4: med=2, mad=1; k=1 → fence [1, 3]: 4 clips to 3
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L),
      ("g", 4L, 4L)).toDF("g", "v", "id")
    val got = Outliers.madClip(df, col("g"), col("v"),
        Seq(col("id")), k = 1L)
      .select(col("id"), col("v"), col("clipped"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L),
      (4L, 4L, 3L)))
  }

  test("madOutliers: no window in the plan (prefix-sum ranks only)") {
    val df = Seq(("g", 1L, 1L), ("g", 5L, 2L), ("h", 2L, 3L))
      .toDF("g", "v", "id")
    val res = Outliers.madOutliers(df, col("g"), col("v"),
      Seq(col("id")), k = 1L)
    val windows = physicalNodes(res).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty)
  }

  test("connectedComponentsGeneric: string components resolve to the " +
      "lexicographically smallest member; messy edges collapse") {
    val edges = Seq(("beta", "alpha"), ("alpha", "beta"),
      ("beta", "gamma"), ("x", "y"), ("z", "z"))
      .toDF("a", "b")
    val got = Graph.connectedComponentsGeneric(edges, col("a"),
        col("b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("alpha" -> "alpha", "beta" -> "alpha",
      "gamma" -> "alpha", "x" -> "x", "y" -> "x"))
  }
}
