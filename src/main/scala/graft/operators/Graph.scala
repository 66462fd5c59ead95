package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph operators needed by the dedup pipeline.
  *
  * The one that matters at 100 TB: near-duplicate candidate pairs
  * (MinHash/SimHash/embedding LSH) form an edge list whose connected
  * components are the duplicate CLUSTERS — keeping one canonical doc
  * per cluster is the actual dedup decision. Pairwise removal ("drop
  * every id_b") over-deletes on transitive chains; component-wise
  * keep-min is the standard resolution.
  */
object Graph {

  /** DEBUG-ONLY hook (tools/RoundPlanDump): when set, each iterative
    * operator offers one representative per-round DataFrame here
    * BEFORE its staging action, so the round fragment's physical plan
    * (Exchange count, join strategy) can be captured as committed
    * evidence — the shipped query's own explain covers only the final
    * readout. `None` in production: the by-name argument is never
    * evaluated, so the hot path pays nothing.
    */
  private[graft] var roundPlanProbe
      : Option[(String, DataFrame) => Unit] = None
  @inline private def probeRound(tag: String, df: => DataFrame): Unit =
    roundPlanProbe.foreach(p => p(tag, df))

  /** Lineage truncation per round: reliable `checkpoint()` under a set
    * checkpoint dir (fault-tolerant; superseded files deleted by
    * freeLocalCheckpoint), else executor-local `localCheckpoint()`.
    */
  private implicit class RoundCheckpoint(private val df: DataFrame) {
    def roundCheckpoint(): DataFrame = Checkpoints.stage(df)
  }

  /** Connected components by iterative min-label propagation with a
    * contraction fallback: `comp(v) ← min(comp(v), min over neighbors
    * comp(u))` (plus pointer-jumping path compression) for up to
    * `switchAfter` rounds — one cheap map-side-partial shuffle per
    * round, and dedup graphs (diameter 1-3 after candidate generation)
    * converge in 2-3. If the graph has NOT converged by then (an
    * adversarial high-diameter topology), the surviving structure is
    * contracted through the current labels (edge (u,v) →
    * (comp(u), comp(v))) and finished by the O(log n)-round
    * large-star/small-star algorithm ([[connectedComponentsStar]]).
    *
    * Each round truncates the iterative lineage: with a checkpoint dir
    * set (`sparkContext.setCheckpointDir`) rounds use RELIABLE
    * `checkpoint()` — a 10-round job on a real cluster survives
    * executor loss, and superseded rounds' DFS files are deleted as
    * they are replaced — else fast executor-local `localCheckpoint()`.
    *
    * Input: an edge list (undirected; parallel edges / self-loops fine).
    * Output: (id, comp) — comp = the minimum vertex id in the component.
    * Deterministic: the fixpoint is unique regardless of iteration or
    * partitioning order.
    */
  def connectedComponents(edges: DataFrame, a: Column, b: Column,
                          maxIter: Int = 25,
                          switchAfter: Int = 8,
                          broadcastLimit: Long = 4000000L): DataFrame = {
    val e = edges.select(a.cast("long").as("src"), b.cast("long").as("dst"))
    // pre-partitioned on src: each round's neighbor-min aggregate
    // (groupBy src over the dst-keyed labels join) reuses the
    // checkpoint partitioning — in the broadcast-label regime the
    // round's vote path runs without an exchange
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .roundCheckpoint()
    // node count rides the labels staging job (the broadcast regime
    // gate every other iterative operator here carries — without it,
    // every round's |V|-sized label joins are planned as shuffle
    // joins and each exchange is a per-round barrier)
    val obs0 = org.apache.spark.sql.Observation()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .observe(obs0, count(lit(1)).as("n"))
      .roundCheckpoint()
    val small =
      obs0.get("n").asInstanceOf[Long] <= broadcastLimit
    def vSized(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    var converged = false
    var it = 0
    var prevSum: java.math.BigDecimal = null
    val propagationRounds = math.min(maxIter, switchAfter)
    while (!converged && it < propagationRounds) {
      val lbl = vSized(labels)
      val nbrMin = sym
        .join(lbl, sym("dst") === lbl("id"))
        .groupBy(sym("src").as("id"))
        .agg(min(col("comp")).as("__nbr"))
      val prop = labels
        .join(vSized(nbrMin), Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("__nbr"), col("comp")))
            .as("comp"))
      // path compression (pointer jumping): follow one more hop through
      // the PREVIOUS round's (checkpointed, so not recomputed) table —
      // comp ← oldComp(comp). Labels only decrease, so this stays
      // monotone and halves the remaining diameter each round:
      // O(log d) rounds on chains instead of O(d).
      // labels only ever decrease, so the fixpoint is reached exactly
      // when the label sum stops falling. The sum OBSERVES the
      // checkpoint-materialization job itself (no second pass per
      // round), as decimal(38,0): a Long sum over ~2^40 vertices with
      // 2^63-range ids overflows (wraps silently non-ANSI, throws
      // under ANSI), which would break the monotone
      // "equal sums ⇒ converged" argument.
      val obs = org.apache.spark.sql.Observation()
      // round 1's jump would follow the IDENTITY init table — a
      // provable no-op, so the join (and its broadcast build) is
      // skipped there
      val jumped =
        if (it == 0) prop
        else prop
          .join(vSized(labels.select(col("id").as("__cid"),
            col("comp").as("__cc"))), prop("comp") === col("__cid"),
            "left")
          .select(prop("id").as("id"),
            coalesce(col("__cc"), prop("comp")).as("comp"))
      probeRound("connectedComponents.round", jumped)
      val next = jumped
        .observe(obs,
          coalesce(sum(col("comp").cast("decimal(38,0)")),
            lit(java.math.BigDecimal.ZERO)).as("s"))
        .roundCheckpoint()
      val sumNow = obs.get("s").asInstanceOf[java.math.BigDecimal]
      converged = prevSum != null && prevSum.compareTo(sumNow) == 0
      prevSum = sumNow
      // free the superseded round's cached blocks — an iterative job
      // that checkpoints per round would otherwise leak the block
      // manager full across rounds (and across repeated calls)
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(labels)
      labels = next
      it += 1
    }
    val out =
      if (converged) labels
      else {
        // Contract through the partial labels — same quotient
        // components, (usually far) fewer vertices — and finish with
        // star contraction.
        val relab = sym
          .join(vSized(labels.select(col("id"), col("comp").as("cu"))),
            sym("src") === col("id")).drop("id")
          .join(vSized(labels.select(col("id"), col("comp").as("cv"))),
            sym("dst") === col("id")).drop("id")
          .select(col("cu").as("src"), col("cv").as("dst"))
          .where(col("src") =!= col("dst"))
          .distinct()
        // clamp: with maxIter <= switchAfter the leftover budget is 0
        // and starRounds would label straight off the UNCONVERGED edges
        // (duplicate ids with conflicting comps); give the fallback at
        // least one round and let its convergence guard fail loudly if
        // that isn't enough
        val roots = connectedComponentsStar(relab, col("src"), col("dst"),
          math.max(1, maxIter - propagationRounds))
        val joined = labels
          .join(vSized(roots.select(col("id").as("__rid"),
            col("comp").as("__rc"))),
            labels("comp") === col("__rid"), "left")
          .select(labels("id"),
            coalesce(col("__rc"), labels("comp")).as("comp"))
          .roundCheckpoint()
        org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(roots)
        joined
      }
    if (out ne labels)
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(labels)
    org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(sym)
    out
  }

  /** Connected components by alternating large-star/small-star
    * contraction — Kiveris et al., "Connected Components in MapReduce
    * and Beyond" (ACM SoCC 2014): converges in O(log n) rounds on ANY
    * topology (propagation needs O(diameter), O(log d) with path
    * compression), so this is the adversarial-graph path; each round
    * costs two groupBy-min shuffles of 16-byte edges plus a distinct.
    *
    *  - large-star: per vertex u, point every neighbor x > u at
    *    m = min(Γ(u) ∪ {u});
    *  - small-star: orient edges (larger → smaller); per u, point every
    *    smaller neighbor (and u itself) at the minimum.
    *
    * Both preserve connectivity; unions of stars are their fixpoint.
    * Convergence test = "no edge's target is itself a source" (a
    * two-level forest IS a union of stars), one left-semi join on
    * 8-byte keys per round.
    *
    * Output: (id, comp) like [[connectedComponents]]; isolated vertices
    * (no edges) don't appear, matching the propagation form.
    */
  def connectedComponentsStar(edges: DataFrame, a: Column, b: Column,
                              maxIter: Int = 20): DataFrame =
    starRounds(edges, a, b, maxIter)._1

  /** [[connectedComponentsStar]] plus the number of (large, small)
    * rounds it took — exposed for convergence-bound tests.
    */
  def starRounds(edges: DataFrame, a: Column, b: Column,
                 maxIter: Int = 20,
                 broadcastLimit: Long = 4000000L): (DataFrame, Int) = {
    val (e0, nE0) = Checkpoints.stageCount(edges
      .select(a.cast("long").as("u"), b.cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct())
    // per-round min tables are node-sized (≤ 2·edges rows) — below
    // the gate they broadcast into the star joins, so a round's only
    // exchanges are its two partial-aggregated groupBys + the
    // distinct, never an edge-table shuffle join
    var nE = nE0
    def gated(df: DataFrame): DataFrame =
      if (nE <= broadcastLimit) broadcast(df) else df

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u").as("mu"))
        .agg(min(col("v")).as("mv"))
        .select(col("mu"), least(col("mu"), col("mv")).as("m"))
      // no distinct here: smallStar's groupBy/distinct dedups right
      // after, and skipping it saves a full shuffle per round
      sym.join(gated(mins), sym("u") === col("mu"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      val o = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = o.groupBy(col("u").as("mu")).agg(min(col("v")).as("m"))
      o.join(gated(mins), o("u") === col("mu"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("mu").as("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    var e = e0
    var rounds = 0
    var isStar = false
    while (!isStar && rounds < maxIter) {
      val (next, nNext) =
        Checkpoints.stageCount(smallStar(largeStar(e)))
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(e)
      e = next
      nE = nNext
      rounds += 1
      // a union of stars ⇔ no edge target is also an edge source
      isStar = e.join(e.select(col("v").as("u")).distinct(),
        Seq("u"), "left_semi").isEmpty
    }
    // labels derived from a non-star edge set would emit duplicate ids
    // with conflicting comps — refuse rather than return silently wrong
    // components (star contraction halves depth per round, so any sane
    // budget converges; hitting this means maxIter was set far too low)
    require(isStar || e.isEmpty,
      s"connectedComponentsStar: not converged after $rounds rounds; " +
        "raise maxIter")
    val labels = e.select(col("u").as("id"), col("v").as("comp"))
      .union(e.select(col("v").as("id"), col("v").as("comp")))
      .distinct()
      .roundCheckpoint()
    org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(e)
    (labels, rounds)
  }

  /** Cluster-resolved dedup decision over an edge list: every vertex
    * with its cluster id (= min member) and whether it is the canonical
    * survivor. Vertices not in any edge are their own cluster and are
    * trivially kept, so only edge endpoints appear here.
    */
  def dedupClusters(edges: DataFrame, a: Column, b: Column): DataFrame =
    connectedComponents(edges, a, b)
      .select(col("id"), col("comp").as("cluster"),
        (col("id") === col("comp")).as("keep"))

  /** Fixed-point PageRank: authority scores over a directed edge list,
    * for source/domain weighting in corpus curation (a crawl that
    * ranks domains by link authority feeds the quality prior of its
    * sampling weights). `iters` synchronous iterations of
    *
    *   rank'(v) = (scale·(dampDen−dampNum)) div (dampDen·N)
    *            + (dampNum · Σ_{u→v} (rank(u) div outdeg(u))) div dampDen
    *
    * ENTIRELY in scaled-integer arithmetic (ranks are fixed-point
    * longs, `scale` = 1.0): every operation is a BIGINT multiply/add
    * or a floor division of non-negatives, so the result is
    * bit-deterministic, independent of partitioning and summation
    * order — a float PageRank cannot hash-match an oracle, THIS one
    * matches an unrolled-CTE SQL mirror exactly. Dangling mass is not
    * redistributed (the PageRank-lite variant: leaked mass uniformly
    * shrinks ranks without reordering them); floor-truncation loses
    * < 1 ulp of the fixed point per hop, bounded and identical on
    * every engine.
    *
    * Scale shape: each iteration is one shuffle (contribution
    * aggregate on dst) plus the ranks⋈edges join. The join strategy is
    * gated on the MEASURED node count (already in hand for the base
    * term): at or below `broadcastLimit` the |V|-sized rank and outdeg
    * tables broadcast, so the |E|-sized edge list never crosses the
    * wire — the domain-authority regime (|V| = #domains ≪ |E|). Above
    * the limit it degrades to shuffle joins, correct at any |V|.
    * Lineage is cut per iteration with [[Checkpoints.stage]], so long
    * runs honor the session's reliable-checkpoint mode like every
    * other iterative operator here.
    */
  def pageRank(edges: DataFrame, src: Column, dst: Column,
               iters: Int = 5, dampNum: Long = 85, dampDen: Long = 100,
               scale: Long = 1000000L,
               broadcastLimit: Long = 4000000L,
               start: Option[DataFrame] = None): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "need 0 <= dampNum <= dampDen")
    // staged PRE-PARTITIONED on dst (distinct FIRST so the dedup
    // keeps its map-side partial aggregation — the repartition then
    // re-exchanges only the deduped edges, once): every round's
    // inflow aggregate groups by dst over a broadcast-joined scan of
    // e, so with this layout the per-round plan has NO exchange at
    // all in the broadcast regime — the checkpoint partitioning is
    // reused round after round (guide §2.4)
    // outdeg rides the staged edge row (a src-partitioned window count
    // over the deduped edges): it is STATIC across rounds, so folding
    // it into e removes one |V|-sized broadcast/join from EVERY round
    // — the only per-round state left is the rank vector (guide §2.4)
    val e = Checkpoints.stage(
      edges.select(src.as("src"), dst.as("dst"))
        .distinct()
        .withColumn("outdeg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("src"))))
        .repartition(col("dst")))
    // nodes are |V|-sized and re-joined every iteration — stage them
    // once instead of recomputing the aggregate per round.
    val (nodes, n) = Checkpoints.stageCount(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    require(n > 0, "empty graph")
    val base = scale * (dampDen - dampNum) / (dampDen * n)
    // `start` WARM-STARTS the iteration: known ids take their stored
    // rank, unseen (new) ids the uniform prior — power iteration
    // converges from any start vector, a near-fixed-point start just
    // needs fewer rounds (the warm-start contract [[pageRankWarm]]
    // prices). The arithmetic stays bit-deterministic either way.
    var ranks = Checkpoints.stage(start match {
      case None =>
        nodes.select(col("id"), lit(scale / n).as("rank"))
      case Some(s0) =>
        nodes.join(s0.select(col("id"), col("rank").as("__r0")),
            Seq("id"), "left")
          .select(col("id"),
            coalesce(col("__r0"), lit(scale / n)).as("rank"))
    })
    val small = n <= broadcastLimit
    def vSized(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    var it = 0
    while (it < iters) {
      val contrib = e
        .join(vSized(ranks.withColumnRenamed("id", "src")), Seq("src"))
        .select(col("dst").as("id"),
          expr("rank DIV outdeg").as("share"))
        .groupBy(col("id"))
        .agg(sum(col("share")).as("inflow"))
      // contrib is |V|-sized (one row per in-degree-bearing node) —
      // under the gate it broadcasts like every other round state, so
      // the round plan has NO shuffle at all (nodes keeps its staged
      // partitioning; above the gate this degrades to the shuffle
      // join as before)
      val next = nodes
        .join(vSized(contrib), Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"($dampNum * coalesce(inflow, 0L)) DIV $dampDen"))
            .as("rank"))
      probeRound("pageRank.round", next)
      val staged = Checkpoints.stage(next)
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(ranks)
      ranks = staged
      it += 1
    }
    ranks
  }

  /** PERSONALIZED PageRank (the random-walk-with-restart variant:
    * Jeh & Widom, "Scaling personalized web search", WWW 2003):
    * teleport mass returns to a SEED set instead of the uniform
    * distribution, so ranks measure proximity to the seeds — the
    * trusted-source weighting of corpus curation ("how close is this
    * domain to the vetted allowlist" feeds the sampling prior), where
    * global PageRank measures only popularity.
    *
    * Same scaled-integer arithmetic, broadcast gating, and per-round
    * staging as [[pageRank]] — the ONLY differences are the base term
    * (scale·(1−d)/|S| on seed nodes, 0 elsewhere) and the start vector
    * (uniform over seeds). Bit-deterministic; the x_ppr oracle unrolls
    * the same iterations.
    */
  def pageRankPersonalized(edges: DataFrame, src: Column, dst: Column,
                           seeds: DataFrame, seedId: Column,
                           iters: Int = 5, dampNum: Long = 85,
                           dampDen: Long = 100, scale: Long = 1000000L,
                           broadcastLimit: Long = 4000000L): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "need 0 <= dampNum <= dampDen")
    // pre-partitioned on dst like [[pageRank]], with the static outdeg
    // folded onto the staged edge row (one fewer |V| broadcast/round)
    val e = Checkpoints.stage(
      edges.select(src.as("src"), dst.as("dst"))
        .distinct()
        .withColumn("outdeg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("src"))))
        .repartition(col("dst")))
    val (sd, ns) = Checkpoints.stageCount(
      seeds.select(seedId.as("id")).distinct())
    val (nodes, n) = Checkpoints.stageCount(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .union(sd.select(col("id"))).distinct())
    require(ns > 0, "empty seed set")
    val base = scale * (dampDen - dampNum) / (dampDen * ns)
    val small = n <= broadcastLimit
    def vSized(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    def seeded(rank: Long): DataFrame = nodes
      .join(vSized(sd.withColumn("__s", lit(1))), Seq("id"), "left")
      .select(col("id"),
        when(col("__s").isNotNull, lit(rank)).otherwise(lit(0L))
          .as("__seed_term"))
    var ranks = Checkpoints.stage(
      seeded(scale / ns).select(col("id"),
        col("__seed_term").as("rank")))
    val baseTerms = Checkpoints.stage(seeded(base))
    var it = 0
    while (it < iters) {
      val contrib = e
        .join(vSized(ranks.withColumnRenamed("id", "src")), Seq("src"))
        .select(col("dst").as("id"),
          expr("rank DIV outdeg").as("share"))
        .groupBy(col("id"))
        .agg(sum(col("share")).as("inflow"))
      // |V|-sized contrib broadcasts under the gate (see [[pageRank]])
      val next = baseTerms
        .join(vSized(contrib), Seq("id"), "left")
        .select(col("id"),
          (col("__seed_term") +
            expr(s"($dampNum * coalesce(inflow, 0L)) DIV $dampDen"))
            .as("rank"))
      probeRound("ppr.round", next)
      val staged = Checkpoints.stage(next)
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(ranks)
      ranks = staged
      it += 1
    }
    ranks
  }

  /** LOCAL personalized PageRank by synchronous FORWARD PUSH
    * (Andersen, Chung & Lang, "Local graph partitioning using
    * PageRank vectors", FOCS 2006 — the lazy-walk push, batched into
    * deterministic synchronous rounds): seed mass diffuses over the
    * UNDIRECTED edge list, each round pushing every active node whose
    * residual clears the degree-scaled threshold
    * (r·epsDen ≥ epsNum·scale·deg).
    *
    * Why this exists next to [[pageRankPersonalized]]: power-iteration
    * PPR touches EVERY node EVERY round — |V|-sized work regardless of
    * how local the answer is. Forward push's work is proportional to
    * the mass actually moved: the state table starts seeds-only and
    * grows exactly by push receivers, so a 10-seed query on a 100 TB
    * graph does frontier-sized joins over the seeds' neighborhoods
    * and never reads the far side. The eps threshold is the work
    * bound — residuals below deg·eps·scale stop pushing (ACL's
    * guarantee: |π(v) − p(v)| ≤ eps·deg(v) at the converged cut);
    * `rounds` caps rounds for a fixed, oracle-unrollable plan.
    *
    * Per push of node v (ALL scaled-integer, floor division —
    * deterministic, partitioning-independent, and mass only ever
    * leaks DOWNWARD, never inflates):
    *   ar = (alphaNum·r) div alphaDen   → p += ar
    *   rem = r − ar; keep = rem div 2 stays (the lazy half)
    *   give = (rem − keep) div deg to EACH neighbor
    * (an isolated pusher keeps the whole remainder). Returns
    * (id, p, r) for every TOUCHED node — p is the unnormalized
    * per-seed-scale mass (multi-seed runs are sums of per-seed
    * vectors; seeds start at r = scale each).
    */
  def pprForwardPush(edges: DataFrame, a: Column, b: Column,
                     seeds: DataFrame, seedId: Column,
                     rounds: Int = 4, alphaNum: Long = 15,
                     alphaDen: Long = 100, epsNum: Long = 1,
                     epsDen: Long = 10000L, scale: Long = 1000000L,
                     broadcastLimit: Long = 4000000L): DataFrame = {
    require(rounds >= 0 && alphaDen > 0 && alphaNum >= 0 &&
      alphaNum <= alphaDen && epsDen > 0 && epsNum >= 0 && scale > 0,
      "need 0 <= alphaNum <= alphaDen, epsDen > 0, scale > 0")
    val spark = edges.sparkSession
    val e0 = edges.select(a.as("src"), b.as("dst"))
    // pre-partitioned on dst: each round's share aggregate
    // (groupBy dst over broadcast-joined pushers) reuses the
    // checkpoint partitioning instead of re-exchanging per round
    val sym = Checkpoints.stage(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
        .repartition(col("dst")))
    val deg = Checkpoints.stage(
      sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("id"), col("deg")))
    var (state, nActive) = Checkpoints.stageCount(
      seeds.select(seedId.as("id")).where(col("id").isNotNull)
        .distinct()
        .select(col("id"), lit(0L).as("p"), lit(scale).as("r")))
    var it = 0
    while (it < rounds && nActive > 0) {
      def gated(df: DataFrame): DataFrame =
        if (nActive <= broadcastLimit) broadcast(df) else df
      // the degree table narrows to the ACTIVE slice through a
      // broadcast semi join (a scan of the staged deg table, never a
      // |V|-sized shuffle), then joins state at state size
      val degActive = deg.join(gated(state.select(col("id"))),
        Seq("id"), "left_semi")
      val st = state.join(gated(degActive), Seq("id"), "left")
        .select(col("id"), col("p"), col("r"),
          coalesce(col("deg"), lit(0L)).as("deg"))
      val pusher = col("r") > 0 &&
        col("r") * epsDen >= lit(epsNum * scale) * col("deg")
      val ar = expr(s"($alphaNum * r) DIV $alphaDen")
      val rem = col("r") - ar
      val keep = expr(s"(r - ($alphaNum * r) DIV $alphaDen) DIV 2")
      val updated = st.select(col("id"),
        when(pusher, col("p") + ar).otherwise(col("p")).as("p"),
        when(!pusher, col("r"))
          .when(col("deg") === 0, rem)
          .otherwise(keep).as("r"),
        when(pusher && col("deg") > 0,
          expr(s"(r - ($alphaNum * r) DIV $alphaDen" +
            s" - (r - ($alphaNum * r) DIV $alphaDen) DIV 2) DIV deg"))
          .otherwise(lit(0L)).as("give"),
        pusher.as("__push"))
      val shares = gated(updated.where(col("__push") && col("give") > 0)
          .select(col("id").as("src"), col("give")))
        .join(sym, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("give")).as("inc"))
        .select(col("dst").as("id"), col("inc"))
      // outer-merge as a partial-aggregated UNION instead of a
      // full_outer sort-merge join: one row per id on each side, so
      // sum() reproduces the coalesce arithmetic exactly — replaces
      // two exchanges + two sorts per round with one exchange and
      // keeps the merge map-side combinable (guide §2.3/§2.4)
      val (next, nNext) = Checkpoints.stageCount(
        updated.select(col("id"), col("p"), col("r"))
          .unionAll(shares.select(col("id"), lit(0L).as("p"),
            col("inc").as("r")))
          .groupBy(col("id"))
          .agg(sum(col("p")).as("p"), sum(col("r")).as("r")))
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(state)
      state = next
      nActive = nNext
      it += 1
    }
    state
  }

  /** HITS hubs & authorities (Kleinberg, "Authoritative sources in a
    * hyperlinked environment", JACM 1999) by scaled-integer power
    * iteration with MAX-normalization after each half-step: raw
    * scores divide (floor) by the round's maximum, scaled back to
    * [0, scale]. Max-normalization instead of the classical L2 keeps
    * every operation in exact integer arithmetic — no sqrt, no float
    * accumulation — so the whole iteration is a pure function of the
    * edge SET and unrolls into an exact SQL oracle (the x_pagerank
    * discipline); the normalization choice rescales each round but
    * the iteration still converges toward the principal left/right
    * singular directions of the adjacency, which is what HITS ranks
    * by.
    *
    * Scale: per round, two edge-sized shuffles (inflow/outflow sums
    * with map-side partials), a |V|-sized left join (broadcast-gated
    * on the measured node count), and a 1-row max broadcast — the
    * pageRank shape exactly; per-round state staged and freed.
    * Returns (id, hub, auth).
    */
  def hits(edges: DataFrame, src: Column, dst: Column,
           iters: Int = 5, scale: Long = 1000000L,
           broadcastLimit: Long = 4000000L,
           start: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // pre-partitioned on dst: the auth half-step's inflow aggregate
    // (groupBy dst) reuses the checkpoint partitioning per round; the
    // hub half-step (groupBy src) keeps its exchange — one exchange
    // per round instead of two
    val e = Checkpoints.stage(
      edges.select(src.as("src"), dst.as("dst"))
        .distinct().repartition(col("dst")))
    val (nodes, n) = Checkpoints.stageCount(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    require(n > 0, "empty graph")
    val small = n <= broadcastLimit
    def vSized(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    def normalized(raw: DataFrame, out: String): DataFrame = {
      val m = raw.agg(greatest(max(col("raw")), lit(1L)).as("__m"))
      raw.crossJoin(broadcast(m))
        .select(col("id"), expr(s"(raw * ${scale}L) DIV __m").as(out))
    }
    // `start` WARM-STARTS the iteration from a stored hub vector
    // (the [[hitsWarm]] contract): known ids take their stored hub,
    // unseen (new) ids the cold prior `scale` — power iteration
    // converges from any non-zero start, a near-fixed-point start
    // just needs fewer rounds. Only the HUB vector seeds: each round
    // derives auth from hub first, so a stored auth would be
    // overwritten before it was ever read.
    var hub = Checkpoints.stage(start match {
      case None => nodes.select(col("id"), lit(scale).as("hub"))
      case Some(s0) =>
        nodes.join(s0.select(col("id"), col("hub").as("__h0")),
            Seq("id"), "left")
          .select(col("id"),
            coalesce(col("__h0"), lit(scale)).as("hub"))
    })
    var auth: DataFrame = null
    var it = 0
    while (it < iters) {
      // the half-step aggregate is |V|-sized — broadcast under the
      // gate so the round plan keeps zero shuffles (see [[pageRank]])
      val rawA = nodes.join(
          vSized(e.join(vSized(hub.withColumnRenamed("id", "src")),
              Seq("src"))
            .groupBy(col("dst")).agg(sum(col("hub")).as("__x"))
            .withColumnRenamed("dst", "id")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("__x"), lit(0L)).as("raw"))
      probeRound("hits.authHalfRound", rawA)
      val nextAuth = Checkpoints.stage(normalized(rawA, "auth"))
      if (auth != null)
        org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(auth)
      auth = nextAuth
      val rawH = nodes.join(
          vSized(e.join(vSized(auth.withColumnRenamed("id", "dst")),
              Seq("dst"))
            .groupBy(col("src")).agg(sum(col("auth")).as("__x"))
            .withColumnRenamed("src", "id")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("__x"), lit(0L)).as("raw"))
      val nextHub = Checkpoints.stage(normalized(rawH, "hub"))
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(hub)
      hub = nextHub
      it += 1
    }
    nodes.join(hub, Seq("id")).join(auth, Seq("id"))
      .select(col("id"), col("hub"), col("auth"))
  }

  /** DETERMINISTIC random-walk corpus generation (the DeepWalk /
    * node2vec data step — Perozzi et al., KDD 2014: walk sequences
    * become skip-gram training text): `walksPerNode` walks of up to
    * `len` steps start at every node; at step t the walk at node v
    * moves to v's sorted-neighbor number
    * `PolyFp("start_walk_t_v") mod outdeg(v)`. No RNG state — the
    * "randomness" is the same engine-portable polynomial fingerprint
    * the deterministic samplers use, so the full walk corpus is a
    * pure function of the edge SET (reproducible across runs,
    * partitionings, and engines — the SQL oracle replays every hop).
    * Dead-end nodes end their walk (shorter sequences, the DeepWalk
    * convention for directed graphs). Returns (start, walk, step,
    * node), step 0 = the start node.
    *
    * Scale: per step, one join against the outdeg table and one
    * (node, idx) equality join against the neighbor index — both
    * broadcast-gated on the measured node count, walk-state-sized
    * shuffles otherwise; the neighbor index builds once (the only
    * per-node window, partitioned by src). Walk state is
    * |V|·walksPerNode rows regardless of step count.
    */
  def randomWalks(edges: DataFrame, src: Column, dst: Column,
                  walksPerNode: Int = 2, len: Int = 4,
                  broadcastLimit: Long = 4000000L): DataFrame = {
    require(walksPerNode >= 1 && len >= 0, "need walks >= 1, len >= 0")
    val e = Checkpoints.stage(
      edges.select(src.as("src"), dst.as("dst")).distinct())
    val nbr = Checkpoints.stage(e.select(col("src").as("__ns"),
      col("dst").as("__nd"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("dst"))) - 1).as("idx")))
    val od = Checkpoints.stage(
      nbr.groupBy(col("__ns")).agg(count(lit(1)).as("deg"))
        .select(col("__ns").as("__ds"), col("deg")))
    val (nodes, n) = Checkpoints.stageCount(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    val small = n <= broadcastLimit
    def vSized(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    var cur = Checkpoints.stage(nodes
      .select(col("id").as("start"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("walk"))
      .select(col("start"), col("walk"), lit(0).as("step"),
        col("start").as("node")))
    val outs = scala.collection.mutable.ArrayBuffer(cur)
    var t = 1
    while (t <= len) {
      val key = concat_ws("_", col("start"), col("walk"), lit(t),
        col("node"))
      val next = Checkpoints.stage(cur
        .join(vSized(od), col("node") === col("__ds"))
        .select(col("start"), col("walk"),
          pmod(TextAnalysis.fingerprint(key), col("deg")).as("__i"),
          col("node"))
        .join(vSized(nbr),
          col("node") === col("__ns") && col("__i") === col("idx"))
        .select(col("start"), col("walk"), lit(t).as("step"),
          col("__nd").as("node")))
      outs += next
      cur = next
      t += 1
    }
    outs.reduce(_.unionAll(_))
      .select(col("start"), col("walk"), col("step"), col("node"))
  }

  /** LANDMARK DISTANCE SKETCHES by multi-source BFS (the
    * landmark/pivot method for shortest-path estimation — Potamias et
    * al., "Fast shortest path distance estimation in large networks",
    * CIKM 2009): pick the `landmarks` smallest node ids (a
    * deterministic, documented pivot rule; degree-weighted selection
    * is a caller-side substitution), then run ONE layered BFS for all
    * landmarks simultaneously over the UNDIRECTED graph. Returns
    * (id, lm, dist) for every node within `maxDepth` of each
    * landmark — the sketch that answers dist(u, v) ≲ min_lm
    * d(u,lm) + d(lm,v) without a per-query traversal.
    *
    * Deterministic and oracle-replayable: BFS layers are set-valued
    * (no tie-breaks anywhere), so the result is a pure function of
    * the edge set; the SQL mirror is a depth-bounded recursive CTE
    * folded by min(dist).
    *
    * Scale: per layer, one frontier×edges join (frontier-sized, never
    * |V|·L) and one anti join against the accumulated sketch to keep
    * only first discoveries; the sketch accumulates to ≤ |V|·L rows,
    * layer state staged and freed per round. Early-exits when a layer
    * discovers nothing.
    */
  def landmarkDistances(edges: DataFrame, a: Column, b: Column,
                        landmarks: Int = 4, maxDepth: Int = 6,
                        pivots: Option[DataFrame] = None)
      : DataFrame = {
    require(landmarks >= 1 && maxDepth >= 0,
      "need landmarks >= 1, maxDepth >= 0")
    val e0 = edges.select(a.as("src"), b.as("dst"))
    val sym = Checkpoints.stage(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct())
    val nodes = sym.select(col("src").as("id")).distinct()
    // `pivots` (one `lm` column) FREEZES the landmark set — the
    // incremental path's contract: a store's landmarks are chosen
    // once at bootstrap and batches extend the same sketch, even if
    // later nodes would win the smallest-id rule
    val lms = Checkpoints.stage(pivots match {
      case Some(p) => p.select(col("lm"))
      case None => nodes.orderBy(col("id")).limit(landmarks)
        .select(col("id").as("lm"))
    })
    // BFS layers accumulate in a buffer; the sketch is their UNION —
    // re-staging the whole growing sketch per layer would rewrite
    // O(|V|·L) rows `maxDepth` times (and pay a second job per layer
    // for the liveness count, which now rides the layer's staging job
    // as an Observation)
    val (l0, n0) = Checkpoints.stageCount(
      lms.select(col("lm").as("id"), col("lm"), lit(0).as("dist")))
    val layers = scala.collection.mutable.ArrayBuffer(l0)
    def sketchView: DataFrame = layers.reduce(_ unionAll _)
    var frontier = l0
    var d = 1
    var alive = n0 > 0
    while (d <= maxDepth && alive) {
      val (next, nNext) = Checkpoints.stageCount(
        frontier.join(sym, col("id") === col("src"))
          .select(col("dst").as("id"), col("lm"), lit(d).as("dist"))
          .distinct()
          .join(sketchView.select(col("id"), col("lm")),
            Seq("id", "lm"), "left_anti"))
      alive = nNext > 0
      if (alive) {
        layers += next
        frontier = next
      }
      d += 1
    }
    sketchView
  }

  /** HARMONIC closeness centrality within `maxDepth` hops — the
    * influence ranking of a near-dup/citation graph (which sources
    * sit closest to everything else), in the bounded-radius form that
    * is the only honest one on a sketch: hc(u) = Σ over v ≠ u within
    * `maxDepth` of ⌊scale / d(u,v)⌋, integer floor-division per pair
    * then an integer sum — bit-deterministic, no float accumulation,
    * and the SQL mirror is the same arithmetic over a recursive-CTE
    * BFS. Harmonic (Σ 1/d), not classic (1/Σd): unreachable pairs
    * contribute zero instead of poisoning the sum, so the truncated
    * radius is semantically clean (Boldi & Vigna, "Axioms for
    * centrality", Internet Math 2014).
    *
    * Exact arm = one multi-source BFS with EVERY node as a pivot
    * ([[landmarkDistances]]' loop): per layer one frontier×edges join,
    * sketch ≤ |V|² rows — the licensed small-graph baseline. The
    * SCALE path is [[harmonicClosenessLandmark]]: the Eppstein-Wang
    * estimator over L ≪ |V| pivots (one pass over a maintained
    * landmark sketch, |V|·L rows — the store the streaming gate
    * already keeps). Nodes with no neighbor within range keep a
    * 0-valued row (absence would conflate "isolated" with "absent").
    */
  def harmonicCloseness(edges: DataFrame, a: Column, b: Column,
                        maxDepth: Int = 6,
                        scale: Long = 1000000L): DataFrame = {
    val e0 = edges.select(a.as("src"), b.as("dst"))
    val nodes = Checkpoints.stage(
      e0.select(col("src").as("id"))
        .union(e0.select(col("dst").as("id")))
        .where(col("id").isNotNull)
        .distinct())
    val sketch = landmarkDistances(edges, a, b, maxDepth = maxDepth,
      pivots = Some(nodes.select(col("id").as("lm"))))
    nodes.join(
        sketch.where(col("dist") >= 1)
          .groupBy(col("id"))
          .agg(sum(expr(s"${scale}L div dist")).as("hc")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("hc"), lit(0L)).as("hc"))
  }

  /** The LANDMARK estimator of [[harmonicCloseness]] (Eppstein &
    * Wang, "Fast approximation of centrality", J. Graph Algorithms
    * Appl. 2004, harmonic form): hc_est(u) = Σ over the L frozen
    * pivots of ⌊scale / d(u, lm)⌋ — a single pass over the (id, lm,
    * dist) sketch [[writeLandmarkStore]] maintains, |V|·L rows
    * instead of the exact arm's |V|² BFS. Deterministic pivots
    * (the L smallest node ids, or a store's frozen set) make the
    * estimator itself ORACLE-EXACT — correctness is hash-checked,
    * and only the estimator-vs-exact ranking agreement is a judgment
    * call for the caller. Same 0-row rule for pivot-unreachable
    * nodes.
    */
  def harmonicClosenessLandmark(sketch: DataFrame,
                                allNodes: DataFrame,
                                scale: Long = 1000000L): DataFrame =
    allNodes.select(col(allNodes.columns.head).as("id")).distinct()
      .join(
        sketch.where(col("dist") >= 1)
          .groupBy(col("id"))
          .agg(sum(expr(s"${scale}L div dist")).as("hc_est")),
        Seq("id"), "left")
      .select(col("id"),
        coalesce(col("hc_est"), lit(0L)).as("hc_est"))

  // ---------- incremental landmark-distance store ----------

  /** Persist [[landmarkDistances]]'s sketch as `batch=0` of an
    * incremental store (id-clustered (id, lm, dist, __b) rows on the
    * shared gen=/batch= protocol), the warm base for
    * [[landmarkDistancesIncremental]]. The landmark set is FROZEN
    * here: landmarks are recoverable from the store itself as the
    * dist = 0 rows, so no side artifact is needed.
    */
  def writeLandmarkStore(edges: DataFrame, a: Column, b: Column,
                         landmarks: Int, maxDepth: Int,
                         storeDir: String, filesOut: Int = 4): Unit =
    Stats.withWriterLease(edges.sparkSession, Seq(storeDir),
        "writeLandmarkStore(batch)") {
    landmarkDistances(edges, a, b, landmarks, maxDepth)
      .select(col("id"), col("lm"), col("dist"), lit(0L).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"), col("lm"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=0")
    Stats.upsertManifest(edges.sparkSession, storeDir,
      storeManifestPath(storeDir))
  }

  private def landmarkStoreView(
      spark: org.apache.spark.sql.SparkSession, storeDir: String,
      beforeBatch: Long): DataFrame = {
    Stats.openCommittedStore(spark, storeDir,
        Seq("id" -> "bigint", "lm" -> "bigint", "dist" -> "int",
          "__b" -> "bigint"), "landmarkStore")
      .where(col("__b") < beforeBatch)
      .groupBy(col("id"), col("lm"))
      .agg(min(col("dist")).as("dist"))
  }

  /** The landmark store's CURRENT sketch (distances only shrink under
    * edge insertion, so the fold is min(dist) per (id, lm)).
    */
  def landmarkStoreDistances(spark: org.apache.spark.sql.SparkSession,
                             storeDir: String): DataFrame =
    landmarkStoreView(spark, storeDir, Long.MaxValue)

  /** Snapshot read of the landmark store as of batch `asOf` — same
    * contract and retention trade as [[ccStoreLabelsAsOf]].
    */
  def landmarkStoreDistancesAsOf(
      spark: org.apache.spark.sql.SparkSession, storeDir: String,
      asOf: Long): DataFrame = {
    require(asOf >= 0L, "asOf is a committed batch id")
    landmarkStoreView(spark, storeDir, asOf + 1)
  }

  /** WARM-START landmark sketch maintenance: distances over the UNION
    * graph for the store's FROZEN landmark set, relaxing ONLY from the
    * new edges' endpoints — the incremental-SSSP insertion step
    * (Ramalingam & Reps, "An incremental algorithm for a
    * generalization of the shortest-path problem", J. Algorithms
    * 1996, specialized to unit weights and batched): edge insertion
    * can only SHRINK distances, so the stored sketch is a valid
    * upper bound, and any improved node's shortest union path crosses
    * a new edge — seed candidates d(u)+1 across each new edge in both
    * directions, keep the ones that beat the store, and propagate
    * improvements one hop per round. Sound and complete by induction
    * along the improved path: the first improved vertex on it is a
    * new-edge endpoint (its predecessor is unimproved, so an old
    * predecessor edge would contradict the old BFS), and every later
    * one is reached from the previous improvement.
    *
    * Contract (the monotone gate-store contract everywhere):
    * `allEdges` is any SUPERSET of the union edges within `maxDepth`
    * hops of a new edge — improvements never propagate farther; pass
    * the full union list when reach slicing isn't cheap. `newEdges`
    * is the batch (re-sent edges are harmless: their candidates never
    * beat the store); `batchId` exceeds every prior append; `maxDepth`
    * matches the store's bootstrap. The append holds only IMPROVED
    * (id, lm) rows — frontier-sized, never |V|·L — and retries are
    * overwrite-idempotent (the prior view reads batches < batchId).
    *
    * Returns the full current sketch, ≡ [[landmarkDistances]] over
    * the union with the store's frozen pivots
    * (x_landmark_incremental replays it with the shared depth-bounded
    * recursive-CTE oracle over the union edge list).
    *
    * Scale: per round, one frontier×edges join and one improvement
    * anti-probe of the current sketch — frontier-sized throughout; at
    * most `maxDepth` rounds (a candidate accepted in round r has
    * dist ≥ r+1 ≤ maxDepth), early-exit when a round improves
    * nothing; round state staged and freed ([[Checkpoints]]).
    */
  def landmarkDistancesIncremental(
      allEdges: DataFrame, a: Column, b: Column,
      newEdges: DataFrame, na: Column, nb: Column,
      storeDir: String, batchId: Long, maxDepth: Int = 6,
      filesOut: Int = 4, broadcastLimit: Long = 4000000L): DataFrame =
    Stats.withWriterLease(allEdges.sparkSession, Seq(storeDir),
        "landmarkDistancesIncremental(batch)") {
    require(batchId >= 1L, "batchId 0 is the writeLandmarkStore base")
    require(maxDepth >= 0, "maxDepth must be >= 0")
    val spark = allEdges.sparkSession
    Stats.requireMonotoneBatch(spark, Seq(storeDir), batchId,
      "landmarkDistancesIncremental")
    val stored = Checkpoints.stage(
      landmarkStoreView(spark, storeDir, batchId))
    val e0 = allEdges.select(a.as("src"), b.as("dst"))
    val sym = Checkpoints.stage(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct())
    val en0 = newEdges.select(na.as("src"), nb.as("dst"))
    val enSym = en0
      .union(en0.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
    // improvements that beat the CURRENT sketch (missing = infinity).
    // The current best for a candidate key is min(stored, improvements
    // so far), and both are probed as LOOKUPS from the frontier-sized
    // candidate set: the once-staged store keeps its (id, lm)
    // checkpoint partitioning (only the tiny candidate side exchanges)
    // and the improvement layers are frontier-sized — the r16 form
    // re-min-folded stored ∪ all layers INSIDE every round's join,
    // a |sketch|-sized scan + aggregate per round that this removes
    // (one observed staging job per round is kept; the liveness count
    // still rides it).
    val improved =
      scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var nImp = 0L // accumulated improvement rows (broadcast gate)
    def improving(cand: DataFrame): DataFrame = {
      val candAgg = cand.where(col("dist") <= maxDepth)
        .groupBy(col("id"), col("lm"))
        .agg(min(col("dist")).as("dist"))
      val withSt = candAgg.join(
        stored.select(col("id"), col("lm"), col("dist").as("__st")),
        Seq("id", "lm"), "left")
      val withImp =
        if (improved.isEmpty)
          // dist is int end to end (the store schema pins it)
          withSt.withColumn("__imp", lit(null).cast("int"))
        else {
          val impMin = improved.reduce(_ unionAll _)
            .groupBy(col("id"), col("lm"))
            .agg(min(col("dist")).as("__imp"))
          withSt.join(
            if (nImp <= broadcastLimit) broadcast(impMin) else impMin,
            Seq("id", "lm"), "left")
        }
      // least() skips nulls, so missing-on-both-sides = infinity
      withImp
        .where(least(col("__st"), col("__imp")).isNull ||
          col("dist") < least(col("__st"), col("__imp")))
        .select(col("id"), col("lm"), col("dist"))
    }
    def curView: DataFrame =
      (stored +: improved.toSeq).reduce(_ unionAll _)
    var (frontier, nF) = Checkpoints.stageCount(improving(
      enSym.join(stored.select(col("id").as("src"), col("lm"),
          col("dist")), Seq("src"))
        .select(col("dst").as("id"), col("lm"),
          (col("dist") + 1).as("dist"))))
    var d = 0
    var alive = nF > 0
    while (alive && d < maxDepth) {
      improved += frontier
      nImp += nF
      // frontier-sized probe side broadcasts under the gate, so the
      // staged edge table is never shuffled per round (guide §3.1)
      val fSized =
        if (nF <= broadcastLimit) broadcast(frontier) else frontier
      val roundDf = improving(
        fSized.join(sym, col("id") === col("src"))
          .select(col("dst").as("id"), col("lm"),
            (col("dist") + 1).as("dist")))
      probeRound("landmarkIncremental.round", roundDf)
      val (next, nNext) = Checkpoints.stageCount(roundDf)
      frontier = next
      nF = nNext
      alive = nNext > 0
      d += 1
    }
    if (alive) improved += frontier // dist = maxDepth discoveries
    val sketch = curView
      .groupBy(col("id"), col("lm"))
      .agg(min(col("dist")).as("dist"))
    // delta append: only improved keys, min-folded across rounds
    // (a later round can re-improve a key); empty batches still
    // commit a visible empty dir (retry-idempotent)
    val delta =
      if (improved.isEmpty) frontier
      else Checkpoints.stage(improved.reduce(_ unionAll _)
        .groupBy(col("id"), col("lm"))
        .agg(min(col("dist")).as("dist")))
    delta.select(col("id"), col("lm"), col("dist"),
        lit(batchId).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"), col("lm"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=$batchId")
    Stats.upsertManifestFor(spark, storeDir,
      storeManifestPath(storeDir), s"$storeDir/batch=$batchId")
    // sketch is staged, so its data predates the overwrite safely
    sketch
  }

  /** Fold the landmark store's batches (min dist per (id, lm); __b =
    * the first batch that achieved it) into one generation.
    */
  def compactLandmarkStore(spark: org.apache.spark.sql.SparkSession,
                           storeDir: String, filesOut: Int = 4)
      : Option[Long] =
    Stats.withWriterLease(spark, Seq(storeDir),
        "compactLandmarkStore(batch)") {
    val tok = Stats.compactCommittedStore(spark, storeDir,
      _.groupBy(col("id"), col("lm"))
        .agg(min(struct(col("dist"), col("__b"))).as("m"))
        .select(col("id"), col("lm"), col("m.dist").as("dist"),
          col("m.__b").as("__b"))
        .repartitionByRange(filesOut, col("id"))
        .sortWithinPartitions(col("id"), col("lm")))
    if (tok.isDefined)
      Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }

  /** RETRACTION for the landmark store — [[rebuildCCStore]]'s
    * posture, distance-valued: edge (or node) deletion can only
    * GROW shortest distances, which
    * [[landmarkDistancesIncremental]]'s monotone-relaxation argument
    * cannot absorb (it rests on insertions only shrinking — the
    * stored sketch stops being a valid upper bound the moment an
    * edge on a shortest path disappears), so the honest form is a
    * REBUILD of the BFS sketch over the surviving edge list, written
    * as a SUPERSEDING `gen=<head+1>`: the min-fold view flips
    * atomically (old, smaller distances can never leak into a fold
    * with the new generation), vanished nodes drop, and later
    * incremental batches continue above the generation
    * (monotone-guarded in [[landmarkDistancesIncremental]]).
    *
    * The landmark set stays FROZEN through the retraction — pivots
    * are recovered from the store's own dist = 0 rows, minus any
    * pivot in `deletedNodes` (a retracted pivot's whole BFS tree
    * disappears with it; the sketch continues with the survivors,
    * the documented cost of deleting a pivot). A surviving pivot
    * that lost every edge keeps its dist = 0 self-row — same
    * node-universe rule as the recursive-CTE oracle.
    */
  def rebuildLandmarkStore(survivingEdges: DataFrame, a: Column,
                           b: Column, storeDir: String,
                           deletedNodes: Option[DataFrame] = None,
                           maxDepth: Int = 6, filesOut: Int = 4)
      : Long =
    Stats.withWriterLease(survivingEdges.sparkSession, Seq(storeDir),
        "rebuildLandmarkStore(batch)") {
    val spark = survivingEdges.sparkSession
    val storedLms = landmarkStoreDistances(spark, storeDir)
      .where(col("dist") === 0)
      .select(col("lm"))
    val pivots = deletedNodes match {
      case Some(del) => storedLms.join(
        del.select(col(del.columns.head).as("lm")), Seq("lm"),
        "left_anti")
      case None => storedLms
    }
    val tok = Stats.supersedingToken(spark, Seq(storeDir))
    landmarkDistances(survivingEdges, a, b, maxDepth = maxDepth,
        pivots = Some(pivots))
      .select(col("id"), col("lm"), col("dist"), lit(tok).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"), col("lm"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/gen=$tok")
    Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }

  /** NODE2VEC biased walks (Grover & Leskovec, KDD 2016): like
    * [[randomWalks]] but the hop distribution at step t ≥ 2 is tilted
    * by where the walk CAME from — candidate c leaving node v with
    * predecessor u weighs
    *
    *   wReturn   if c = u            (the 1/p return bias)
    *   wCommon   if edge u→c exists  (distance-1: stay local)
    *   wExplore  otherwise           (the 1/q exploration bias)
    *
    * with INTEGER weights (the paper's 1/p, 1, 1/q scaled by a common
    * denominator — exact arithmetic, no float sampling): candidates
    * sort by the neighbor index, the draw is
    * `PolyFp("start_walk_t_u_v") mod Σw`, and the candidate whose
    * exclusive cumulative-weight range contains the draw wins. Step 1
    * has no predecessor and draws uniformly (all weights 1, the
    * DeepWalk rule). Zero RNG state — the corpus is a pure function
    * of the edge SET and the three weights, so the SQL oracle replays
    * every biased hop. Directed adaptation: "distance 1" means the
    * directed edge u→c exists. Returns (start, walk, step, node) —
    * the [[skipGramPairs]]-composable schema.
    *
    * Scale: per step, one neighbor-index join (walk-local fanout ≤
    * outdeg), one LEFT probe of the distinct edge set for the u→c
    * flag, and one WALK-LOCAL window (partitioned by the walk state —
    * bounded by outdeg, never data-wide) computing the cumulative
    * ranges. Walk state carries (node, prev) only.
    */
  def node2vecWalks(edges: DataFrame, src: Column, dst: Column,
                    walksPerNode: Int = 2, len: Int = 4,
                    wReturn: Long = 1L, wCommon: Long = 4L,
                    wExplore: Long = 2L,
                    broadcastLimit: Long = 4000000L): DataFrame = {
    require(walksPerNode >= 1 && len >= 0, "need walks >= 1, len >= 0")
    require(wReturn >= 1 && wCommon >= 1 && wExplore >= 1,
      "weights must be >= 1")
    val e = Checkpoints.stage(
      edges.select(src.as("src"), dst.as("dst")).distinct())
    val nbr = Checkpoints.stage(e.select(col("src").as("__ns"),
      col("dst").as("__nd"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("dst"))) - 1).as("idx")))
    val (nodes, n) = Checkpoints.stageCount(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    val small = n <= broadcastLimit
    def vSized(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    val prevEdge = e.select(col("src").as("__pu"),
      col("dst").as("__pc"), lit(true).as("__adj"))
    // walk state: (start, walk, step, prev, node); prev = -1 at step 0
    var cur = Checkpoints.stage(nodes
      .select(col("id").as("start"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("walk"))
      .select(col("start"), col("walk"), lit(0).as("step"),
        lit(-1L).as("prev"), col("start").as("node")))
    val outs = scala.collection.mutable.ArrayBuffer(
      cur.select(col("start"), col("walk"), col("step"), col("node")))
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("start"), col("walk"), col("prev"), col("node"))
    var t = 1
    while (t <= len) {
      val cands = cur
        .join(vSized(nbr), col("node") === col("__ns"))
        .select(col("start"), col("walk"), col("prev"), col("node"),
          col("__nd").as("cand"), col("idx"))
      val weighted = (
          if (t == 1)
            cands.withColumn("__w", lit(1L))
          else
            cands.join(vSized(prevEdge),
                col("prev") === col("__pu") &&
                  col("cand") === col("__pc"), "left")
              .withColumn("__w",
                when(col("cand") === col("prev"), lit(wReturn))
                  .when(col("__adj"), lit(wCommon))
                  .otherwise(lit(wExplore)))
        )
        .withColumn("__cum",
          coalesce(sum(col("__w")).over(
            wKey.orderBy(col("idx"))
              .rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, -1)), lit(0L)))
        .withColumn("__tot", sum(col("__w")).over(wKey))
      val key = concat_ws("_", col("start"), col("walk"), lit(t),
        col("prev"), col("node"))
      val next = Checkpoints.stage(weighted
        .withColumn("__draw",
          pmod(TextAnalysis.fingerprint(key), col("__tot")))
        .where(col("__draw") >= col("__cum") &&
          col("__draw") < col("__cum") + col("__w"))
        .select(col("start"), col("walk"), lit(t).as("step"),
          col("node").as("prev"), col("cand").as("node")))
      outs += next.select(col("start"), col("walk"), col("step"),
        col("node"))
      cur = next
      t += 1
    }
    outs.reduce(_.unionAll(_))
      .select(col("start"), col("walk"), col("step"), col("node"))
  }

  /** SKIP-GRAM pair counts from a [[randomWalks]] corpus — the
    * trainable artifact of the DeepWalk pipeline: for every walk,
    * every ordered (center, context) node pair within `window` steps
    * of each other, aggregated to co-occurrence counts (what a
    * skip-gram/NCE trainer or an implicit-matrix factorization
    * consumes). Window pairing is a self-equality-join on the walk
    * key — co-partitioned, walk-local fan-out ≤ 2·window per row,
    * never a data-sized window function; counts aggregate map-side.
    */
  def skipGramPairs(walks: DataFrame, window: Int = 2): DataFrame = {
    val a = walks.select(col("start").as("__s"), col("walk").as("__w"),
      col("step").as("__ta"), col("node").as("center"))
    val b = walks.select(col("start").as("__s2"),
      col("walk").as("__w2"), col("step").as("__tb"),
      col("node").as("context"))
    a.join(b, col("__s") === col("__s2") && col("__w") === col("__w2")
        && col("__ta") =!= col("__tb")
        && abs(col("__ta") - col("__tb")) <= window)
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).as("n"))
  }

  /** DETERMINISTIC NEGATIVE SAMPLING for a skip-gram pair corpus —
    * the third artifact of the word2vec/DeepWalk data pipeline
    * (Mikolov et al., NeurIPS 2013: each positive (center, context)
    * pair trains against k sampled non-context nodes): negative j of
    * a pair is the node whose rank in the id-ordered node list equals
    * `PolyFp("center_context_j") mod |V|` — no RNG state, the same
    * engine-portable fingerprint the walk generator uses, so the
    * sample set is a pure function of the pair SET and the oracle
    * replays every draw. Draws that collide with the pair's own
    * center or context are DROPPED (not resampled — resampling would
    * chain data-dependent rounds; the uniform-draw collision mass is
    * ≤ 2/|V| per draw and the drop is itself deterministic), so each
    * pair yields ≤ k negatives. Returns (center, context, j, neg).
    *
    * Scale: the node index is the distributed prefix-sum rank (never
    * a global window); draws explode k-wide off the pair list and
    * resolve through one rank-equality join (broadcast-gated on the
    * measured node count). Uniform sampling, not degree^0.75 — the
    * unigram tilt needs float pow, which is not engine-portable; a
    * caller wanting it can weight downstream.
    */
  def negativeSamples(pairs: DataFrame, center: Column,
                      context: Column, k: Int,
                      broadcastLimit: Long = 4000000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val p = Checkpoints.stage(
      pairs.select(center.as("center"), context.as("context")))
    val nodes = p.select(col("center").as("id"))
      .union(p.select(col("context").as("id"))).distinct()
    val (idx, n) = Checkpoints.stageCount(Training.withPrefixSum(
      nodes, Seq(col("id")), lit(1L), "__idx"))
    def vSized(df: DataFrame): DataFrame =
      if (n <= broadcastLimit) broadcast(df) else df
    p.select(col("center"), col("context"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .withColumn("__draw",
        pmod(TextAnalysis.fingerprint(concat_ws("_", col("center"),
          col("context"), col("j"))), lit(n)))
      .join(vSized(idx.select(col("__idx"), col("id").as("neg"))),
        col("__draw") === col("__idx"))
      .where(col("neg") =!= col("center") &&
        col("neg") =!= col("context"))
      .select(col("center"), col("context"), col("j"), col("neg"))
  }

  // ---------- warm-start PageRank ----------

  /** Persist [[pageRank]]'s converged ranks as `batch=0` of an
    * incremental store (id-clustered (id, rank, __b) rows — the
    * label-store protocol), the warm-start base for
    * [[pageRankWarm]].
    */
  def writePageRankStore(edges: DataFrame, src: Column, dst: Column,
                         iters: Int, storeDir: String,
                         filesOut: Int = 4, dampNum: Long = 85,
                         dampDen: Long = 100, scale: Long = 1000000L,
                         broadcastLimit: Long = 4000000L): Unit =
    Stats.withWriterLease(edges.sparkSession, Seq(storeDir),
        "writePageRankStore(batch)") {
    pageRank(edges, src, dst, iters, dampNum, dampDen, scale,
        broadcastLimit)
      .select(col("id"), col("rank"), lit(0L).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=0")
    Stats.upsertManifest(edges.sparkSession, storeDir,
      storeManifestPath(storeDir))
  }

  /** RETRACTION for the PageRank store — the value-iteration twist
    * on [[rebuildCCStore]]'s posture: a warm restart from the stored
    * ranks would CONVERGE over the surviving graph, but the seed
    * still carries the deleted edges' influence (it decays
    * geometrically, never to exactly zero in finite rounds), which
    * fails the right-to-be-forgotten bar every other retraction here
    * meets exactly — so the honest form is a COLD recompute over the
    * surviving edge list, written as a superseding `gen=<head+1>`
    * (atomic view flip; vanished nodes drop; later [[pageRankWarm]]
    * batches continue above the generation, monotone-guarded).
    */
  def rebuildPageRankStore(survivingEdges: DataFrame, src: Column,
                           dst: Column, iters: Int, storeDir: String,
                           filesOut: Int = 4, dampNum: Long = 85,
                           dampDen: Long = 100, scale: Long = 1000000L,
                           broadcastLimit: Long = 4000000L): Long =
    Stats.withWriterLease(survivingEdges.sparkSession, Seq(storeDir),
        "rebuildPageRankStore(batch)") {
    val spark = survivingEdges.sparkSession
    val tok = Stats.supersedingToken(spark, Seq(storeDir))
    pageRank(survivingEdges, src, dst, iters, dampNum, dampDen, scale,
        broadcastLimit)
      .select(col("id"), col("rank"), lit(tok).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/gen=$tok")
    Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }

  private def prStoreView(spark: org.apache.spark.sql.SparkSession,
                          storeDir: String,
                          beforeBatch: Long): DataFrame = {
    Stats.openCommittedStore(spark, storeDir,
        Seq("id" -> "bigint", "rank" -> "bigint", "__b" -> "bigint"),
        "pageRankStore")
      .where(col("__b") < beforeBatch)
      .groupBy(col("id"))
      .agg(max(struct(col("__b"), col("rank"))).as("m"))
      .select(col("id"), col("m.rank").as("rank"))
  }

  /** The PageRank store's CURRENT ranks (newest batch wins per id). */
  def pageRankStoreRanks(spark: org.apache.spark.sql.SparkSession,
                         storeDir: String): DataFrame =
    prStoreView(spark, storeDir, Long.MaxValue)

  /** WARM-START PageRank over an EVOLVED graph: power iteration on
    * the union edge list initialized from the STORED ranks (new nodes
    * take the uniform prior), run for `rounds` < a cold run's iters.
    *
    * What the warm start buys — and what it cannot: rank mass
    * redistributes globally (the teleport base shifts with |V|, every
    * inflow sum spans the graph), so PER-ROUND work is inherently
    * graph-sized; no frontier slicing is sound (why rounds 9 and 10
    * EXCLUDED an incremental PageRank rather than fake one). What IS
    * sound is round-count: from a near-fixed-point start the residual
    * contracts by the damping factor per round, so a handful of warm
    * rounds replaces a cold run's full ladder — the standard
    * restart treatment for evolving graphs (Langville & Meyer, "Deep
    * Inside PageRank", updating chapter). The arithmetic is the same
    * bit-deterministic scaled-integer iteration, a pure function of
    * (store contents, union graph, rounds) — so the driver's oracle
    * can unroll history's iterations AND the warm rounds in SQL and
    * hash-match exactly; approximation quality vs a longer cold run
    * is pinned separately in GraphSpec.
    *
    * Survivor ranks append as an overwrite-idempotent `batch=<id>`
    * (newest-wins store; retries read only batches < batchId).
    */
  def pageRankWarm(allEdges: DataFrame, src: Column, dst: Column,
                   storeDir: String, batchId: Long, rounds: Int = 2,
                   filesOut: Int = 4, dampNum: Long = 85,
                   dampDen: Long = 100, scale: Long = 1000000L,
                   broadcastLimit: Long = 4000000L): DataFrame =
    Stats.withWriterLease(allEdges.sparkSession, Seq(storeDir),
        "pageRankWarm(batch)") {
    require(batchId >= 1L, "batchId 0 is the writePageRankStore base")
    val spark = allEdges.sparkSession
    Stats.requireMonotoneBatch(spark, Seq(storeDir), batchId,
      "pageRankWarm")
    val start = prStoreView(spark, storeDir, batchId)
    val ranks = Checkpoints.stage(
      pageRank(allEdges, src, dst, rounds, dampNum, dampDen, scale,
        broadcastLimit, start = Some(start)))
    ranks.select(col("id"), col("rank"), lit(batchId).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=$batchId")
    Stats.upsertManifestFor(spark, storeDir,
      storeManifestPath(storeDir), s"$storeDir/batch=$batchId")
    // ranks is staged, so its data predates the overwrite safely
    ranks
  }

  /** Fold the PageRank store's batches, newest winning per id. */
  def compactPageRankStore(spark: org.apache.spark.sql.SparkSession,
                           storeDir: String, filesOut: Int = 4)
      : Option[Long] =
    Stats.withWriterLease(spark, Seq(storeDir),
        "compactPageRankStore(batch)") {
    val tok = Stats.compactCommittedStore(spark, storeDir,
      _.groupBy(col("id"))
        .agg(max(struct(col("__b"), col("rank"))).as("m"))
        .select(col("id"), col("m.rank").as("rank"),
          col("m.__b").as("__b"))
        .repartitionByRange(filesOut, col("id"))
        .sortWithinPartitions(col("id")))
    if (tok.isDefined)
      Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }

  // ---------- warm-start HITS ----------

  /** Persist [[hits]]'s converged hub/auth vectors as `batch=0` of an
    * incremental store (id-clustered (id, hub, auth, __b) rows — the
    * PageRank-store protocol), the warm-start base for [[hitsWarm]].
    */
  def writeHitsStore(edges: DataFrame, src: Column, dst: Column,
                     iters: Int, storeDir: String, filesOut: Int = 4,
                     scale: Long = 1000000L,
                     broadcastLimit: Long = 4000000L): Unit =
    Stats.withWriterLease(edges.sparkSession, Seq(storeDir),
        "writeHitsStore(batch)") {
    hits(edges, src, dst, iters, scale, broadcastLimit)
      .select(col("id"), col("hub"), col("auth"), lit(0L).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=0")
    Stats.upsertManifest(edges.sparkSession, storeDir,
      storeManifestPath(storeDir))
  }

  /** RETRACTION for the HITS store — [[rebuildPageRankStore]]'s
    * posture and argument verbatim (a warm hub seed carries the
    * deleted edges' influence forever): cold recompute over the
    * surviving edges as a superseding generation.
    */
  def rebuildHitsStore(survivingEdges: DataFrame, src: Column,
                       dst: Column, iters: Int, storeDir: String,
                       filesOut: Int = 4, scale: Long = 1000000L,
                       broadcastLimit: Long = 4000000L): Long =
    Stats.withWriterLease(survivingEdges.sparkSession, Seq(storeDir),
        "rebuildHitsStore(batch)") {
    val spark = survivingEdges.sparkSession
    val tok = Stats.supersedingToken(spark, Seq(storeDir))
    hits(survivingEdges, src, dst, iters, scale, broadcastLimit)
      .select(col("id"), col("hub"), col("auth"), lit(tok).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/gen=$tok")
    Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }

  private def hitsStoreView(spark: org.apache.spark.sql.SparkSession,
                            storeDir: String,
                            beforeBatch: Long): DataFrame = {
    Stats.openCommittedStore(spark, storeDir,
        Seq("id" -> "bigint", "hub" -> "bigint", "auth" -> "bigint",
          "__b" -> "bigint"), "hitsStore")
      .where(col("__b") < beforeBatch)
      .groupBy(col("id"))
      .agg(max(struct(col("__b"), col("hub"), col("auth"))).as("m"))
      .select(col("id"), col("m.hub").as("hub"),
        col("m.auth").as("auth"))
  }

  /** The HITS store's CURRENT scores (newest batch wins per id). */
  def hitsStoreScores(spark: org.apache.spark.sql.SparkSession,
                      storeDir: String): DataFrame =
    hitsStoreView(spark, storeDir, Long.MaxValue)

  /** WARM-START HITS over an EVOLVED graph: power iteration on the
    * union edge list initialized from the STORED hub vector (new
    * nodes take the cold prior), run for `rounds` < a cold run's
    * iters — the same round-count contract as [[pageRankWarm]], and
    * for the same reason: each half-step's inflow/outflow sums span
    * the whole graph (max-normalization is global), so per-round work
    * is inherently graph-sized and the only sound saving is fewer
    * rounds from a near-fixed-point start. Only the hub vector seeds
    * the iteration (auth is re-derived from hub in the first
    * half-step, so a stored auth would never be read). The arithmetic
    * is the same bit-deterministic scaled-integer iteration, a pure
    * function of (store contents, union graph, rounds) — the driver's
    * oracle unrolls history's iterations AND the warm rounds in SQL
    * and hash-matches exactly.
    *
    * Survivor scores append as an overwrite-idempotent `batch=<id>`
    * (newest-wins store; retries read only batches < batchId).
    */
  def hitsWarm(allEdges: DataFrame, src: Column, dst: Column,
               storeDir: String, batchId: Long, rounds: Int = 2,
               filesOut: Int = 4, scale: Long = 1000000L,
               broadcastLimit: Long = 4000000L): DataFrame =
    Stats.withWriterLease(allEdges.sparkSession, Seq(storeDir),
        "hitsWarm(batch)") {
    require(batchId >= 1L, "batchId 0 is the writeHitsStore base")
    val spark = allEdges.sparkSession
    Stats.requireMonotoneBatch(spark, Seq(storeDir), batchId,
      "hitsWarm")
    val start = hitsStoreView(spark, storeDir, batchId)
    val scores = Checkpoints.stage(
      hits(allEdges, src, dst, rounds, scale, broadcastLimit,
        start = Some(start)))
    scores.select(col("id"), col("hub"), col("auth"),
        lit(batchId).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=$batchId")
    Stats.upsertManifestFor(spark, storeDir,
      storeManifestPath(storeDir), s"$storeDir/batch=$batchId")
    // scores is staged, so its data predates the overwrite safely
    scores
  }

  /** Fold the HITS store's batches, newest winning per id. */
  def compactHitsStore(spark: org.apache.spark.sql.SparkSession,
                       storeDir: String, filesOut: Int = 4)
      : Option[Long] =
    Stats.withWriterLease(spark, Seq(storeDir),
        "compactHitsStore(batch)") {
    val tok = Stats.compactCommittedStore(spark, storeDir,
      _.groupBy(col("id"))
        .agg(max(struct(col("__b"), col("hub"), col("auth"))).as("m"))
        .select(col("id"), col("m.hub").as("hub"),
          col("m.auth").as("auth"), col("m.__b").as("__b"))
        .repartitionByRange(filesOut, col("id"))
        .sortWithinPartitions(col("id")))
    if (tok.isDefined)
      Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }

  /** DETERMINISTIC one-level Louvain (the modularity-gain label
    * update of Blondel et al., "Fast unfolding of communities in
    * large networks", J. Stat. Mech. 2008 — the community-detection
    * counterpart of label propagation, which optimizes nothing):
    * every node starts in its own community; each SYNCHRONOUS round,
    * every node moves to the candidate community (its neighbors'
    * communities plus its own) maximizing the modularity gain
    *
    *   score(i → C) = 2m·w(i,C) − d(i)·(D(C) − [i ∈ C]·d(i))
    *
    * — the standard ΔQ numerator scaled by (2m)² so the comparison is
    * EXACT integer arithmetic (computed in decimal(38,0): with
    * trillion-edge graphs 2m·w ≈ 10²⁴, past int64 but far inside 38
    * digits). Ties break (score DESC, community ASC), so the whole
    * run is a pure function of the weighted edge SET — the oracle
    * unrolls every round in SQL and hash-matches. Synchronous update
    * is what makes the rounds engine-replayable; the classic
    * sequential sweep is order-dependent and would pin the result to
    * one partitioning. The known trade: on exactly-symmetric
    * structures synchronous moves can swap instead of settle (the
    * parallel-LPA oscillation), so `rounds` is a budget, not a
    * convergence promise — on modular graphs the asymmetric pulls
    * settle fast (GraphSpec pins the bridged-cliques partition in 3
    * rounds). Input edges are folded to a canonical
    * undirected weighted graph (least/greatest endpoints, self-loops
    * dropped, weights summed); `weight` defaults to 1 per input row.
    * Returns (id, community) after `rounds` rounds.
    *
    * Scale: per round — one |C|-sized community-degree aggregate, one
    * edge-sized neighbor-community sum, one candidate argmax
    * aggregate (all map-side-partial; the |V|-sized label table
    * broadcast-gated below `broadcastLimit` measured nodes); no
    * windows, state staged and freed per round. Multi-level Louvain
    * composes this with [[contractGraph]]: run a level, contract
    * communities to super-nodes — internal mass becomes SELF-LOOPS
    * (counted twice into the super-node's degree, the Blondel et al.
    * convention, so 2m is invariant under contraction) — and run the
    * next level on the quotient graph. Self-loops never enter w(i,C)
    * (a node is not its own neighbor; its self mass moves with it, a
    * constant across candidates), only the degree.
    */
  def louvain(edges: DataFrame, a: Column, b: Column,
              rounds: Int = 3, weight: Option[Column] = None,
              broadcastLimit: Long = 4000000L,
              start: Option[DataFrame] = None): DataFrame =
    louvainRounds(edges, a, b, rounds, weight, broadcastLimit,
      start)._1

  /** [[louvain]] plus the number of rounds actually executed — the
    * early-exit observability hook the convergence spec pins
    * (`earlyExit = false` replays the fixed-round behavior for the
    * bit-identical A/B).
    */
  private[graft] def louvainRounds(
      edges: DataFrame, a: Column, b: Column,
      rounds: Int = 3, weight: Option[Column] = None,
      broadcastLimit: Long = 4000000L,
      start: Option[DataFrame] = None,
      earlyExit: Boolean = true): (DataFrame, Int) = {
    require(rounds >= 1, "rounds must be >= 1")
    val w0 = weight.getOrElse(lit(1L)).cast("long")
    val eAll = Checkpoints.stage(
      edges.select(least(a, b).as("u"), greatest(a, b).as("v"),
          w0.as("w"))
        .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w")))
    val e = eAll.where(col("u") =!= col("v"))
    val sym = e.unionAll(
      e.select(col("v").as("u"), col("u").as("v"), col("w")))
    // weighted degree: neighbor mass + TWICE the self-loop mass
    val deg = Checkpoints.stage(
      sym.select(col("u"), col("w"))
        .unionAll(eAll.where(col("u") === col("v"))
          .select(col("u"), (col("w") * 2).as("w")))
        .groupBy(col("u")).agg(sum(col("w")).as("d"))
        .select(col("u").as("id"), col("d")))
    // node count + total weighted degree in ONE job over the staged
    // degree table
    val nm = deg.agg(count(lit(1)), sum(col("d"))).head
    val n = nm.getLong(0)
    require(n > 0, "empty graph")
    val m2 = nm.getLong(1)
    def vSized(df: DataFrame): DataFrame =
      if (n <= broadcastLimit) broadcast(df) else df
    val dec = "decimal(38,0)"
    // `start` WARM-STARTS the rounds from a stored assignment (the
    // [[louvainWarm]] contract): known ids keep their stored
    // community, unseen (new) ids start as singletons — the gain
    // arithmetic is valid from ANY assignment, a near-converged start
    // just needs fewer rounds.
    var comm = Checkpoints.stage(start match {
      case None => deg.select(col("id"), col("id").as("c"))
      case Some(s0) =>
        deg.select(col("id"))
          .join(s0.select(col("id"), col("c").as("__c0")),
            Seq("id"), "left")
          .select(col("id"),
            coalesce(col("__c0"), col("id")).as("c"))
    })
    var it = 0
    var executed = 0
    while (it < rounds) {
      // community weighted-degree sums (|C|-sized)
      val dc = comm.join(vSized(deg), Seq("id"))
        .groupBy(col("c")).agg(sum(col("d")).as("dc"))
        .select(col("c").as("cand"), col("dc"))
      // w(i, C): weight from each node into each neighbor community
      val wic = sym
        .join(vSized(comm.select(col("id").as("v"), col("c").as("cand"))),
          Seq("v"))
        .groupBy(col("u"), col("cand")).agg(sum(col("w")).as("wi"))
        .select(col("u").as("id"), col("cand"), col("wi"))
      // the node's own community is always a candidate (w = 0 when it
      // has no intra-community edges — the "staying" score)
      val own = comm.select(col("id"), col("c").as("cand"))
        .join(wic.select(col("id"), col("cand")), Seq("id", "cand"),
          "left_anti")
        .select(col("id"), col("cand"), lit(0L).as("wi"))
      val scored = wic.unionAll(own)
        .join(vSized(deg), Seq("id"))
        .join(vSized(dc), Seq("cand"))
        .join(vSized(comm.select(col("id"), col("c").as("__cur"))),
          Seq("id"))
        .select(col("id"), col("cand"), col("__cur"),
          (lit(m2).cast(dec) * col("wi").cast(dec) -
            col("d").cast(dec) *
              (col("dc").cast(dec) -
                when(col("__cur") === col("cand"), col("d"))
                  .otherwise(lit(0L)).cast(dec))).as("score"))
      val next = scored
        .groupBy(col("id"))
        .agg(max(struct(col("score"), (-col("cand")).as("nc"),
          col("cand").as("pick"))).as("m"),
          // every cand row of an id carries the same __cur, so max
          // is exact — it rides the argmax aggregate for the mover
          // count below
          max(col("__cur")).as("__cur"))
      // CONVERGENCE EARLY-EXIT (the CC equal-sums pattern at a
      // stronger invariant): zero movers means the next round sees
      // the identical assignment, recomputes the identical scores,
      // and picks the identical argmax — a fixed point, so skipping
      // the remaining rounds is bit-identical and saves one full
      // edge-scale shuffle per skipped round. The mover count rides
      // the staging job as an Observation — no per-round probe job.
      val obs = org.apache.spark.sql.Observation()
      val staged = Checkpoints.stage(next
        .observe(obs, coalesce(sum(
            when(col("m.pick") =!= col("__cur"), 1L).otherwise(0L)),
          lit(0L)).as("mv"))
        .select(col("id"), col("m.pick").as("c")))
      executed += 1
      if (earlyExit && executed < rounds &&
          obs.get("mv").asInstanceOf[Long] == 0L) it = rounds
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(comm)
      comm = staged
      it += 1
    }
    (comm.select(col("id"), col("c").as("community")), executed)
  }

  /** EXACT modularity decomposition of a community assignment
    * (Newman & Girvan's Q, the quantity [[louvain]] climbs): per
    * community C,
    *
    *   Q_C = in_C/(2m) − (D_C/(2m))²,  Q = Σ_C Q_C
    *
    * reported as the EXACT integer numerator q_num = 2m·in_C − D_C²
    * (Q_C = q_num/(2m)²; decimal(38,0), same bounds argument as the
    * gain arithmetic) alongside in_C (= Σ_{i,j∈C} A_ij: twice the
    * intra-community weight, self-loops counted twice — the Blondel
    * convention matching [[louvain]]'s degrees) and D_C. Exact
    * integers end to end, so the oracle replays it; callers wanting
    * the float Q divide once at the end. The audit pairing for
    * community detection: detect with [[louvain]], QUANTIFY the
    * partition with this — e.g. compare level-1 vs level-2 cuts, or
    * track drift of a stored partition as the graph evolves.
    *
    * Scale: one canonical weight fold, two assignment joins, three
    * aggregates — all map-side-partial, |C|-sized outputs, no
    * windows.
    */
  def modularity(edges: DataFrame, a: Column, b: Column,
                 assign: DataFrame, id: Column, community: Column,
                 weight: Option[Column] = None): DataFrame = {
    val w0 = weight.getOrElse(lit(1L)).cast("long")
    // staged: the folded edge table feeds the intra aggregate AND all
    // three degree branches — without the cut, the raw edge
    // derivation would replay once per branch
    val eAll = Checkpoints.stage(
      edges.select(least(a, b).as("u"), greatest(a, b).as("v"),
          w0.as("w"))
        .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w")))
    val asg = assign.select(id.as("__id"), community.as("__c"))
    val eC = eAll
      .join(asg.select(col("__id").as("u"), col("__c").as("cu")),
        Seq("u"))
      .join(asg.select(col("__id").as("v"), col("__c").as("cv")),
        Seq("v"))
    val intra = eC.where(col("cu") === col("cv"))
      .groupBy(col("cu")).agg((sum(col("w")) * 2).as("in_w2"))
      .select(col("cu").as("community"), col("in_w2"))
    val e = eAll.where(col("u") =!= col("v"))
    val deg = e.select(col("u").as("id"), col("w"))
      .unionAll(e.select(col("v").as("id"), col("w")))
      .unionAll(eAll.where(col("u") === col("v"))
        .select(col("u").as("id"), (col("w") * 2).as("w")))
      .groupBy(col("id")).agg(sum(col("w")).as("d"))
    val m2 = deg.agg(sum(col("d"))).head.getLong(0)
    val dec = "decimal(38,0)"
    deg.join(asg, col("id") === col("__id"))
      .groupBy(col("__c")).agg(sum(col("d")).as("deg_sum"))
      .select(col("__c").as("community"), col("deg_sum"))
      .join(intra, Seq("community"), "left")
      .select(col("community"),
        coalesce(col("in_w2"), lit(0L)).as("in_w2"), col("deg_sum"),
        (lit(m2).cast(dec) *
            coalesce(col("in_w2"), lit(0L)).cast(dec) -
          col("deg_sum").cast(dec) * col("deg_sum").cast(dec))
          .as("q_num"))
  }

  // ---------- warm-start Louvain ----------

  /** Persist [[louvain]]'s assignment as `batch=0` of an incremental
    * store (id-clustered (id, c, __b) rows — the PageRank-store
    * protocol), the warm-start base for [[louvainWarm]].
    */
  def writeLouvainStore(edges: DataFrame, a: Column, b: Column,
                        rounds: Int, storeDir: String,
                        filesOut: Int = 4,
                        weight: Option[Column] = None,
                        broadcastLimit: Long = 4000000L): Unit =
    Stats.withWriterLease(edges.sparkSession, Seq(storeDir),
        "writeLouvainStore(batch)") {
    louvain(edges, a, b, rounds, weight, broadcastLimit)
      .select(col("id"), col("community").as("c"), lit(0L).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=0")
    Stats.upsertManifest(edges.sparkSession, storeDir,
      storeManifestPath(storeDir))
  }

  /** RETRACTION for the Louvain store — [[rebuildPageRankStore]]'s
    * posture and argument (a warm assignment seed remembers the
    * deleted edges' merges; deletion can also SPLIT a community,
    * which gain rounds never undo — they only move nodes toward
    * positive gain over the seed): cold recompute over the surviving
    * edges as a superseding generation.
    */
  def rebuildLouvainStore(survivingEdges: DataFrame, a: Column,
                          b: Column, rounds: Int, storeDir: String,
                          filesOut: Int = 4,
                          weight: Option[Column] = None,
                          broadcastLimit: Long = 4000000L): Long =
    Stats.withWriterLease(survivingEdges.sparkSession, Seq(storeDir),
        "rebuildLouvainStore(batch)") {
    val spark = survivingEdges.sparkSession
    val tok = Stats.supersedingToken(spark, Seq(storeDir))
    louvain(survivingEdges, a, b, rounds, weight, broadcastLimit)
      .select(col("id"), col("community").as("c"), lit(tok).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/gen=$tok")
    Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }

  private def louvainStoreView(
      spark: org.apache.spark.sql.SparkSession, storeDir: String,
      beforeBatch: Long): DataFrame = {
    Stats.openCommittedStore(spark, storeDir,
        Seq("id" -> "bigint", "c" -> "bigint", "__b" -> "bigint"),
        "louvainStore")
      .where(col("__b") < beforeBatch)
      .groupBy(col("id"))
      .agg(max(struct(col("__b"), col("c"))).as("m"))
      .select(col("id"), col("m.c").as("c"))
  }

  /** The Louvain store's CURRENT assignment (newest batch wins). */
  def louvainStoreCommunities(
      spark: org.apache.spark.sql.SparkSession, storeDir: String)
      : DataFrame =
    louvainStoreView(spark, storeDir, Long.MaxValue)

  /** WARM-START Louvain over an EVOLVED graph: gain rounds on the
    * union edge list initialized from the STORED assignment (new
    * nodes start as singletons), run for `rounds` < a cold run's
    * budget — the same round-count contract as [[pageRankWarm]] /
    * [[hitsWarm]], for the same reason: every round's community-
    * degree sums and 2m span the whole graph, so per-round work is
    * inherently graph-sized and the sound saving is fewer rounds from
    * a near-converged start. Bit-deterministic, a pure function of
    * (store contents, union weighted graph, rounds) — the driver's
    * oracle unrolls history's rounds AND the warm rounds in SQL and
    * hash-matches. The assignment appends as an overwrite-idempotent
    * `batch=<id>` (newest-wins; retries read only batches < batchId).
    */
  def louvainWarm(allEdges: DataFrame, a: Column, b: Column,
                  storeDir: String, batchId: Long, rounds: Int = 1,
                  filesOut: Int = 4, weight: Option[Column] = None,
                  broadcastLimit: Long = 4000000L): DataFrame =
    Stats.withWriterLease(allEdges.sparkSession, Seq(storeDir),
        "louvainWarm(batch)") {
    require(batchId >= 1L, "batchId 0 is the writeLouvainStore base")
    val spark = allEdges.sparkSession
    Stats.requireMonotoneBatch(spark, Seq(storeDir), batchId,
      "louvainWarm")
    val start = louvainStoreView(spark, storeDir, batchId)
    val asg = Checkpoints.stage(
      louvain(allEdges, a, b, rounds, weight, broadcastLimit,
        start = Some(start)))
    asg.select(col("id"), col("community").as("c"),
        lit(batchId).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=$batchId")
    Stats.upsertManifestFor(spark, storeDir,
      storeManifestPath(storeDir), s"$storeDir/batch=$batchId")
    // asg is staged, so its data predates the overwrite safely
    asg
  }

  /** Fold the Louvain store's batches, newest winning per id. */
  def compactLouvainStore(spark: org.apache.spark.sql.SparkSession,
                          storeDir: String, filesOut: Int = 4)
      : Option[Long] =
    Stats.withWriterLease(spark, Seq(storeDir),
        "compactLouvainStore(batch)") {
    val tok = Stats.compactCommittedStore(spark, storeDir,
      _.groupBy(col("id"))
        .agg(max(struct(col("__b"), col("c"))).as("m"))
        .select(col("id"), col("m.c").as("c"), col("m.__b").as("__b"))
        .repartitionByRange(filesOut, col("id"))
        .sortWithinPartitions(col("id")))
    if (tok.isDefined)
      Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }

  /** Contract a weighted undirected graph by a community assignment:
    * edges fold to their endpoint communities (canonical order,
    * weights summed) — Louvain's level-2 quotient graph. Intra-
    * community edges become SELF-LOOPS (cu = cv), which [[louvain]]
    * counts twice into the super-node's degree per the Blondel et al.
    * convention — so 2m is invariant under contraction and the
    * level-2 modularity arithmetic is exactly the level-1 arithmetic
    * on the quotient. Input self-loops fold through like any edge.
    */
  def contractGraph(edges: DataFrame, a: Column, b: Column,
                    assign: DataFrame, id: Column, community: Column,
                    weight: Option[Column] = None): DataFrame = {
    val w0 = weight.getOrElse(lit(1L)).cast("long")
    val e = edges.select(least(a, b).as("u"), greatest(a, b).as("v"),
        w0.as("w"))
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
    val asg = assign.select(id.as("__id"), community.as("__c"))
    e.join(asg.select(col("__id").as("u"), col("__c").as("cu")),
        Seq("u"))
      .join(asg.select(col("__id").as("v"), col("__c").as("cv")),
        Seq("v"))
      .select(least(col("cu"), col("cv")).as("cu"),
        greatest(col("cu"), col("cv")).as("cv"), col("w"))
      .groupBy(col("cu"), col("cv")).agg(sum(col("w")).as("w"))
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani CMU-CALD-02-107;
    * the synchronous variant of Raghavan et al. 2007's LPA): spread
    * seed labels over an undirected edge list for `iters` rounds. The
    * corpus-curation use: a few documents carry a trusted label
    * (language, domain, license) and the near-dup / shared-passage
    * graph extends it to the rest — mirror sites inherit their seed's
    * label without any per-doc classifier.
    *
    * Per round, every NON-seed node adopts the label carried by the
    * most labeled neighbors; a node with no labeled neighbor keeps its
    * current label (initially null). Seeds never change. Unlike
    * classic LPA's random tie-break, ties are resolved to the MAXIMUM
    * label (after max count) — the whole fixpoint is a pure function
    * of the graph, independent of partitioning, so an unrolled-CTE SQL
    * mirror hash-matches it (the x_label_prop oracle).
    *
    * Scale shape: one map-side-combined (node, label) count shuffle
    * per round — the argmax over (count, label) folds into the SAME
    * aggregation via max(struct) — plus the |V|-sized label join,
    * broadcast below `broadcastLimit` measured node count (the
    * pageRank gate). Lineage cut per round via [[Checkpoints.stage]].
    *
    * `seeds`: (id, label) with non-null labels; ids absent from the
    * edge list still appear in the output (isolated seeds). A node
    * seeded more than once keeps the MAXIMUM label — the same
    * direction as the neighbor-vote tie-break, so the duplicate-seed
    * contract and the propagation tie policy agree. Label type is any
    * orderable Spark type; node ids are key-type-generic.
    */
  def labelPropagation(edges: DataFrame, a: Column, b: Column,
                       seeds: DataFrame, seedId: Column, seedLabel: Column,
                       iters: Int = 3,
                       broadcastLimit: Long = 4000000L): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val e0 = edges.select(a.as("src"), b.as("dst"))
    // pre-partitioned on dst: BOTH per-round vote aggregates
    // (groupBy (dst,label) then groupBy dst) are satisfied by the
    // checkpoint's hash(dst) partitioning, so in the broadcast regime
    // a round's vote path runs with ZERO exchanges (guide §2.4)
    val sym = Checkpoints.stage(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
        .repartition(col("dst")))
    val sd = Checkpoints.stage(
      seeds.select(seedId.as("id"), seedLabel.as("__seed"))
        .where(col("__seed").isNotNull)
        .groupBy(col("id")).agg(max(col("__seed")).as("__seed")))
    val (nodes, n) = Checkpoints.stageCount(
      sym.select(col("src").as("id"))
        .union(sym.select(col("dst").as("id")))
        .union(sd.select(col("id")))
        .distinct())
    val small = n <= broadcastLimit
    def vSized(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    var labels = Checkpoints.stage(
      nodes.join(vSized(sd), Seq("id"), "left")
        .select(col("id"), col("__seed").as("label"),
          col("__seed").isNotNull.as("__fixed")))
    var it = 0
    while (it < iters) {
      // (dst, label) neighbor counts and their argmax in ONE shuffle:
      // max(struct(cnt, label)) = max count, then max label on ties.
      val best = sym
        .join(vSized(labels.where(col("label").isNotNull)
          .select(col("id").as("src"), col("label").as("__l"))),
          Seq("src"))
        .groupBy(col("dst"), col("__l"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("__c"), col("__l"))).as("__b"))
        .select(col("dst").as("id"), col("__b.__l").as("__nl"))
      val next = labels
        .join(vSized(best), Seq("id"), "left")
        .select(col("id"),
          when(col("__fixed"), col("label"))
            .otherwise(coalesce(col("__nl"), col("label"))).as("label"),
          col("__fixed"))
      probeRound("labelPropagation.round", next)
      val staged = Checkpoints.stage(next)
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(labels)
      labels = staged
      it += 1
    }
    labels.select(col("id"), col("label"))
  }

  // ---------- warm-start incremental label propagation ----------

  /** The persisted label state, ALL rounds merged in one pass:
    * committed store rows from batches BEFORE `beforeBatch` (a retry
    * of batch b must never read its own prior attempt's rows), newest
    * batch wins per (round, id). The argmax rides
    * max(struct(__b, label)) — batch ids are unique per (round, id),
    * so the label field never decides. ONE aggregate serves every
    * round's reads (callers stage the result and filter per round —
    * three per-round aggregates over a mostly-history store cost more
    * than the whole frontier recompute).
    */
  private def labelStateAll(spark: org.apache.spark.sql.SparkSession,
                            storeDir: String,
                            beforeBatch: Long): DataFrame = {
    Stats.openCommittedStore(spark, storeDir,
        Seq("__round" -> "int", "id" -> "bigint",
          "label" -> "*", "__b" -> "bigint"), "labelStore")
      .where(col("__b") < beforeBatch)
      .groupBy(col("__round"), col("id"))
      .agg(max(struct(col("__b"), col("label"))).as("m"))
      .select(col("__round"), col("id"), col("m.label").as("label"))
  }

  /** Run [[labelPropagation]] and persist EVERY round's (id, label)
    * state — not just the final one — as `batch=0` of a label store.
    * The per-round states are what make warm-starting EXACT: a node
    * clean at round r needs its old round-r label (the final state is
    * not enough, since a node can turn dirty mid-run and its
    * neighbors' mid-run labels then matter). Store rows are
    * (__round, id, label, __b), round-then-id clustered so a round's
    * read is a contiguous footer-pruned slice. Single pass: ONE
    * propagation run captures every round's staged state on the way
    * to the fixpoint (k rounds total, not k²).
    */
  def writeLabelState(edges: DataFrame, a: Column, b: Column,
                      seeds: DataFrame, seedId: Column, seedLabel: Column,
                      iters: Int, storeDir: String,
                      filesOut: Int = 4,
                      broadcastLimit: Long = 4000000L): Unit =
    Stats.withWriterLease(edges.sparkSession, Seq(storeDir),
        "writeLabelState(batch)") {
      labelStateRoundSlices(edges, a, b, seeds, seedId, seedLabel,
          iters, broadcastLimit, bTok = 0L)
        .repartitionByRange(filesOut, col("__round"), col("id"))
        .sortWithinPartitions(col("__round"), col("id"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$storeDir/batch=0")
    }

  /** RETRACTION for the label-propagation state store — the
    * fixed-round vote history cannot subtract a deleted node's votes
    * (a vote it won in round r cascades through every later round),
    * so the store REBUILDS the full k-round state over the surviving
    * edges and seeds, written as a superseding `gen=<head+1>` that
    * hides every earlier round slice atomically. Pass the seed set
    * with retracted nodes REMOVED (a deleted node's seed label is
    * itself forgotten data); later [[labelPropagationIncremental]]
    * batches continue above the generation (monotone-guarded).
    */
  def rebuildLabelState(survivingEdges: DataFrame, a: Column,
                        b: Column, survivingSeeds: DataFrame,
                        seedId: Column, seedLabel: Column, iters: Int,
                        storeDir: String, filesOut: Int = 4,
                        broadcastLimit: Long = 4000000L): Long =
    Stats.withWriterLease(survivingEdges.sparkSession, Seq(storeDir),
        "rebuildLabelState(batch)") {
    val spark = survivingEdges.sparkSession
    val tok = Stats.supersedingToken(spark, Seq(storeDir))
    labelStateRoundSlices(survivingEdges, a, b, survivingSeeds,
        seedId, seedLabel, iters, broadcastLimit, bTok = tok)
      .repartitionByRange(filesOut, col("__round"), col("id"))
      .sortWithinPartitions(col("__round"), col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/gen=$tok")
    tok
  }

  private def labelStateRoundSlices(
      edges: DataFrame, a: Column, b: Column, seeds: DataFrame,
      seedId: Column, seedLabel: Column, iters: Int,
      broadcastLimit: Long, bTok: Long): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // the labelPropagation loop, with each round's staged labels kept
    // (sym pre-partitioned on dst for the exchange-free vote path,
    // exactly as in [[labelPropagation]])
    val e0 = edges.select(a.as("src"), b.as("dst"))
    val sym = Checkpoints.stage(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
        .repartition(col("dst")))
    val sd = Checkpoints.stage(
      seeds.select(seedId.as("id"), seedLabel.as("__seed"))
        .where(col("__seed").isNotNull)
        .groupBy(col("id")).agg(max(col("__seed")).as("__seed")))
    val (nodes, n) = Checkpoints.stageCount(
      sym.select(col("src").as("id"))
        .union(sym.select(col("dst").as("id")))
        .union(sd.select(col("id")))
        .distinct())
    def vSized(df: DataFrame): DataFrame =
      if (n <= broadcastLimit) broadcast(df) else df
    var labels = Checkpoints.stage(
      nodes.join(vSized(sd), Seq("id"), "left")
        .select(col("id"), col("__seed").as("label"),
          col("__seed").isNotNull.as("__fixed")))
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var it = 0
    while (it < iters) {
      val best = sym
        .join(vSized(labels.where(col("label").isNotNull)
          .select(col("id").as("src"), col("label").as("__l"))),
          Seq("src"))
        .groupBy(col("dst"), col("__l"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("__c"), col("__l"))).as("__b"))
        .select(col("dst").as("id"), col("__b.__l").as("__nl"))
      val next = labels
        .join(vSized(best), Seq("id"), "left")
        .select(col("id"),
          when(col("__fixed"), col("label"))
            .otherwise(coalesce(col("__nl"), col("label"))).as("label"),
          col("__fixed"))
      labels = Checkpoints.stage(next)
      rounds += labels.select(lit(it + 1).as("__round"), col("id"),
        col("label"), lit(bTok).as("__b"))
      it += 1
    }
    rounds.reduce(_ unionByName _)
  }

  /** WARM-START label propagation: the k-round result over the UNION
    * graph (old edges + `newEdges`), recomputing ONLY the frontier —
    * per round r, the dirty set is the nodes within r hops of a new
    * edge, and only their votes are re-aggregated; every other node's
    * round-r label is read from the persisted store
    * ([[writeLabelState]]). EXACTLY ≡ the from-scratch fixed-round run
    * (x_label_prop_incremental shares x_label_prop's unrolled-CTE
    * oracle), by induction: a node outside dirty_r has an unchanged
    * edge set and only clean round-(r-1) neighbors, so its stored
    * round-r label is the union-graph value; a dirty node's vote reads
    * neighbors' round-(r-1) labels from the store overridden by the
    * recomputed dirty slice.
    *
    * Contract: `allEdges` is any SUPERSET of the union edges with an
    * endpoint within `iters` hops of a new edge — the dirty closure
    * never expands past that radius and clean nodes' votes are never
    * recomputed, so farther edges can never matter; pass the full
    * union list (the accumulated candidate feed the dedup stores
    * already maintain) when reach slicing isn't cheap, or just the
    * batch itself when new edges land on otherwise-untouched nodes
    * (per-user chains, new-source ingests). `newEdges` is the batch's
    * additions; the seed set is FIXED across runs for existing
    * nodes (new nodes may arrive seeded — they are dirty from round 1).
    * `batchId` must exceed every previously appended batch. The store
    * append is overwrite-idempotent (`batch=<id>` dirs; the state view
    * reads only batches < batchId, so a retry never sees its own prior
    * attempt) and holds only the frontier slices, not |V| rows per
    * batch.
    *
    * Scale shape per round: one frontier-expansion semi join, one vote
    * shuffle bounded by edges INTO the frontier (not the full edge
    * list), one |V|-row-narrow state-view aggregate (id-clustered
    * store; [[compactLabelState]] folds delta batches). Frontier sets
    * and slices are staged per round ([[Checkpoints]]).
    */
  def labelPropagationIncremental(allEdges: DataFrame, a: Column, b: Column,
                                  newEdges: DataFrame, na: Column, nb: Column,
                                  seeds: DataFrame, seedId: Column,
                                  seedLabel: Column, iters: Int,
                                  storeDir: String, batchId: Long,
                                  broadcastLimit: Long = 4000000L)
      : DataFrame =
    Stats.withWriterLease(allEdges.sparkSession, Seq(storeDir),
        "labelPropagationIncremental(batch)") {
    require(iters >= 1, "iters must be >= 1")
    require(batchId >= 1L, "batchId 0 is the writeLabelState base")
    val spark = allEdges.sparkSession
    Stats.requireMonotoneBatch(spark, Seq(storeDir), batchId,
      "labelPropagationIncremental")
    val e0 = allEdges.select(a.as("src"), b.as("dst"))
    // pre-partitioned on dst for the exchange-free vote aggregates,
    // as in [[labelPropagation]]
    val sym = Checkpoints.stage(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
        .repartition(col("dst")))
    val en = newEdges.select(na.as("src"), nb.as("dst"))
    val (sd, nSd) = Checkpoints.stageCount(
      seeds.select(seedId.as("id"), seedLabel.as("__seed"))
        .where(col("__seed").isNotNull)
        .groupBy(col("id")).agg(max(col("__seed")).as("__seed")))
    def gated(df: DataFrame, n: Long): DataFrame =
      if (n <= broadcastLimit) broadcast(df) else df
    // dirty_1: endpoints of the new edges (new nodes arrive only here)
    var (dirty, nDirty) = Checkpoints.stageCount(
      en.select(col("src").as("id"))
        .union(en.select(col("dst").as("id")))
        .distinct())
    // the persisted state, merged ONCE for all rounds and staged —
    // every per-round read below is a filter on this
    val state = Checkpoints.stage(
      labelStateAll(spark, storeDir, batchId))
    // round-0 labels are the seed labels — no store read needed
    var prevSlice: DataFrame = null // labels of dirty_{r-1}
    val slices = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var r = 1
    while (r <= iters) {
      // full round-(r-1) labels where votes need them: store state
      // overridden by the recomputed dirty_{r-1} slice (round 1 votes
      // read seed labels directly)
      val prevLabels =
        if (r == 1) sd.select(col("id"), col("__seed").as("label"))
        else state.where(col("__round") === (r - 1))
          .select(col("id"), col("label"))
          .join(gated(dirty.select(col("id")), nDirty), Seq("id"),
            "left_anti")
          .unionByName(prevSlice)
      // frontier for THIS round: last round's dirty set plus its
      // neighbors (their votes read a changed label)
      val (dirtyNow, nNow) =
        if (r == 1) (dirty, nDirty)
        else Checkpoints.stageCount(
          sym.join(gated(dirty.select(col("id").as("src")), nDirty),
              Seq("src"), "left_semi")
            .select(col("dst").as("id"))
            .union(dirty.select(col("id")))
            .distinct())
      // votes only for dirty nodes: edge scan pruned to edges INTO the
      // frontier, labels joined on the source side
      val votes = sym
        .join(gated(dirtyNow.select(col("id").as("dst")), nNow),
          Seq("dst"), "left_semi")
        .join(prevLabels.where(col("label").isNotNull)
          .select(col("id").as("src"), col("label").as("__l")),
          Seq("src"))
        .groupBy(col("dst"), col("__l"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("__c"), col("__l"))).as("__bst"))
        .select(col("dst").as("id"), col("__bst.__l").as("__nl"))
      // current (round r-1) labels of the dirty nodes themselves
      val cur =
        if (r == 1)
          dirty.join(gated(sd, nSd), Seq("id"), "left")
            .select(col("id"), col("__seed").as("__cur"))
        else dirtyNow
          .join(prevLabels.select(col("id"), col("label").as("__cur")),
            Seq("id"), "left")
          .select(col("id"), col("__cur"))
      val slice = Checkpoints.stage(cur
        .join(gated(votes, nNow), Seq("id"), "left")
        .join(gated(sd, nNow), Seq("id"), "left")
        .select(col("id"),
          when(col("__seed").isNotNull, col("__seed"))
            .otherwise(coalesce(col("__nl"), col("__cur")))
            .as("label")))
      slices += slice.select(lit(r).as("__round"), col("id"),
        col("label"), lit(batchId).as("__b"))
      prevSlice = slice
      dirty = dirtyNow
      nDirty = nNow
      r += 1
    }
    // persist the frontier slices (overwrite-idempotent batch append —
    // frontier-sized, never |V|-sized); the state view reads only
    // batches < batchId, so the result below is retry-stable
    slices.reduce(_ unionByName _)
      .repartitionByRange(1, col("__round"), col("id"))
      .sortWithinPartitions(col("__round"), col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=$batchId")
    // final view off the STAGED state (materialized before the write,
    // so a retry's overwrite cannot invalidate its file listing)
    state.where(col("__round") === iters)
      .select(col("id"), col("label"))
      .join(gated(dirty.select(col("id")), nDirty), Seq("id"),
        "left_anti")
      .unionByName(prevSlice.select(col("id"), col("label")))
  }

  /** The label store's CURRENT (id, label) state at `round` (rounds
    * are 1-based; pass the run's `iters` for the final labels) — the
    * committed view folded newest-wins per (round, id); the read the
    * streaming gate's consumers (and specs) use between micro-batches.
    */
  def labelStoreLabels(spark: org.apache.spark.sql.SparkSession,
                       storeDir: String, round: Int): DataFrame =
    labelStateAll(spark, storeDir, Long.MaxValue)
      .where(col("__round") === round)
      .select(col("id"), col("label"))

  /** Fold the label store's delta batches into one round-clustered
    * generation, newest batch winning per (round, id) — the OPTIMIZE
    * cycle every incremental store here carries.
    */
  def compactLabelState(spark: org.apache.spark.sql.SparkSession,
                        storeDir: String, filesOut: Int = 4)
      : Option[Long] =
    Stats.withWriterLease(spark, Seq(storeDir),
        "compactLabelState(batch)") {
      Stats.compactCommittedStore(spark, storeDir,
        _.groupBy(col("__round"), col("id"))
          .agg(max(struct(col("__b"), col("label"))).as("m"))
          .select(col("__round"), col("id"), col("m.label").as("label"),
            col("m.__b").as("__b"))
          .repartitionByRange(filesOut, col("__round"), col("id"))
          .sortWithinPartitions(col("__round"), col("id")))
    }

  /** Per-node triangle counts over an undirected edge list — the local
    * clustering signal of a near-dup graph: a candidate edge whose
    * endpoints close many triangles sits inside a dense duplicate
    * clique (safe to collapse); an edge closing none is the lone
    * bridge a transitive dedup policy should distrust.
    *
    * Algorithm: degree orientation (Suri & Vassilvitskii, "Counting
    * triangles and the curse of the last reducer", WWW 2011) — orient
    * each edge from its (degree, id)-smaller endpoint, making a DAG
    * whose max out-degree is O(√m); wedges form only on out-neighbor
    * pairs, so the wedge fanout — the quadratic step that kills the
    * naive per-node algorithm on a high-degree hub — is bounded by
    * orientation, not by the hub's true degree. Each triangle is
    * counted exactly once (at its orientation apex) and credited to
    * all three corners.
    *
    * Scale shape: one degree aggregate (|V|-sized, broadcast-gated
    * below `broadcastLimit` measured nodes), one wedge self-join on
    * the oriented apex, one closing semi-equality join against the
    * oriented edge set, one corner-credit aggregate. Deterministic:
    * pure counting, no tie-breaks.
    *
    * Returns (id, n_tri) for every node of the edge list (0-triangle
    * nodes included — their absence would make "no triangles" and
    * "not in the graph" indistinguishable to the caller).
    */
  def triangleCounts(edges: DataFrame, a: Column, b: Column,
                     broadcastLimit: Long = 4000000L): DataFrame = {
    val e0 = edges.select(a.as("u"), b.as("v"))
    // undirected canonical edges, self-loops dropped
    val e = Checkpoints.stage(
      e0.select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .where(col("u") =!= col("v"))
        .distinct())
    val deg = e.select(col("u").as("id"))
      .unionAll(e.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val (degS, n) = Checkpoints.stageCount(deg)
    def vSized(df: DataFrame): DataFrame =
      if (n <= broadcastLimit) broadcast(df) else df
    // orient from the (degree, id)-smaller endpoint
    val oriented = Checkpoints.stage(e
      .join(vSized(degS.select(col("id").as("u"), col("d").as("du"))),
        Seq("u"))
      .join(vSized(degS.select(col("id").as("v"), col("d").as("dv"))),
        Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t")))
          .as("o"))
      .select(col("o.s").as("s"), col("o.t").as("t")))
    // wedges at the apex s: out-neighbor pairs, canonically ordered so
    // the closing edge lookup is orientation-free (the closer (x, y)
    // is oriented by degree, not by id — probe it canonically)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("apex"),
        col("e1.t").as("x"), col("e2.t").as("y"))
    val closing = oriented
      .select(least(col("s"), col("t")).as("x"),
        greatest(col("s"), col("t")).as("y"))
    // corner credits in ONE pass over the closing join: each confirmed
    // triangle explodes into its three corners feeding a map-side-
    // combined count. Never materialize the triangle list — on clique-
    // heavy graphs it is Θ(Σ C(m,3)) rows, and staging it (the r9
    // shape) held gigabytes of checkpoint blocks whose GC churn was
    // HALF the operator's runtime (measured: 25s GC of 52s total at
    // sf0.1; zero shuffle spill — the cost was block storage, not the
    // join).
    val corners = wedges
      .join(closing.hint("shuffle_hash"), Seq("x", "y"))
      .select(explode(array(col("apex"), col("x"), col("y"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
    degS.select(col("id"))
      .join(corners, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  // ---------- incremental triangle counts ----------

  /** Sibling footer-manifest path for a gen=/batch= graph store — the
    * BM25-index convention (`postings` + `postings_manifest`): outside
    * the store root so the manifest's own parquet never pollutes the
    * store's recursive listings.
    */
  private def storeManifestPath(storeDir: String): String =
    storeDir.stripSuffix("/") + "_manifest"

  /** The store's committed view opened ONLY on the files the probe id
    * set can live in ([[Stats.readTouchedKeysUnder]] over the
    * id-clustered batch/gen layout). File-granular superset of the
    * probed ids' rows — every row of a probed id survives pruning, so
    * per-id newest-wins folds over the pruned set are exact; callers
    * keep their row-level filters. Absent manifest = full view.
    */
  private def prunedStoreView(spark: org.apache.spark.sql.SparkSession,
                              storeDir: String, keyCol: String,
                              probes: DataFrame): DataFrame =
    Stats.readTouchedKeysUnder(spark,
      Stats.committedViewDirs(spark, storeDir),
      storeManifestPath(storeDir), keyCol, probes)

  /** Persist [[triangleCounts]]' per-node totals as `batch=0` of an
    * incremental store (id-clustered (id, n_tri, __b) rows — the
    * label-store protocol), plus its sibling footer manifest so
    * warm-start batches open only touched-id files.
    */
  def writeTriangleStore(edges: DataFrame, a: Column, b: Column,
                         storeDir: String, filesOut: Int = 4,
                         broadcastLimit: Long = 4000000L): Unit =
    Stats.withWriterLease(edges.sparkSession, Seq(storeDir),
        "writeTriangleStore(batch)") {
    triangleCounts(edges, a, b, broadcastLimit)
      .select(col("id"), col("n_tri"), lit(0L).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=0")
    Stats.upsertManifest(edges.sparkSession, storeDir,
      storeManifestPath(storeDir))
  }

  private def triangleStoreView(spark: org.apache.spark.sql.SparkSession,
                                storeDir: String,
                                beforeBatch: Long): DataFrame = {
    Stats.openCommittedStore(spark, storeDir,
        Seq("id" -> "bigint", "n_tri" -> "bigint", "__b" -> "bigint"),
        "triangleStore")
      .where(col("__b") < beforeBatch)
      .groupBy(col("id"))
      .agg(max(struct(col("__b"), col("n_tri"))).as("m"))
      .select(col("id"), col("m.n_tri").as("n_tri"))
  }

  /** The triangle store's CURRENT per-node totals (newest committed
    * batch wins per id); the read the streaming gate's consumers (and
    * specs) use between micro-batches.
    */
  def triangleStoreCounts(spark: org.apache.spark.sql.SparkSession,
                          storeDir: String): DataFrame =
    triangleStoreView(spark, storeDir, Long.MaxValue)

  /** Snapshot read of the triangle store as of batch `asOf` — same
    * contract and retention trade as [[ccStoreLabelsAsOf]].
    */
  def triangleStoreCountsAsOf(spark: org.apache.spark.sql.SparkSession,
                              storeDir: String, asOf: Long): DataFrame = {
    require(asOf >= 0L, "asOf is a committed batch id")
    triangleStoreView(spark, storeDir, asOf + 1)
  }

  /** WARM-START triangle counting: per-node totals over the UNION
    * graph, counting ONLY the triangles a new edge creates — old
    * triangles are never re-enumerated (the one-sided law of every
    * incremental path here; the per-insertion common-neighbor delta
    * is the classic dynamic-graph step — Eppstein & Spiro, "The
    * h-index of a graph and its application to dynamic subgraph
    * statistics", WADS 2009 — batched here with canonical
    * attribution so a whole edge batch lands in one pass). A union-graph triangle containing ≥ 1 new
    * edge is counted EXACTLY once, at its canonically-smallest new
    * edge: for new edge (u, v), common neighbors w qualify iff each of
    * the other two edges is old, or new AND canonically greater than
    * (u, v) — so multi-new-edge triangles never double-count. Work is
    * Σ over new edges of deg(u) + deg(v) common-neighbor candidates,
    * never the old wedge volume.
    *
    * Contract (the monotone gate-store contract everywhere):
    * `allEdges` is any SUPERSET of the union edges incident to the
    * batch's endpoints, drawn from the union graph — a triangle
    * containing a new edge (u, v) consists of edges incident to u or
    * v, so edges touching neither endpoint can never matter; pass the
    * full union list when incident slicing isn't cheap, or just the
    * batch itself when new edges land on otherwise-untouched nodes
    * (per-user chains, new-source ingests). `newEdges` is the batch's
    * GENUINELY new edges (an edge re-sent from history would re-count
    * its triangles — upstream exact-dedup owns that, as with doc ids
    * in the BM25 index); `batchId` exceeds every prior append. The
    * store append holds only touched nodes (new-edge endpoints and
    * credited corners); retries are overwrite-idempotent because the
    * prior view reads only batches < batchId.
    *
    * Returns (id, n_tri) for every node of the union edge list,
    * ≡ [[triangleCounts]] over the union (x_triangles_incremental
    * shares x_triangles' canonical 3-way-join oracle).
    */
  def triangleCountsIncremental(allEdges: DataFrame, a: Column, b: Column,
                                newEdges: DataFrame, na: Column,
                                nb: Column, storeDir: String,
                                batchId: Long,
                                broadcastLimit: Long = 4000000L)
      : DataFrame =
    Stats.withWriterLease(allEdges.sparkSession, Seq(storeDir),
        "triangleCountsIncremental(batch)") {
    require(batchId >= 1L, "batchId 0 is the writeTriangleStore base")
    val spark = allEdges.sparkSession
    Stats.requireMonotoneBatch(spark, Seq(storeDir), batchId,
      "triangleCountsIncremental")
    def canon(df: DataFrame, x: Column, y: Column): DataFrame =
      df.select(least(x, y).as("u"), greatest(x, y).as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    val (n, nCnt) = Checkpoints.stageCount(canon(newEdges, na, nb))
    // same DataFrame reference for both args = "every incident edge
    // is new" (fresh chains, new-source ingests) — skip re-deriving
    // and re-staging the identical edge set
    val all =
      if (allEdges eq newEdges) n
      else Checkpoints.stage(canon(allEdges, a, b))
    def gated(df: DataFrame): DataFrame =
      if (nCnt <= broadcastLimit) broadcast(df) else df
    val old = all.join(n, Seq("u", "v"), "left_anti")
    val tagged = old.withColumn("__new", lit(false))
      .unionByName(n.withColumn("__new", lit(true)))
    // adjacency rows carrying the edge's canonical pair + new flag
    val adjRows = tagged.select(col("u").as("p"), col("v").as("w"),
        struct(col("u"), col("v")).as("ce"), col("__new"))
      .unionByName(tagged.select(col("v").as("p"), col("u").as("w"),
        struct(col("u"), col("v")).as("ce"), col("__new")))
    val canonUV = struct(col("u"), col("v"))
    // the new-edge side rides the measured broadcast gate — the
    // common-neighbor expansion then never shuffles the adjacency
    val newTris = adjRows
      .select(col("p").as("u"), col("w"),
        col("ce").as("eu"), col("__new").as("nu"))
      .join(gated(n), Seq("u"))
      .where(col("w") =!= col("v") && col("w") =!= col("u"))
      .join(adjRows.select(col("p").as("v"), col("w"),
        col("ce").as("ev"), col("__new").as("nv")), Seq("v", "w"))
      .where((!col("nu") || col("eu") > canonUV) &&
        (!col("nv") || col("ev") > canonUV))
    val credits = Checkpoints.stage(newTris
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("__d")))
    val touched = Checkpoints.stage(
      n.select(col("u").as("id"))
        .union(n.select(col("v").as("id")))
        .union(credits.select(col("id")))
        .distinct())
    // prior totals only for touched nodes: the store scan OPENS only
    // the files the touched id set can live in (footer manifest over
    // the id-clustered layout — a batch touching 0.1% of nodes reads
    // ~0.1% of the store, not all of it), then row-filters on a
    // broadcast-gated semi join; the merge is a touched-sized join —
    // never a |V|-sized side. Newest-wins is exact over the pruned
    // set: pruning keeps EVERY file a probed id can live in, so every
    // one of its rows survives
    val prior = prunedStoreView(spark, storeDir, "id", touched)
      .where(col("__b") < batchId)
      .groupBy(col("id"))
      .agg(max(struct(col("__b"), col("n_tri"))).as("m"))
      .select(col("id"), col("m.n_tri").as("n_tri"))
    val priorTouched = prior.join(gated(touched), Seq("id"), "left_semi")
    val slice = Checkpoints.stage(touched
      .join(priorTouched, Seq("id"), "left")
      .join(credits, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("n_tri"), lit(0L)) + coalesce(col("__d"), lit(0L)))
          .as("n_tri")))
    slice.select(col("id"), col("n_tri"), lit(batchId).as("__b"))
      .repartitionByRange(1, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=$batchId")
    Stats.upsertManifestFor(spark, storeDir, storeManifestPath(storeDir),
      s"$storeDir/batch=$batchId")
    // the returned view is REBUILT after the write: a retry's
    // overwrite of batch=<id> invalidates any file listing captured
    // before it (slice itself is staged, so its data predates the
    // overwrite safely)
    triangleStoreView(spark, storeDir, batchId)
      .join(gated(touched), Seq("id"), "left_anti")
      .unionByName(slice)
  }

  /** Fold the triangle store's delta batches, newest batch winning per
    * id — the OPTIMIZE cycle every incremental store here carries.
    */
  /** RETRACTION for the triangle store — [[rebuildCCStore]]'s posture
    * on the count form: deletion DECREASES per-node triangle counts,
    * which the create-only incremental form cannot absorb, so the
    * honest path is a from-scratch recount over the surviving edges
    * written as a SUPERSEDING `gen=<head+1>` (atomic view flip;
    * vanished nodes drop; later incremental batches continue above
    * the generation).
    */
  def rebuildTriangleStore(survivingEdges: DataFrame, a: Column,
                           b: Column, storeDir: String,
                           filesOut: Int = 4,
                           broadcastLimit: Long = 4000000L): Long =
    Stats.withWriterLease(survivingEdges.sparkSession, Seq(storeDir),
        "rebuildTriangleStore(batch)") {
    val spark = survivingEdges.sparkSession
    val tok = Stats.supersedingToken(spark, Seq(storeDir))
    triangleCounts(survivingEdges, a, b, broadcastLimit)
      .select(col("id"), col("n_tri"), lit(tok).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/gen=$tok")
    Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }

  def compactTriangleStore(spark: org.apache.spark.sql.SparkSession,
                           storeDir: String, filesOut: Int = 4)
      : Option[Long] =
    Stats.withWriterLease(spark, Seq(storeDir),
        "compactTriangleStore(batch)") {
    val tok = Stats.compactCommittedStore(spark, storeDir,
      _.groupBy(col("id"))
        .agg(max(struct(col("__b"), col("n_tri"))).as("m"))
        .select(col("id"), col("m.n_tri").as("n_tri"),
          col("m.__b").as("__b"))
        .repartitionByRange(filesOut, col("id"))
        .sortWithinPartitions(col("id")))
    if (tok.isDefined)
      Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }

  /** [[connectedComponents]] for ARBITRARY key types (URLs, source
    * names, entity strings): endpoints are densely re-labeled through
    * [[Training.encodeCategorical]]'s sorted-vocabulary codes, the
    * long-keyed CC machinery runs unchanged, and components decode
    * back — the canonical member is the LEXICOGRAPHICALLY smallest id
    * of each component (sorted codes make code-min ≡ value-min), so a
    * recursive-CTE oracle over the raw strings matches exactly.
    * Collision-free by construction where hashing string ids to longs
    * could not be. Returns (id, comp) in the original key type.
    */
  def connectedComponentsGeneric(edges: DataFrame, a: Column,
                                 b: Column,
                                 broadcastLimit: Long = 4000000L)
      : DataFrame = {
    val e = Checkpoints.stage(
      edges.select(a.as("ga"), b.as("gb")).distinct())
    val (vocab, nVocab) = Checkpoints.stageCount(
      e.select(col("ga").as("__cat"))
        .union(e.select(col("gb").as("__cat")))
        .where(col("__cat").isNotNull).distinct())
    val coded = Checkpoints.stage(
      Training.withPrefixSum(vocab, Seq(col("__cat")), lit(1L),
        "__code"))
    val side =
      if (nVocab <= broadcastLimit) broadcast(coded) else coded
    val codedEdges = e
      .join(side.select(col("__cat").as("ga"),
        col("__code").as("ca")), Seq("ga"))
      .join(side.select(col("__cat").as("gb"),
        col("__code").as("cb")), Seq("gb"))
      .select(col("ca"), col("cb"))
    connectedComponents(codedEdges, col("ca"), col("cb"))
      .join(side.select(col("__code").as("id"),
        col("__cat").as("__id_v")), Seq("id"))
      .join(side.select(col("__code").as("comp"),
        col("__cat").as("__comp_v")), Seq("comp"))
      .select(col("__id_v").as("id"), col("__comp_v").as("comp"))
  }

  /** The k-core of an undirected graph (Seidman, "Network structure
    * and minimum degree", Social Networks 1983): the maximal subgraph
    * where every node keeps degree ≥ k — computed by synchronous
    * peeling (drop all under-degree nodes, recount, repeat to the
    * fixpoint). On a near-dup graph the k-core is the dense duplicate
    * COMMUNITY: template farms and mirror families survive peeling;
    * chains and lone bridge edges — the pairs a transitive policy
    * should distrust — do not. The fixpoint is unique (the k-core is
    * the union of all subgraphs with min degree ≥ k), so the result is
    * independent of peeling order and an unrolled-CTE oracle that runs
    * AT LEAST the convergence rounds matches exactly — extra rounds
    * are identity.
    *
    * Scale shape: per round, two semi joins restrict edges to
    * surviving nodes (the |V|-sized survivor set broadcast below
    * `broadcastLimit` measured nodes) and one map-side-combined degree
    * count; rounds are bounded by `maxRounds` with an early exit on
    * the measured survivor count, and lineage is cut per round
    * ([[Checkpoints.stage]]). Synchronous peeling converges in at most
    * the graph's degeneracy-peeling depth; dedup graphs (dense cores,
    * shallow chains) converge in a few rounds.
    *
    * Returns the surviving nodes: (id).
    */
  def kCore(edges: DataFrame, a: Column, b: Column, k: Int,
            maxRounds: Int = 50,
            broadcastLimit: Long = 4000000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val e = Checkpoints.stage(
      edges.select(least(a, b).as("u"), greatest(a, b).as("v"))
        .where(col("u") =!= col("v"))
        .distinct())
    var (nodes, n) = Checkpoints.stageCount(
      e.select(col("u").as("id")).union(e.select(col("v").as("id")))
        .distinct())
    def vSized(df: DataFrame): DataFrame =
      if (n <= broadcastLimit) broadcast(df) else df
    var it = 0
    var converged = false
    while (it < maxRounds && !converged && n > 0) {
      val live = e
        .join(vSized(nodes.select(col("id").as("u"))), Seq("u"),
          "left_semi")
        .join(vSized(nodes.select(col("id").as("v"))), Seq("v"),
          "left_semi")
      val next = live.select(col("u").as("id"))
        .unionAll(live.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("__d"))
        .where(col("__d") >= k)
        .select(col("id"))
      val (staged, m) = Checkpoints.stageCount(next)
      converged = m == n
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(nodes)
      nodes = staged
      n = m
      it += 1
    }
    nodes
  }

  /** Stage + row count in ONE action — see [[Checkpoints.stageCount]]
    * (the convergence checks of iterative operators are per-job
    * scheduling latency, not data; fusing them halves the job count
    * of round-heavy topologies).
    */
  private def stagedCount(df: DataFrame): (DataFrame, Long) =
    Checkpoints.stageCount(df)

  // ---------- strongly connected components ----------

  /** STRONGLY connected components of a DIRECTED graph by iterated
    * forward-backward coloring (Fleischer, Hendrickson & Pınar, "On
    * identifying strongly connected components in parallel", IPDPS
    * 2000, in the label-propagation form Pregel-style systems use —
    * Slota, Rajamanickam & Madduri, IPDPS 2014). Each OUTER round over
    * the remaining subgraph:
    *
    *   1. FORWARD color: f(v) = min id that reaches v (including v),
    *      a min-label fixpoint along edge direction;
    *   2. BACKWARD reach within each color class: a node v with an
    *      all-class path v →* f(v) reaches its pivot, and the pivot
    *      reaches v by f's definition — mutual reachability, so
    *      {v : f(v) = c, v →*₍f=c₎ c} is EXACTLY SCC(c);
    *   3. every non-empty color retires its pivot's SCC (labeled by
    *      the pivot = the SCC's min member id); survivors re-color.
    *
    * Deterministic end to end: min-labels and set-valued reachability,
    * no tie-breaks — the oracle checks it against the mutual-
    * reachability closure in SQL. Returns (id, scc) for every node of
    * the edge list; scc = min member id.
    *
    * Scale: each outer round first TRIMS (Slota et al.'s Multistep
    * step 1): a node with no incoming or no outgoing edge in the
    * remainder cannot sit on a cycle, so it retires as a singleton
    * SCC — peeled ITERATIVELY (each layer exposes the next), edge-
    * driven at ONE observed staging job per layer (an edge survives
    * iff its src has an in-edge and its dst an out-edge; survivors'
    * node set = srcSet ∩ dstSet, and singletons are reconstructed
    * once at the end as allNodes ∖ FB-found), which drains DAG-shaped
    * regions without paying any coloring fixpoint. The surviving
    * cyclic core then runs the FB round: edge-sized min propagations
    * with path compression (pointer jumping — O(log d) rounds on a
    * depth-d remainder) and sum/count early exits (the CC
    * convergence pattern); outer rounds retire ≥ 1 SCC per live
    * color, so forests of small SCCs drain in parallel, and rounds
    * ALTERNATE the coloring direction (SCCs are reversal-invariant),
    * so a chain of SCCs whose ids ascend along the edges — one color
    * per round for a single direction — drains wholesale on the
    * reversed round (x_scc_chain prices exactly this shape). The
    * residual adversary is an id order hostile to BOTH directions,
    * where rounds still scale with log(SCC-depth) — the topology's
    * price, not the plan's. Round state staged and freed.
    *
    * Budgets: `maxRounds`/`maxInner` ≤ 0 (the default) derive from
    * the node count — n outer rounds (every round retires ≥ 1 node)
    * and n + 1 fixpoint iterations (a min/flag propagation converges
    * within the remainder's diameter < n) always suffice, so the
    * derived budgets never abort a finite input; pass explicit values
    * to bound wall-clock instead, accepting the loud `require` abort
    * when the graph's topology outruns them.
    */
  def stronglyConnectedComponents(edges: DataFrame, src: Column,
                                  dst: Column, maxRounds: Int = 0,
                                  maxInner: Int = 0,
                                  broadcastLimit: Long = 4000000L)
      : DataFrame = {
    val free: DataFrame => Unit =
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint
    val (e0, nE0) = Checkpoints.stageCount(
      edges.select(src.cast("long").as("src"),
          dst.cast("long").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct())
    val (allNodes, nAll) = stagedCount(
      e0.select(col("src").as("id"))
        .union(e0.select(col("dst").as("id"))).distinct())
    var remE = e0
    var nE = nE0
    val roundBudget =
      if (maxRounds > 0) maxRounds.toLong else math.max(nAll, 1L)
    val innerBudget =
      if (maxInner > 0) maxInner.toLong else nAll + 1L
    // broadcast regime gate (node-sized round state: colorings,
    // frontiers, retirement sets): below the gate every per-round
    // join is a broadcast hash join — an AQE exchange stage is its
    // own JOB, so each removed exchange removes a per-round barrier
    val small = nAll <= broadcastLimit
    def gated(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    // FB-retired SCCs only. Trim-retired and edge-drained nodes are
    // singleton SCCs by construction, filled in ONCE at the end via
    // allNodes ∖ (FB-found) — the per-trim-layer staged singleton
    // DataFrame (and its anti-join job) of the previous form is gone.
    val found =
      scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var outer = 0L
    while (nE > 0 && outer < roundBudget) {
      // 0. TRIM, edge-driven: an edge survives iff its src has an
      // in-edge and its dst has an out-edge; the surviving node set
      // is exactly srcSet ∩ dstSet of the surviving edges, so no node
      // table is maintained and each peel layer is ONE observed
      // staging job (was: node stageCount + singleton stage + edge
      // stage = 3-4 jobs per layer). Edge count stable ⇒ no node
      // trimmed (trimming a node removes its edges), so the fixpoint
      // test rides the same job.
      var trimming = true
      while (trimming && nE > 0) {
        // semi joins dedup their build side internally — no distinct
        // (each distinct was an exchange, i.e. a per-layer barrier)
        val hasIn = remE.select(col("dst").as("src"))
        val hasOut = remE.select(col("src").as("dst"))
        val (keepE, nKeepE) = stagedCount(remE
          .join(gated(hasIn), Seq("src"), "left_semi")
          .join(gated(hasOut), Seq("dst"), "left_semi"))
        if (nKeepE == nE) { free(keepE); trimming = false }
        else {
          if (!(remE eq e0)) free(remE)
          remE = keepE
          nE = nKeepE
        }
      }
      if (nE == 0) {
        outer += 1
      } else {
      // nodes of the surviving cyclic core (each has in + out
      // here) — derived lazily into the f init staging, never
      // materialized on its own
      val rem = remE.select(col("src").as("id"))
        .union(remE.select(col("dst").as("id"))).distinct()
      // Rounds ALTERNATE the coloring direction: SCCs are invariant
      // under edge reversal, and a chain whose ids ascend along the
      // edges — the worst case for one direction (a single color per
      // round) — splits into one color PER SCC under the reversed
      // min-propagation, so monotone chains drain in ~2 rounds
      // instead of SCC-depth-many.
      val dirE =
        if (outer % 2 == 0) remE
        else remE.select(col("dst").as("src"), col("src").as("dst"))
      // 1. directional min-label fixpoint with PATH COMPRESSION:
      // one edge step (f(dst) ≤ min over in-neighbors f(src)) plus
      // one pointer jump (f(v) ← f(f(v)) through the previous
      // round's staged table, the CC loop's trick) per round. Every
      // assigned value is an id that reaches v and labels only
      // decrease, so the fixpoint is the same min-reaching-id
      // coloring and "equal sums ⇒ converged" still holds (the
      // combined step is monotone; a fixpoint of edge∘jump is a
      // fixpoint of the edge step alone). The jump halves the
      // remaining label depth per round: O(log d) observed staging
      // jobs on a depth-d chain instead of O(d).
      // round 1 reads the IDENTITY coloring straight off the edge set
      // (f(v) = v ⇒ the neighbor-min is just min(src) per dst), so the
      // identity table is never staged and round 1 pays no f-broadcast
      // — one staging job and one broadcast job fewer per outer round
      var f: DataFrame = null
      var prevSum: java.math.BigDecimal = null
      var stable = false
      var it = 0
      while (!stable && it < innerBudget) {
        val nbrMin =
          if (f eq null)
            dirE.groupBy(col("dst").as("id"))
              .agg(min(col("src")).as("__nbr"))
          else dirE
            .join(gated(f.select(col("id").as("src"),
              col("f").as("__nf"))), Seq("src"))
            .groupBy(col("dst").as("id"))
            .agg(min(col("__nf")).as("__nbr"))
        val fBase =
          if (f eq null) rem.select(col("id"), col("id").as("f"))
          else f
        val prop = fBase
          .join(gated(nbrMin), Seq("id"), "left")
          .select(col("id"),
            least(col("f"), coalesce(col("__nbr"), col("f")))
              .as("f"))
        // round 1's jump would follow the IDENTITY init table — a
        // provable no-op, skipped
        val jumped =
          if (it == 0) prop
          else prop
            .join(gated(f.select(col("id").as("__jid"),
              col("f").as("__jf"))),
              prop("f") === col("__jid"), "left")
            .select(prop("id").as("id"),
              least(prop("f"), coalesce(col("__jf"), prop("f")))
                .as("f"))
        probeRound("scc.coloringRound", jumped)
        val obs = org.apache.spark.sql.Observation()
        val next = Checkpoints.stage(jumped
          .observe(obs,
            coalesce(sum(col("f").cast("decimal(38,0)")),
              lit(java.math.BigDecimal.ZERO)).as("s")))
        val sumNow = obs.get("s").asInstanceOf[java.math.BigDecimal]
        stable = prevSum != null && prevSum.compareTo(sumNow) == 0
        prevSum = sumNow
        if (f ne null) free(f)
        f = next
        it += 1
      }
      require(stable, s"scc: forward coloring did not converge in " +
        s"$innerBudget rounds (outer $outer)")
      // 2. reach back to the pivot INSIDE each color class (against
      // the round's coloring direction)
      val ce = Checkpoints.stage(dirE
        .join(gated(f.select(col("id").as("src"),
          col("f").as("__fs"))), Seq("src"))
        .join(gated(f.select(col("id").as("dst"),
          col("f").as("__fd"))), Seq("dst"))
        .where(col("__fs") === col("__fd"))
        .select(col("src"), col("dst")))
      // frontier-layered BFS against the coloring direction: each
      // layer stages only the NEWLY reached ids (one observed job per
      // layer), never the whole reached set re-distincted; reached =
      // the union of layers. Converged when a layer comes back empty.
      // pivots derive from the CACHED f by a narrow filter — no
      // staging job
      val pivots = f.where(col("id") === col("f")).select(col("id"))
      val rLayers = scala.collection.mutable.ArrayBuffer(pivots)
      def reachedView: DataFrame = rLayers.reduce(_ unionAll _)
      var frontier = pivots
      stable = false
      it = 0
      while (!stable && it < innerBudget) {
        val (next, n2) = stagedCount(
          ce.join(gated(frontier.select(col("id").as("dst"))),
              Seq("dst"), "left_semi")
            .select(col("src").as("id"))
            .distinct()
            .join(gated(reachedView), Seq("id"), "left_anti"))
        stable = n2 == 0
        if (n2 > 0) { rLayers += next; frontier = next }
        it += 1
      }
      require(stable, s"scc: backward reach did not converge in " +
        s"$innerBudget rounds (outer $outer)")
      val reached = reachedView
      // 3. retire the found SCCs; surviving edges re-color next round
      val scc = Checkpoints.stage(
        f.join(gated(reached), Seq("id"), "left_semi")
          .select(col("id"), col("f").as("scc")))
      found += scc
      free(ce)
      free(f)
      rLayers.foreach(free)
      val (remENext, nENext) = stagedCount(remE
        .join(gated(scc.select(col("id").as("src"))), Seq("src"),
          "left_anti")
        .join(gated(scc.select(col("id").as("dst"))), Seq("dst"),
          "left_anti"))
      if (!(remE eq e0)) free(remE)
      remE = remENext
      nE = nENext
      outer += 1
      }
    }
    require(nE == 0,
      s"scc did not drain in $roundBudget outer rounds")
    // singleton fill: every node never retired by an FB round is its
    // own SCC (trim-retired or edge-drained) — one anti-join at the
    // end instead of a staged singleton set per trim layer
    if (found.isEmpty)
      allNodes.select(col("id"), col("id").as("scc"))
    else {
      val fb = found.reduce(_ unionAll _)
      fb.unionAll(
        allNodes.join(gated(fb.select(col("id"))), Seq("id"),
          "left_anti")
          .select(col("id"), col("id").as("scc")))
    }
  }

  /** The CONDENSATION of a directed graph with LONGEST-PATH levels:
    * contract each SCC ([[stronglyConnectedComponents]]) to one node,
    * keep the distinct cross-SCC edges (a DAG by construction), and
    * compute each condensed node's topological LEVEL — the longest
    * path from any source (level 0 = no incoming edges) — by the
    * monotone fixpoint level(c) ← max(level(c), 1 + max over
    * predecessors), converging in DAG-depth rounds with the CC
    * sum-observation early exit. The dependency-graph readout:
    * "what can run in parallel, what must wait, where the cycles
    * collapsed". Returns (scc, level, n_members).
    *
    * Scale: one SCC run + per-round edge-sized max propagation over
    * the CONDENSED graph (≤ #SCCs nodes — usually far smaller than
    * |V|); state staged and freed per round.
    */
  def sccCondensation(edges: DataFrame, src: Column, dst: Column,
                      maxRounds: Int = 0, maxInner: Int = 0)
      : DataFrame = {
    val e0 = Checkpoints.stage(
      edges.select(src.cast("long").as("src"),
          dst.cast("long").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct())
    val asg = Checkpoints.stage(stronglyConnectedComponents(
      e0, col("src"), col("dst"), maxRounds, maxInner))
    val ce = Checkpoints.stage(e0
      .join(asg.select(col("id").as("src"), col("scc").as("__ca")),
        Seq("src"))
      .join(asg.select(col("id").as("dst"), col("scc").as("__cb")),
        Seq("dst"))
      .where(col("__ca") =!= col("__cb"))
      .select(col("__ca").as("src"), col("__cb").as("dst"))
      .distinct())
    condensationLevels(asg, ce, maxInner)
  }

  /** The longest-path level fixpoint + member counts over an already-
    * computed (assignment, condensation-edge) pair — the shared tail
    * of [[sccCondensation]] (from-scratch inputs) and
    * [[sccStoreLevels]] (store-backed inputs).
    */
  private def condensationLevels(asg: DataFrame, ce: DataFrame,
                                 maxInner: Int): DataFrame = {
    val free: DataFrame => Unit =
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint
    var lvl = Checkpoints.stage(
      asg.select(col("scc")).distinct()
        .withColumn("level", lit(0L)))
    // DAG depth < #condensed nodes, so the derived budget never
    // aborts a finite input (the levels fixpoint converges or the
    // condensation was not a DAG — a bug the require below names)
    val levelBudget =
      if (maxInner > 0) maxInner.toLong else lvl.count() + 1L
    var prevSum: java.math.BigDecimal = null
    var stable = false
    var it = 0
    while (!stable && it < levelBudget) {
      val predMax = ce
        .join(lvl.select(col("scc").as("src"),
          col("level").as("__pl")), Seq("src"))
        .groupBy(col("dst").as("scc"))
        .agg((max(col("__pl")) + 1).as("__nl"))
      val obs = org.apache.spark.sql.Observation()
      val next = Checkpoints.stage(lvl
        .join(predMax, Seq("scc"), "left")
        .select(col("scc"),
          greatest(col("level"), coalesce(col("__nl"), col("level")))
            .as("level"))
        .observe(obs,
          coalesce(sum(col("level").cast("decimal(38,0)")),
            lit(java.math.BigDecimal.ZERO)).as("s")))
      val sumNow = obs.get("s").asInstanceOf[java.math.BigDecimal]
      stable = prevSum != null && prevSum.compareTo(sumNow) == 0
      prevSum = sumNow
      free(lvl)
      lvl = next
      it += 1
    }
    require(stable,
      s"condensationLevels: no fixpoint in $levelBudget rounds" +
        " — the condensation must be a DAG, so this is a bug")
    asg.groupBy(col("scc")).agg(count(lit(1)).as("n_members"))
      .join(lvl, Seq("scc"))
      .select(col("scc"), col("level"), col("n_members"))
  }

  /** [[sccCondensation]]'s readout FROM THE INCREMENTAL STORE: the
    * level fixpoint runs over the stored condensation (≤ #SCCs nodes,
    * stale labels mapped at read) and member counts come from the
    * stored assignment — after a [[sccIncremental]] batch the
    * dependency-graph readout refreshes WITHOUT touching the original
    * edge list. Same (scc, level, n_members) relation, hash-checkable
    * against the from-scratch oracle over the union graph.
    */
  def sccStoreLevels(spark: org.apache.spark.sql.SparkSession,
                     storeDir: String, maxInner: Int = 0): DataFrame = {
    val asg = Checkpoints.stage(sccStoreAssign(spark, storeDir))
    val ce = Checkpoints.stage(
      sccCedgesView(spark, storeDir, Long.MaxValue, asg))
    condensationLevels(asg, ce, maxInner)
  }

  // ---------- incremental strongly connected components ----------

  /** Persist [[stronglyConnectedComponents]]' (id, scc) assignment
    * PLUS the condensation's cross-SCC edges as `batch=0` of an
    * incremental store — the state that makes directed-graph
    * maintenance sublinear: edge insertion can only MERGE SCCs (an
    * SCC never splits when reachability grows), so a later batch
    * recomputes SCC over (stored condensation ∪ the batch's mapped
    * edges) — a graph of ≤ #SCCs + batch nodes, usually far smaller
    * than |V| — and relabels only merged members. The
    * [[connectedComponentsIncremental]] contract-through-stored-labels
    * pattern, directed.
    */
  def writeSccStore(edges: DataFrame, src: Column, dst: Column,
                    storeDir: String, filesOut: Int = 1): Unit =
    Stats.withWriterLease(edges.sparkSession, Seq(storeDir),
        "writeSccStore(batch)") {
    val e0 = Checkpoints.stage(
      edges.select(src.cast("long").as("src"),
          dst.cast("long").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct())
    val asg = Checkpoints.stage(
      stronglyConnectedComponents(e0, col("src"), col("dst")))
    asg.select(col("id"), col("scc"), lit(0L).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/assign/batch=0")
    e0.join(asg.select(col("id").as("src"), col("scc").as("__ca")),
        Seq("src"))
      .join(asg.select(col("id").as("dst"), col("scc").as("__cb")),
        Seq("dst"))
      .where(col("__ca") =!= col("__cb"))
      .select(col("__ca").as("src"), col("__cb").as("dst"))
      .distinct()
      .withColumn("__b", lit(0L))
      .repartitionByRange(filesOut, col("src"))
      .sortWithinPartitions(col("src"), col("dst"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/cedges/batch=0")
  }

  private def sccAssignView(spark: org.apache.spark.sql.SparkSession,
                            storeDir: String,
                            beforeBatch: Long): DataFrame =
    Stats.openCommittedStore(spark, s"$storeDir/assign",
        Seq("id" -> "bigint", "scc" -> "bigint", "__b" -> "bigint"),
        "sccStore/assign")
      .where(col("__b") < beforeBatch)
      .groupBy(col("id"))
      .agg(max(struct(col("__b"), col("scc"))).as("m"))
      .select(col("id"), col("m.scc").as("scc"))

  /** The SCC store's CURRENT (id, scc) assignment — newest wins per
    * id (scc = min member id of the merged component, maintained
    * exactly by [[sccIncremental]]).
    */
  def sccStoreAssign(spark: org.apache.spark.sql.SparkSession,
                     storeDir: String): DataFrame =
    sccAssignView(spark, storeDir, Long.MaxValue)

  /** The store's condensation edges under the CURRENT assignment:
    * stored rows may carry stale labels (their endpoints were SCC
    * labels at write time), so each endpoint — always a node id —
    * maps through the current assignment; edges whose SCCs have since
    * merged collapse to self-loops and drop. Staleness costs this
    * mapping join, never correctness.
    */
  def sccStoreCondensation(spark: org.apache.spark.sql.SparkSession,
                           storeDir: String): DataFrame =
    sccCedgesView(spark, storeDir, Long.MaxValue,
      sccStoreAssign(spark, storeDir))

  private def sccCedgesView(spark: org.apache.spark.sql.SparkSession,
                            storeDir: String, beforeBatch: Long,
                            asg: DataFrame): DataFrame =
    Stats.openCommittedStore(spark, s"$storeDir/cedges",
        Seq("src" -> "bigint", "dst" -> "bigint", "__b" -> "bigint"),
        "sccStore/cedges")
      .where(col("__b") < beforeBatch)
      .join(asg.select(col("id").as("src"), col("scc").as("__ca")),
        Seq("src"))
      .join(asg.select(col("id").as("dst"), col("scc").as("__cb")),
        Seq("dst"))
      .where(col("__ca") =!= col("__cb"))
      .select(col("__ca").as("src"), col("__cb").as("dst"))
      .distinct()

  /** INCREMENTAL SCC — the directed warm start: contract the batch's
    * edges through the stored assignment (unseen endpoints are their
    * own super-nodes), run [[stronglyConnectedComponents]] over the
    * stored condensation ∪ the mapped batch — SOUND because
    * insertions only merge SCCs and the condensation preserves every
    * cross-SCC reachability of the stored graph, and ≤ #SCCs + batch
    * sized because contracted members never re-enter. Labels stay
    * exact: a stored label is its SCC's min member id, so the min
    * over merged super-node labels IS the merged SCC's min member id
    * (the CC-incremental relabel argument, directed). The assign
    * delta holds only merged-SCC members and new nodes; the batch's
    * own cross-SCC edges append to the condensation store under
    * current labels. Retries are overwrite-idempotent (both views
    * read only rows with `__b` < batchId; compaction keeps row-level
    * `__b`). Returns the full (id, scc) assignment over old ∪ new.
    * Edge/node DELETION is out of contract here (it can SPLIT an
    * SCC) — that direction is [[rebuildSccStore]], the documented
    * rebuild-on-retract posture.
    */
  def sccIncremental(newEdges: DataFrame, src: Column, dst: Column,
                     storeDir: String, batchId: Long,
                     broadcastLimit: Long = 4000000L): DataFrame =
    Stats.withWriterLease(newEdges.sparkSession, Seq(storeDir),
        "sccIncremental(batch)") {
    require(batchId >= 1L, "batchId 0 is the writeSccStore base")
    val spark = newEdges.sparkSession
    Stats.requireMonotoneBatch(spark,
      Seq(s"$storeDir/assign", s"$storeDir/cedges"), batchId,
      "sccIncremental")
    val (en, nNew) = Checkpoints.stageCount(
      newEdges.select(src.cast("long").as("src"),
          dst.cast("long").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct())
    def gated(df: DataFrame): DataFrame =
      if (nNew <= broadcastLimit) broadcast(df) else df
    val stored = Checkpoints.stage(
      sccAssignView(spark, storeDir, batchId))
    val ids = en.select(col("src").as("id"))
      .union(en.select(col("dst").as("id"))).distinct()
    val mapped = Checkpoints.stage(en
      .join(gated(stored.select(col("id").as("src"),
        col("scc").as("__cu"))), Seq("src"), "left")
      .join(gated(stored.select(col("id").as("dst"),
        col("scc").as("__cv"))), Seq("dst"), "left")
      .select(coalesce(col("__cu"), col("src")).as("src"),
        coalesce(col("__cv"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct())
    val superE = sccCedgesView(spark, storeDir, batchId, stored)
      .unionByName(mapped)
      .distinct()
    val superAsg = Checkpoints.stage(stronglyConnectedComponents(
      superE, col("src"), col("dst")))
    // super-nodes whose label changed = merged groups' non-min labels
    val remap = Checkpoints.stage(
      superAsg.where(col("id") =!= col("scc"))
        .select(col("id").as("__old"), col("scc").as("__new")))
    // merged SCCs' stored members relabel; winners keep their rows
    val losers = stored
      .join(gated(remap), col("scc") === col("__old"))
      .select(col("id"), col("__new").as("scc"))
    // the batch's NEW nodes: their super-node is their own id
    val newNodes = ids
      .join(gated(stored.select(col("id"))), Seq("id"), "left_anti")
      .join(gated(remap), col("id") === col("__old"), "left")
      .select(col("id"), coalesce(col("__new"), col("id")).as("scc"))
    val slice = Checkpoints.stage(newNodes.unionByName(losers))
    slice.select(col("id"), col("scc"), lit(batchId).as("__b"))
      .repartitionByRange(1, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/assign/batch=$batchId")
    // the batch's own cross-SCC edges, under the POST-batch labels
    mapped
      .join(gated(remap.select(col("__old").as("src"),
        col("__new").as("__ns"))), Seq("src"), "left")
      .join(gated(remap.select(col("__old").as("dst"),
        col("__new").as("__nd"))), Seq("dst"), "left")
      .select(coalesce(col("__ns"), col("src")).as("src"),
        coalesce(col("__nd"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .withColumn("__b", lit(batchId))
      .repartitionByRange(1, col("src"))
      .sortWithinPartitions(col("src"), col("dst"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/cedges/batch=$batchId")
    stored
      .join(gated(slice.select(col("id"))), Seq("id"), "left_anti")
      .unionByName(slice.select(col("id"), col("scc")))
  }

  /** RETRACTION for the SCC store — the one maintenance direction
    * [[sccIncremental]] cannot absorb: edge (or node) DELETION can
    * SPLIT an SCC, and a split invalidates the contraction soundness
    * argument (which rests on insertions only merging). The honest
    * form is a REBUILD over the surviving edge list — O(survivors),
    * the rebuild-on-retract posture the KMV compaction documents —
    * written as a SUPERSEDING GENERATION: `assign/gen=<head+1>` and
    * `cedges/gen=<head+1>` hide every earlier batch in the committed
    * view atomically (readers resolve old state or new, never a mix),
    * and the next [[compactSccStore]] cycle vacuums the stale dirs.
    * The caller supplies the surviving edges (the streaming gate's
    * edge store holds them; a node takedown = dropping its incident
    * edges). Stale-read window: until the rebuild lands, reads serve
    * the pre-delete state — retraction is not incremental here BY
    * DESIGN, and the spec pins rebuild ≡ from-scratch including
    * splits.
    */
  def rebuildSccStore(survivingEdges: DataFrame, src: Column,
                      dst: Column, storeDir: String,
                      filesOut: Int = 1): Long =
    Stats.withWriterLease(survivingEdges.sparkSession, Seq(storeDir),
        "rebuildSccStore(batch)") {
    val spark = survivingEdges.sparkSession
    val tok = Stats.supersedingToken(spark,
      Seq(s"$storeDir/assign", s"$storeDir/cedges"))
    val e0 = Checkpoints.stage(
      survivingEdges.select(src.cast("long").as("src"),
          dst.cast("long").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct())
    val asg = Checkpoints.stage(
      stronglyConnectedComponents(e0, col("src"), col("dst")))
    asg.select(col("id"), col("scc"), lit(tok).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/assign/gen=$tok")
    e0.join(asg.select(col("id").as("src"), col("scc").as("__ca")),
        Seq("src"))
      .join(asg.select(col("id").as("dst"), col("scc").as("__cb")),
        Seq("dst"))
      .where(col("__ca") =!= col("__cb"))
      .select(col("__ca").as("src"), col("__cb").as("dst"))
      .distinct()
      .withColumn("__b", lit(tok))
      .repartitionByRange(filesOut, col("src"))
      .sortWithinPartitions(col("src"), col("dst"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/cedges/gen=$tok")
    tok
  }

  /** OPTIMIZE for the SCC store: assign folds newest-wins per id
    * (row-level `__b` kept — the retry-view contract), cedges fold to
    * distinct rows keeping each edge's EARLIEST batch id (relabeling
    * is deliberately left to read time: folding post-batch labels
    * into older rows would break a retried batch's strictly-before
    * view; stale rows only cost the read-time mapping join).
    */
  def compactSccStore(spark: org.apache.spark.sql.SparkSession,
                      storeDir: String, filesOut: Int = 1)
      : Option[Long] =
    Stats.withWriterLease(spark, Seq(storeDir),
        "compactSccStore(batch)") {
    val tok = Stats.compactCommittedStore(spark, s"$storeDir/assign",
      _.groupBy(col("id"))
        .agg(max(struct(col("__b"), col("scc"))).as("m"))
        .select(col("id"), col("m.scc").as("scc"),
          col("m.__b").as("__b"))
        .repartitionByRange(filesOut, col("id"))
        .sortWithinPartitions(col("id")))
    if (tok.isDefined)
      Stats.compactCommittedStore(spark, s"$storeDir/cedges",
        _.groupBy(col("src"), col("dst"))
          .agg(min(col("__b")).as("__b"))
          .repartitionByRange(filesOut, col("src"))
          .sortWithinPartitions(col("src"), col("dst"))): Unit
    tok
  }

  // ---------- incremental connected components ----------

  /** The CC store's comp-clustered PROJECTION root — the same
    * (id, comp, __b) rows re-clustered by comp, so the losers lookup
    * (probe: a batch-sized set of LOSING component ids) opens only
    * loser-comp files instead of scanning the id-clustered store.
    * Projection rows go stale when an id later moves component — the
    * reader confirms every candidate through an id-pruned newest-wins
    * lookup, so staleness costs reading, never correctness;
    * [[compactCCStore]] folds the staleness away.
    */
  private def ccByCompDir(storeDir: String): String =
    storeDir.stripSuffix("/") + "_bycomp"

  /** Persist [[connectedComponents]]' (id, comp) labeling as `batch=0`
    * of an incremental store (id-clustered, newest-batch-wins rows —
    * the label-store protocol), plus the comp-clustered projection and
    * both sibling footer manifests.
    */
  def writeCCStore(edges: DataFrame, a: Column, b: Column,
                   storeDir: String, filesOut: Int = 4): Unit =
    Stats.withWriterLease(edges.sparkSession, Seq(storeDir),
        "writeCCStore(batch)") {
    val spark = edges.sparkSession
    val labels = Checkpoints.stage(connectedComponents(edges, a, b)
      .select(col("id"), col("comp"), lit(0L).as("__b")))
    // projection FIRST, main store second: a committed main row must
    // always have its projection mirror (loser-lookup completeness),
    // so the main write is the commit point — a crash between the two
    // leaves only an orphan projection batch, whose extra candidates
    // the confirm step filters harmlessly
    labels
      .repartitionByRange(filesOut, col("comp"))
      .sortWithinPartitions(col("comp"), col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"${ccByCompDir(storeDir)}/batch=0")
    labels
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=0")
    Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    Stats.upsertManifest(spark, ccByCompDir(storeDir),
      storeManifestPath(ccByCompDir(storeDir)))
  }

  /** RETRACTION for the CC store — [[rebuildSccStore]]'s posture,
    * undirected: edge (or node) deletion can SPLIT a component, which
    * [[connectedComponentsIncremental]]'s contract-through-labels
    * argument cannot absorb (it rests on insertions only merging), so
    * the honest form is a REBUILD over the surviving edge list,
    * written as a SUPERSEDING `gen=<head+1>` in the main store AND
    * the comp-clustered projection — the committed view flips
    * atomically, stale ids (nodes that lost every edge) disappear
    * rather than lingering as newest-wins rows, and later incremental
    * batches continue above the generation (monotone-guarded).
    */
  def rebuildCCStore(survivingEdges: DataFrame, a: Column, b: Column,
                     storeDir: String, filesOut: Int = 4): Long =
    Stats.withWriterLease(survivingEdges.sparkSession, Seq(storeDir),
        "rebuildCCStore(batch)") {
    val spark = survivingEdges.sparkSession
    val byComp = ccByCompDir(storeDir)
    val tok = Stats.supersedingToken(spark, Seq(storeDir, byComp))
    val labels = Checkpoints.stage(
      connectedComponents(survivingEdges, a, b)
        .select(col("id"), col("comp"), lit(tok).as("__b")))
    // projection first, main second — the writeCCStore commit order
    labels
      .repartitionByRange(filesOut, col("comp"))
      .sortWithinPartitions(col("comp"), col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$byComp/gen=$tok")
    labels
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/gen=$tok")
    Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    Stats.upsertManifest(spark, byComp, storeManifestPath(byComp))
    tok
  }

  private def ccStoreView(spark: org.apache.spark.sql.SparkSession,
                          storeDir: String,
                          beforeBatch: Long): DataFrame = {
    Stats.openCommittedStore(spark, storeDir,
        Seq("id" -> "bigint", "comp" -> "bigint", "__b" -> "bigint"),
        "ccStore")
      .where(col("__b") < beforeBatch)
      .groupBy(col("id"))
      .agg(max(struct(col("__b"), col("comp"))).as("m"))
      .select(col("id"), col("m.comp").as("comp"))
  }

  /** The CC store's CURRENT (id, comp) labeling — the committed view
    * folded newest-wins per id; the read the streaming gate's
    * consumers (and specs) use between micro-batches.
    */
  def ccStoreLabels(spark: org.apache.spark.sql.SparkSession,
                    storeDir: String): DataFrame =
    ccStoreView(spark, storeDir, Long.MaxValue)

  /** SNAPSHOT read of the CC store: the (id, comp) labeling AS OF
    * batch `asOf` (batches ≤ asOf, newest wins per id) — the
    * reproducible-corpus read ("the dedup clusters the training run
    * saw at batch k"), and the inputs of [[graft.operators.Stats
    * .keyedDiff]]'s snapshot audit. Exact for any `asOf` at or after
    * the newest generation token: compaction's newest-wins fold keeps
    * one row per id (row-level `__b` intact), so ids whose label
    * changed AFTER an older snapshot lose their older row — the
    * standard time-travel-vs-OPTIMIZE retention trade (pin the
    * snapshot read before compacting, or keep pre-compaction batch
    * dirs under an explicit retention policy, exactly as
    * Delta/Iceberg do).
    */
  def ccStoreLabelsAsOf(spark: org.apache.spark.sql.SparkSession,
                        storeDir: String, asOf: Long): DataFrame = {
    require(asOf >= 0L, "asOf is a committed batch id")
    ccStoreView(spark, storeDir, asOf + 1)
  }

  /** INCREMENTAL connected components — the truly sublinear warm
    * start: edge insertion only MERGES components, so a batch is
    * processed by contracting its edges through the stored labels and
    * running CC on the contracted graph, which has at most one node
    * per TOUCHED component plus the batch's new nodes — never the
    * corpus (the union-find "link by canonical representative" step,
    * distributed as one contraction round of Kiveris et al.,
    * "Connected components in MapReduce and beyond", SoCC 2014 —
    * whose large/small-star machinery [[connectedComponentsStar]]
    * also finishes the contracted graph here). Because a stored component label is the MIN member id,
    * the min over merged contracted nodes is the min over all merged
    * members, so relabeling through the contraction is EXACT
    * (x_cc_incremental shares a full-graph recursive-CTE oracle).
    *
    * Only rows of LOSING components rewrite: members of the component
    * whose label is the merged min keep their stored row untouched;
    * the delta holds losing-component members and the batch's new
    * nodes. Retries are overwrite-idempotent (the view reads only
    * batches < batchId); [[compactCCStore]] folds newest-wins.
    *
    * Scale shape: one broadcast-gated relabel join of the batch edges
    * against the store (manifest-style pruning rides the id-clustered
    * layout), CC on the contracted batch-sized graph, one semi join to
    * fetch losing-component rows. No full-graph pass anywhere.
    *
    * Returns the full (id, comp) labeling over old ∪ new nodes.
    */
  def connectedComponentsIncremental(newEdges: DataFrame, na: Column,
                                     nb: Column, storeDir: String,
                                     batchId: Long,
                                     broadcastLimit: Long = 4000000L,
                                     smallStoreBytes: Long = 32L << 20)
      : DataFrame =
    Stats.withWriterLease(newEdges.sparkSession, Seq(storeDir),
        "connectedComponentsIncremental(batch)") {
    require(batchId >= 1L, "batchId 0 is the writeCCStore base")
    val spark = newEdges.sparkSession
    Stats.requireMonotoneBatch(spark,
      Seq(storeDir, ccByCompDir(storeDir)), batchId,
      "connectedComponentsIncremental")
    val (en, nNew) = Checkpoints.stageCount(
      newEdges.select(na.cast("long").as("u"), nb.cast("long").as("v"))
        .where(col("u") =!= col("v"))
        .distinct())
    def gated(df: DataFrame): DataFrame =
      if (nNew <= broadcastLimit) broadcast(df) else df
    // relabel batch endpoints through the stored components; unknown
    // (new) nodes keep their own id — the store scan OPENS only the
    // files the batch endpoints can live in (sibling footer manifest
    // over the id-clustered layout), then row-filters on a batch-sized
    // semi join. Newest-wins is exact over the pruned set: every row
    // of a probed id survives file pruning
    val ids = en.select(col("u").as("id"))
      .union(en.select(col("v").as("id"))).distinct()
    // one pruner for both id-keyed probes below (endpoint relabel +
    // loser-candidate confirm): manifest + listing load once. Regime
    // gate on MEASURED store bytes, as in kCoreIncremental: a small
    // store reads whole (fewer scheduler round trips than per-probe
    // pruning), a big one only by manifest-pruned probe.
    val idPruner = Stats.keyPruner(spark,
      Stats.committedViewDirs(spark, storeDir),
      storeManifestPath(storeDir), "id")
    val smallStore = idPruner.totalBytes <= smallStoreBytes
    def idProbeView(probe: DataFrame): DataFrame =
      if (smallStore)
        spark.read.parquet(
          Stats.committedViewDirs(spark, storeDir): _*)
      else idPruner.read(probe)
    val touchedState = Checkpoints.stage(
      idProbeView(ids)
        .where(col("__b") < batchId)
        .groupBy(col("id"))
        .agg(max(struct(col("__b"), col("comp"))).as("m"))
        .select(col("id"), col("m.comp").as("comp"))
        .join(gated(ids), Seq("id"), "left_semi"))
    val relabeled = en
      .join(gated(touchedState.select(col("id").as("u"),
        col("comp").as("cu"))), Seq("u"), "left")
      .join(gated(touchedState.select(col("id").as("v"),
        col("comp").as("cv"))), Seq("v"), "left")
      .select(coalesce(col("cu"), col("u")).as("ca"),
        coalesce(col("cv"), col("v")).as("cb"))
      .where(col("ca") =!= col("cb"))
    // CC over the CONTRACTED graph: batch-sized by construction
    val merged = Checkpoints.stage(
      connectedComponents(relabeled, col("ca"), col("cb"))
        .where(col("id") =!= col("comp"))
        .select(col("id").as("__old"), col("comp").as("__new")))
    // losing components' members rewrite; winners keep their rows.
    // Member candidates come from the comp-clustered projection —
    // probe: the batch-sized losing-comp set, so only loser-comp
    // FILES open — then each candidate's CURRENT label is confirmed
    // through an id-pruned newest-wins lookup (projection rows go
    // stale when an id later moves component; the confirm step makes
    // staleness cost reading, never correctness; compaction folds it
    // away). Stores written before the projection existed fall back
    // to the id-clustered scan, and never grow a partial projection.
    val byComp = ccByCompDir(storeDir)
    val hasProjection = Stats.committedViewDirs(spark, byComp).nonEmpty
    val losers =
      if (!hasProjection || smallStore)
        ccStoreView(spark, storeDir, batchId)
          .join(gated(merged), col("comp") === col("__old"))
          .select(col("id"), col("__new").as("comp"))
      else {
        val loserComps = merged.select(col("__old").as("comp"))
        val candIds = Checkpoints.stage(
          Stats.readTouchedKeysUnder(spark,
              Stats.committedViewDirs(spark, byComp),
              storeManifestPath(byComp), "comp", loserComps)
            .where(col("__b") < batchId)
            .join(gated(loserComps), Seq("comp"), "left_semi")
            .select(col("id")).distinct())
        idPruner.read(candIds)
          .where(col("__b") < batchId)
          .join(candIds, Seq("id"), "left_semi")
          .groupBy(col("id"))
          .agg(max(struct(col("__b"), col("comp"))).as("m"))
          .select(col("id"), col("m.comp").as("comp"))
          .join(gated(merged), col("comp") === col("__old"))
          .select(col("id"), col("__new").as("comp"))
      }
    // the batch's NEW nodes: absent from the store, so each appears in
    // the contracted graph under its OWN id — its final component is
    // its merged remap (when its contracted node lost) or itself (it
    // is the min of its merged group, or untouched)
    val newNodes = ids
      .join(gated(touchedState.select(col("id"))), Seq("id"),
        "left_anti")
      .join(gated(merged), col("id") === col("__old"), "left")
      .select(col("id"), coalesce(col("__new"), col("id")).as("comp"))
    val slice = Checkpoints.stage(newNodes.unionByName(losers))
    // projection mirror FIRST, main store second: a committed main row
    // must always have its projection mirror (loser-lookup
    // completeness — the main write is the commit point; an orphan
    // projection batch from a crash in between only adds candidates
    // the confirm step filters). A store without a projection base
    // skips the mirror and stays on the fallback scan.
    if (hasProjection)
      slice.select(col("id"), col("comp"), lit(batchId).as("__b"))
        .repartitionByRange(1, col("comp"))
        .sortWithinPartitions(col("comp"), col("id"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$byComp/batch=$batchId")
    slice.select(col("id"), col("comp"), lit(batchId).as("__b"))
      .repartitionByRange(1, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=$batchId")
    // manifest upkeep only in the big regime (stale manifests are
    // sound — uncovered files always read — and compactCCStore
    // restores full coverage); the PROJECTION batch itself is always
    // appended above: its completeness is a correctness invariant for
    // future big-regime loser lookups, the manifest is only an index
    if (!smallStore) {
      if (hasProjection)
        Stats.upsertManifestFor(spark, byComp, storeManifestPath(byComp),
          s"$byComp/batch=$batchId")
      Stats.upsertManifestFor(spark, storeDir,
        storeManifestPath(storeDir), s"$storeDir/batch=$batchId")
    }
    ccStoreView(spark, storeDir, batchId)
      .join(gated(slice.select(col("id"))), Seq("id"), "left_anti")
      .unionByName(slice.select(col("id"), col("comp")))
  }

  /** Fold the CC store's delta batches, newest batch winning per id —
    * and fold the comp-clustered projection the same way (the per-id
    * newest-wins fold is what evicts its stale rows), refreshing both
    * manifests.
    */
  def compactCCStore(spark: org.apache.spark.sql.SparkSession,
                     storeDir: String, filesOut: Int = 4): Option[Long] =
    Stats.withWriterLease(spark, Seq(storeDir),
        "compactCCStore(batch)") {
    def currentRows(df: DataFrame): DataFrame =
      df.groupBy(col("id"))
        .agg(max(struct(col("__b"), col("comp"))).as("m"))
        .select(col("id"), col("m.comp").as("comp"),
          col("m.__b").as("__b"))
    val tok = Stats.compactCommittedStore(spark, storeDir,
      currentRows(_)
        .repartitionByRange(filesOut, col("id"))
        .sortWithinPartitions(col("id")))
    if (tok.isDefined) {
      val byComp = ccByCompDir(storeDir)
      if (Stats.committedViewDirs(spark, byComp).nonEmpty) {
        Stats.compactCommittedStore(spark, byComp,
          currentRows(_)
            .repartitionByRange(filesOut, col("comp"))
            .sortWithinPartitions(col("comp"), col("id"))): Unit
        Stats.upsertManifest(spark, byComp, storeManifestPath(byComp))
      }
      Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    }
    tok
  }

  // ---------- warm-start incremental k-core ----------

  /** Persist [[kCore]]'s member set as `batch=0` of an incremental
    * store. Membership is MONOTONE under edge insertion (the k-core
    * only grows), so the store is append-only member ids — no
    * newest-wins merge needed; the view is the union of committed
    * batches.
    */
  def writeKCoreStore(edges: DataFrame, a: Column, b: Column, k: Int,
                      storeDir: String, filesOut: Int = 4,
                      maxRounds: Int = 50,
                      broadcastLimit: Long = 4000000L): Unit =
    Stats.withWriterLease(edges.sparkSession, Seq(storeDir),
        "writeKCoreStore(batch)") {
    kCore(edges, a, b, k, maxRounds, broadcastLimit)
      .select(col("id"), lit(0L).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=0")
    Stats.upsertManifest(edges.sparkSession, storeDir,
      storeManifestPath(storeDir))
  }

  /** RETRACTION for the k-core store — the monotone-union twist on
    * [[rebuildCCStore]]'s posture: membership only GROWS under edge
    * insertion (which is why the store is a union of member deltas),
    * but deletion SHRINKS the core, a direction the union view cannot
    * express at all — so the store REBUILDS as the k-core of the
    * surviving edges, written as a superseding `gen=<head+1>` that
    * hides every earlier member delta atomically. Later
    * [[kCoreIncremental]] batches continue above the generation
    * (monotone-guarded).
    */
  def rebuildKCoreStore(survivingEdges: DataFrame, a: Column,
                        b: Column, k: Int, storeDir: String,
                        filesOut: Int = 4, maxRounds: Int = 50,
                        broadcastLimit: Long = 4000000L): Long =
    Stats.withWriterLease(survivingEdges.sparkSession, Seq(storeDir),
        "rebuildKCoreStore(batch)") {
    val spark = survivingEdges.sparkSession
    val tok = Stats.supersedingToken(spark, Seq(storeDir))
    kCore(survivingEdges, a, b, k, maxRounds, broadcastLimit)
      .select(col("id"), lit(tok).as("__b"))
      .repartitionByRange(filesOut, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/gen=$tok")
    Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }

  private def kCoreStoreView(spark: org.apache.spark.sql.SparkSession,
                             storeDir: String,
                             beforeBatch: Long): DataFrame = {
    Stats.openCommittedStore(spark, storeDir,
        Seq("id" -> "bigint", "__b" -> "bigint"), "kCoreStore")
      .where(col("__b") < beforeBatch)
      .select(col("id")).distinct()
  }

  /** The k-core store's CURRENT member set (union of committed member
    * deltas — membership is monotone); the read the streaming gate's
    * consumers (and specs) use between micro-batches.
    */
  def kCoreStoreMembers(spark: org.apache.spark.sql.SparkSession,
                        storeDir: String): DataFrame =
    kCoreStoreView(spark, storeDir, Long.MaxValue)

  /** Snapshot read of the k-core member set as of batch `asOf` —
    * membership is monotone, so (unlike the newest-wins stores) every
    * historical snapshot survives compaction exactly: the fold keeps
    * each id's max batch, which is ≤ asOf iff the id was a member by
    * then. No retention trade here.
    */
  def kCoreStoreMembersAsOf(spark: org.apache.spark.sql.SparkSession,
                            storeDir: String, asOf: Long): DataFrame = {
    require(asOf >= 0L, "asOf is a committed batch id")
    kCoreStoreView(spark, storeDir, asOf + 1)
  }

  /** WARM-START k-core: the fixed-k core of the UNION graph, peeling
    * ONLY a candidate frontier — the persisted members never re-peel
    * (the insertion-locality idea of Sarıyüce et al., "Streaming
    * algorithms for k-core decomposition", VLDB 2013, specialized to
    * fixed-k membership). Soundness rests on two facts: (1) edge insertion never shrinks
    * the k-core, so stored members stay members and are FROZEN; (2) a
    * node can flip INTO the core only through a chain of flipped
    * nodes reaching a new edge, every one with union-degree ≥ k — so
    * the candidate set is the closure of the new edges' endpoints
    * through ≥ k-degree non-members, grown to a fixpoint, and the
    * synchronous peel then runs over candidates alone with degrees
    * counted into (frozen members ∪ surviving candidates). Unlike the
    * triangle path, a re-sent historical edge is HARMLESS here — it
    * only seeds closure from nodes that then peel away.
    *
    * Survivors append as an overwrite-idempotent `batch=<id>` member
    * delta (monotone store; retries read only batches < batchId).
    * Returns the full member set, ≡ [[kCore]] over the union
    * (x_kcore_incremental shares x_kcore's unrolled-peel oracle).
    */
  def kCoreIncremental(allEdges: DataFrame, a: Column, b: Column,
                       newEdges: DataFrame, na: Column, nb: Column,
                       k: Int, storeDir: String, batchId: Long,
                       maxRounds: Int = 50,
                       broadcastLimit: Long = 4000000L,
                       smallStoreBytes: Long = 32L << 20): DataFrame =
    Stats.withWriterLease(allEdges.sparkSession, Seq(storeDir),
        "kCoreIncremental(batch)") {
    require(k >= 1, "k must be >= 1")
    require(batchId >= 1L, "batchId 0 is the writeKCoreStore base")
    val spark = allEdges.sparkSession
    Stats.requireMonotoneBatch(spark, Seq(storeDir), batchId,
      "kCoreIncremental")
    val e = Checkpoints.stage(
      allEdges.select(least(a, b).as("u"), greatest(a, b).as("v"))
        .where(col("u") =!= col("v"))
        .distinct())
    val en = newEdges.select(least(na, nb).as("u"),
      greatest(na, nb).as("v")).where(col("u") =!= col("v"))
    def gated(df: DataFrame, sz: Long): DataFrame =
      if (sz <= broadcastLimit) broadcast(df) else df
    // union-degree eligibility: only ≥ k-degree nodes can flip into
    // the core — computed from the input edge list (data-sized and
    // inherent: the union graph is an argument), staged once
    val degreeOK = Checkpoints.stage(
      e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("__d"))
        .where(col("__d") >= k)
        .select(col("id")))
    // membership regime, gated on MEASURED store bytes (from the
    // listing the pruner already paid, never a scan). SMALL store:
    // stage the whole member set once — membership then fuses into
    // each round's plan as a broadcast semi join, ZERO extra jobs per
    // round. BIG store (the 100 TB arm): consult membership BY PROBE —
    // the store scan OPENS only the files the probe ids can live in
    // (sibling footer manifest over the id-clustered layout) and the
    // member store is never scanned whole; each round's probe pays
    // one pruning job, which is the right trade exactly when the
    // bytes it skips dwarf scheduler latency. The r11 bench window
    // caught the un-gated pruned shape at 143 scheduler round trips
    // per run (2.9× on x_kcore_incremental) — per-round pruning of a
    // megabyte-sized store is pure fixed cost.
    val memberPruner = Stats.keyPruner(spark,
      Stats.committedViewDirs(spark, storeDir),
      storeManifestPath(storeDir), "id")
    val smallStore = memberPruner.totalBytes <= smallStoreBytes
    val oldCoreSmall: Option[DataFrame] =
      if (!smallStore) None
      else Some(Checkpoints.stage(
        spark.read.parquet(Stats.committedViewDirs(spark, storeDir): _*)
          .where(col("__b") < batchId)
          .select(col("id")).distinct()))
    def memberOf(probe: DataFrame): DataFrame = oldCoreSmall match {
      case Some(oc) =>
        probe.join(broadcast(oc), Seq("id"), "left_semi")
      case None =>
        memberPruner.read(probe)
          .where(col("__b") < batchId)
          .select(col("id"))
          .join(probe, Seq("id"), "left_semi")
    }
    // small regime: the whole eligible set (≥ k-degree non-members)
    // stages ONCE, so each closure round is a single semi join against
    // it — no per-round membership broadcast
    val eligibleSmall: Option[DataFrame] = oldCoreSmall.map(oc =>
      Checkpoints.stage(
        degreeOK.join(broadcast(oc), Seq("id"), "left_anti")))
    // the eligible slice of a frontier: its ≥ k-degree NON-members —
    // flips propagate only along such chains
    def eligibleOf(probe: DataFrame): DataFrame = eligibleSmall match {
      case Some(el) => probe.join(el, Seq("id"), "left_semi")
      case None =>
        val pk = probe.join(degreeOK, Seq("id"), "left_semi")
        pk.join(memberOf(pk), Seq("id"), "left_anti")
    }
    var (cand, nc) = Checkpoints.stageCount(eligibleOf(
      en.select(col("u").as("id")).union(en.select(col("v").as("id")))
        .distinct()))
    // closure: grow through eligible neighbors to a fixpoint — flips
    // propagate only along such chains
    var it = 0
    var grown = nc > 0
    while (it < maxRounds && grown) {
      val nbrs = e.join(gated(cand.select(col("id").as("u")), nc),
          Seq("u"), "left_semi")
        .select(col("v").as("id"))
        .union(e.join(gated(cand.select(col("id").as("v")), nc),
          Seq("v"), "left_semi")
          .select(col("u").as("id")))
      val (next, m) = Checkpoints.stageCount(
        cand.unionByName(eligibleOf(nbrs.distinct())).distinct())
      grown = m > nc
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(cand)
      cand = next
      nc = m
      it += 1
    }
    // peel candidates with members frozen: a candidate survives iff
    // its degree into (frozen members ∪ surviving candidates) ≥ k.
    // Only edges INCIDENT to candidates are enumerated, and only the
    // candidates' current neighbor set probes the member store —
    // per-round work is frontier-sized on both the edge and store side
    var surv = cand
    var ns = nc
    it = 0
    var converged = ns == 0
    while (it < maxRounds && !converged) {
      // one (c, w) row per candidate endpoint of each incident edge
      // (a candidate–candidate edge credits both endpoints)
      val inc = e.join(gated(surv.select(col("id").as("u")), ns),
          Seq("u"))
        .select(col("u").as("c"), col("v").as("w"))
        .unionAll(e.join(gated(surv.select(col("id").as("v")), ns),
          Seq("v"))
          .select(col("v").as("c"), col("u").as("w")))
      val nbrIds = inc.select(col("w").as("id")).distinct()
      val live = surv.unionByName(memberOf(nbrIds))
      val (next, m) = Checkpoints.stageCount(
        inc.join(live.select(col("id").as("w")), Seq("w"), "left_semi")
          .groupBy(col("c")).agg(count(lit(1)).as("__d"))
          .where(col("__d") >= k)
          .select(col("c").as("id")))
      converged = m == ns
      if (surv ne cand)
        org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(surv)
      surv = next
      ns = m
      it += 1
    }
    surv.select(col("id"), lit(batchId).as("__b"))
      .repartitionByRange(1, col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$storeDir/batch=$batchId")
    // manifest upkeep only in the big regime: a stale manifest is
    // SOUND (uncovered files always read), the small regime never
    // consults it, and the next compactKCoreStore refreshes coverage
    // in full — so the small regime pays zero index maintenance
    if (!smallStore)
      Stats.upsertManifestFor(spark, storeDir,
        storeManifestPath(storeDir), s"$storeDir/batch=$batchId")
    // the one full-view read, REBUILT after the write (a retry's
    // overwrite invalidates listings captured before it; surv is
    // staged, so its data predates the overwrite safely)
    kCoreStoreView(spark, storeDir, batchId).unionByName(surv)
  }

  /** Fold the k-core store's member deltas into one id-clustered
    * generation (set union — membership is monotone).
    */
  def compactKCoreStore(spark: org.apache.spark.sql.SparkSession,
                        storeDir: String, filesOut: Int = 4)
      : Option[Long] =
    Stats.withWriterLease(spark, Seq(storeDir),
        "compactKCoreStore(batch)") {
    val tok = Stats.compactCommittedStore(spark, storeDir,
      _.groupBy(col("id"))
        .agg(max(col("__b")).as("__b"))
        .repartitionByRange(filesOut, col("id"))
        .sortWithinPartitions(col("id")))
    if (tok.isDefined)
      Stats.upsertManifest(spark, storeDir, storeManifestPath(storeDir))
    tok
  }
}
