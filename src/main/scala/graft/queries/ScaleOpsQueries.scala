package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Graph, Outliers, RuntimeFilter, Stats, TimeSeries}
import ParityQueries.t
import RetrievalQueries.{cdcWinsSql, passageCorpus, passageCorpusSql}

/** Round-9 scale operators as driver queries: explicit runtime-filter
  * (Bloom) joins, semi-supervised label propagation, and robust
  * median/MAD outlier detection — each oracle-checked exactly (the
  * Bloom operators return bit-identical rows to their naive twins; the
  * graph and outlier fixpoints are integer/discrete arithmetic a CTE
  * chain mirrors).
  */
object ScaleOpsQueries {

  /** Seed slice for label propagation: every 3rd document's language
    * column is trusted; the shared-passage graph spreads it.
    */
  private def langSeeds(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("lang"))

  /** Per-user CO-OCCURRENCE WINDOW graph — the standard session
    * construction: an edge between two events within w = 24 positions
    * of each other in a user's timeline (skip-1 is x_cc_chain's
    * successor edge). Every (i, i+j, i+k) with j < k ≤ 24 closes a
    * triangle (all three gaps ≤ 24): C(24,2) = 276 triangles per
    * position — enough per-node wedge volume that the from-scratch
    * twin pays real compute at bench scale. Degree ≤ 48, long
    * diameter, and every edge lives wholly inside one user's
    * timeline, so a user-sliced batch touches ONLY its own chains. This is the fixture the warm-start graph
    * queries measure on: the passage-clique corpus makes every batch
    * span every planted clique, so measured runs there pay near-batch
    * volume and the frontier locality the operators deliver never
    * shows in the bench. `f` slices rows (by user) AFTER the per-user
    * window, so history and batch partitions of the edge set are
    * exact complements — and, because chains never cross users, the
    * batch slice IS the union graph's incident-edge set for its own
    * endpoints (what the warm-start operators' edge contract needs).
    */
  private def chainEdges(s: SparkSession, d: String,
                         f: org.apache.spark.sql.Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pos = t(s, d, "events")
      .select(Seq(col("user_id"), col("event_id")) ++
        (1 to 24).map(k =>
          lead(col("event_id"), k).over(w).as(s"n$k")): _*)
      .where(f)
    // ONE pass over the windowed rows (a per-skip unionAll would
    // re-execute the window once per branch — Catalyst does not dedupe
    // the common subtree)
    pos.select(col("event_id").as("ida"),
        explode(array((1 to 24).map(k => col(s"n$k")): _*)).as("idb"))
      .where(col("idb").isNotNull)
  }

  /** Seed slice for chain-graph label propagation: every 5th event's
    * type is trusted; chains spread it along the timeline.
    */
  private def chainSeeds(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").where(col("event_id") % 5 === 0)
      .select(col("event_id"), col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Runtime-filter inner join: lineitem ⋈ (6%-selective part slice)
    // with the fact side Bloom-pre-filtered on the dim's surviving
    // keys BEFORE its exchange — the fact shuffle carries ~6% + fpp of
    // the rows, not the table. Result ≡ the naive join exactly (the
    // exact join removes Bloom false positives), aggregated per part.
    "x_bloom_join" -> ((s, d) => {
      val dim = t(s, d, "part").where(col("p_size") > 47)
      RuntimeFilter.bloomJoin(t(s, d, "lineitem"), dim,
          col("l_partkey"), col("p_partkey"),
          expectedItems = 200000L, fpp = 0.01)
        .groupBy(col("p_partkey"), col("p_brand"))
        .agg(count(lit(1)).as("n_li"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy(col("p_partkey"))
    }),

    // Runtime-filter left-semi: keep only fact rows whose key is in
    // the dim slice — the 100 TB allowlist shape (the allowlist's
    // Bloom broadcasts where the allowlist itself could not).
    "x_bloom_semi" -> ((s, d) => {
      val dim = t(s, d, "part").where(col("p_size") > 47)
      RuntimeFilter.bloomSemiJoin(t(s, d, "lineitem"), dim,
          col("l_partkey"), col("p_partkey"),
          expectedItems = 200000L, fpp = 0.01)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity").cast("long").as("qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Runtime-filter anti join — blocklist decontamination: orders
    // from customers NOT in the BUILDING segment. The Bloom's
    // no-false-negative side emits ~80% of orders WITHOUT shuffling
    // them (definitely-absent keys skip the join entirely); only the
    // maybe-contained sliver pays the exact anti join.
    "x_bloom_anti" -> ((s, d) => {
      val block = t(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING")
      RuntimeFilter.bloomAntiJoin(t(s, d, "orders"), block,
          col("o_custkey"), col("c_custkey"),
          expectedItems = 100000L, fpp = 0.01)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // Semi-supervised label propagation over the shared-passage graph:
    // every 3rd doc seeds its language; 3 synchronous rounds spread it
    // across the planted-passage cliques (mirror docs inherit their
    // neighbors' majority label, ties to the max label). Deterministic
    // fixpoint — the oracle unrolls the same 3 rounds as CTEs.
    "x_label_prop" -> ((s, d) => {
      val pairs = Curation.substringDupPairs(
        passageCorpus(t(s, d, "documents")), col("doc_id"), col("text"))
      Graph.labelPropagation(
          pairs, col("ida"), col("idb"),
          langSeeds(s, d), col("doc_id"), col("lang"), iters = 3)
        .select(col("id").as("doc_id"), col("label"))
        .orderBy(col("doc_id"))
    }),

    // INCREMENTAL connected components - the truly sublinear warm
    // start: the batch's edges contract through the stored labels, CC
    // runs on the batch-sized contracted graph, and only LOSING
    // components' rows rewrite. Must equal the from-scratch labeling
    // over the union graph (recursive-CTE oracle).
    "x_cc_incremental" -> ((s, d) => {
      val pairs = Curation.substringDupPairs(
        passageCorpus(t(s, d, "documents")), col("doc_id"), col("text"))
      val isNew = col("ida") % 10 === 3 || col("idb") % 10 === 3
      val store = ArtifactMemo.dirFor("ccstore", d) { p =>
        Graph.writeCCStore(pairs.where(!isNew),
          col("ida"), col("idb"), p)
      }
      Graph.connectedComponentsIncremental(pairs.where(isNew),
          col("ida"), col("idb"), store, batchId = 1L)
        .select(col("id").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    }),

    // SNAPSHOT DIFF — the reproducibility audit every store's time
    // travel exists for: the dedup clusters AS OF batch 0 (history
    // only) vs AS OF batch 1 (after the ≡ 3 (mod 10) edges landed),
    // keyed-diffed to exactly the docs whose cluster CHANGED or that
    // first APPEARED — "what moved between the corpus snapshot run A
    // trained on and run B's". The store builds once per data dir
    // (base + one incremental batch inside the memo, so the query is
    // order-independent of x_cc_incremental); both snapshot reads and
    // the diff are the measured path. Oracle: two recursive-CTE CC
    // runs (history / union) full-outer joined.
    "x_snapshot_diff" -> ((s, d) => {
      val store = ArtifactMemo.dirFor("diffstore", d) { p =>
        val pairs = Curation.substringDupPairs(
          passageCorpus(t(s, d, "documents")), col("doc_id"),
          col("text"))
        val isNew = col("ida") % 10 === 3 || col("idb") % 10 === 3
        Graph.writeCCStore(pairs.where(!isNew), col("ida"), col("idb"),
          p)
        Graph.connectedComponentsIncremental(pairs.where(isNew),
          col("ida"), col("idb"), p, batchId = 1L): Unit
      }
      graft.operators.Stats.keyedDiff(
          Graph.ccStoreLabelsAsOf(s, store, 0L),
          Graph.ccStoreLabelsAsOf(s, store, 1L), Seq("id"))
        .select(col("id").as("doc_id"), col("old_comp"),
          col("new_comp"), col("status"))
        .orderBy(col("doc_id"))
    }),

    // WARM-START label propagation on the SPARSE chain fixture: the
    // history users' per-round label states persist once
    // (writeLabelState); the batch adds the user ≡ 3 (mod 100) chains
    // and only the frontier within r hops of them recomputes per
    // round — every clean node's round label reads from the store.
    // The chain topology is what lets the bench SHOW the frontier
    // locality (clique corpora make every batch span every clique).
    // Must equal the from-scratch 3-round run over the union graph:
    // x_label_prop_chain's unrolled-CTE oracle is shared verbatim.
    "x_label_prop_incremental" -> ((s, d) => {
      // SF-invariant ~1% batch slice by USER — chains are per-user,
      // so batch edges are disjoint from history by construction
      val isNew = col("user_id") % 100 === 3
      val store = ArtifactMemo.dirFor("lpstate_chain", d) { p =>
        Graph.writeLabelState(chainEdges(s, d, !isNew),
          col("ida"), col("idb"),
          chainSeeds(s, d), col("event_id"), col("event_type"),
          iters = 3, p)
      }
      // chains never cross users, so the batch slice already covers
      // every union edge within iters hops of a new edge — the
      // operator's edge contract — and the warm start never derives
      // or scans the history graph at all
      val batch = chainEdges(s, d, isNew)
      Graph.labelPropagationIncremental(
          batch, col("ida"), col("idb"),
          batch, col("ida"), col("idb"),
          chainSeeds(s, d), col("event_id"), col("event_type"),
          iters = 3, store, batchId = 1L)
        .select(col("id").as("event_id"), col("label"))
        .orderBy(col("event_id"))
    }),

    // LOCAL personalized PageRank by synchronous forward push
    // (Andersen-Chung-Lang) on the chain fixture: seed mass from
    // every 1000th event diffuses 3 rounds; work is frontier-sized —
    // the state table holds only touched nodes, and the eps threshold
    // freezes sub-threshold residuals (power-iteration PPR touches
    // |V| every round; this is the single-seed-query scale path).
    // Scaled-integer throughout → the oracle unrolls the push rounds
    // exactly.
    "x_ppr_push" -> ((s, d) =>
      Graph.pprForwardPush(chainEdges(s, d, lit(true)),
          col("ida"), col("idb"),
          t(s, d, "events").where(col("event_id") % 1000 === 0),
          col("event_id"), rounds = 3)
        .select(col("id").as("event_id"), col("p"), col("r"))
        .orderBy(col("event_id"))),

    // BATCH TWIN of x_label_prop_incremental on the SAME chain graph:
    // the from-scratch 3-round run the warm start must beat — the
    // bench pair that demonstrates frontier locality end to end.
    "x_label_prop_chain" -> ((s, d) =>
      Graph.labelPropagation(
          chainEdges(s, d, lit(true)), col("ida"), col("idb"),
          chainSeeds(s, d), col("event_id"), col("event_type"),
          iters = 3)
        .select(col("id").as("event_id"), col("label"))
        .orderBy(col("event_id"))),

    // Robust per-source length outliers: documents whose character
    // count deviates from their source's discrete median by more than
    // 2× the median absolute deviation — truncated crawls and
    // concatenation blowups, flagged without a distribution
    // assumption. All integer arithmetic; no window anywhere (ranks
    // ride the distributed prefix sum).
    "x_outlier_mad" -> ((s, d) =>
      Outliers.madOutliers(t(s, d, "documents"),
          group = col("source"), value = col("n_chars"),
          key = Seq(col("doc_id")), k = 2L)
        .select(col("source"), col("doc_id"), col("n_chars"),
          col("med"), col("mad"), col("dev"))
        .orderBy(col("source"), col("doc_id"))),

    // Winsorization twin: every doc keeps a length CLIPPED to its
    // source's [med - 2*mad, med + 2*mad] fence - the gentler curation
    // arm for metrics feeding downstream arithmetic.
    "x_outlier_clip" -> ((s, d) =>
      Outliers.madClip(t(s, d, "documents"),
          group = col("source"), value = col("n_chars"),
          key = Seq(col("doc_id")), k = 2L)
        .select(col("source"), col("doc_id"), col("n_chars"),
          col("med"), col("mad"), col("clipped"))
        .orderBy(col("source"), col("doc_id"))),

    // Per-node triangle counts over the shared-passage graph
    // (degree-oriented wedge counting): planted-passage cliques close
    // C(m-1, 2) triangles per member - the local-clustering signal
    // that separates dense duplicate cliques (collapse safely) from
    // lone bridge edges (distrust under a transitive policy). The
    // oracle recounts every triangle with a canonical 3-way edge join.
    "x_triangles" -> ((s, d) => {
      val pairs = Curation.substringDupPairs(
        passageCorpus(t(s, d, "documents")), col("doc_id"), col("text"))
      Graph.triangleCounts(pairs, col("ida"), col("idb"))
        .select(col("id").as("doc_id"), col("n_tri"))
        .orderBy(col("doc_id"))
    }),

    // Triangle-store RETRACTION: deletion DECREASES counts, which the
    // create-only incremental form cannot absorb — the store recounts
    // over the surviving edges (docs % 10 = 7 retracted, SF-invariant;
    // clique members lose corners) as a superseding generation. The
    // oracle recounts every triangle over exactly the surviving
    // universe.
    "x_tri_delete" -> ((s, d) => {
      val pairs = Curation.substringDupPairs(
        passageCorpus(t(s, d, "documents")), col("doc_id"), col("text"))
      val keep = col("ida") % 10 =!= 7 && col("idb") % 10 =!= 7
      val store = ArtifactMemo.dirFor("tridelstore", d) { p =>
        Graph.writeTriangleStore(pairs, col("ida"), col("idb"), p)
        Graph.rebuildTriangleStore(pairs.where(keep), col("ida"),
          col("idb"), p): Unit
      }
      Graph.triangleStoreCounts(s, store)
        .select(col("id").as("doc_id"), col("n_tri"))
        .orderBy(col("doc_id"))
    }),

    // WARM-START triangle counting on the SPARSE chain fixture: the
    // history users' per-node totals persist once; the batch adds the
    // user ≡ 3 (mod 10) chains and only the triangles a new edge
    // CREATES are enumerated — counted exactly once at the
    // canonically-smallest new edge, so multi-new-edge triangles
    // (every skip-closure triangle here: all three edges arrive
    // together) never double-count, and old wedge volume is never
    // re-expanded. The chain topology is what lets the bench SHOW the
    // frontier locality — an SF-INVARIANT ~10% user slice touches
    // ~10% of the graph, where the passage-clique corpus made every
    // batch span every planted clique. Must equal the from-scratch
    // count over the union graph: x_triangles_chain's oracle shared
    // verbatim.
    "x_triangles_incremental" -> ((s, d) => {
      val isNew = col("user_id") % 100 === 3
      val store = ArtifactMemo.dirFor("tristore_chain", d) { p =>
        Graph.writeTriangleStore(chainEdges(s, d, !isNew),
          col("ida"), col("idb"), p)
      }
      // chains never cross users, so the batch slice IS the union
      // graph's incident-edge set for its own endpoints — the
      // operator's edge contract — and the warm start never derives
      // or scans the history graph at all
      val batch = chainEdges(s, d, isNew)
      Graph.triangleCountsIncremental(
          batch, col("ida"), col("idb"),
          batch, col("ida"), col("idb"), store,
          batchId = 1L)
        .select(col("id").as("event_id"), col("n_tri"))
        .orderBy(col("event_id"))
    }),

    // BATCH TWIN of x_triangles_incremental on the SAME chain graph:
    // the from-scratch count the warm start must beat in the bench.
    "x_triangles_chain" -> ((s, d) =>
      Graph.triangleCounts(chainEdges(s, d, lit(true)),
          col("ida"), col("idb"))
        .select(col("id").as("event_id"), col("n_tri"))
        .orderBy(col("event_id"))),

    // Precision/recall audit of the MinHash+LSH pipeline vs exact
    // all-pairs ground truth at five thresholds: tp/fp/fn counts per
    // theta, the recall-floor measurement a dedup pipeline ships next
    // to its decisions. The oracle rebuilds BOTH arms in SQL (the
    // PolyFp MinHash candidate CTE and the exact string-shingle
    // Jaccard) and recounts.
    "x_neardup_pr" -> ((s, d) =>
      Dedup.neardupPrCurve(t(s, d, "documents"), col("doc_id"),
          col("text"), thetas = Seq(0.5, 0.6, 0.7, 0.8, 0.9))),

    // 3-core of the low-quantity customer-supplier trade graph
    // (synchronous peeling to the unique fixpoint): the dense
    // community that survives after chains and pendants peel away -
    // on a dup graph, the template-farm detector. Oracle unrolls 8
    // peel rounds (the fixture converges in 2; extra rounds are
    // identity by the fixpoint property).
    "x_kcore" -> ((s, d) => {
      val e = t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .where(col("l_quantity") <= 2)
        .select((col("o_custkey") * 2).as("u"),
          (col("l_suppkey") * 2 + 1).as("v"))
      Graph.kCore(e, col("u"), col("v"), k = 3)
        .select(col("id").as("node_id"))
        .orderBy(col("node_id"))
    }),

    // WARM-START k-core: the history slice's members persist once
    // (membership is monotone under edge insertion, so the store is
    // append-only); the batch's edges seed a candidate closure through
    // >= k-degree non-members and ONLY that frontier peels, degrees
    // counted into frozen members + surviving candidates. Batch edge
    // slices may overlap history here (the order-key split re-derives
    // some pairs) - harmless for k-core, unlike the triangle path.
    // Must equal the from-scratch peel: x_kcore's oracle shared.
    "x_kcore_incremental" -> ((s, d) => {
      def pairs(f: org.apache.spark.sql.Column): DataFrame =
        t(s, d, "lineitem")
          .join(t(s, d, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .where(col("l_quantity") <= 2 && f)
          .select((col("o_custkey") * 2).as("u"),
            (col("l_suppkey") * 2 + 1).as("v"))
      // SF-invariant ~12% batch slice (an order-key cutoff would make
      // the "batch" 95% of the graph at sf0.1)
      val store = ArtifactMemo.dirFor("kcstore", d) { p =>
        Graph.writeKCoreStore(pairs(col("o_orderkey") % 8 =!= 0),
          col("u"), col("v"), k = 3, p)
      }
      Graph.kCoreIncremental(pairs(lit(true)), col("u"), col("v"),
          pairs(col("o_orderkey") % 8 === 0), col("u"), col("v"),
          k = 3, store, batchId = 1L)
        .select(col("id").as("node_id"))
        .orderBy(col("node_id"))
    }),

    // K-CORE-store RETRACTION — the monotone-union twist on rebuild-
    // on-retract: membership only GROWS under insertion (the store is
    // a union of member deltas), but deletion SHRINKS the core — a
    // direction the union view cannot express at all — and the
    // shrink CASCADES (peeling a deleted node's neighbors can drop
    // survivors below degree k, recursively). The store rebuilds as
    // the 3-core of the surviving edges (customers % 11 = 4 and
    // suppliers % 7 = 2 retracted) written as a superseding
    // generation. Potency (per the x_neardup_delete discipline):
    // SURVIVING members cascade out at every SF — 16 / 65 / 749 at
    // sf0.001 / 0.01 / 0.1 — exactly the rows a lazy anti-join
    // "rebuild" would keep. Oracle = the same unrolled 8-round peel
    // over exactly the surviving edges.
    "x_kcore_delete" -> ((s, d) => {
      def pairs(f: org.apache.spark.sql.Column): DataFrame =
        t(s, d, "lineitem")
          .join(t(s, d, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .where(col("l_quantity") <= 2 && f)
          .select((col("o_custkey") * 2).as("u"),
            (col("l_suppkey") * 2 + 1).as("v"))
      val keep = col("o_custkey") % 11 =!= 4 && col("l_suppkey") % 7 =!= 2
      val store = ArtifactMemo.dirFor("kcdelstore", d) { p =>
        Graph.writeKCoreStore(pairs(lit(true)), col("u"), col("v"),
          k = 3, p)
        Graph.rebuildKCoreStore(pairs(keep), col("u"), col("v"),
          k = 3, p): Unit
      }
      Graph.kCoreStoreMembers(s, store)
        .select(col("id").as("node_id"))
        .orderBy(col("node_id"))
    }),

    // EXACT per-group discrete quantiles of price cents, window-free:
    // one prefix-sum ranking + O(#groups) broadcast stats; the
    // PERCENTILE_DISC rank ceil(q*n) emits only stored values, so the
    // result hash-matches bit for bit where interpolated percentiles
    // cannot. Tiebreak = the 4-column unique lineitem key.
    "x_quantile_disc" -> ((s, d) =>
      Outliers.discreteQuantiles(t(s, d, "lineitem"),
          group = col("l_returnflag"),
          value = round(col("l_extendedprice") * 100),
          key = Seq(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
          qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .select(col("group").as("l_returnflag"), col("q"),
          col("value").as("cents"))
        .orderBy(col("l_returnflag"), col("q"))),

    // Personalized PageRank over the trade graph: teleport mass
    // returns to the seed nations (< 5) instead of the uniform
    // distribution, so ranks measure proximity to the trusted set -
    // the allowlist-weighting prior. Scaled-integer arithmetic; the
    // oracle unrolls the same 5 iterations.
    "x_ppr" -> ((s, d) => {
      val edges = t(s, d, "lineitem").where(col("l_quantity") <= 2)
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .where(col("src") =!= col("dst"))
      val seeds = t(s, d, "customer").where(col("c_nationkey") < 5)
        .select(col("c_nationkey"))
      Graph.pageRankPersonalized(edges, col("src"), col("dst"),
          seeds, col("c_nationkey"), iters = 5)
        .select(col("id").as("nationkey"), col("rank"))
        .orderBy(col("nationkey"))
    }),

    // Corpus drift report between the history slice and the full
    // corpus: per-column exact (rows, nulls, distinct) profiles
    // full-outer joined - the ingest regression alarm, all integers.
    "x_profile_drift" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Stats.profileDrift(docs.where(col("doc_id") < 400), docs,
          Seq("lang", "source", "n_chars"))
        .orderBy(col("column"))
    }),

    // Deterministic categorical encoding: dense codes by SORTED vocab
    // order (pure function of the value set - re-ingestion and
    // distribution drift never reshuffle codes, unlike
    // frequency-ordered indexers). Vocab rank via prefix sum, joined
    // back broadcast-gated.
    "x_categorical" -> ((s, d) => {
      val withSrc = graft.operators.Training.encodeCategorical(
        t(s, d, "documents"), col("source"), "source_code")
      graft.operators.Training.encodeCategorical(
          withSrc, col("lang"), "lang_code")
        .select(col("doc_id"), col("source"), col("source_code"),
          col("lang"), col("lang_code"))
        .orderBy(col("doc_id"))
    }),

    // STABLE incremental encoding: the history slice (doc_id < 10,
    // sources src0-src9) seeds the persisted vocabulary; the batch
    // introduces 10 genuinely new sources, which get dense codes
    // AFTER the existing maximum while every old code is untouched -
    // the contract that keeps embedding-table indices valid across
    // ingests. Re-running the batch is a no-op (idempotent refresh).
    "x_categorical_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val dir = ArtifactMemo.dirFor("catvocab", d) { p =>
        graft.operators.Training.encodeCategoricalIncremental(
          docs.where(col("doc_id") < 10), col("source"),
          "source_code", s"$p/vocab").count(): Unit
      }
      graft.operators.Training.encodeCategoricalIncremental(
          docs.where(col("doc_id") >= 10), col("source"),
          "source_code", s"$dir/vocab")
        .select(col("doc_id"), col("source"), col("source_code"))
        .orderBy(col("doc_id"))
    }),

    // VOCABULARY RETRACTION — the append-only-index twist on right-
    // to-be-forgotten: the value STRING is the personal data, the
    // dense code is an embedding-table index downstream models depend
    // on. retractCategorical NULLs the strings of src3 and src9 in
    // the seeded vocab: the mappings vanish, the codes stay RESERVED
    // (src9 held the max code 10 — a rebuild that recomputed the max
    // over visible rows would mis-start the fresh range at 10 and
    // shift every new code), and the batch re-encounters both values
    // as FRESH entries with fresh codes after the new sources (they
    // sort after src19: codes 21 and 22) — the old embedding rows
    // stay orphaned, exactly what forgetting the association means.
    "x_categorical_delete" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val dir = ArtifactMemo.dirFor("catdelvocab", d) { p =>
        graft.operators.Training.encodeCategoricalIncremental(
          docs.where(col("doc_id") < 10), col("source"),
          "source_code", s"$p/vocab").count(): Unit
        graft.operators.Training.retractCategorical(s,
          Seq("src3", "src9").toDF("v"), s"$p/vocab")
      }
      graft.operators.Training.encodeCategoricalIncremental(
          docs.where(col("doc_id") >= 10), col("source"),
          "source_code", s"$dir/vocab")
        .select(col("doc_id"), col("source"), col("source_code"))
        .orderBy(col("doc_id"))
    }),

    // Sequential conversion funnel over the event stream: earliest
    // view, then the earliest click strictly after it, then the
    // earliest purchase after that - one filtered min-aggregate per
    // stage joined broadcast-gated to the previous stage's reach, no
    // window over the stream. Long-format per-user output.
    "x_funnel" -> ((s, d) =>
      TimeSeries.funnel(t(s, d, "events"), col("user_id"), col("ts"),
          col("event_type"), Seq("view", "click", "purchase"))
        .select(col("user").as("user_id"), col("stage"),
          col("stage_name"), col("ts"))
        .orderBy(col("user_id"), col("stage"))),

    // Weekly cohort retention: users bucketed by the ISO week of
    // their first event, counted in each later active week - integer
    // week arithmetic on Monday-truncated dates, bit-deterministic.
    "x_cohort" -> ((s, d) =>
      TimeSeries.cohortRetention(t(s, d, "events"), col("user_id"),
          col("ts"))
        .orderBy(col("cohort"), col("week_offset"))),

    // packBins with loader-facing positions: global token interval,
    // shard, and within-shard offset from ONE prefix sum - the
    // sequence-packing metadata attention-boundary resets need.
    "x_pack_offsets" -> ((s, d) =>
      graft.operators.Training.packBinsWithOffsets(
          t(s, d, "documents").select(col("doc_id"),
            size(graft.operators.TextAnalysis.tokens(col("text")))
              .cast("long").as("n_tokens")),
          Seq(col("doc_id")), col("n_tokens"), budget = 2048L)
        .select(col("doc_id"), col("n_tokens"), col("start"),
          col("end"), col("bin"), col("offset"))
        .orderBy(col("doc_id"))),

    // The funnel's bounded-hop arm: each stage must follow within 48
    // hours of the previous - exercises the horizon predicate the
    // unbounded query never builds.
    "x_funnel_horizon" -> ((s, d) =>
      TimeSeries.funnel(t(s, d, "events"), col("user_id"), col("ts"),
          col("event_type"), Seq("view", "click", "purchase"),
          horizonMicros = 48L * 3600L * 1000000L)
        .select(col("user").as("user_id"), col("stage"),
          col("stage_name"), col("ts"))
        .orderBy(col("user_id"), col("stage"))),

    // Markov transition counts over each user's time-ordered event
    // chain: the "what happens next" matrix. The ordering window
    // partitions by user (corpus-cardinality keys), ties break on the
    // unique event id.
    "x_transitions" -> ((s, d) =>
      TimeSeries.transitionCounts(t(s, d, "events"), col("user_id"),
          col("ts"), col("event_type"), col("event_id"))
        .orderBy(col("from_type"), col("to_type"))),

    // Connected components over STRING ids: the source-level
    // substring-sharing graph clusters mirror-site families, with
    // sorted-vocab dense codes making the canonical member the
    // lexicographically smallest source - collision-free where
    // hashing string ids could not be.
    "x_cc_generic" -> ((s, d) => {
      val pairs = Curation.substringDupPairs(
        passageCorpus(t(s, d, "documents")), col("source"), col("text"))
      Graph.connectedComponentsGeneric(pairs, col("ida"), col("idb"))
        .select(col("id").as("source"), col("comp"))
        .orderBy(col("source"))
    }))

  /** Recursive-CTE connected components over the doc-level shared-
    * passage pair graph — the full-graph mirror the incremental CC
    * must equal (min reachable id per node, the resolveSql idiom).
    */
  private val ccIncSql: String =
    s"""WITH RECURSIVE corpus AS (
       |$passageCorpusSql),
       |w AS (
       |${cdcWinsSql("corpus", "doc_id")}),
       |dw AS (SELECT DISTINCT doc_id, win FROM w),
       |p AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
       |      FROM dw a JOIN dw b
       |        ON a.win = b.win AND a.doc_id < b.doc_id),
       |sym AS (SELECT ida AS a, idb AS b FROM p
       |        UNION SELECT idb, ida FROM p),
       |reach(id, r) AS (
       |  SELECT DISTINCT a AS id, a AS r FROM sym
       |  UNION
       |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a
       |)
       |SELECT id AS doc_id, min(r) AS comp FROM reach
       |GROUP BY id ORDER BY doc_id""".stripMargin

  /** Snapshot-diff mirror: CC over the HISTORY slice and over the
    * union, full-outer joined to the changed/added rows — the SQL
    * twin of the ccStoreLabelsAsOf(0) vs asOf(1) keyedDiff.
    */
  private val ccDiffSql: String =
    s"""WITH RECURSIVE corpus AS (
       |$passageCorpusSql),
       |w AS (
       |${cdcWinsSql("corpus", "doc_id")}),
       |dw AS (SELECT DISTINCT doc_id, win FROM w),
       |p AS MATERIALIZED (
       |      SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
       |      FROM dw a JOIN dw b
       |        ON a.win = b.win AND a.doc_id < b.doc_id),
       |ph AS MATERIALIZED (
       |      SELECT ida, idb FROM p
       |      WHERE NOT (ida % 10 = 3 OR idb % 10 = 3)),
       |symh AS (SELECT ida AS a, idb AS b FROM ph
       |         UNION SELECT idb, ida FROM ph),
       |reachh(id, r) AS (
       |  SELECT DISTINCT a AS id, a AS r FROM symh
       |  UNION
       |  SELECT reachh.id, symh.b FROM reachh JOIN symh
       |    ON reachh.r = symh.a
       |),
       |oldc AS MATERIALIZED (
       |  SELECT id, min(r) AS comp FROM reachh GROUP BY id),
       |sym AS (SELECT ida AS a, idb AS b FROM p
       |        UNION SELECT idb, ida FROM p),
       |reach(id, r) AS (
       |  SELECT DISTINCT a AS id, a AS r FROM sym
       |  UNION
       |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a
       |),
       |newc AS MATERIALIZED (
       |  SELECT id, min(r) AS comp FROM reach GROUP BY id)
       |SELECT n.id AS doc_id, o.comp AS old_comp, n.comp AS new_comp,
       |  CASE WHEN o.comp IS NULL THEN 'added' ELSE 'changed' END
       |    AS status
       |FROM newc n LEFT JOIN oldc o ON n.id = o.id
       |WHERE o.comp IS NULL OR o.comp <> n.comp
       |ORDER BY doc_id""".stripMargin

  /** The unrolled label-propagation round CTEs (the pageRankSqlOver
    * idiom): per round, per-(node, label) neighbor counts, argmax by
    * (count, label), seeds pinned, no-labeled-neighbor keeps previous.
    * References CTEs `e` (symmetric edges src/dst), `seeds` (id,
    * label), `nodes` (id), and `l0` (the seed state) — shared by the
    * passage-graph and chain-graph oracles so the round arithmetic
    * cannot diverge.
    */
  private def lpRoundsSql(iters: Int): String =
    (1 to iters).map { k =>
      val prev = s"l${k - 1}"
      s"""c$k AS MATERIALIZED (
         |  SELECT e.dst AS id, p.label AS l, count(*) AS c
         |  FROM e JOIN $prev p ON e.src = p.id
         |  WHERE p.label IS NOT NULL GROUP BY e.dst, p.label),
         |b$k AS MATERIALIZED (
         |  SELECT c.id, max(c.l) AS bl
         |  FROM c$k c JOIN (SELECT id, max(c) AS mc FROM c$k GROUP BY id) m
         |    ON c.id = m.id AND c.c = m.mc
         |  GROUP BY c.id),
         |l$k AS MATERIALIZED (
         |  SELECT n.id,
         |    CASE WHEN s.label IS NOT NULL THEN s.label
         |         ELSE coalesce(b.bl, p.label) END AS label
         |  FROM nodes n
         |  LEFT JOIN seeds s ON n.id = s.id
         |  LEFT JOIN $prev p ON n.id = p.id
         |  LEFT JOIN b$k b ON n.id = b.id)""".stripMargin
    }.mkString(",\n")

  /** Unrolled 3-round label-propagation mirror over the shared-passage
    * graph.
    */
  private val labelPropSql: String =
    s"""WITH corpus AS (
       |$passageCorpusSql),
       |w AS (
       |${cdcWinsSql("corpus", "doc_id")}),
       |dw AS (SELECT DISTINCT doc_id, win FROM w),
       |p AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
       |      FROM dw a JOIN dw b
       |        ON a.win = b.win AND a.doc_id < b.doc_id),
       |e AS (SELECT ida AS src, idb AS dst FROM p
       |      UNION SELECT idb, ida FROM p),
       |seeds AS (SELECT doc_id AS id, max(lang) AS label FROM documents
       |          WHERE doc_id % 3 = 0 GROUP BY doc_id),
       |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e
       |          UNION SELECT id FROM seeds),
       |l0 AS (SELECT n.id, s.label FROM nodes n
       |       LEFT JOIN seeds s ON n.id = s.id),
       |${lpRoundsSql(3)}
       |SELECT id AS doc_id, label FROM l3 ORDER BY doc_id""".stripMargin

  /** The sparse chain fixture's canonical edge CTE (`p` with ida <
    * idb): per-user chain successors plus every-3rd-position skip
    * edges — the SQL mirror of `chainEdges`.
    */
  private val chainEdgesSql: String =
    s"""pos AS (
      |  SELECT user_id, event_id,
      |${(1 to 24).map(k =>
        s"    lead(event_id, $k) OVER (PARTITION BY user_id\n" +
        s"      ORDER BY ts, event_id) AS n$k").mkString(",\n")}
      |  FROM events),
      |ed AS MATERIALIZED (
      |${(1 to 24).map(k =>
        s"  SELECT event_id AS a, n$k AS b FROM pos WHERE n$k IS NOT NULL")
        .mkString("\n  UNION ALL\n")}),
      |p AS MATERIALIZED (
      |  SELECT DISTINCT least(a, b) AS ida, greatest(a, b) AS idb
      |  FROM ed WHERE a <> b)""".stripMargin

  /** Canonical 3-way-join triangle recount over the chain fixture —
    * shared by x_triangles_chain and its warm-start twin.
    */
  private val trianglesChainSql: String =
    s"""WITH $chainEdgesSql,
       |tr AS (SELECT e1.ida AS a, e1.idb AS b, e2.idb AS c
       |       FROM p e1 JOIN p e2 ON e1.ida = e2.ida AND e1.idb < e2.idb
       |       JOIN p e3 ON e3.ida = e1.idb AND e3.idb = e2.idb),
       |corners AS (SELECT a AS id FROM tr
       |            UNION ALL SELECT b FROM tr
       |            UNION ALL SELECT c FROM tr),
       |cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri
       |        FROM corners GROUP BY id),
       |nodes AS (SELECT ida AS id FROM p UNION SELECT idb FROM p)
       |SELECT n.id AS event_id,
       |  coalesce(cnt.n_tri, CAST(0 AS BIGINT)) AS n_tri
       |FROM nodes n LEFT JOIN cnt ON n.id = cnt.id
       |ORDER BY event_id""".stripMargin

  /** Unrolled 3-round forward-push PPR mirror over the chain fixture:
    * per round — degree-joined state, threshold test
    * (r·10⁴ ≥ 10⁶·deg), the push arithmetic (ar = (15·r)//100 settles;
    * half the remainder stays lazily; the rest splits by degree), and
    * the share fan-out folded back through a full outer join. Every
    * operation is BIGINT floor division on non-negatives — identical
    * to the operator's scaled-integer path.
    */
  private val pprPushSql: String = {
    val roundCtes = (1 to 3).map { k =>
      val prev = s"s${k - 1}"
      s"""up$k AS MATERIALIZED (
         |  SELECT id,
         |    CASE WHEN push THEN p + (15 * r) // 100 ELSE p END AS p,
         |    CASE WHEN NOT push THEN r
         |         WHEN deg = 0 THEN r - (15 * r) // 100
         |         ELSE (r - (15 * r) // 100) // 2 END AS r,
         |    CASE WHEN push AND deg > 0
         |         THEN (r - (15 * r) // 100
         |               - (r - (15 * r) // 100) // 2) // deg
         |         ELSE CAST(0 AS BIGINT) END AS give
         |  FROM (SELECT s.id, s.p, s.r,
         |          coalesce(d.deg, CAST(0 AS BIGINT)) AS deg,
         |          s.r > 0 AND s.r * 10000 >=
         |            1000000 * coalesce(d.deg, CAST(0 AS BIGINT))
         |            AS push
         |        FROM $prev s LEFT JOIN deg d ON s.id = d.id)),
         |sh$k AS MATERIALIZED (
         |  SELECT e.dst AS id, CAST(sum(u.give) AS BIGINT) AS inc
         |  FROM up$k u JOIN e ON u.id = e.src
         |  WHERE u.give > 0 GROUP BY e.dst),
         |s$k AS MATERIALIZED (
         |  SELECT coalesce(u.id, h.id) AS id,
         |    CAST(coalesce(u.p, 0) AS BIGINT) AS p,
         |    CAST(coalesce(u.r, 0) + coalesce(h.inc, 0) AS BIGINT) AS r
         |  FROM up$k u FULL OUTER JOIN sh$k h ON u.id = h.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $chainEdgesSql,
       |e AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM p
       |      UNION SELECT idb, ida FROM p),
       |deg AS MATERIALIZED (SELECT src AS id,
       |        CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
       |s0 AS (SELECT event_id AS id, CAST(0 AS BIGINT) AS p,
       |         CAST(1000000 AS BIGINT) AS r
       |       FROM events WHERE event_id % 1000 = 0
       |       GROUP BY event_id),
       |$roundCtes
       |SELECT id AS event_id, p, r FROM s3 ORDER BY event_id"""
      .stripMargin
  }

  /** Unrolled 3-round label-propagation mirror over the chain fixture
    * — shared by x_label_prop_chain and its warm-start twin.
    */
  private val labelPropChainSql: String =
    s"""WITH $chainEdgesSql,
       |e AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM p
       |      UNION SELECT idb, ida FROM p),
       |seeds AS MATERIALIZED (SELECT event_id AS id,
       |          max(event_type) AS label
       |          FROM events WHERE event_id % 5 = 0 GROUP BY event_id),
       |nodes AS MATERIALIZED (SELECT src AS id FROM e
       |          UNION SELECT dst FROM e
       |          UNION SELECT id FROM seeds),
       |l0 AS MATERIALIZED (SELECT n.id, s.label FROM nodes n
       |       LEFT JOIN seeds s ON n.id = s.id),
       |${lpRoundsSql(3)}
       |SELECT id AS event_id, label FROM l3 ORDER BY event_id""".stripMargin

  /** Unrolled 5-iteration personalized-PageRank mirror: the pageRank
    * oracle's shape with the base term and start vector confined to
    * the seed set.
    */
  private val pprSql: String = {
    val rounds = (1 to 5).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS MATERIALIZED (
         |  SELECT n.id,
         |    CAST(CASE WHEN s.id IS NOT NULL
         |           THEN (1000000 * 15) // (100 * ns) ELSE 0 END
         |      + (85 * coalesce(inf.inflow, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n CROSS JOIN params
         |  LEFT JOIN seeds s ON n.id = s.id
         |  LEFT JOIN (
         |    SELECT e.dst AS id,
         |      CAST(sum(r.rank // od.outdeg) AS BIGINT) AS inflow
         |    FROM e JOIN $prev r ON e.src = r.id
         |      JOIN od ON e.src = od.src
         |    GROUP BY e.dst) inf ON n.id = inf.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
       |  FROM lineitem
       |    JOIN orders ON l_orderkey = o_orderkey
       |    JOIN customer ON o_custkey = c_custkey
       |    JOIN supplier ON l_suppkey = s_suppkey
       |  WHERE l_quantity <= 2 AND c_nationkey <> s_nationkey),
       |seeds AS (SELECT DISTINCT c_nationkey AS id FROM customer
       |          WHERE c_nationkey < 5),
       |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e
       |          UNION SELECT id FROM seeds),
       |params AS (SELECT count(*) AS ns FROM seeds),
       |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |r0 AS (SELECT n.id,
       |         CAST(CASE WHEN s.id IS NOT NULL THEN 1000000 // ns
       |              ELSE 0 END AS BIGINT) AS rank
       |       FROM nodes n CROSS JOIN params
       |       LEFT JOIN seeds s ON n.id = s.id),
       |$rounds
       |SELECT id AS nationkey, rank FROM r5 ORDER BY nationkey""".stripMargin
  }

  /** Unrolled synchronous peeling (8 rounds >= the fixture's 2-round
    * convergence; extra rounds are identity at the fixpoint), over
    * the edges a survivor predicate keeps — the keep-predicate
    * parameterization every `*_delete` oracle here uses.
    */
  private def kcoreSqlKeep(keep: String): String = {
    val rounds = (1 to 8).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS MATERIALIZED (
         |  SELECT id FROM (
         |    SELECT x.id, count(*) AS c FROM (
         |      SELECT e.u AS id FROM e
         |        JOIN $prev a ON e.u = a.id JOIN $prev b ON e.v = b.id
         |      UNION ALL
         |      SELECT e.v FROM e
         |        JOIN $prev a ON e.u = a.id JOIN $prev b ON e.v = b.id
         |    ) x GROUP BY x.id) WHERE c >= 3)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_quantity <= 2 AND ($keep)),
       |r0 AS (SELECT u AS id FROM e UNION SELECT v FROM e),
       |$rounds
       |SELECT id AS node_id FROM r8 ORDER BY node_id""".stripMargin
  }

  private val kcoreSql: String = kcoreSqlKeep("TRUE")

  /** Both near-dup arms rebuilt in SQL: the PolyFp MinHash candidate
    * CTE (ExtensionQueries.minhashCandCte, shared with x_minhash_*)
    * scored to signature-agreement estimates, the exact string-shingle
    * Jaccard pairs at >= 0.5, full-outer joined and recounted per
    * threshold.
    */
  private lazy val neardupPrSql: String =
    ExtensionQueries.minhashCandCte +
      """, est AS (
        |  SELECT id_a AS da, id_b AS db,
        |    CAST(len(list_filter(range(32),
        |      i -> sa[CAST(i+1 AS INT)] = sb[CAST(i+1 AS INT)]))
        |      AS DOUBLE) / 32 AS est
        |  FROM cand
        |), sh2 AS (
        |  SELECT DISTINCT doc_id, shingle FROM sh
        |  WHERE shingle IS NOT NULL
        |), sizes AS (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
        |expairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM sh2 a JOIN sh2 b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |ex AS (
        |  SELECT da, db,
        |    CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac
        |  FROM expairs
        |  JOIN sizes sa ON da = sa.doc_id
        |  JOIN sizes sb ON db = sb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
        |j AS (
        |  SELECT coalesce(ex.da, est.da) AS da,
        |    coalesce(ex.db, est.db) AS db, ex.jac, est.est
        |  FROM ex FULL JOIN est ON ex.da = est.da AND ex.db = est.db),
        |th AS (SELECT CAST(unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE)
        |       AS theta)
        |SELECT theta,
        |  CAST(count(*) FILTER (WHERE jac >= theta AND est >= theta)
        |    AS BIGINT) AS tp,
        |  CAST(count(*) FILTER (WHERE est >= theta
        |    AND (jac IS NULL OR jac < theta)) AS BIGINT) AS fp,
        |  CAST(count(*) FILTER (WHERE jac >= theta
        |    AND (est IS NULL OR est < theta)) AS BIGINT) AS fn
        |FROM j CROSS JOIN th GROUP BY theta ORDER BY theta""".stripMargin

  /** Canonical 3-way-join triangle recount over the same
    * shared-passage pair CTEs the label-prop oracle builds.
    */
  private val trianglesSql: String = trianglesSqlKeep("TRUE")

  /** [[trianglesSql]] over a restricted node universe — the
    * retraction oracle recounts over surviving edges only.
    */
  private def trianglesSqlKeep(nodePred: String): String =
    s"""WITH corpus AS (
       |$passageCorpusSql),
       |w AS (
       |${cdcWinsSql("corpus", "doc_id")}),
       |dw AS (SELECT DISTINCT doc_id, win FROM w),
       |p AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
       |      FROM dw a JOIN dw b
       |        ON a.win = b.win AND a.doc_id < b.doc_id
       |        AND ${nodePred.replace("NODE", "a.doc_id")}
       |        AND ${nodePred.replace("NODE", "b.doc_id")}),
       |tr AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |       FROM p e1 JOIN p e2 ON e1.u = e2.u AND e1.v < e2.v
       |       JOIN p e3 ON e3.u = e1.v AND e3.v = e2.v),
       |corners AS (SELECT a AS id FROM tr
       |            UNION ALL SELECT b FROM tr
       |            UNION ALL SELECT c FROM tr),
       |cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri
       |        FROM corners GROUP BY id),
       |nodes AS (SELECT u AS id FROM p UNION SELECT v FROM p)
       |SELECT n.id AS doc_id,
       |  coalesce(cnt.n_tri, CAST(0 AS BIGINT)) AS n_tri
       |FROM nodes n LEFT JOIN cnt ON n.id = cnt.id
       |ORDER BY doc_id""".stripMargin

  /** Discrete median/MAD mirror: row_number ranks (the oracle may use
    * windows; the Spark side must not), lower median at 0-based rank
    * (n−1)//2.
    */
  private val outlierMadSql: String =
    """WITH b AS (SELECT source AS g, n_chars AS x, doc_id FROM documents),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY g ORDER BY x, doc_id) AS rn,
      |        count(*) OVER (PARTITION BY g) AS n FROM b),
      |med AS (SELECT g, x AS med FROM r WHERE rn - 1 = (n - 1) // 2),
      |dv AS (SELECT r.g, r.x, r.doc_id, med.med,
      |         abs(r.x - med.med) AS dev FROM r JOIN med USING (g)),
      |r2 AS (SELECT *,
      |        row_number() OVER (PARTITION BY g ORDER BY dev, doc_id) AS rn2,
      |        count(*) OVER (PARTITION BY g) AS n2 FROM dv),
      |mad AS (SELECT g, dev AS mad FROM r2 WHERE rn2 - 1 = (n2 - 1) // 2)
      |SELECT dv.g AS source, dv.doc_id, dv.x AS n_chars,
      |  dv.med, mad.mad, dv.dev
      |FROM dv JOIN mad USING (g) WHERE dv.dev > 2 * mad.mad
      |ORDER BY source, doc_id""".stripMargin

  /** The winsorization mirror: same median/MAD CTEs, clamp instead of
    * filter.
    */
  private val outlierClipSql: String =
    """WITH b AS (SELECT source AS g, n_chars AS x, doc_id FROM documents),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY g ORDER BY x, doc_id) AS rn,
      |        count(*) OVER (PARTITION BY g) AS n FROM b),
      |med AS (SELECT g, x AS med FROM r WHERE rn - 1 = (n - 1) // 2),
      |dv AS (SELECT r.g, r.x, r.doc_id, med.med,
      |         abs(r.x - med.med) AS dev FROM r JOIN med USING (g)),
      |r2 AS (SELECT *,
      |        row_number() OVER (PARTITION BY g ORDER BY dev, doc_id) AS rn2,
      |        count(*) OVER (PARTITION BY g) AS n2 FROM dv),
      |mad AS (SELECT g, dev AS mad FROM r2 WHERE rn2 - 1 = (n2 - 1) // 2)
      |SELECT dv.g AS source, dv.doc_id, dv.x AS n_chars,
      |  dv.med, mad.mad,
      |  greatest(least(dv.x, dv.med + 2 * mad.mad),
      |    dv.med - 2 * mad.mad) AS clipped
      |FROM dv JOIN mad USING (g)
      |ORDER BY source, doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "x_bloom_join" ->
      """SELECT p_partkey, p_brand, count(*) AS n_li,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size > 47
        |GROUP BY p_partkey, p_brand
        |ORDER BY p_partkey""".stripMargin,
    "x_bloom_semi" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
        |  CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 47)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "x_bloom_anti" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus
        |FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "x_label_prop" -> labelPropSql,
    "x_label_prop_chain" -> labelPropChainSql,
    "x_ppr_push" -> pprPushSql,
    // warm-start ≡ from-scratch: the chain twin's oracle is shared
    "x_label_prop_incremental" -> labelPropChainSql,
    "x_cc_incremental" -> ccIncSql,
    "x_snapshot_diff" -> ccDiffSql,
    "x_outlier_mad" -> outlierMadSql,
    "x_outlier_clip" -> outlierClipSql,
    "x_triangles" -> trianglesSql,
    // recount over survivors only (deleted clique members lose
    // corners; their own rows vanish)
    "x_tri_delete" -> trianglesSqlKeep("NODE % 10 <> 7"),
    "x_triangles_chain" -> trianglesChainSql,
    // warm-start ≡ from-scratch: the chain twin's oracle is shared
    "x_triangles_incremental" -> trianglesChainSql,
    "x_neardup_pr" -> neardupPrSql,
    "x_kcore" -> kcoreSql,
    // rebuild-on-retract ≡ the peel over surviving edges only (the
    // shrink cascades past the deleted nodes themselves)
    "x_kcore_delete" -> kcoreSqlKeep(
      "o_custkey % 11 <> 4 AND l_suppkey % 7 <> 2"),
    // warm-start ≡ from-scratch: the full-graph oracle is shared
    "x_kcore_incremental" -> kcoreSql,
    "x_ppr" -> pprSql,
    "x_pack_offsets" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS start,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + n_tokens AS BIGINT) AS "end",
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    // 2048 AS BIGINT) AS bin,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    % 2048 AS BIGINT) AS offset
        |FROM tk ORDER BY doc_id""".stripMargin,
    "x_cc_generic" ->
      s"""WITH RECURSIVE corpus AS (
        |$passageCorpusSql),
        |w AS (
        |${cdcWinsSql("corpus", "source")}),
        |dw AS (SELECT DISTINCT source, win FROM w),
        |p AS (SELECT DISTINCT a.source AS sa, b.source AS sb
        |      FROM dw a JOIN dw b
        |        ON a.win = b.win AND a.source < b.source),
        |sym AS (SELECT sa AS a, sb AS b FROM p
        |        UNION SELECT sb, sa FROM p),
        |reach(id, r) AS (
        |  SELECT DISTINCT a AS id, a AS r FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a)
        |SELECT id AS source, min(r) AS comp
        |FROM reach GROUP BY id ORDER BY source""".stripMargin,
    "x_funnel_horizon" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |         AND e.ts <= s1.t + INTERVAL 48 HOUR
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |         AND e.ts <= s2.t + INTERVAL 48 HOUR
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT user_id, 1 AS stage, 'view' AS stage_name, t AS ts
        |FROM s1
        |UNION ALL SELECT user_id, 2, 'click', t FROM s2
        |UNION ALL SELECT user_id, 3, 'purchase', t FROM s3
        |ORDER BY user_id, stage""".stripMargin,
    "x_transitions" ->
      """WITH chain AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n
        |FROM chain WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,
    "x_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |       WHERE e.event_type = 'click' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT user_id, 1 AS stage, 'view' AS stage_name, t AS ts
        |FROM s1
        |UNION ALL SELECT user_id, 2, 'click', t FROM s2
        |UNION ALL SELECT user_id, 3, 'purchase', t FROM s3
        |ORDER BY user_id, stage""".stripMargin,
    "x_cohort" ->
      """WITH ev AS (SELECT user_id AS u,
        |              CAST(date_trunc('week', ts) AS DATE) AS wk
        |            FROM events),
        |f AS (SELECT u, min(wk) AS cohort FROM ev GROUP BY u),
        |a AS (SELECT DISTINCT u, wk FROM ev)
        |SELECT f.cohort,
        |  CAST(datediff('day', f.cohort, a.wk) // 7 AS BIGINT)
        |    AS week_offset,
        |  count(*) AS n_users
        |FROM a JOIN f ON a.u = f.u
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_categorical_incremental" ->
      """WITH hv AS (
        |  SELECT v, CAST(row_number() OVER (ORDER BY v) AS BIGINT)
        |    AS code
        |  FROM (SELECT DISTINCT source AS v FROM documents
        |        WHERE doc_id < 10 AND source IS NOT NULL)),
        |mx AS (SELECT coalesce(max(code), 0) AS m FROM hv),
        |nv AS (
        |  SELECT v, CAST(m + row_number() OVER (ORDER BY v) AS BIGINT)
        |    AS code
        |  FROM (SELECT DISTINCT source AS v FROM documents
        |        WHERE doc_id >= 10 AND source IS NOT NULL
        |          AND source NOT IN (SELECT v FROM hv))
        |  CROSS JOIN mx),
        |vv AS (SELECT v, code FROM hv UNION ALL SELECT v, code FROM nv)
        |SELECT d.doc_id, d.source, vv.code AS source_code
        |FROM documents d LEFT JOIN vv ON d.source = vv.v
        |WHERE d.doc_id >= 10 ORDER BY d.doc_id""".stripMargin,
    // retraction ≡ codes from the VISIBLE vocab, fresh range starting
    // past the max RESERVED code (src9's 10), re-entries coded fresh
    "x_categorical_delete" ->
      """WITH hv AS (
        |  SELECT v, CAST(row_number() OVER (ORDER BY v) AS BIGINT)
        |    AS code
        |  FROM (SELECT DISTINCT source AS v FROM documents
        |        WHERE doc_id < 10 AND source IS NOT NULL)),
        |vis AS (SELECT v, code FROM hv
        |        WHERE v NOT IN ('src3', 'src9')),
        |mx AS (SELECT coalesce(max(code), 0) AS m FROM hv),
        |nv AS (
        |  SELECT v, CAST(m + row_number() OVER (ORDER BY v) AS BIGINT)
        |    AS code
        |  FROM (SELECT DISTINCT source AS v FROM documents
        |        WHERE doc_id >= 10 AND source IS NOT NULL
        |          AND source NOT IN (SELECT v FROM vis))
        |  CROSS JOIN mx),
        |vv AS (SELECT v, code FROM vis UNION ALL SELECT v, code FROM nv)
        |SELECT d.doc_id, d.source, vv.code AS source_code
        |FROM documents d LEFT JOIN vv ON d.source = vv.v
        |WHERE d.doc_id >= 10 ORDER BY d.doc_id""".stripMargin,
    "x_categorical" ->
      """WITH sv AS (
        |  SELECT v, CAST(row_number() OVER (ORDER BY v) AS BIGINT)
        |    AS code
        |  FROM (SELECT DISTINCT source AS v FROM documents
        |        WHERE source IS NOT NULL)),
        |lv AS (
        |  SELECT v, CAST(row_number() OVER (ORDER BY v) AS BIGINT)
        |    AS code
        |  FROM (SELECT DISTINCT lang AS v FROM documents
        |        WHERE lang IS NOT NULL))
        |SELECT d.doc_id, d.source, sv.code AS source_code,
        |  d.lang, lv.code AS lang_code
        |FROM documents d
        |LEFT JOIN sv ON d.source = sv.v
        |LEFT JOIN lv ON d.lang = lv.v
        |ORDER BY d.doc_id""".stripMargin,
    "x_profile_drift" ->
      """WITH pa AS (
        |  SELECT * FROM (
        |    SELECT 'lang' AS column, count(*) AS n_a,
        |      CAST(sum(CAST(lang IS NULL AS BIGINT)) AS BIGINT) AS nulls_a,
        |      count(DISTINCT lang) AS ndv_a
        |    FROM documents WHERE doc_id < 400
        |    UNION ALL
        |    SELECT 'source', count(*),
        |      CAST(sum(CAST(source IS NULL AS BIGINT)) AS BIGINT),
        |      count(DISTINCT source)
        |    FROM documents WHERE doc_id < 400
        |    UNION ALL
        |    SELECT 'n_chars', count(*),
        |      CAST(sum(CAST(n_chars IS NULL AS BIGINT)) AS BIGINT),
        |      count(DISTINCT n_chars)
        |    FROM documents WHERE doc_id < 400)),
        |pb AS (
        |  SELECT * FROM (
        |    SELECT 'lang' AS column, count(*) AS n_b,
        |      CAST(sum(CAST(lang IS NULL AS BIGINT)) AS BIGINT) AS nulls_b,
        |      count(DISTINCT lang) AS ndv_b
        |    FROM documents
        |    UNION ALL
        |    SELECT 'source', count(*),
        |      CAST(sum(CAST(source IS NULL AS BIGINT)) AS BIGINT),
        |      count(DISTINCT source)
        |    FROM documents
        |    UNION ALL
        |    SELECT 'n_chars', count(*),
        |      CAST(sum(CAST(n_chars IS NULL AS BIGINT)) AS BIGINT),
        |      count(DISTINCT n_chars)
        |    FROM documents))
        |SELECT pa.column, pa.n_a, pa.nulls_a, pa.ndv_a,
        |  pb.n_b, pb.nulls_b, pb.ndv_b
        |FROM pa FULL JOIN pb ON pa.column = pb.column
        |ORDER BY pa.column""".stripMargin,
    "x_quantile_disc" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
        |    l_orderkey, l_linenumber, l_partkey, l_suppkey
        |  FROM lineitem),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY g ORDER BY x,
        |          l_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn,
        |        count(*) OVER (PARTITION BY g) AS n FROM b),
        |qv AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9, 0.99])
        |         AS DOUBLE) AS q)
        |SELECT r.g AS l_returnflag, qv.q, r.x AS cents
        |FROM r CROSS JOIN qv
        |WHERE r.rn = CAST(ceil(qv.q * r.n) AS BIGINT)
        |ORDER BY l_returnflag, qv.q""".stripMargin)
}
