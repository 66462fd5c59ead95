package graft

import org.apache.spark.sql.functions._
import graft.pipeline.PlanLint
import graft.pipeline.PlanLint.Budget

/** PlanLint over EVERY shipped query: each SparkEntry.queries entry
  * must stay inside an explicit physical-plan budget (shuffle / sort /
  * broadcast counts, no cartesian products) — the CI gate that catches
  * a scale regression (a dropped broadcast hint, a join that degrades
  * to nested-loop, a new shuffle) at sf0.001 plan-shape cost, before
  * any big run pays for it.
  *
  * Budgets are measured-plus-headroom (survey: graft.tools.PlanSurvey):
  * tight enough that DOUBLING a query's exchanges fails, loose enough
  * that AQE/stats jitter does not. Queries allowed a cartesian are the
  * adjudicated by-design cases: the explicit cross-join query, the
  * brute-force exact verifiers that license the approximate paths
  * (cosine top-k baseline, embedding near-dup twin, the three recall
  * gates), and x_domain_mix's single-row quota cross-joins (bounded by
  * #strata, never data-sized).
  */
class QueryPlanBudgetSpec extends SparkSuite {

  private val default = Budget(maxShuffles = 6, maxSorts = 6,
    maxBroadcasts = 6, allowCartesian = false,
    allowGlobalWindow = false)

  /** Per-query overrides; everything not named holds `default`. */
  private val overrides: Map[String, Budget] = Map(
    // explicitly a cross join (reference op: unconditioned join)
    "r_cross_join" -> default.copy(allowCartesian = true),
    // brute-force exact baselines/verifiers — quadratic BY DESIGN,
    // they exist to license the LSH/IVF paths
    "x_cosine_topk" -> default.copy(allowCartesian = true),
    // hash-embed text ANN: same licensed brute-force exact baseline
    // (the scale path composes hashEmbed with signBuckets/ivfTopK)
    "x_text_ann" -> default.copy(allowCartesian = true),
    // hard-negative mining: brute exact baseline (scale arm is
    // hardNegativesIvf, probed + broadcast-filtered)
    "x_hard_negatives" -> default.copy(allowCartesian = true),
    // quantile rank-error gate: the 4-row sketch aggregate is
    // cross-joined back for the rank recount — bounded by the
    // quantile count, never data-sized (the BM25-stats pattern)
    "x_quantile_err" -> default.copy(allowCartesian = true),
    // curriculum: window-free BY CONSTRUCTION (prefix-sum rank,
    // pinned like x_stratified); the 1-row N aggregate cross-joins
    "x_curriculum" -> default.copy(allowCartesian = true,
      maxWindows = 0),
    // collocations: the 1-row N aggregate broadcast cross join is
    // bounded by construction; marginal re-aggregates + two
    // vocab-table joins push the exchange count past default
    "x_collocations" -> default.copy(allowCartesian = true,
      maxShuffles = 12, maxBroadcasts = 8),
    // MaxSim exact arm: token-pair cross join BY DESIGN (licensed
    // baseline, x_cosine_topk pattern)
    "x_maxsim" -> default.copy(allowCartesian = true),
    // greedy k-center: each round cross-joins the corpus against ONE
    // broadcast 1-row center — bounded by construction; the final
    // plan unions six staged 1-row picks
    "x_kcenter" -> default.copy(allowCartesian = true,
      maxBroadcasts = 8),
    // store-backed closeness: the NODE universe unions two
    // nationTradeEdges derivations (3 broadcast dim joins each) on
    // top of the estimator's store join — broadcasts, never shuffles
    "x_closeness_incremental" -> default.copy(maxBroadcasts = 8),
    // MaxSim gate runs BOTH arms (exact cartesian + IVF candidate
    // routing) plus the anti-join compare
    "x_maxsim_ivf_err" -> Budget(maxShuffles = 16, maxSorts = 10,
      maxBroadcasts = 12, allowCartesian = true),
    "x_embed_neardup" -> default.copy(allowCartesian = true),
    // KMV pairwise overlap: the ga < gb pair join is over the
    // #sources-row SKETCH table (k longs each) — a planning-table
    // cross, bounded like x_domain_mix's quota joins, never data-sized
    "x_kmv_overlap" -> default.copy(allowCartesian = true),
    // SemDeDup gates: each contains the brute-force exact baseline
    // (cartesian BY DESIGN — it licenses the cell-confined pass) plus
    // the CC-resolved clustered arm
    "x_semdedup_drop_err" -> Budget(maxShuffles = 12, maxSorts = 8,
      maxBroadcasts = 10, allowCartesian = true),
    "x_semdedup_recall_err" -> Budget(maxShuffles = 12, maxSorts = 8,
      maxBroadcasts = 10, allowCartesian = true),
    "x_ann_recall_err" -> Budget(maxShuffles = 10, maxSorts = 10,
      maxBroadcasts = 8, allowCartesian = true),
    "x_embed_recall_err" -> Budget(maxShuffles = 10, maxSorts = 6,
      maxBroadcasts = 8, allowCartesian = true),
    "x_ivf_recall_err" -> Budget(maxShuffles = 12, maxSorts = 10,
      maxBroadcasts = 8, allowCartesian = true),
    // quantized-IVF gate: contains the same brute-force exact baseline
    // BY DESIGN plus the two-stage (shortlist + re-rank) windows
    "x_ivf_q8_recall_err" -> Budget(maxShuffles = 14, maxSorts = 12,
      maxBroadcasts = 10, allowCartesian = true),
    // two ranking windows (quantized shortlist, float re-rank)
    "x_cosine_ivf_q8" -> Budget(maxShuffles = 8, maxSorts = 8,
      maxBroadcasts = 8),
    // PQ gate: brute-force exact baseline BY DESIGN + the two-stage
    // PQ shortlist/re-rank windows (the q8 gate's shape)
    "x_ivf_pq_recall_err" -> Budget(maxShuffles = 14, maxSorts = 12,
      maxBroadcasts = 10, allowCartesian = true),
    // same two-stage windows as x_cosine_ivf_q8
    "x_cosine_ivf_pq" -> Budget(maxShuffles = 8, maxSorts = 8,
      maxBroadcasts = 8),
    // drift gate = the PQ gate's shape read through the appended
    // store (one extra newest-wins fold on the store view)
    "x_pq_drift_err" -> Budget(maxShuffles = 16, maxSorts = 12,
      maxBroadcasts = 10, allowCartesian = true),
    // exact-vs-approx disagreement gate: two gates + exceptAll both ways
    "x_quality_gate_approx_err" -> Budget(maxShuffles = 10,
      maxSorts = 6, maxBroadcasts = 8),
    // SCD2 merge: several broadcast-keyed change-detection joins
    "r_scd2" -> Budget(maxShuffles = 7, maxSorts = 6, maxBroadcasts = 9),
    // incremental sig-store near-dup: shuffles = cap aggregate +
    // removal-id distinct + the store∪batch union alignment;
    // everything else rides batch-sized broadcasts BY DESIGN —
    // touched-bucket semi joins, the pair join's batch side, and the
    // removal anti join (measured 5/9, each broadcast bounded by the
    // new batch, never the store)
    "x_minhash_incremental" -> Budget(maxShuffles = 6, maxSorts = 6,
      maxBroadcasts = 10),
    // the tombstone-aware re-gate: x_minhash_incremental's shape plus
    // the deleted-id anti-joins (store slice + removal confirm), each
    // a broadcast of a batch-bounded set — never a shuffle join
    "x_neardup_delete" -> Budget(maxShuffles = 6, maxSorts = 6,
      maxBroadcasts = 14),
    // same tombstone-aware re-gate shape on the entity dictionary:
    // the staged batch feeds the probe, both erGatePairs arms, and
    // the final anti-join — each use a broadcast of the batch-bounded
    // entity set (never a shuffle join); 9 measured + headroom
    "x_er_delete" -> Budget(maxShuffles = 6, maxSorts = 6,
      maxBroadcasts = 12),
    // incremental embedding near-dup: 3 shuffles (cap aggregate +
    // candidate distinct + output sort); the touched-bucket semi
    // joins, pair join, and both vector fetches all ride batch-sized
    // broadcasts BY DESIGN — the probe-expansion subtree recurs under
    // several of them pre-reuse, hence the high exchange count (every
    // one bounded by the new batch, never the store)
    "x_embed_incremental" -> Budget(maxShuffles = 5, maxSorts = 6,
      maxBroadcasts = 16),
    "x_top_terms" -> Budget(maxShuffles = 7, maxSorts = 6,
      maxBroadcasts = 6),
    // distributed per-stratum rank (withPrefixSum): re-introducing ANY
    // window — even a partitioned one — would mean one reducer per
    // stratum, the defect class mixToTarget/stratifiedEveryK cleared
    "x_stratified" -> default.copy(maxWindows = 0),
    // MAD outliers: ranks are prefix-sum BY CONSTRUCTION (a
    // per-source window would funnel each source through one reducer)
    "x_outlier_mad" -> default.copy(maxWindows = 0),
    "x_outlier_clip" -> default.copy(maxWindows = 0),
    // PR audit: the θ sweep is a 5-row broadcast cross join over the
    // PAIR table (near-dup-sized, never corpus-sized — the
    // x_domain_mix quota-join class)
    "x_neardup_pr" -> default.copy(allowCartesian = true),
    // discrete quantiles: the q sweep is a 5-row broadcast cross join
    // over the ranked rows; ranks are prefix-sum (no window)
    "x_quantile_disc" -> default.copy(allowCartesian = true,
      maxWindows = 0),
    // modularity decomposition: the staged edge fold feeds the intra
    // aggregate and three degree branches, each with its assignment
    // join — breadth of bounded aggregates (|C|-sized outputs), one
    // pass over the staged table per branch
    "x_modularity" -> Budget(maxShuffles = 10, maxSorts = 10,
      maxBroadcasts = 8),
    // same decomposition over the staged stale assignment
    "x_modularity_drift" -> Budget(maxShuffles = 10, maxSorts = 10,
      maxBroadcasts = 8),
    // dynamic batching: rank = the distributed prefix sum; any window
    // would re-introduce the single-reducer global sort it replaces
    "x_length_batches" -> default.copy(maxWindows = 0),
    // cluster-aware split: the staged CC labels left-join + the
    // cluster-key min aggregate + the cluster join-back + output sort
    // — each shuffle corpus-keyed fixed-width rows, one pass
    "x_split_safe" -> Budget(maxShuffles = 8, maxSorts = 8,
      maxBroadcasts = 6),
    // the audit unions two assignment pipelines (naive + the staged
    // safe split), each joining the staged pair list twice — breadth,
    // not depth: every shuffle is pair- or corpus-sized, fixed-width
    "x_split_leakage" -> Budget(maxShuffles = 14, maxSorts = 12,
      maxBroadcasts = 10),
    // label propagation: per-round count-argmax aggregates, no window
    "x_label_prop" -> default.copy(maxWindows = 0),
    // warm-start form: the final plan is the store's state-view argmax
    // + the staged frontier slice union (rounds already checkpointed)
    "x_label_prop_incremental" -> default.copy(maxWindows = 0),
    // warm-start triangles: store-view argmax + anti join + staged
    // delta slice; the common-neighbor expansion is checkpointed
    "x_triangles_incremental" -> default.copy(maxWindows = 0),
    // batch triangles: the r10 single-pass corner-credit rewrite keeps
    // the closing join + credit aggregate in ONE un-checkpointed plan
    // (measured 7 exchanges; the staged triangle list it replaced hid
    // two of them behind a 2 GB checkpoint — the GC cost that
    // motivated the rewrite)
    "x_triangles" -> default.copy(maxShuffles = 8),
    // same single-pass corner-credit shape over the chain fixture
    "x_triangles_chain" -> default.copy(maxShuffles = 8),
    // relational fallback arm: the 2 corpus shuffles (anti-join +
    // ordered reassembly) plus the two-pass frequency subtree — the
    // hash-keyed aggregate (fixed-width keys) and the candidate-only
    // string confirm aggregate, both bounded BY DESIGN
    "x_line_dedup_shuffle" -> default.copy(maxShuffles = 8),
    // quota arithmetic cross-joins against 1-row aggregates
    "x_domain_mix" -> Budget(maxShuffles = 9, maxSorts = 6,
      maxBroadcasts = 8, allowCartesian = true, maxWindows = 0),
    "x_pipeline_e2e" -> default.copy(maxWindows = 0),
    "x_incremental_overwrite" -> Budget(maxShuffles = 7, maxSorts = 6,
      maxBroadcasts = 6),
    // BM25's corpus stats (N, Σdl, per-term df) are a 1-row aggregate
    // cross-joined back — bounded by construction, never data-sized
    "x_bm25" -> default.copy(allowCartesian = true),
    // the indexed paths carry the same 1-row stats cross-join, twice
    // (corpus stats ⨯ slice-derived dfs) — both single-row by
    // construction
    "x_bm25_indexed" -> default.copy(allowCartesian = true),
    "x_bm25_incremental" -> default.copy(allowCartesian = true),
    // same 1-row stats/df cross joins as its siblings
    "x_bm25_delete" -> default.copy(allowCartesian = true),
    // set-oriented retrieval: the same 1-row stats cross-join plus the
    // batch joins (query terms ⋈ slice ⋈ dfs ⋈ dl), the pos-fold
    // aggregate, and the bounded-buffer per-query top-k — NO window
    // anywhere (the TopKPairsAggregator replaces the per-query sort)
    "x_bm25_many" -> default.copy(allowCartesian = true,
      maxShuffles = 10, maxWindows = 0),
    // eval = the many-path's shapes + the qrels derivation aggregates
    // + the two integer metric aggregates; still window-free (measured
    // 9 broadcasts — the tiny query/qsize tables ride under several
    // joins by design, each bounded by the query set, never the corpus)
    "x_retrieval_eval" -> default.copy(allowCartesian = true,
      maxShuffles = 14, maxBroadcasts = 11, maxWindows = 0),
    // hybrid many: sparse arm above + the dense arm's licensed
    // brute-force baseline (its rank window partitions by query) +
    // per-query fusion joins
    "x_hybrid_rrf_many" -> Budget(maxShuffles = 14, maxSorts = 12,
      maxBroadcasts = 10, allowCartesian = true),
    // hybrid fusion: the BM25 stats cross-join plus the dense arm's
    // brute-force exact baseline (licenses the ANN arms) BY DESIGN;
    // the global rank window sorts a limit(50)-bounded input — a k-row
    // single task by construction, never corpus-sized
    "x_hybrid_rrf" -> default.copy(allowCartesian = true,
      allowGlobalWindow = true),
    // indexed form: same bounded shapes + the index path's 1-row
    // stats cross joins
    "x_hybrid_rrf_indexed" -> default.copy(allowCartesian = true,
      allowGlobalWindow = true),
    // the MMR shortlist rides the brute-force dense arm BY DESIGN
    "x_mmr" -> default.copy(allowCartesian = true),
    // same justification, IVF dense arm (centroid-probe broadcasts)
    "x_hybrid_rrf_ann" -> default.copy(allowCartesian = true,
      allowGlobalWindow = true),
    // the agreement gate contains BOTH fusions (the exact one's brute
    // arm included) BY DESIGN — the license-the-ANN-path pattern of
    // x_ivf_q8_recall_err; all windows remain limit(50)-bounded
    "x_hybrid_rrf_err" -> Budget(maxShuffles = 14, maxSorts = 12,
      maxBroadcasts = 10, allowCartesian = true,
      allowGlobalWindow = true),
    // hash-candidate buckets + exact string confirm: measured 7
    // exchanges (idHash distinct, bucket agg+join, confirm semi join +
    // distinct, pair-count agg, output sort)
    "x_substring_dup" -> default.copy(maxShuffles = 9),
    // persisted df-stats path: the from-scratch shuffles plus the
    // stats-store merge-refresh aggregate (measured 7)
    "x_allpairs_incremental" -> default.copy(maxShuffles = 7),
    // blocked Hamming pairing with the round-9 skew cap: the window
    // pre-count (fixed-width) and its semi join add 2 exchanges over
    // the uncapped shape (measured 8) — the buffer-bounding trade
    "x_image_neardup" -> default.copy(maxShuffles = 8),
    // entity-grain ER: exact-collapse aggregate + block-cap pre-count
    // + both pair sides + pair distinct + output sort (measured 7);
    // every exchange is entity-grain, never record-grain
    "x_er_pairs" -> default.copy(maxShuffles = 7),
    // the LM scorer's context-vocabulary V is a 1-row aggregate
    // cross-joined back — bounded by construction (the x_bm25 pattern)
    "x_lm_score" -> default.copy(allowCartesian = true),
    "x_lm_quality" -> default.copy(allowCartesian = true),
    "x_lm_incremental" -> default.copy(allowCartesian = true),
    // same licensed 1-row V broadcast as the other LM scorers
    "x_lm_delete" -> default.copy(allowCartesian = true))

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name stays inside its physical-plan budget") {
      val budget = overrides.getOrElse(name, default)
      PlanLint.assertBudget(fn(spark, sf0001), budget): Unit
    }
  }

  test("the budget actually bites: un-hinted small-dim join with " +
      "broadcast disabled blows a 1-shuffle budget") {
    import spark.implicits._
    val fact = (0L until 1000L).map(i => (i, i % 25)).toDF("id", "k")
    val dim = (0L until 25L).map(i => (i, s"d$i")).toDF("k", "name")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = fact.join(dim, "k").groupBy($"name").count()
      val e = intercept[IllegalStateException] {
        PlanLint.assertBudget(joined, Budget(maxShuffles = 1))
      }
      assert(e.getMessage.contains("shuffles"))
      // the hinted/broadcast form passes the same budget
      PlanLint.assertBudget(
        fact.join(broadcast(dim), "k").groupBy($"name").count(),
        Budget(maxShuffles = 1)): Unit
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
