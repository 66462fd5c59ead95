package graft

/** Determinism under PARALLELISM change — the cluster-resize audit.
  * Every shipped query must return bit-identical rows when the shuffle
  * partition count, input split size, and AQE mode all change: on a
  * real cluster those vary per run (executor count, file layout,
  * adaptive re-planning), and any order-dependent float fold, non-total
  * tiebreak, or partition-id dependence would make "same query, same
  * data" silently return different answers — poisoning the oracle
  * story and any incremental ≡ batch claim built on it.
  *
  * The sample below is chosen adversarially: float scoring folds
  * (cosine, BM25, LM, DSIR), scaled-integer iteration (PageRank),
  * argmax ties, sketch/quantile cuts, sampling, and the prefix-sum
  * machinery — the query families where partition order is most
  * tempting to lean on. Comparison is on collected row multisets
  * (queries already end in ORDER BY; a non-total sort may legitimately
  * permute equal rows between runs, exactly as the driver's hash
  * compare allows).
  */
class DeterminismSpec extends SparkSuite {

  private val sample = Seq(
    "x_cosine_topk",      // IEEE-exact left-fold dot products
    "x_pagerank",         // scaled-integer fixed point
    "x_lm_score",         // quantized log-prob sums
    "x_bm25_indexed",     // per-term float fold through the index
    "x_dsir_select_q",    // quantized importance weights + gumbel keys
    "x_quantile_disc",    // discrete quantile cuts
    "x_curriculum",       // prefix-sum ranks, window-free
    "x_weighted_sample",  // hash-keyed sampling
    "q_argmax_daily",     // argmax with tie-break contract
    "x_dedup_clusters",   // CC label convergence
    "x_minhash_sigs",     // permutation-hash signatures
    "x_triangles_chain",  // corner-credit aggregation over windows
    "x_ppr_push",         // frontier growth + integer push rounds
    "x_louvain2",         // modularity-gain argmax ties through TWO
                          // levels + the contraction in between
    "x_kcenter_incremental", // greedy picks seeded from the store
    "x_sft_pack",         // greedy first-fit packing over prefix sums
    "x_dpo_pairs",        // float-scored struct argmax/argmin ties
    "x_length_batches",   // length-bucketed prefix-sum batch ranks
    "x_scc",              // fw-bw coloring fixpoints, outer recolors
    "x_pq_incremental",   // frozen-fit argmin codes through the store
    "x_landmark_incremental", // monotone relaxation from a store
    "x_pq_delete",        // tombstone hiding through newest-wins folds
    "x_bm25_delete",      // surviving-df recovery + negative stats
    "x_scc_levels",       // condensation DAG + longest-path fixpoint
    "x_scc_incremental",  // contract-through-store + merged relabel
    "x_scc_chain",        // alternating-direction drain over segments
    "x_pca_delete",       // negative moment fold read POST-compaction
    "x_kmv_delete",       // survivor sketch re-fold POST-compaction
    "x_dsir_delete",      // subtracted model + survivor-only scoring
    "x_neardup_delete",   // tombstone-aware banded store re-gate
    "x_lm_delete",        // subtracted count model re-scoring
    "x_scc_levels_incremental", // store-backed level fixpoint
    "x_scc_delete",       // rebuild-on-retract superseding generation
    "x_cc_delete",        // CC rebuild with component splits
    "x_tri_delete",       // triangle recount over survivors
    "x_landmark_delete",  // BFS-sketch rebuild, stale-small rows gone
    "x_pagerank_delete",  // cold value-iteration rebuild over survivors
    "x_kcore_delete",     // cascaded peel rebuild over survivors
    "x_kcenter_delete",   // greedy trace rebuild after a center hit
    "x_substring_delete", // tombstone-aware window-fp store re-count
    "x_er_delete",        // tombstone-aware dictionary re-gate
    "x_categorical_delete", // reserved-code vocab after retraction
    "x_closeness",        // all-pairs BFS + integer floor-div sums
    "x_closeness_landmark", // Eppstein-Wang fold over the L pivots
    "x_closeness_incremental", // store-backed estimator readout
    "x_retract_deadline",  // as-of probes post-vacuum (compliance)
    "x_bm25_incremental",  // index-gate store readout; appends now run
                           // under the batch writer fence (r15)
    "x_embed_incremental", // codes+vecs sibling store, fenced appends
    "x_substring_incremental", // manifest-pruned window-fp store
                           // readout after fenced append+compact
    "x_kcore_incremental", // peel-from-store warm maintenance readout
    "x_hits_warm",         // warm-start hub/authority fixpoint
    "x_store_maintenance", // maintainStores sweep → folded view (r16)
    "x_store_asof",        // snapshot read across a fold + retroactive
                           // takedown anti-join (r16)
    "x_store_diff",        // keyed snapshot-to-snapshot diff (r16)
    "x_cosine_ivf_pq",     // IVFADC shortlist + exact re-rank through
                           // the persisted cell-clustered code store
    "x_semdedup")          // probes=4 cell-confined pairs + CC keep

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq

  sample.foreach { name =>
    test(s"$name is bit-identical under shuffle/split/AQE change") {
      val conf = spark.conf
      val before = rows(name)
      val saved = Seq(
        "spark.sql.shuffle.partitions",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.adaptive.enabled").map(k => k -> conf.get(k))
      try {
        conf.set("spark.sql.shuffle.partitions", "7")
        conf.set("spark.sql.files.maxPartitionBytes", "131072")
        conf.set("spark.sql.adaptive.enabled", "false")
        val after = rows(name)
        assert(after == before,
          s"$name drifted under parallelism change: " +
            s"${before.size} vs ${after.size} rows; first diff: " +
            after.zip(before).find(p => p._1 != p._2)
              .orElse(Some(("size", "mismatch"))).get)
      } finally saved.foreach { case (k, v) => conf.set(k, v) }
    }
  }
}
