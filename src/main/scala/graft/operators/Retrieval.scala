package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-fusion operators for hybrid retrieval — combining a sparse
  * (BM25, [[TextAnalysis.bm25TopK]]) and a dense
  * ([[Similarity.bruteForceTopK]] / the ANN paths) arm into one ranked
  * list, the standard production shape for retrieval over a curated
  * corpus.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009): each arm is
    * a ranked list with columns `(id, rank)` (rank 1-based);
    * `score(id) = Σ_arms 1 / (c + rank)`, missing-arm contributions 0.
    * Returns `(id, rrf, n_arms)` ordered by score desc (id tiebreak),
    * limited to `k`.
    *
    * Determinism: each contribution is a pure per-row IEEE-double
    * division and double addition is commutative, so with ≤ 2 arms the
    * fused score is bit-reproducible on any engine regardless of
    * aggregation order; 3+ arms are order-dependent at the last ulp —
    * keep cross-engine hash checks at 2 arms (ranking-agreement specs
    * can cover more).
    *
    * Scale: arms are top-k lists — bounded by construction, never
    * data-sized — so the union/aggregate is a k-row job regardless of
    * corpus size; the heavy lifting happened inside the arms.
    */
  def rrfFuse(arms: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(arms.nonEmpty, "rrfFuse: need at least one arm")
    arms.map(_.select(col("id"),
        (lit(1.0) / (col("rank").cast("double") + lit(c.toDouble)))
          .as("contrib")))
      .reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(sum(col("contrib")).as("rrf"), count(lit(1)).as("n_arms"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }
}
