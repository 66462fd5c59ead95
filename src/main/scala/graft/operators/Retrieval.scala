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

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998) of a retrieval SHORTLIST: greedily pick the candidate
    * maximizing `λ·score − (1−λ)·max_{s∈selected} cos(vec, vec_s)` —
    * relevance traded against redundancy with what is already picked.
    *
    * `candidates` is `(id, score, vec)` — a top-m shortlist from an
    * upstream arm ([[rrfFuse]], the ANN paths), NEVER a corpus: the
    * greedy argmax is inherently sequential, so the shortlist is
    * collected (bounded O(m·dim) driver traffic — the adjudicated
    * bounded-collect class; `maxShortlist` guards the contract) and
    * re-ranked locally. Deterministic: left-fold double cosine, ties
    * broken by min id. Returns `(id, mmr_rank, mmr_score)`.
    */
  def mmrRerank(candidates: DataFrame, k: Int, lambda: Double = 0.5,
                maxShortlist: Int = 10000): DataFrame = {
    val spark = candidates.sparkSession
    val rows = candidates
      .select(col("id").cast("long"), col("score").cast("double"),
        col("vec"))
      .limit(maxShortlist + 1).collect()
    require(rows.length <= maxShortlist,
      s"mmrRerank: shortlist exceeds maxShortlist=$maxShortlist — " +
        "re-rank a top-m shortlist, not a corpus")
    val ids = rows.map(_.getLong(0))
    val scores = rows.map(_.getDouble(1))
    val vecs = rows.map(_.getSeq[Any](2).map {
      case f: Float => f.toDouble
      case d: Double => d
    }.toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val norms = vecs.map(v => math.sqrt(dot(v, v)))
    def cos(i: Int, j: Int): Double =
      if (norms(i) == 0.0 || norms(j) == 0.0) 0.0
      else dot(vecs(i), vecs(j)) / (norms(i) * norms(j))
    val n = ids.length
    val picked = new scala.collection.mutable.ArrayBuffer[(Long, Int, Double)]
    // -inf, not 0: the true max cosine to the selected set can be
    // negative, and clipping it at 0 would silently under-penalize
    // (the first pick never reads maxSim, and every entry is
    // overwritten by a real cosine right after it)
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val used = Array.fill(n)(false)
    var round = 0
    while (round < math.min(k, n)) {
      var best = -1; var bestVal = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!used(i)) {
          val v =
            if (round == 0) scores(i)
            else lambda * scores(i) - (1.0 - lambda) * maxSim(i)
          if (v > bestVal || (v == bestVal && best >= 0 &&
              ids(i) < ids(best))) {
            best = i; bestVal = v
          }
        }
        i += 1
      }
      used(best) = true
      picked += ((ids(best), round + 1, bestVal))
      var j = 0
      while (j < n) {
        if (!used(j)) {
          val c = cos(best, j)
          if (c > maxSim(j)) maxSim(j) = c
        }
        j += 1
      }
      round += 1
    }
    import spark.implicits._
    picked.toSeq.toDF("id", "mmr_rank", "mmr_score")
  }
}
