package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Persist a corpus's BM25 artifacts as an INVERTED INDEX:
    *
    *   - `postings/`  (th, term, id, tf) range-clustered by
    *     th = xxhash64(term), with a footer manifest — a query's
    *     store scan OPENS only the files its own terms' hashes can
    *     live in, then row-filters on the exact term (hash collisions
    *     only cost reading, never correctness);
    *   - `doclen/`    (id, dl) id-clustered + manifest — fetched only
    *     for candidate docs;
    *   - `stats/`     one (n_docs, sum_dl) row.
    *
    * This is the structural fix for full-scan BM25 at corpus scale:
    * [[TextAnalysis.bm25Scores]] re-reads and re-tokenizes 100 TB of
    * text PER QUERY; through the index a query touches
    * O(Σ postings of its terms) — the classic inverted-file bound —
    * plus a candidate-pruned doclen fetch. Tokenization is
    * [[TextAnalysis.tokens]] exactly, so tf/df/dl agree with the
    * full-scan path token for token.
    */
  def writeBm25Index(df: DataFrame, id: Column, text: Column,
                     indexDir: String, filesOut: Int = 16): Unit = {
    val spark = df.sparkSession
    val toks = df.select(id.as("id"),
      explode(TextAnalysis.tokens(text)).as("term"))
    toks.where(col("term") =!= "")
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select(xxhash64(col("term")).as("th"), col("term"), col("id"),
        col("tf"))
      .repartitionByRange(filesOut, col("th"))
      .sortWithinPartitions(col("th"), col("term"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$indexDir/postings")
    Stats.writeManifest(spark, s"$indexDir/postings",
      s"$indexDir/postings_manifest")
    val doclen = df.select(id.as("id"),
      size(TextAnalysis.tokens(text)).cast("long").as("dl"))
    doclen
      .repartitionByRange(math.max(1, filesOut / 2), col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$indexDir/doclen")
    Stats.writeManifest(spark, s"$indexDir/doclen",
      s"$indexDir/doclen_manifest")
    doclen.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$indexDir/stats")
  }

  /** Append a NEW batch of documents to an existing BM25 index (the
    * continuous-ingestion write path): postings and doc lengths append
    * as new clustered files with footer-only manifest refreshes (the
    * [[graft.operators.Dedup.appendBandedSigStore]] protocol), and the
    * one-row stats table folds additively — n_docs and sum_dl are a
    * merge semigroup, so history is never re-read or re-tokenized.
    * Batch doc ids must be new (an id re-ingest would double-count its
    * postings — upstream exact-dedup owns that invariant, as with
    * every incremental store here). After the append,
    * [[bm25TopKIndexed]] answers over the UNION corpus exactly
    * (driver-checked: x_bm25_incremental shares the full-corpus
    * oracle).
    */
  def appendBm25Index(df: DataFrame, id: Column, text: Column,
                      indexDir: String, filesOut: Int = 4): Unit = {
    val spark = df.sparkSession
    df.select(id.as("id"), explode(TextAnalysis.tokens(text)).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select(xxhash64(col("term")).as("th"), col("term"), col("id"),
        col("tf"))
      .repartitionByRange(filesOut, col("th"))
      .sortWithinPartitions(col("th"), col("term"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$indexDir/postings")
    Stats.refreshManifest(spark, s"$indexDir/postings",
      s"$indexDir/postings_manifest")
    val doclen = df.select(id.as("id"),
      size(TextAnalysis.tokens(text)).cast("long").as("dl"))
    doclen
      .repartitionByRange(math.max(1, filesOut / 2), col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$indexDir/doclen")
    Stats.refreshManifest(spark, s"$indexDir/doclen",
      s"$indexDir/doclen_manifest")
    // additive stats fold: one old row + one batch row, via a staged
    // read so the overwrite never races its own input
    val old = spark.read.parquet(s"$indexDir/stats")
      .select(col("n_docs"), col("sum_dl")).head
    val batch = doclen
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")).head
    val batchSum = if (batch.isNullAt(1)) 0L else batch.getLong(1)
    import spark.implicits._
    Seq((old.getLong(0) + batch.getLong(0),
        old.getLong(1) + batchSum))
      .toDF("n_docs", "sum_dl")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$indexDir/stats")
  }

  /** [[TextAnalysis.bm25TopK]] answered FROM the persisted index —
    * bit-identical results (shared [[TextAnalysis.bm25ScoreExpr]]
    * expression tree, same df/tf/dl integers, same (score desc, id)
    * cut), but the corpus is never touched: the postings scan is
    * manifest-pruned to the query terms' hash files, per-term df is
    * recovered from the slice itself (the slice holds EVERY posting of
    * a matched term), and doc lengths are fetched manifest-pruned for
    * candidates only. Per-query cost is postings-of-terms, not corpus.
    */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String, queryTerms: Seq[String], k: Int,
                      k1: Double = 1.2, b: Double = 0.75,
                      idfMode: String = "rational"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    import spark.implicits._
    val idx = queryTerms.indices
    val probe = queryTerms.toDF("term")
      .select(xxhash64(col("term")).as("th"))
    val slice = Checkpoints.stage(
      Stats.readTouchedKeysManifest(spark, s"$indexDir/postings",
          s"$indexDir/postings_manifest", "th", probe)
        .where(col("term").isin(queryTerms: _*))
        .select(col("term"), col("id"), col("tf")))
    val dfAggs = idx.map(i =>
      sum(when(col("term") === queryTerms(i), 1L).otherwise(0L))
        .as(s"df_$i"))
    val dfsRow = slice.agg(dfAggs.head, dfAggs.tail: _*)
    val tfAggs = idx.map(i =>
      coalesce(max(when(col("term") === queryTerms(i), col("tf"))),
        lit(0L)).as(s"tf_$i"))
    val tfs = slice.groupBy(col("id")).agg(tfAggs.head, tfAggs.tail: _*)
    val dl = Stats.readTouchedKeysManifest(spark, s"$indexDir/doclen",
        s"$indexDir/doclen_manifest", "id",
        tfs.select(col("id")))
      .select(col("id"), col("dl"))
    val consts = broadcast(
      spark.read.parquet(s"$indexDir/stats").crossJoin(dfsRow))
    tfs.join(dl, Seq("id"))
      .crossJoin(consts)
      .select(col("id") +: idx.map(i => col(s"tf_$i")) :+ col("dl") :+
        TextAnalysis.bm25ScoreExpr(idx, k1, b, idfMode).as("score"): _*)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
