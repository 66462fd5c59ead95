package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import graft.functions.ShinglesExpr
import graft.operators.TextAnalysis.fingerprint

/** Data selection via importance resampling (DSIR, Xie et al. 2023):
  * pick raw-corpus documents whose hashed n-gram distribution looks
  * like a small high-quality TARGET corpus, by importance weight
  * under bag-of-hashed-n-grams unigram models of target vs raw.
  *
  * Pipeline shape, and why it scales to 100 TB:
  *
  *  1. **Featurize** ([[dsirFeatures]]): word unigrams + bigrams →
  *     polynomial fingerprint → bucket id mod B. Narrow map + explode;
  *     the feature space is a FIXED B (hashing trick), not a vocab.
  *  2. **Fit** ([[dsirBucketTable]]): bucket count tables for target
  *     and raw — two map-side-combined aggregations whose result is
  *     AT MOST B rows each, merged with one outer join. The "model"
  *     is a ≤B-row table regardless of corpus size.
  *  3. **Score** ([[dsirQuantizedScores]] / [[dsirLogWeights]]): the
  *     corpus's exploded features join the BROADCAST bucket table
  *     (bounded by B, never data-sized) and sum per document — one
  *     shuffle, map-side combined, fixed-width rows.
  *  4. **Select**: top-k by weight ([[dsirTopK]], TakeOrdered — heap
  *     per partition, k-row driver merge) or Gumbel-top-k resampling
  *     ([[dsirGumbelTopK]]) for the paper's sampled selection, with
  *     deterministic content-hash Gumbel noise — reproducible
  *     run-over-run, no rand().
  *
  * Two scoring arms, one semantics:
  *
  *  - **Quantized-log arm** (oracle-checked bit-for-bit): per-feature
  *    log-ratio quantized to floor(3·log2 v)/3-bit resolution via
  *    `length(bin(min(v, 2^21-1)^3)) - 1` — pure 64-bit integer
  *    arithmetic both engines compute identically (the cube of the
  *    2^21-1 clamp is the largest BIGINT-safe power; buckets more
  *    frequent than that saturate, which only flattens boilerplate).
  *  - **ln arm** (production): exact `ln((t_f+α)/(T+αB)) −
  *    ln((r_f+α)/(R+αB))` importance weights in doubles, with the
  *    Gumbel resampling the paper uses. Spec-checked for rank
  *    agreement against the quantized arm; not oracle-hashed
  *    (transcendental libm values differ across engines in the last
  *    ulp — the same adjudication as BM25's ln-idf arm).
  */
object Selection {

  /** Largest v with v³ < 2^63: clamp for the quantized-log cube. */
  val QlogClamp = 2097151L

  private def shingles(text: Column, n: Int): Column =
    toColumn(ShinglesExpr(toExpression(text), n))

  /** floor(log2(min(v, 2^21-1)^3)) for v >= 1 — the quantized log,
    * identical integer arithmetic in Spark and DuckDB (`bin()` length).
    */
  def qlog3(v: Column): Column = {
    val c = least(v, lit(QlogClamp))
    (length(bin(c * c * c)) - 1).cast("long")
  }

  /** Hashed bag-of-n-grams features: (id, f) with one row per word
    * unigram AND bigram occurrence, f = polyFingerprint(gram) mod
    * `buckets`. Multiplicity kept (bag, not set).
    */
  def dsirFeatures(df: DataFrame, id: Column, text: Column,
                   buckets: Int): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    df.select(id.as("id"),
        explode(concat(shingles(text, 1), shingles(text, 2))).as("g"))
      .select(col("id"), pmod(fingerprint(col("g")), lit(buckets.toLong))
        .as("f"))
  }

  /** The fitted "model": per-bucket occurrence counts in the target
    * and raw corpora, outer-merged — at most `buckets` rows. Stage it
    * ([[Checkpoints.stage]]) so both scoring passes reuse one fit.
    */
  def dsirBucketTable(rawFeats: DataFrame, targetFeats: DataFrame)
      : DataFrame = {
    val tc = targetFeats.groupBy(col("f")).agg(count(lit(1)).as("tcnt"))
    val rc = rawFeats.groupBy(col("f")).agg(count(lit(1)).as("rcnt"))
    tc.join(rc, Seq("f"), "full_outer")
      .select(col("f"), coalesce(col("tcnt"), lit(0L)).as("tcnt"),
        coalesce(col("rcnt"), lit(0L)).as("rcnt"))
  }

  /** Integer importance score per document (quantized-log arm):
    * Σ_f n_f · (qlog3(t_f+1) − qlog3(r_f+1)). The bucket table rides a
    * broadcast (≤ B rows); the only shuffle is the per-document sum.
    */
  def dsirQuantizedScores(feats: DataFrame, bucketTable: DataFrame)
      : DataFrame =
    feats.join(broadcast(bucketTable), Seq("f"))
      .groupBy(col("id"))
      .agg(sum(qlog3(col("tcnt") + 1) - qlog3(col("rcnt") + 1))
        .as("score"))

  /** Exact ln-arm importance log-weights (production):
    * log w(x) = Σ_f n_f·[ln(t_f+α) − ln(r_f+α)] + n(x)·[ln(R+αB) −
    * ln(T+αB)] — the per-document log-likelihood ratio of the two
    * smoothed hashed-unigram models. Same broadcast-join shape as the
    * quantized arm, plus a 1-row totals broadcast.
    */
  def dsirLogWeights(feats: DataFrame, bucketTable: DataFrame,
                     buckets: Int, alpha: Double = 1.0): DataFrame = {
    val totals = bucketTable
      .agg(sum(col("tcnt")).as("T"), sum(col("rcnt")).as("R"))
    val corr = log(col("R") + alpha * buckets) -
      log(col("T") + alpha * buckets)
    feats.join(broadcast(bucketTable), Seq("f"))
      .groupBy(col("id"))
      .agg(sum(log(col("tcnt") + alpha) - log(col("rcnt") + alpha))
        .as("__s"), count(lit(1)).as("__n"))
      .crossJoin(broadcast(totals))
      .select(col("id"), (col("__s") + col("__n") * corr).as("logw"))
  }

  /** Persist a fitted bucket table (≤ B rows — a TINY artifact
    * regardless of corpus size; the DSIR analog of
    * [[Similarity.saveCentroids]]).
    */
  def saveBucketTable(bucketTable: DataFrame, path: String): Unit =
    bucketTable.coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  def loadBucketTable(spark: org.apache.spark.sql.SparkSession,
                      path: String): DataFrame =
    spark.read.parquet(path)

  /** Incremental model refresh: bucket counts are an additive monoid,
    * so a new raw-corpus batch folds into a persisted table by
    * summing per-bucket counts — the history is NEVER re-featurized
    * or re-read beyond the ≤B-row table itself. The refreshed model
    * is bit-identical to a from-scratch fit over history ∪ batch
    * (spec-pinned), which is what licenses running it on a cadence at
    * 100 TB: per batch the cost is one batch-sized aggregation plus a
    * ≤B-row merge.
    */
  def refreshBucketTable(stored: DataFrame, newRawFeats: DataFrame)
      : DataFrame = {
    val delta = newRawFeats.groupBy(col("f"))
      .agg(count(lit(1)).as("rcnt"))
    stored.select(col("f"), col("tcnt"), col("rcnt"))
      .unionByName(delta.select(col("f"), lit(0L).as("tcnt"),
        col("rcnt")))
      .groupBy(col("f"))
      .agg(sum(col("tcnt")).as("tcnt"), sum(col("rcnt")).as("rcnt"))
  }

  /** RETRACTION for the additive DSIR model — the
    * right-to-be-forgotten path for the selection artifact: without
    * it, every future importance fit still weighs the deleted docs'
    * n-grams. Bucket counts are an additive monoid, so subtracting
    * the deleted RAW docs' per-bucket counts (one featurize pass over
    * the deleted docs — O(deleted), history never re-read) lands the
    * model BIT-EXACTLY on the surviving corpus, the
    * [[Similarity.deletePcaMoments]] negative-row protocol. Buckets
    * whose (tcnt, rcnt) both reach zero are dropped — a from-scratch
    * [[dsirBucketTable]] over survivors has no such rows, so the
    * retracted table is hash-identical to it (spec-pinned). The
    * caller owns idempotence (featurize each retracted doc exactly
    * once — the same ids-are-delete-once contract as every additive
    * store here); target-corpus docs retract by the symmetric tcnt
    * column if ever needed.
    */
  def retractBucketTable(stored: DataFrame, deletedRawFeats: DataFrame)
      : DataFrame = {
    val neg = deletedRawFeats.groupBy(col("f"))
      .agg((-count(lit(1))).as("rcnt"))
      .select(col("f"), lit(0L).as("tcnt"), col("rcnt"))
    stored.select(col("f"), col("tcnt"), col("rcnt"))
      .unionByName(neg)
      .groupBy(col("f"))
      .agg(sum(col("tcnt")).as("tcnt"), sum(col("rcnt")).as("rcnt"))
      .where(col("tcnt") =!= 0L || col("rcnt") =!= 0L)
  }

  /** Deterministic top-k selection on a score column: (score DESC, id
    * ASC) — TakeOrdered, total order, bit-reproducible.
    */
  def dsirTopK(scores: DataFrame, k: Int): DataFrame =
    scores.orderBy(desc("score"), asc("id")).limit(k)

  /** Gumbel-top-k resampling (the paper's sampled selection): key =
    * logw/temperature − ln(−ln u) with u a deterministic content-hash
    * uniform in (0, 1) — fingerprint(content)+1 over Mod+1, seed-free
    * and reproducible on re-ingestion, no rand() in the plan.
    */
  def dsirGumbelTopK(weights: DataFrame, content: Column, k: Int,
                     temperature: Double = 1.0): DataFrame = {
    require(temperature > 0, "temperature must be > 0")
    val mod = graft.functions.PolyFp.Mod.toDouble
    val u = (fingerprint(content) + 1).cast("double") / (mod + 1.0)
    weights
      .withColumn("__key", col("logw") / temperature - log(-log(u)))
      .orderBy(desc("__key"), asc("id")).limit(k)
      .drop("__key")
  }
}
