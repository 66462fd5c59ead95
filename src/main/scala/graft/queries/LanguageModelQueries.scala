package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.LanguageModel
import ParityQueries.t

/** Bigram language-model quality scoring (CCNet-style perplexity
  * filtering), oracle-checked on the quantized-log arm — counts, PolyFp
  * keys, and qlog3 terms are 64-bit integer arithmetic both engines
  * compute identically ([[graft.operators.LanguageModel]]).
  *
  * Fixture roles: train = documents with doc_id % 7 ≠ 0 (the trusted
  * slice the LM is fitted on); score = the held-out doc_id % 7 = 0
  * docs (the corpus being priced). The incremental split fits history
  * (doc_id < 350) into a persisted model and folds the rest of the
  * train slice in via [[graft.operators.LanguageModel.refreshModel]] —
  * the oracle refits from scratch, so hash-green IS the
  * refresh ≡ from-scratch claim, driver-checked through a real
  * artifact.
  */
object LanguageModelQueries {

  /** Rational mean-qlog3 floor for the quality filter: score/n ≥
    * −73/5 = −14.6. qlog3 ≈ 3·log2, so this is "average bigram no
    * less likely than ~2^−4.9 under the fitted model" — splits the
    * held-out fixture near its median into a proper subset.
    */
  private val MinAvgNum = -73L
  private val MinAvgDen = 5L

  private def trainFeats(s: SparkSession, d: String): DataFrame =
    LanguageModel.lmFeatures(
      t(s, d, "documents").where(col("doc_id") % 7 =!= 0),
      col("doc_id"), col("text"))

  private def heldOut(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").where(col("doc_id") % 7 === 0)

  private def modelPath(s: SparkSession, d: String): String =
    ArtifactMemo.dirFor("lmmodel", d) { p =>
      LanguageModel.saveModel(
        LanguageModel.lmModel(
          LanguageModel.lmFeatures(
            t(s, d, "documents")
              .where(col("doc_id") % 7 =!= 0 && col("doc_id") < 350),
            col("doc_id"), col("text"))), p)
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the fitted model itself: context (kind 1) + bigram (kind 2)
    // counts on 8-byte PolyFp keys — the persistable artifact
    "x_lm_model" -> ((s, d) =>
      LanguageModel.lmModel(trainFeats(s, d))
        .orderBy(col("kind"), col("h"))),

    // per-held-out-doc integer LM score: (n_bigrams, Σ qlog3 terms)
    "x_lm_score" -> ((s, d) =>
      LanguageModel.lmScoreQuantized(heldOut(s, d), col("doc_id"),
          col("text"), LanguageModel.lmModel(trainFeats(s, d)))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))),

    // the quality gate: held-out docs whose mean bigram score clears
    // the floor (multiplicative compare — no integer division)
    "x_lm_quality" -> ((s, d) =>
      LanguageModel.lmQualityFilter(
          LanguageModel.lmScoreQuantized(heldOut(s, d), col("doc_id"),
            col("text"), LanguageModel.lmModel(trainFeats(s, d))),
          MinAvgNum, MinAvgDen)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))),

    // persisted-model refresh: history model (doc_id < 350, a real
    // parquet artifact) + the rest of the train slice folded in —
    // scored held-out docs must hash-match the from-scratch oracle
    "x_lm_incremental" -> ((s, d) => {
      val stored = LanguageModel.loadModel(s, modelPath(s, d))
      val batch = LanguageModel.lmFeatures(
        t(s, d, "documents")
          .where(col("doc_id") % 7 =!= 0 && col("doc_id") >= 350),
        col("doc_id"), col("text"))
      LanguageModel.lmScoreQuantized(heldOut(s, d), col("doc_id"),
          col("text"), LanguageModel.refreshModel(stored, batch))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // LM-model RETRACTION (right-to-be-forgotten for the quality
    // model): a takedown slice of the TRAIN corpus (doc_id % 5 = 2,
    // SF-invariant) subtracts from the fitted count model — integer
    // monoid, zeroed rows drop — and the held-out docs re-score under
    // the retracted model. The oracle refits from scratch over the
    // surviving train slice, so hash-green IS the subtraction ≡
    // from-scratch claim.
    "x_lm_delete" -> ((s, d) => {
      val doomed = LanguageModel.lmFeatures(
        t(s, d, "documents")
          .where(col("doc_id") % 7 =!= 0 && col("doc_id") % 5 === 2),
        col("doc_id"), col("text"))
      LanguageModel.lmScoreQuantized(heldOut(s, d), col("doc_id"),
          col("text"),
          LanguageModel.retractModel(
            LanguageModel.lmModel(trainFeats(s, d)), doomed))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    })
  )

  // ---- DuckDB oracle ----------------------------------------------

  /** PolyFp of a string expression: left fold (h*31 + codepoint) mod
    * 1e9+7 — [[graft.functions.PolyFingerprintExpr]] in SQL.
    */
  private def ph(x: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($x, ''),
       |      c -> CAST(unicode(c) AS BIGINT))),
       |  (h, c) -> (h * 31 + c) % 1000000007)""".stripMargin

  private def qlog(v: String): String =
    s"(length(bin(least($v, 2097151) * least($v, 2097151) * " +
      s"least($v, 2097151))) - 1)"

  /** Shared CTEs: bigram features over all documents, the train-slice
    * model (uni = context counts, big = bigram counts), and the
    * context-vocabulary size V.
    */
  private def lmCtes: String = lmCtesTrain("doc_id % 7 <> 0")

  /** [[lmCtes]] with a parameterized TRAIN-slice membership predicate
    * — the retraction oracle refits over survivors only.
    */
  private def lmCtesTrain(trainPred: String): String =
    s"""tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), grams AS (
       |  SELECT doc_id,
       |    list_extract(t, i) || ' ' ||
       |      list_extract(t, CAST(i + 1 AS INT)) AS g,
       |    list_extract(t, i) AS w1
       |  FROM tok, unnest(range(1, len(t))) AS u(i)
       |), feats AS (
       |  SELECT doc_id, ${ph("g")} AS hg, ${ph("w1")} AS h1 FROM grams
       |), tfeats AS (
       |  SELECT * FROM feats WHERE $trainPred
       |), uni AS (
       |  SELECT h1 AS h, CAST(count(*) AS BIGINT) AS c1
       |  FROM tfeats GROUP BY 1
       |), big AS (
       |  SELECT hg AS h, CAST(count(*) AS BIGINT) AS c2
       |  FROM tfeats GROUP BY 1
       |), vv AS (SELECT CAST(count(*) AS BIGINT) AS V FROM uni)""".stripMargin

  private def scoredSql: String =
    s"""WITH $lmCtes, scored AS (
       |  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(${qlog("COALESCE(c2, 0) + 1")} -
       |      ${qlog("COALESCE(c1, 0) + V")}) AS BIGINT) AS score
       |  FROM feats f
       |  LEFT JOIN big ON f.hg = big.h
       |  LEFT JOIN uni ON f.h1 = uni.h
       |  CROSS JOIN vv
       |  WHERE f.doc_id % 7 = 0
       |  GROUP BY f.doc_id
       |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "x_lm_model" ->
      s"""WITH $lmCtes
         |SELECT h, CAST(1 AS INT) AS kind, c1 AS cnt FROM uni
         |UNION ALL
         |SELECT h, CAST(2 AS INT) AS kind, c2 AS cnt FROM big
         |ORDER BY kind, h""".stripMargin,
    "x_lm_score" ->
      (scoredSql +
        "\nSELECT doc_id, n_bigrams, score FROM scored ORDER BY doc_id"),
    "x_lm_quality" ->
      (scoredSql + s"""
         |SELECT doc_id, n_bigrams, score FROM scored
         |WHERE score * $MinAvgDen >= $MinAvgNum * n_bigrams
         |ORDER BY doc_id""".stripMargin),
    // refresh ≡ from-scratch: the oracle refits over the WHOLE train
    // slice; the Spark side goes through the persisted history model
    "x_lm_incremental" ->
      (scoredSql +
        "\nSELECT doc_id, n_bigrams, score FROM scored ORDER BY doc_id"),
    // retraction ≡ from-scratch over the SURVIVING train slice
    "x_lm_delete" ->
      (s"""WITH ${lmCtesTrain("doc_id % 7 <> 0 AND doc_id % 5 <> 2")},
         | scored AS (
         |  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(${qlog("COALESCE(c2, 0) + 1")} -
         |      ${qlog("COALESCE(c1, 0) + V")}) AS BIGINT) AS score
         |  FROM feats f
         |  LEFT JOIN big ON f.hg = big.h
         |  LEFT JOIN uni ON f.h1 = uni.h
         |  CROSS JOIN vv
         |  WHERE f.doc_id % 7 = 0
         |  GROUP BY f.doc_id
         |)
         |SELECT doc_id, n_bigrams, score FROM scored
         |ORDER BY doc_id""".stripMargin)
  )
}
