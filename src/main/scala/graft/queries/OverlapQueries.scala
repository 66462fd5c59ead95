package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Overlap
import ParityQueries.t

/** KMV corpus-overlap sketches as driver queries: per-source distinct
  * 3-shingle vocabularies sketched with k minimum values, then distinct
  * counts and pairwise source overlap estimated FROM THE SKETCHES
  * ALONE — the planning pass that decides which source pairs are worth
  * a cross-dedup join at 100 TB, at k·#sources longs of state.
  *
  * Everything here is oracle-checked: the sketch content is the k
  * smallest affine-mixed PolyFp fingerprints (identical integer
  * arithmetic in DuckDB), and the estimators are integer / exact-ratio
  * arithmetic on it. The accuracy gate is Spark-side (estimate vs the
  * corpus's own exact distinct count) with an empty-set oracle.
  */
object OverlapQueries {

  private val K = 64

  /** (source, shingle) with multiplicity — the sketch aggregate
    * dedupes internally.
    */
  private def shingles(s: SparkSession, d: String): DataFrame = {
    val shs = org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.ShinglesExpr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(col("text")), 3))
    t(s, d, "documents").select(col("source"), explode(shs).as("shingle"))
  }

  private def sketches(s: SparkSession, d: String): DataFrame =
    Overlap.kmvSketch(shingles(s, d), col("source"), col("shingle"), K)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-source distinct-shingle estimates from the k = 64 sketch:
    // n_seen = sketch occupancy, dhat = exact when unsaturated else
    // the KMV integer estimator.
    "x_kmv_distinct" -> ((s, d) =>
      Overlap.kmvDistinct(sketches(s, d), K)
        .select(col("grp").as("source"), col("n_seen"), col("dhat"))
        .orderBy(col("source"))),

    // Pairwise source overlap from sketches alone: union-sketch
    // occupancy, match count, union distinct estimate, Jaccard and
    // intersection estimates — #sources² planning rows.
    "x_kmv_overlap" -> ((s, d) =>
      Overlap.kmvOverlap(sketches(s, d), K)
        .select(col("ga"), col("gb"), col("ku"), col("matches"),
          col("dhat_u"), col("jac_est"), col("inter_est"))
        .orderBy(col("ga"), col("gb"))),

    // Incremental sketch maintenance: the history slice's sketches
    // persist ONCE (ArtifactMemo — bench reruns measure the read+fold
    // path); a batch's sketches fold in via the merge semigroup, and
    // the refreshed estimates must equal the from-scratch fit over the
    // WHOLE corpus — the oracle computes exactly that (merge ≡ whole
    // is the spec-pinned law; here the driver hash-checks it through a
    // real persisted artifact). History is never re-shingled: per
    // refresh the cost is one batch pass + a k·#sources-long merge.
    "x_kmv_incremental" -> ((s, d) => {
      def slice(s2: SparkSession, hist: Boolean) = {
        val shs = org.apache.spark.sql.GraftSqlBridge.toColumn(
          graft.functions.ShinglesExpr(
            org.apache.spark.sql.GraftSqlBridge
              .toExpression(col("text")), 3))
        t(s2, d, "documents")
          .where(if (hist) col("doc_id") < 400 else col("doc_id") >= 400)
          .select(col("source"), explode(shs).as("shingle"))
      }
      val store = ArtifactMemo.dirFor("kmvstore", d) { p =>
        Overlap.kmvSketch(slice(s, hist = true),
            col("source"), col("shingle"), K)
          .write.mode("overwrite").parquet(p)
      }
      val batch = Overlap.kmvSketch(slice(s, hist = false),
        col("source"), col("shingle"), K)
      Overlap.kmvDistinct(
          Overlap.kmvMerge(s.read.parquet(store), batch, K), K)
        .select(col("grp").as("source"), col("n_seen"), col("dhat"))
        .orderBy(col("source"))
    }),

    // Batch containment/novelty vs history, from sketches alone: the
    // per-ingest signal that decides whether a batch is worth full
    // dedup against the store — cont_est = |hist ∩ batch| / |batch|,
    // novelty = 1 − cont_est, all integer / exact-ratio arithmetic on
    // the two sketch tables (hash-green). History sketches come from
    // the SAME persisted artifact x_kmv_incremental maintains.
    "x_kmv_novelty" -> ((s, d) => {
      def slice(hist: Boolean) = {
        val shs = org.apache.spark.sql.GraftSqlBridge.toColumn(
          graft.functions.ShinglesExpr(
            org.apache.spark.sql.GraftSqlBridge
              .toExpression(col("text")), 3))
        t(s, d, "documents")
          .where(if (hist) col("doc_id") < 400 else col("doc_id") >= 400)
          .select(col("source"), explode(shs).as("shingle"))
      }
      val store = ArtifactMemo.dirFor("kmvstore", d) { p =>
        Overlap.kmvSketch(slice(hist = true),
            col("source"), col("shingle"), K)
          .write.mode("overwrite").parquet(p)
      }
      Overlap.kmvContainment(s.read.parquet(store),
          Overlap.kmvSketch(slice(hist = false),
            col("source"), col("shingle"), K), K)
        .select(col("grp").as("source"), col("ku"), col("matches"),
          col("dhat_u"), col("dhat_b"), col("cont_est"), col("novelty"))
        .orderBy(col("source"))
    }),

    // KMV RETRACTION: min-k sketches cannot subtract (the deleted
    // values' replacements were discarded at sketch time), so the
    // retractable store keeps PER-DOCUMENT sketches — the finest
    // granularity — and a takedown (doc_id % 13 = 2, SF-invariant,
    // cutting across both appends) is a tombstone the group fold
    // anti-joins: the merge-semigroup law makes the folded survivor
    // sketch BIT-IDENTICAL to sketching the surviving corpus from
    // scratch (the oracle computes exactly that), with zero staleness
    // and zero corpus re-reads. An OPTIMIZE drops the rows physically
    // and clears the tombstones; estimates must be unchanged.
    "x_kmv_delete" -> ((s, d) => {
      def slice(pred: org.apache.spark.sql.Column) = {
        val shs = org.apache.spark.sql.GraftSqlBridge.toColumn(
          graft.functions.ShinglesExpr(
            org.apache.spark.sql.GraftSqlBridge
              .toExpression(col("text")), 3))
        t(s, d, "documents").where(pred)
          .select(col("source"), col("doc_id"),
            explode(shs).as("shingle"))
      }
      val store = ArtifactMemo.dirFor("kmvdelstore", d) { p =>
        Overlap.writeKmvUnitStore(slice(col("doc_id") % 2 === 0),
          col("source"), col("doc_id"), col("shingle"), K, p)
        Overlap.appendKmvUnitSketches(slice(col("doc_id") % 2 === 1),
          col("source"), col("doc_id"), col("shingle"), K, p,
          batchId = 1L)
        Overlap.deleteKmvUnits(
          t(s, d, "documents").where(col("doc_id") % 13 === 2)
            .select(col("doc_id").as("unit")), p, batchId = 2L)
        Overlap.compactKmvUnitStore(s, p): Unit
      }
      Overlap.kmvDistinct(Overlap.kmvStoreSketches(s, store, K), K)
        .select(col("grp").as("source"), col("n_seen"), col("dhat"))
        .orderBy(col("source"))
    }),

    // Accuracy gate (empty-set oracle, integer-exact): fires when any
    // source's KMV estimate misses its exact distinct-shingle count by
    // more than 50% relative — ~4 standard errors at k = 64 (12.7%);
    // measured max per-source error is 14-21% across SFs.
    "x_kmv_err" -> ((s, d) => {
      val exact = shingles(s, d)
        .select(col("source"), Overlap.kmvHash(col("shingle")).as("fp"))
        .groupBy(col("source"))
        .agg(countDistinct(col("fp")).as("d_exact"))
      Overlap.kmvDistinct(sketches(s, d), K)
        .select(col("grp").as("source"), col("dhat"))
        .join(exact, Seq("source"))
        .where(abs(col("dhat") - col("d_exact")) * 2 > col("d_exact"))
        .select(col("source"), col("dhat"), col("d_exact"))
        .orderBy(col("source"))
    })
  )

  /** The affine-mixed PolyFp KMV hash of a shingle, in DuckDB. */
  private val fpSql =
    """(list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(shingle, ''),
      |        c -> CAST(unicode(c) AS BIGINT))),
      |    (h, c) -> (h * 31 + c) % 1000000007)
      |  * 1103515245 + 12345) % 1000000007""".stripMargin

  /** Shared prefix: per-source distinct shingle hashes and the k = 64
    * KMV sketch list per source.
    */
  private def sketchCte(docFilter: String, p: String = ""): String =
    s"""${p}toks AS (
      |  SELECT doc_id, source,
      |    CAST(generate_subscripts(string_split(text,' '),1) AS INT) AS pos,
      |    unnest(string_split(text,' ')) AS tok
      |  FROM documents WHERE $docFilter
      |), ${p}shg AS (
      |  SELECT source,
      |    tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w
      |      AS shingle
      |  FROM ${p}toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      |), ${p}fps AS (
      |  SELECT DISTINCT source, $fpSql AS fp
      |  FROM ${p}shg WHERE shingle IS NOT NULL
      |), ${p}ranked AS (
      |  SELECT source, fp,
      |    row_number() OVER (PARTITION BY source ORDER BY fp) AS rn
      |  FROM ${p}fps
      |), ${p}sk AS (
      |  SELECT source, list(fp ORDER BY fp) AS sketch
      |  FROM ${p}ranked WHERE rn <= $K GROUP BY source
      |)""".stripMargin

  private val sketchSql = "WITH " + sketchCte("TRUE")

  val oracleSql: Map[String, String] = Map(
    "x_kmv_distinct" ->
      s"""$sketchSql
        |SELECT source, len(sketch) AS n_seen,
        |  CASE WHEN len(sketch) < $K THEN len(sketch)
        |       ELSE (${K - 1} * CAST(1000000007 AS BIGINT)) // sketch[$K] END AS dhat
        |FROM sk ORDER BY source""".stripMargin,
    // merge ≡ whole: the oracle is simply the from-scratch sketch
    // estimate over the full corpus (same SQL as x_kmv_distinct)
    "x_kmv_incremental" ->
      s"""$sketchSql
        |SELECT source, len(sketch) AS n_seen,
        |  CASE WHEN len(sketch) < $K THEN len(sketch)
        |       ELSE (${K - 1} * CAST(1000000007 AS BIGINT)) // sketch[$K] END AS dhat
        |FROM sk ORDER BY source""".stripMargin,
    "x_kmv_overlap" ->
      s"""$sketchSql, pairs AS (
        |  SELECT a.source AS ga, b.source AS gb,
        |    a.sketch AS sa, b.sketch AS sb,
        |    (list_sort(list_distinct(a.sketch || b.sketch)))[1:$K]
        |      AS ku_arr
        |  FROM sk a JOIN sk b ON a.source < b.source
        |)
        |SELECT ga, gb, len(ku_arr) AS ku,
        |  len(list_filter(ku_arr,
        |    x -> list_contains(sa, x) AND list_contains(sb, x)))
        |    AS matches,
        |  CASE WHEN len(ku_arr) < $K THEN len(ku_arr)
        |       ELSE (${K - 1} * CAST(1000000007 AS BIGINT)) // ku_arr[$K] END AS dhat_u,
        |  CAST(len(list_filter(ku_arr,
        |    x -> list_contains(sa, x) AND list_contains(sb, x)))
        |    AS DOUBLE) / len(ku_arr) AS jac_est,
        |  len(list_filter(ku_arr,
        |    x -> list_contains(sa, x) AND list_contains(sb, x)))
        |    * (CASE WHEN len(ku_arr) < $K THEN len(ku_arr)
        |            ELSE (${K - 1} * CAST(1000000007 AS BIGINT)) // ku_arr[$K] END)
        |    // len(ku_arr) AS inter_est
        |FROM pairs ORDER BY ga, gb""".stripMargin,
    // two sketch CTE blocks (history / batch slices) + the same
    // integer containment arithmetic as Overlap.kmvContainment
    "x_kmv_novelty" ->
      (s"""WITH ${sketchCte("doc_id < 400", "h_")},
        |${sketchCte("doc_id >= 400", "b_")},
        |paired AS (
        |  SELECT h.source, h.sketch AS sa, b.sketch AS sb,
        |    (list_sort(list_distinct(h.sketch || b.sketch)))[1:$K]
        |      AS ku_arr
        |  FROM h_sk h JOIN b_sk b ON h.source = b.source
        |), est AS (
        |  SELECT source,
        |    len(ku_arr) AS ku,
        |    len(list_filter(ku_arr,
        |      x -> list_contains(sa, x) AND list_contains(sb, x)))
        |      AS matches,
        |    CASE WHEN len(ku_arr) < $K THEN len(ku_arr)
        |         ELSE (${K - 1} * CAST(1000000007 AS BIGINT))
        |           // ku_arr[$K] END AS dhat_u,
        |    CASE WHEN len(sb) < $K THEN len(sb)
        |         ELSE (${K - 1} * CAST(1000000007 AS BIGINT))
        |           // sb[$K] END AS dhat_b
        |  FROM paired
        |)
        |SELECT source, ku, matches, dhat_u, dhat_b,
        |  LEAST(1.0,
        |    CAST(matches AS DOUBLE) * dhat_u / (CAST(ku AS DOUBLE) * dhat_b))
        |    AS cont_est,
        |  1.0 - LEAST(1.0, CAST(matches AS DOUBLE) * dhat_u /
        |    (CAST(ku AS DOUBLE) * dhat_b)) AS novelty
        |FROM est ORDER BY source""".stripMargin),
    "x_kmv_err" ->
      """SELECT source, CAST(0 AS BIGINT) AS dhat,
        |  CAST(0 AS BIGINT) AS d_exact
        |FROM documents WHERE 1 = 0""".stripMargin,
    // retraction ≡ from-scratch over survivors: the semigroup re-fold
    // of surviving per-doc sketches must equal sketching the kept
    // corpus directly
    "x_kmv_delete" ->
      ("WITH " + sketchCte("doc_id % 13 <> 2") + s"""
        |SELECT source, len(sketch) AS n_seen,
        |  CASE WHEN len(sketch) < $K THEN len(sketch)
        |       ELSE (${K - 1} * CAST(1000000007 AS BIGINT)) // sketch[$K] END AS dhat
        |FROM sk ORDER BY source""".stripMargin)
  )
}
