package graft

import graft.queries.{ExtensionQueries, ParityQueries}

/** Smoke: every declared query runs at sf0.001 and yields rows; every
  * oracle key points at a real query. (Value-level parity is the driver's
  * DuckDB gate, pre-checked by tools/check_oracle.py.)
  */
class QueriesSpec extends SparkSuite {

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries whose contract is an EMPTY result (accuracy gates: the
    * oracle is the empty set, any row = violation).
    */
  private val expectEmpty =
    Set("x_approx_distinct_err", "r_approx_pct_err", "x_ann_recall_err",
      "x_embed_recall_err", "x_ivf_recall_err", "x_ivf_q8_recall_err",
      "x_ivf_pq_recall_err", "x_pq_drift_err", "x_cms_err",
      "x_quality_gate_approx_err",
      "x_hybrid_rrf_err", "x_quantile_err", "x_semdedup_drop_err",
      "x_semdedup_recall_err", "x_kmv_err", "x_pca_err",
      "x_maxsim_ivf_err")

  SparkEntry.queries.foreach { case (name, fn) =>
    if (expectEmpty(name))
      test(s"$name runs and returns no violations at sf0.001") {
        assert(fn(spark, sf0001).count() == 0)
      }
    else
      test(s"$name runs and returns rows at sf0.001") {
        assert(fn(spark, sf0001).count() > 0)
      }
  }
}
