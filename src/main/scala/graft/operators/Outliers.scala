package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median / MAD (median absolute
  * deviation — Hampel 1974, the robust dispersion estimator that
  * tolerates up to 50% contamination, unlike mean/stddev z-scores
  * which the outliers themselves inflate) over integer-valued metrics.
  * The corpus-curation use: flag documents whose length / token count
  * / score is wildly atypical FOR THEIR GROUP (source, language) —
  * truncated crawls, concatenation blowups, spam — without a
  * distribution assumption.
  *
  * Determinism: medians are DISCRETE lower medians — the value at
  * 0-based rank (n−1) div 2 in (value, tiebreak-key) order — so every
  * number in the output is a stored value or an integer |x − med|,
  * never an interpolated float; the whole result hash-matches a
  * row_number-CTE SQL mirror (the x_outlier_mad oracle).
  *
  * Scale shape: groups are FEW by this operator's premise (sources,
  * languages), so a `Window.partitionBy(group)` rank would funnel each
  * group through one reducer — the defect class stratifiedEveryK
  * cleared. Ranks come instead from the range-partitioned distributed
  * prefix sum ([[Training.withPrefixSum]]): two ranked passes (values,
  * then deviations), each one range shuffle; everything else is
  * O(#groups) aggregates broadcast back. No window anywhere.
  */
object Outliers {

  /** Rows of `df` whose `|value − median|` exceeds `k × MAD` within
    * their `group`, annotated with the group's `med`, `mad`, and the
    * row's `dev`. `value` must be integer-valued (cast to long); `key`
    * columns are the deterministic tiebreak (unique per row). Groups
    * with MAD = 0 (over half the rows at the median) flag every
    * off-median row — the documented Hampel-filter degenerate case,
    * still deterministic.
    */
  def madOutliers(df: DataFrame, group: Column, value: Column,
                  key: Seq[Column], k: Long): DataFrame = {
    require(k >= 0, "k must be >= 0")
    withMadStats(df, group, value, key)
      .where(col("dev") > col("mad") * k)
      .drop("__g", "__x")
  }

  /** Winsorization through the same machinery: every row annotated
    * with its group's med/mad/dev plus `clipped` — the value clamped
    * to [med − k·mad, med + k·mad]. The curation shape for metrics
    * that feed downstream arithmetic (sampling weights, quality
    * priors) where dropping rows is too blunt but a single truncated
    * crawl must not drag a source's mean. Integer in, integer out.
    */
  def madClip(df: DataFrame, group: Column, value: Column,
              key: Seq[Column], k: Long): DataFrame = {
    require(k >= 0, "k must be >= 0")
    withMadStats(df, group, value, key)
      .withColumn("clipped",
        greatest(least(col("__x"), col("med") + col("mad") * k),
          col("med") - col("mad") * k))
      .drop("__g", "__x")
  }

  /** EXACT per-group discrete quantiles, window-free: for each q in
    * `qs`, the smallest group value whose cumulative distribution
    * reaches q (the PERCENTILE_DISC definition — 1-based rank
    * ceil(q·n)), recovered from ONE distributed prefix-sum ranking
    * plus O(#groups) broadcast aggregates. The exact-quantile
    * counterpart of the approx-sketch gates: at 100 TB a per-group
    * sort window funnels each group through one reducer and
    * interpolated percentiles stop being oracle-exact; discrete ranks
    * over the range-partitioned global order give bit-exact stored
    * values with one data shuffle.
    *
    * Returns (group, q, value) — one row per (group, quantile).
    */
  def discreteQuantiles(df: DataFrame, group: Column, value: Column,
                        key: Seq[Column], qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    val spark = df.sparkSession
    val base = df.withColumn("__g", group)
      .withColumn("__x", value.cast("long"))
    val order = col("__g") +: col("__x") +: key
    val ranked = Training.withPrefixSum(base, order, lit(1L), "__gpos")
    val stats = ranked.groupBy(col("__g").as("__s"))
      .agg(min(col("__gpos")).as("__off"), count(lit(1)).as("__n"))
    import spark.implicits._
    val qdf = qs.toDF("q")
    // 1-based in-group rank = ceil(q·n): the same double multiply +
    // ceil on both engines (n exact below 2^53), so the rank integer
    // — and therefore the emitted stored value — is bit-deterministic
    ranked
      .join(broadcast(stats), col("__g") <=> col("__s"))
      .crossJoin(broadcast(qdf))
      .where(col("__gpos") - col("__off") + 1 ===
        ceil(col("q") * col("__n")).cast("long"))
      .select(col("__g").as("group"), col("q"), col("__x").as("value"))
  }

  /** Every row of `df` + (med, mad, dev) for its group — the shared
    * two-prefix-sum core of [[madOutliers]] and [[madClip]]. Keeps the
    * internal __g/__x columns for the caller's final projection.
    */
  private def withMadStats(df: DataFrame, group: Column, value: Column,
                           key: Seq[Column]): DataFrame = {
    val base = df.withColumn("__g", group)
      .withColumn("__x", value.cast("long"))
    val order = col("__g") +: col("__x") +: key
    val ranked = Training.withPrefixSum(base, order, lit(1L), "__gpos")
    val stats = ranked.groupBy(col("__g").as("__s"))
      .agg(min(col("__gpos")).as("__off"), count(lit(1)).as("__n"))
    // lower median: the unique row at 0-based in-group rank (n−1) div 2
    val med = ranked
      .join(broadcast(stats), col("__g") <=> col("__s"))
      .where(col("__gpos") - col("__off") === expr("(__n - 1) div 2"))
      .select(col("__s").as("__sm"), col("__x").as("med"))
    val withDev = ranked.drop("__gpos")
      .join(broadcast(med), col("__g") <=> col("__sm"))
      .withColumn("dev", abs(col("__x") - col("med")))
      .drop("__sm")
    val devOrder = col("__g") +: col("dev") +: key
    val ranked2 =
      Training.withPrefixSum(withDev, devOrder, lit(1L), "__dpos")
    // __off/`stats` are reusable for the deviation pass: both prefix
    // sums lead with __g, so group blocks are contiguous, identically
    // ordered, and identically sized — each group STARTS at the same
    // global position in both rankings.
    val mad = ranked2
      .join(broadcast(stats), col("__g") <=> col("__s"))
      .where(col("__dpos") - col("__off") === expr("(__n - 1) div 2"))
      .select(col("__s").as("__sm"), col("dev").as("mad"))
    ranked2.drop("__dpos")
      .join(broadcast(mad), col("__g") <=> col("__sm"))
      .drop("__sm")
  }
}
