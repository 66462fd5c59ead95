package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data preparation: global
  * prefix sums over a total order (the primitive), token-budget
  * packing, deterministic global shuffling, and stratified sampling.
  *
  * Scale design: a global prefix sum is the sequential-looking op that
  * DOES distribute — range-partition on the order key, cumsum within
  * each partition (parallel window, no global sort into one task), and
  * add per-partition offsets computed from the tiny (one row per
  * partition) totals table. A naive `Window.orderBy(key)` without
  * `partitionBy` funnels the whole dataset through a single task; this
  * implementation never does.
  */
object Training {

  /** Exclusive prefix sum of `value` over the total order `order`
    * (which MUST be unique — ties would make partition placement, and
    * thus the sum, ambiguous). Adds `out` = sum of `value` over all
    * rows strictly before this one.
    *
    * Two-phase: per-range-partition window cumsum + broadcast of the
    * per-partition totals' own prefix sum. The totals table has one row
    * per partition, so its global window is trivially cheap; everything
    * over the data itself is partition-parallel. `repartitionByRange`
    * samples boundaries with deterministic seeds, so the split — and
    * with a unique order key the result — is reproducible.
    */
  def withPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
                    out: String, parts: Int = 0): DataFrame = {
    val p =
      if (parts > 0) parts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(p, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // compute the range split once for both phases
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(value).as("__t"))
      .withColumn("__off", coalesce(
        sum(col("__t")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__pid"), col("__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offsets), "__pid")
      .withColumn(out,
        col("__off") + coalesce(sum(value).over(w), lit(0L)))
      .drop("__pid", "__off")
  }

  /** Contiguous token-budget packing: walk the corpus in `order` and
    * cut a new bin every `budget` tokens — bin k holds the rows whose
    * exclusive prefix token-sum lies in [k·budget, (k+1)·budget). The
    * standard sharding step before sequence packing: each bin is one
    * training shard of ~budget tokens, and bin assignment is a pure
    * function of the corpus + order (reproducible across reruns).
    */
  def packBins(df: DataFrame, order: Seq[Column], tokens: Column,
               budget: Long): DataFrame =
    withPrefixSum(df, order, tokens, "__cum")
      .withColumn("bin", expr(s"__cum div ${budget}L"))
      .drop("__cum")

  /** Deterministic global shuffle: order by a cryptographic hash of the
    * unique `key` (md5 — engine-independent, seed-free) and emit the
    * 0-based position. Training-data loaders want a reproducible random
    * order; hash-ordering gives exactly that with no RNG state, and the
    * position comes from the distributed prefix-count (no global
    * single-task sort).
    */
  def shuffleOrder(df: DataFrame, key: Column): DataFrame = {
    val hashed = df.withColumn("__sk", md5(key.cast("string").cast("binary")))
    withPrefixSum(hashed, Seq(col("__sk"), key), lit(1L), "pos")
      .drop("__sk")
  }

  /** Stratified 1-in-k sample: within each `stratum`, order rows by
    * (md5(key), key) — a deterministic shuffle — and keep the first
    * ceil(n/k). Integer-exact admission test ((rn−1)·k < n), no float
    * fractions. Every stratum keeps at least one row, so rare strata
    * (languages, sources) survive — the property plain `TABLESAMPLE`
    * does not give.
    */
  def stratifiedEveryK(df: DataFrame, stratum: Column, key: Column,
                       k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(stratum)
      .orderBy(md5(key.cast("string").cast("binary")), key)
    val cw = Window.partitionBy(stratum)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .where((col("__rn") - 1) * k < col("__n"))
      .drop("__rn", "__n")
  }
}
