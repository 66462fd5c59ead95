package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual tools for when AQE's
  * runtime skew-join splitting isn't available (first-stage aggregations,
  * pre-AQE plans, deterministic pipelines).
  *
  * Salting trades one shuffle for two balanced ones:
  *  - aggregation: add a random-ish salt to the grouping key, partially
  *    aggregate per (key, salt), then merge per key. The first shuffle
  *    spreads a hot key over `salts` reducers.
  *  - join: salt the skewed (large) side; EXPLODE the small side once per
  *    salt value so every (key, salt) pair still finds its match.
  *
  * The salt is `pmod(hash(entire row id cols), salts)` — deterministic
  * given the row, so re-runs produce identical partitioning (no
  * `rand()`, which breaks retry determinism and oracle checks).
  */
object Skew {

  /** Two-phase salted aggregation: sum-like aggregates only (the partial
    * merge must be associative). `aggs` maps output name → (partialAgg,
    * mergeAgg) builders over a column name.
    */
  def saltedSumCount(df: DataFrame, key: Column, saltSource: Column,
                     valueCol: Column, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Salted broadcast-style join for a skewed fact against a small dim:
    * fact rows get a deterministic salt in [0, salts); the dim is
    * replicated `salts` times via explode, then the join key is
    * (key, salt) — a hot fact key spreads across `salts` partitions.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String,
                 saltSource: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim,
      saltedFact(factKey) === repDim(dimKey) &&
        saltedFact("__salt") === repDim("__salt"))
      .drop("__salt")
  }
}
