package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit runtime-filter joins: a Bloom filter built over a join's
  * SMALL side pre-filters the BIG side map-side, BEFORE the big side's
  * shuffle — the star-schema pattern (Bloom-joins trace to Bloom CACM
  * 1970 §4 and the semi-join reducers of Bernstein & Chiu, JACM 1981)
  * that Spark's own `InjectRuntimeFilter` applies opportunistically,
  * made deterministic, measurable, and available to ANY plan shape.
  *
  * Why explicit at 100 TB: a fact⋈dim join where the dim predicate is
  * selective shuffles the WHOLE fact table in the naive plan — the
  * exchange, not the join, is the bottleneck. Building a ~MB Bloom
  * over the dim keys (one pass, O(bits) driver traffic via
  * treeAggregate, never rows) and probing it under the fact scan cuts
  * the fact exchange to |matches| + fpp·|fact| rows. The probe sits in
  * the scan's filter stage, after parquet pushdown, so pruned columns
  * and pushed predicates still apply.
  *
  * Correctness is exact, not approximate: Bloom membership has NO
  * false negatives (a stored key always probes true), so the pre-filter
  * drops only rows that cannot match, and the exact join that follows
  * removes the ≤ fpp false positives. Every operator here returns
  * bit-identical rows to its naive twin — the property DedupSpec-style
  * specs and the x_bloom_* oracles pin.
  */
object RuntimeFilter {

  /** Serialized Bloom filter of `key` over `df` — one distributed
    * pass; the driver receives only the bitmap.
    */
  def bloomBytes(df: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double = 0.01): Array[Byte] = {
    val bf = df.where(key.isNotNull)
      .stat.bloomFilter(key, expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `might contain` predicate over a serialized Bloom filter. */
  def mightContain(key: Column, bytes: Array[Byte]): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.BloomProbeExpr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(key), bytes))

  /** Inner join `fact ⋈ dim` with the fact side Bloom-pre-filtered on
    * the dim's keys. Result ≡ `fact.join(dim, factKey === dimKey)`
    * exactly; the fact-side exchange carries only probe survivors.
    * `expectedItems` sizes the filter (overshooting only costs bits;
    * undershooting only raises fpp — never correctness).
    */
  def bloomJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
                dimKey: Column, expectedItems: Long,
                fpp: Double = 0.01): DataFrame = {
    val bytes = bloomBytes(dim, dimKey, expectedItems, fpp)
    fact.where(mightContain(factKey, bytes))
      .join(dim, factKey === dimKey)
  }

  /** Left-semi `fact ⋉ dim` through the same pre-filter: fact rows
    * whose key appears in dim, no dim columns — the 100 TB "keep only
    * allowlisted documents" shape where the allowlist is too big to
    * broadcast but its Bloom is not.
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
                    dimKey: Column, expectedItems: Long,
                    fpp: Double = 0.01): DataFrame = {
    val bytes = bloomBytes(dim, dimKey, expectedItems, fpp)
    fact.where(mightContain(factKey, bytes))
      .join(dim, factKey === dimKey, "left_semi")
  }

  /** Anti join `fact ▷ dim` where the Bloom's one-sidedness does the
    * heavy lifting: a fact row whose key probes FALSE is GUARANTEED
    * absent from dim (no false negatives) and is emitted directly,
    * never shuffled; only the maybe-contained sliver — |matches| +
    * fpp·|fact| rows — pays the exact anti join that removes true
    * members. Result ≡ `fact.join(dim, ..., "left_anti")` exactly.
    *
    * This is blocklist decontamination at corpus scale: removing a
    * 10⁶-id blocklist from 10¹⁰ documents shuffles ~1% of one table
    * instead of all of both. Null fact keys never match anything in
    * an anti join's ON clause, so they belong in the result: the
    * probe's null (not-false) routes them into the confirm arm, whose
    * exact anti join keeps them — no separate null path needed.
    */
  def bloomAntiJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
                    dimKey: Column, expectedItems: Long,
                    fpp: Double = 0.01): DataFrame = {
    val bytes = bloomBytes(dim, dimKey, expectedItems, fpp)
    val probe = mightContain(factKey, bytes)
    val definiteOut = fact.where(probe === lit(false))
    val maybe = fact.where(probe.isNull || probe === lit(true))
    definiteOut.unionAll(
      maybe.join(dim, factKey === dimKey, "left_anti"))
  }
}
