package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless range/interval joins at scale.
  *
  * `points t ⋈ intervals [lo, hi] ON lo ≤ t ≤ hi` with no equality key
  * is the join Spark's planner handles worst: the physical plan is a
  * broadcast nested loop (O(|P|·|I|) predicate evaluations) or, when
  * neither side fits in memory, a full cartesian product. The classic
  * fix — what engines with native range joins (DuckDB's IEJoin,
  * Databricks' range-join hints) do under the hood, here expressed as
  * plain Catalyst operators — is BINNING: quantize the domain into
  * fixed-width bins, replicate each interval into every bin it
  * overlaps, send each point to exactly its own bin, and hash-join on
  * the bin id with the precise predicate as a post-filter.
  *
  * Cost: intervals replicate ×(span/width + 1); points never
  * replicate; the join is a shuffled HASH join (scales out) touching
  * only per-bin pairs. Each qualifying (point, interval) pair meets in
  * EXACTLY one bin — the point's — so no distinct pass is needed.
  */
object RangeJoin {

  /** Interval join on long domains (e.g. `unix_micros` timestamps,
    * non-negative): rows of `points` × `intervals` with
    * `lo ≤ t ≤ hi`, output = point columns ++ interval columns.
    *
    * `binWidth` trades interval replication (span/width) against bin
    * occupancy; set it near the typical interval span. Intervals wider
    * than `maxBins` bins fail fast (raise_error) rather than silently
    * exploding the replication — at scale a handful of giant intervals
    * are better handled on a separate broadcast branch.
    */
  def intervalJoin(points: DataFrame, t: Column,
                   intervals: DataFrame, lo: Column, hi: Column,
                   binWidth: Long, maxBins: Int = 1000): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // exact integer floor-division over the FULL long domain: subtract
    // the positive modulus, then integral-divide (`div`). The `/`
    // operator is double division — exact only while the aligned
    // numerator stays below 2^53, silently misbinning (and so dropping
    // qualifying pairs) beyond it.
    def bin(c: Column): Column = {
      val aligned = c.cast("long") - pmod(c.cast("long"), lit(binWidth))
      org.apache.spark.sql.GraftSqlBridge.toColumn(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftSqlBridge.toExpression(aligned),
          org.apache.spark.sql.GraftSqlBridge.toExpression(lit(binWidth))))
    }
    val p = points.withColumn("__bin", bin(t))
    val iv = intervals
      .withColumn("__lob", bin(lo))
      // the guard rides the __hib expression itself so column pruning
      // can't optimize the check away
      .withColumn("__hib",
        when(bin(hi) - col("__lob") >= maxBins,
          raise_error(lit(s"intervalJoin: an interval spans >= $maxBins " +
            "bins; widen binWidth or route giant intervals to a " +
            "broadcast branch")).cast("long"))
          .otherwise(bin(hi)))
      .withColumn("__bin",
        explode(sequence(col("__lob"), col("__hib"))))
      .drop("__lob", "__hib")
    p.join(iv, Seq("__bin"))
      .where(t >= lo && t <= hi)
      .drop("__bin")
  }

  /** Timestamp convenience: bins on epoch micros (NTZ-tolerant via
    * [[TimeSeries.epochMicros]]). */
  def intervalJoinTs(points: DataFrame, t: Column,
                     intervals: DataFrame, lo: Column, hi: Column,
                     binWidthMicros: Long, maxBins: Int = 1000): DataFrame = {
    val p = points.withColumn("__t_us", TimeSeries.epochMicros(t))
    val iv = intervals
      .withColumn("__lo_us", TimeSeries.epochMicros(lo))
      .withColumn("__hi_us", TimeSeries.epochMicros(hi))
    intervalJoin(p, col("__t_us"), iv, col("__lo_us"), col("__hi_us"),
        binWidthMicros, maxBins)
      .drop("__t_us", "__lo_us", "__hi_us")
  }
}
