package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency sketching: Count-Min heavy hitters (Cormode & Muthukrishnan,
  * "An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 2005), on top of Spark's built-in
  * mergeable `count_min_sketch` aggregate plus the probe expression it
  * lacks (graft.functions.CmsProbeExpr).
  *
  * Scale shape: ONE pass over the item instances builds the sketch —
  * partial sketches merge map-side, the driver receives O(w·d) bytes
  * (a few KB), never data. The sketch then rides the probe expression
  * back out as a plan literal, and a second pass filters item
  * INSTANCES by estimate before the only shuffle: the CMS one-sided
  * error (estimate ≥ truth, always) means thresholding estimates has
  * NO false negatives, so the exact count over the surviving instances
  * removes exactly the false positives. No distinct-key pass, no
  * driver-side survivor set — the shuffle carries only candidate
  * instances however low the threshold. The sketch's real 100 TB value
  * is that it is a mergeable, fixed-size summary: per-partition/
  * streaming frequency state without a distinct-key shuffle.
  */
object Frequency {

  /** Build a serialized Count-Min sketch of `item` — one distributed
    * pass, O(sketch) driver traffic.
    */
  def sketchBytes(df: DataFrame, item: Column, eps: Double = 0.001,
                  confidence: Double = 0.99, seed: Int = 42): Array[Byte] =
    df.select(count_min_sketch(item, lit(eps), lit(confidence), lit(seed))
      .as("s")).head.getAs[Array[Byte]](0)

  /** Estimated count of `item` in a sketch built by [[sketchBytes]]. */
  def estimate(item: Column, sketch: Array[Byte]): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.CmsProbeExpr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(item), sketch))

  /** Exact heavy hitters through the sketch path: items occurring at
    * least `threshold` times. Two passes total: one to build the
    * sketch, one that filters instances by sketch estimate map-side
    * (no false negatives by the CMS guarantee — every true heavy
    * hitter's rows survive), then exact-counts the survivors to remove
    * the false positives. Output is deterministic and equals the naive
    * full GROUP BY ... HAVING, but the shuffle carries only candidate
    * instances and nothing is collected or broadcast.
    */
  def heavyHitters(df: DataFrame, item: Column, threshold: Long,
                   eps: Double = 0.001, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    val sk = sketchBytes(df, item, eps, confidence, seed)
    df.select(item.as("tok"))
      .where(estimate(col("tok"), sk) >= threshold)
      .groupBy(col("tok")).agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= threshold)
  }
}
