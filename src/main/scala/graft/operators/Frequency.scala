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
  * (a few KB), never data. Candidates probe the broadcast sketch; the
  * CMS one-sided error (estimate ≥ truth, always) means thresholding
  * estimates has NO false negatives, so the exact verification only
  * has to count the surviving candidates' rows (map-side partial count,
  * tiny group cardinality). The sketch's real 100 TB value is that it
  * is a mergeable, fixed-size summary: per-partition/streaming
  * frequency state without a distinct-key shuffle.
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
    * least `threshold` times. Sketch-probe prunes candidates (no false
    * negatives by the CMS guarantee); exact counts on survivors remove
    * the false positives — output is deterministic and equals the
    * naive full GROUP BY ... HAVING.
    */
  def heavyHitters(df: DataFrame, item: Column, threshold: Long,
                   eps: Double = 0.001, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    val sk = sketchBytes(df, item, eps, confidence, seed)
    val items = df.select(item.as("tok"))
    val survivors = items.distinct()
      .where(estimate(col("tok"), sk) >= threshold)
    items.join(broadcast(survivors), Seq("tok"), "left_semi")
      .groupBy(col("tok")).agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= threshold)
  }
}
