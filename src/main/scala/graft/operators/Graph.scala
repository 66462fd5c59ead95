package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph operators needed by the dedup pipeline.
  *
  * The one that matters at 100 TB: near-duplicate candidate pairs
  * (MinHash/SimHash/embedding LSH) form an edge list whose connected
  * components are the duplicate CLUSTERS — keeping one canonical doc
  * per cluster is the actual dedup decision. Pairwise removal ("drop
  * every id_b") over-deletes on transitive chains; component-wise
  * keep-min is the standard resolution.
  */
object Graph {

  /** Connected components by iterative min-label propagation:
    * `comp(v) ← min(comp(v), min over neighbors comp(u))` to fixpoint.
    *
    * Each round is one shuffle (join edges with labels + groupBy min) —
    * all partial-aggregated map-side. Rounds = graph diameter, which for
    * near-dup clusters is tiny (candidate generation connects most pairs
    * of a cluster directly, so diameters are 1-3). For adversarial
    * high-diameter graphs use the large-star/small-star contraction of
    * Kiveris et al., "Connected Components in MapReduce and Beyond"
    * (ACM SoCC 2014), which converges in O(log n) rounds; propagation is
    * chosen here because dedup graphs are shallow and each round is a
    * single cheap shuffle.
    *
    * `localCheckpoint` truncates the iterative lineage each round (on a
    * cluster, prefer `sparkContext.setCheckpointDir` + `checkpoint()`
    * for fault tolerance; local mode has no DFS).
    *
    * Input: an edge list (undirected; parallel edges / self-loops fine).
    * Output: (id, comp) — comp = the minimum vertex id in the component.
    * Deterministic: the fixpoint is unique regardless of iteration or
    * partitioning order.
    */
  def connectedComponents(edges: DataFrame, a: Column, b: Column,
                          maxIter: Int = 25): DataFrame = {
    val e = edges.select(a.cast("long").as("src"), b.cast("long").as("dst"))
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var converged = false
    var it = 0
    var prevSum: java.math.BigDecimal = null
    while (!converged && it < maxIter) {
      val nbrMin = sym
        .join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("id"))
        .agg(min(col("comp")).as("__nbr"))
      val prop = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("__nbr"), col("comp")))
            .as("comp"))
      // path compression (pointer jumping): follow one more hop through
      // the PREVIOUS round's (checkpointed, so not recomputed) table —
      // comp ← oldComp(comp). Labels only decrease, so this stays
      // monotone and halves the remaining diameter each round:
      // O(log d) rounds on chains instead of O(d).
      val next = prop
        .join(labels.select(col("id").as("__cid"),
          col("comp").as("__cc")), prop("comp") === col("__cid"), "left")
        .select(prop("id").as("id"),
          coalesce(col("__cc"), prop("comp")).as("comp"))
        .localCheckpoint()
      // labels only ever decrease, so the fixpoint is reached exactly
      // when the label sum stops falling — one scalar aggregate per
      // round instead of a join-and-compare. Summed as decimal(38,0):
      // a Long sum over ~2^40 vertices with 2^63-range ids overflows
      // (wraps silently non-ANSI, throws under ANSI), which would break
      // the monotone "equal sums ⇒ converged" argument.
      val sumNow = next
        .agg(coalesce(sum(col("comp").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)))
        .head.getDecimal(0)
      converged = prevSum != null && prevSum.compareTo(sumNow) == 0
      prevSum = sumNow
      labels = next
      it += 1
    }
    labels
  }

  /** Cluster-resolved dedup decision over an edge list: every vertex
    * with its cluster id (= min member) and whether it is the canonical
    * survivor. Vertices not in any edge are their own cluster and are
    * trivially kept, so only edge endpoints appear here.
    */
  def dedupClusters(edges: DataFrame, a: Column, b: Column): DataFrame =
    connectedComponents(edges, a, b)
      .select(col("id"), col("comp").as("cluster"),
        (col("id") === col("comp")).as("keep"))
}
