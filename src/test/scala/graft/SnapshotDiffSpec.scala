package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Stats}

/** Snapshot time travel + keyed diff: ccStoreLabelsAsOf must replay
  * the exact post-batch-k labeling, and keyedDiff must classify
  * added / removed / changed with null-safe value compares (a value
  * going null is a CHANGE, never a phantom removal).
  */
class SnapshotDiffSpec extends SparkSuite {
  import spark.implicits._

  test("keyedDiff classifies added/removed/changed, null-safely, " +
      "and drops unchanged rows") {
    val a = Seq((1L, Some("x"), 10L), (2L, Some("y"), 20L),
      (3L, Some("z"), 30L), (4L, None: Option[String], 40L))
      .toDF("id", "v", "n")
    val b = Seq((1L, Some("x"), 10L), (2L, Some("y2"), 20L),
      (4L, Some("now"), 40L), (5L, Some("new"), 50L))
      .toDF("id", "v", "n")
    val got = Stats.keyedDiff(a, b, Seq("id"))
      .select(col("id"), col("status"), col("old_v"), col("new_v"))
      .as[(Long, String, Option[String], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      2L -> (("changed", Some("y"), Some("y2"))),
      3L -> (("removed", Some("z"), None)),
      4L -> (("changed", None, Some("now"))),
      5L -> (("added", None, Some("new")))))
  }

  test("ccStoreLabelsAsOf replays each batch's exact labeling; the " +
      "diff between snapshots is only the merged ids") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-asof-").toString + "/cc"
    // batch 0: components {1,2} and {10,11}; batch 1 bridges them
    val hist = Seq((1L, 2L), (10L, 11L)).toDF("a", "b")
    Graph.writeCCStore(hist, col("a"), col("b"), dir, filesOut = 2)
    Graph.connectedComponentsIncremental(
      Seq((2L, 10L)).toDF("a", "b"), col("a"), col("b"), dir,
      batchId = 1L): Unit
    def labels(asOf: Long) =
      Graph.ccStoreLabelsAsOf(spark, dir, asOf)
        .as[(Long, Long)].collect().toMap
    assert(labels(0L) == Map(1L -> 1L, 2L -> 1L, 10L -> 10L,
      11L -> 10L))
    assert(labels(1L) == Map(1L -> 1L, 2L -> 1L, 10L -> 1L,
      11L -> 1L))
    // current view ≡ newest snapshot
    assert(Graph.ccStoreLabels(spark, dir)
      .as[(Long, Long)].collect().toMap == labels(1L))
    val diff = Stats.keyedDiff(
        Graph.ccStoreLabelsAsOf(spark, dir, 0L),
        Graph.ccStoreLabelsAsOf(spark, dir, 1L), Seq("id"))
      .select(col("id"), col("status"), col("new_comp"))
      .as[(Long, String, Option[Long])].collect().toSet
    assert(diff == Set((10L, "changed", Some(1L)),
      (11L, "changed", Some(1L))))
  }

  test("k-core snapshots survive compaction exactly (monotone " +
      "member deltas keep their batch)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kcasof-").toString + "/kc"
    // base: one K3 {1,2,3}; batch 1 attaches 4 with degree 2 → flips
    val hist = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    Graph.writeKCoreStore(hist, col("a"), col("b"), k = 2, dir,
      filesOut = 2)
    val all = (Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (2L, 4L)))
      .toDF("a", "b")
    Graph.kCoreIncremental(all, col("a"), col("b"),
      Seq((1L, 4L), (2L, 4L)).toDF("a", "b"), col("a"), col("b"),
      k = 2, dir, batchId = 1L): Unit
    def members(asOf: Long) =
      Graph.kCoreStoreMembersAsOf(spark, dir, asOf)
        .as[Long].collect().toSet
    assert(members(0L) == Set(1L, 2L, 3L))
    assert(members(1L) == Set(1L, 2L, 3L, 4L))
    // OPTIMIZE, then replay BOTH snapshots — monotone membership
    // means compaction loses nothing
    assert(Graph.compactKCoreStore(spark, dir).contains(1L))
    assert(members(0L) == Set(1L, 2L, 3L))
    assert(members(1L) == Set(1L, 2L, 3L, 4L))
  }
}
