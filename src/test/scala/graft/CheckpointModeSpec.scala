package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Training}

/** The staged materializations inside the incremental/iterative
  * operators ([[graft.operators.Checkpoints]]) must switch to RELIABLE
  * checkpoint() when a checkpoint dir is set — the cluster posture where
  * a long backfill batch survives executor loss — and both modes must
  * produce identical results.
  */
class CheckpointModeSpec extends SparkSuite {

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete(): Unit
  }

  test("withPrefixSum / minhashIncremental / embeddingIncremental: " +
      "reliable-checkpoint mode ≡ localCheckpoint mode; reliable files " +
      "are written under the dir and cleaned afterwards") {
    import spark.implicits._
    val nums = (0L until 100L).map(i => (i, (i * 7 + 3) % 13))
      .toDF("id", "v")
    val hist = (0L until 60L)
      .map(i => (i, s"historical text body $i tail $i"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (900L, "historical text body 7 tail 7"), // dup of 7
      (901L, "novel content that matches nothing else here"))
      .toDF("doc_id", "text")
    def v(seed: Int): Array[Float] =
      Array.tabulate(64)(j => math.cos(seed * 31 + j * 7 + 1).toFloat)
    val histE = (0 until 60).map(i => (i.toLong, v(i))).toDF("id", "vec")
    val batchE = Seq((900L, v(11)), (901L, v(7777))).toDF("id", "vec")
    val histCodes = Dedup.embeddingCodes(histE, col("id"), col("vec"),
      planes = 8, tables = 4)

    def runAll(): (Map[Long, Long], Set[Long], Set[(Long, Long)]) = (
      Training.withPrefixSum(nums, Seq(col("id")), col("v"), "cum",
          parts = 5)
        .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap,
      Dedup.minhashIncremental(batch, col("doc_id"), col("text"),
          Dedup.minhashSigsNative(hist, col("doc_id"), col("text")))
        .select(col("doc_id")).as[Long].collect().toSet,
      Dedup.embeddingIncremental(batchE, col("id"), col("vec"),
          histCodes, histE, threshold = 0.99, planes = 8, tables = 4)
        .select(col("id_a"), col("id_b")).as[(Long, Long)]
        .collect().toSet)

    val localRes = runAll()
    assert(localRes._2 == Set(901L) && localRes._3.contains((11L, 900L)))

    val ckRoot = java.nio.file.Files
      .createTempDirectory("graft-ckmode-").toString
    spark.sparkContext.setCheckpointDir(ckRoot)
    val reliableRes =
      try {
        val r = runAll()
        // the mode actually engaged: reliable checkpoint RDD dirs exist
        val ckDir = new java.io.File(
          new java.net.URI(spark.sparkContext.getCheckpointDir.get))
        assert(ckDir.listFiles().exists(_.getName.startsWith("rdd-")),
          "reliable checkpoint files must be written under the dir")
        r
      } finally spark.sparkContext.setCheckpointDir(null)
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "checkpoint mode must be restorable for later operators")
    assert(reliableRes == localRes,
      "reliable and local checkpoint modes must answer identically")
    // retention follows the caller's checkpoint dir: dropping the dir
    // after results are consumed leaves nothing behind
    rm(new java.io.File(ckRoot))
    assert(!new java.io.File(ckRoot).exists())
  }
}
