package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Stateful, StreamOps}
import graft.streaming.Stateful.{DocEvent, SourceTotals}

/** Spark 4 transformWithState (RocksDB-backed typed state) + native
  * session_window streaming aggregation.
  */
class StatefulSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("transformWithState: running per-source corpus totals") {
    implicit val sc = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[DocEvent]
      val q = Stateful.runningTotals(in.toDS())
        .writeStream.format("memory").queryName("totals_out")
        .outputMode("update").start()
      try {
        in.addData(DocEvent("web", 100L), DocEvent("web", 50L),
          DocEvent("book", 10L))
        q.processAllAvailable()
        in.addData(DocEvent("web", 25L))
        q.processAllAvailable()
        val out = spark.table("totals_out").as[SourceTotals].collect()
        val last = out.groupBy(_.source)
          .map { case (k, v) => k -> v.maxBy(_.n_docs) }
        assert(last("web") == SourceTotals("web", 3L, 175L))
        assert(last("book") == SourceTotals("book", 1L, 10L))
        // state persisted ACROSS batches: batch 2 emitted cumulative 3
        assert(out.count(_.source == "web") == 2)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("session_window stream: closed sessions emit after watermark") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.sessionWindowAgg(
        in.toDF().toDF("user_id", "ts"), "ts", "user_id",
        gap = "1 hour", watermark = "1 minute")
      .writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    try {
      in.addData((1L, ts("2026-08-12 10:00:00")),
        (1L, ts("2026-08-12 10:30:00")))
      q.processAllAvailable()
      // far-future event pushes the watermark past session 1's end
      in.addData((1L, ts("2026-08-12 23:00:00")))
      q.processAllAvailable()
      val rows = spark.table("sw_out")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
      assert(rows.toSeq == Seq((1L, ts("2026-08-12 10:00:00"),
        ts("2026-08-12 11:30:00"), 2L))) // end = last event + gap
    } finally q.stop()
  }

  test("sessionWindowAgg works identically on a batch frame") {
    val batch = Seq((1L, ts("2026-08-12 10:00:00")),
      (1L, ts("2026-08-12 10:30:00")),
      (1L, ts("2026-08-12 23:00:00")),
      (2L, ts("2026-08-12 09:00:00")))
      .toDF("user_id", "ts")
    val got = StreamOps.sessionWindowAgg(batch, "ts", "user_id",
        gap = "1 hour", watermark = "1 minute")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(got == Set(
      (1L, ts("2026-08-12 10:00:00"), ts("2026-08-12 11:30:00"), 2L),
      (1L, ts("2026-08-12 23:00:00"), ts("2026-08-13 00:00:00"), 1L),
      (2L, ts("2026-08-12 09:00:00"), ts("2026-08-12 10:00:00"), 1L)))
  }
}
