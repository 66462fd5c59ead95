package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamSessionize
import graft.streaming.StreamSessionize.Event
import java.sql.Timestamp

class StreamSessionizeSpec extends SparkSuite {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stateful sessionization closes sessions as the watermark passes") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamSessionize.sessions(spark, in.toDS(),
      gapSeconds = 600, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session 1: two events 5 min apart
      in.addData(
        Event(1L, ts("2026-08-12 10:00:00"), 1.0),
        Event(1L, ts("2026-08-12 10:05:00"), 2.0))
      q.processAllAvailable()
      // advance event time far beyond the gap → session must close
      in.addData(Event(1L, ts("2026-08-12 12:00:00"), 5.0))
      q.processAllAvailable()
      in.addData(Event(2L, ts("2026-08-12 14:00:00"), 9.0))
      q.processAllAvailable()

      val rows = spark.table("sessions")
        .as[StreamSessionize.Session].collect()
        .filter(_.user_id == 1L).sortBy(_.s_start.getTime)
      assert(rows.length >= 1)
      val first = rows.head
      assert(first.s_start == ts("2026-08-12 10:00:00"))
      assert(first.s_end == ts("2026-08-12 10:05:00"))
      assert(first.n_events == 2 && first.sum_value == 3.0)
    } finally q.stop()
  }

  test("in-batch gap splits sessions immediately") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamSessionize.sessions(spark, in.toDS(),
      gapSeconds = 60, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions2")
      .outputMode("append").start()
    try {
      in.addData(
        Event(5L, ts("2026-08-12 10:00:00"), 1.0),
        Event(5L, ts("2026-08-12 10:00:30"), 1.0),
        Event(5L, ts("2026-08-12 11:00:00"), 1.0)) // splits in same batch
      q.processAllAvailable()
      val closed = spark.table("sessions2")
        .as[StreamSessionize.Session].collect()
      assert(closed.exists(s => s.user_id == 5L && s.n_events == 2))
    } finally q.stop()
  }
}
