package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries
import java.sql.Timestamp

class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoinLast: latest right row at-or-before, inclusive, per key") {
    val trades = Seq(
      (1L, ts("2026-08-12 10:00:05"), "t1"),
      (1L, ts("2026-08-12 10:01:00"), "t2"),
      (2L, ts("2026-08-12 10:00:30"), "t3"),
      (3L, ts("2026-08-12 10:00:30"), "t4") // key with no quotes
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      (1L, ts("2026-08-12 10:00:00"), 100.0),
      (1L, ts("2026-08-12 10:00:05"), 101.0), // simultaneous → eligible
      (1L, ts("2026-08-12 10:02:00"), 102.0), // after t2 → not for t2
      (2L, ts("2026-08-12 10:00:00"), 200.0)
    ).toDF("sym", "qt", "px")
    val out = TimeSeries.asofJoinLast(trades, quotes,
      col("sym"), col("sym"), col("t"), col("qt"), Seq("px"))
      .select($"trade_id", $"asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out("t1").contains(101.0)) // inclusive simultaneous quote
    assert(out("t2").contains(101.0)) // latest before, not the later one
    assert(out("t3").contains(200.0))
    assert(out("t4").isEmpty) // no quote for key → null
  }

  test("asofJoinAuto: comparable sides plan the window composition, " +
      "stream-vs-dim plans the broadcast probe — same answers") {
    import java.sql.Timestamp
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val right = (0L until 80L).map(i => (i % 7,
      ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"), s"p$i"))
      .toDF("rk", "rt", "payload")
    // comparable: |L| ~ |R| → union+window, no custom node
    val smallLeft = (0L until 100L).map(i => (i, i % 7,
      ts(f"2024-01-${i % 28 + 1}%02d 12:00:00"))).toDF("event_id", "k", "t")
    val cmp = TimeSeries.asofJoinAuto(smallLeft, right, "k", "rk", "t", "rt")
    val cmpPlan = cmp.queryExecution.executedPlan.toString
    assert(!cmpPlan.contains("AsOfJoin") && cmpPlan.contains("Window"),
      cmpPlan)
    // stream vs dim: |L| >> |R| → native broadcast probe
    val bigLeft = (0L until 20000L).map(i => (i, i % 7,
      ts(f"2024-01-${i % 28 + 1}%02d 12:00:00"))).toDF("event_id", "k", "t")
    val big = TimeSeries.asofJoinAuto(bigLeft, right, "k", "rk", "t", "rt")
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(bigPlan.contains("BroadcastAsOfJoin"), bigPlan)
    // both formulations answer identically on the shared left subset
    val native = TimeSeries
      .asofJoinNative(smallLeft, right, "k", "rk", "t", "rt")
      .select($"event_id", $"payload")
      .as[(Long, Option[String])].collect().toMap
    val auto = cmp.select($"event_id", $"payload")
      .as[(Long, Option[String])].collect().toMap
    assert(auto == native)
  }

  test("sessionize: gap splits sessions, 1-based index per key") {
    val ev = Seq(
      (1L, ts("2026-08-12 10:00:00"), 1L),
      (1L, ts("2026-08-12 10:10:00"), 2L), // same session (gap 10m)
      (1L, ts("2026-08-12 11:30:00"), 3L), // > 1h gap → new session
      (2L, ts("2026-08-12 10:00:00"), 4L)
    ).toDF("uid", "t", "eid")
    val out = TimeSeries.sessionize(ev, col("uid"), col("t"), col("eid"),
      gapSeconds = 3600L)
      .select($"eid", $"session_idx").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("sessionize: gap exactly equal to threshold does NOT split") {
    val ev = Seq(
      (1L, ts("2026-08-12 10:00:00"), 1L),
      (1L, ts("2026-08-12 11:00:00"), 2L)
    ).toDF("uid", "t", "eid")
    val out = TimeSeries.sessionize(ev, col("uid"), col("t"), col("eid"),
      gapSeconds = 3600L)
      .select($"eid", $"session_idx").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }
}
