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

  test("funnel: strict sequential ordering, horizon bound, per-stage " +
      "earliest times") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1 completes A->B->C in order; u2 did B BEFORE A (no stage 2);
    // u3 reaches B but its C precedes B; u4 never does A
    val ev = Seq(
      (1L, t(1), "A"), (1L, t(5), "B"), (1L, t(3), "B"), (1L, t(9), "C"),
      (2L, t(2), "B"), (2L, t(4), "A"),
      (3L, t(1), "A"), (3L, t(6), "B"), (3L, t(4), "C"),
      (4L, t(7), "B")).toDF("u", "ts", "et")
    val got = TimeSeries.funnel(ev, col("u"), col("ts"), col("et"),
        Seq("A", "B", "C"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        r.getTimestamp(3)).toMap
    assert(got.keySet == Set((1L, 1), (1L, 2), (1L, 3), (2L, 1),
      (3L, 1), (3L, 2)))
    // stage 2 for u1 is the EARLIEST B after A (minute 3, not 5)
    assert(got((1L, 2)) == t(3))
    assert(got((1L, 3)) == t(9))
    // a 60-second horizon kills u1's A(1)->B(3) hop
    val tight = TimeSeries.funnel(ev, col("u"), col("ts"), col("et"),
        Seq("A", "B", "C"), horizonMicros = 60L * 1000000L)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(tight == Set((1L, 1), (2L, 1), (3L, 1)))
  }

  test("cohortRetention: cohorts by first-activity week, offsets in " +
      "whole weeks, distinct users per cell") {
    def d(s0: String) = Timestamp.valueOf(s0 + " 12:00:00")
    // 2024-01-01 is a Monday. u1: weeks 0 and 2; u2: week 0 only
    // (two events same week count once); u3 joins in week 1.
    val ev = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-16")),
      (2L, d("2024-01-02")), (2L, d("2024-01-03")),
      (3L, d("2024-01-10"))).toDF("u", "ts")
    val got = TimeSeries.cohortRetention(ev, col("u"), col("ts"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) ->
        r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-08", 0L) -> 1L))
  }

  test("transitionCounts: per-user chains with deterministic ties; " +
      "chain ends emit nothing") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, t(1), "A", 10L), (1L, t(2), "B", 11L), (1L, t(3), "A", 12L),
      (2L, t(1), "A", 20L), (2L, t(1), "B", 21L), // tie: id order A->B
      (3L, t(5), "C", 30L)).toDF("u", "ts", "et", "eid")
    val got = TimeSeries.transitionCounts(ev, col("u"), col("ts"),
        col("et"), col("eid"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(got == Map(("A", "B") -> 2L, ("B", "A") -> 1L))
  }
}
