package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned keyless interval join: equals the nested-loop result, emits
  * each qualifying pair exactly once, honors inclusive bounds, and
  * fails fast on replication blow-ups.
  */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  val points = Seq((1L, 5L), (2L, 10L), (3L, 17L), (4L, 29L), (5L, 40L))
    .toDF("pid", "t")
  val intervals = Seq(
    (10L, 0L, 10L),   // hits 5, 10 (inclusive hi)
    (11L, 10L, 18L),  // hits 10 (inclusive lo), 17
    (12L, 30L, 35L),  // hits nothing
    (13L, 3L, 31L))   // wide: hits 5, 10, 17, 29
    .toDF("iid", "lo", "hi")

  test("matches the nested-loop join, one row per qualifying pair") {
    val got = RangeJoin.intervalJoin(points, col("t"), intervals,
        col("lo"), col("hi"), binWidth = 7)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    val naive = points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == naive.sorted)
    assert(got.size == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L),
      (1L, 13L), (2L, 13L), (3L, 13L), (4L, 13L)))
  }

  test("bin width 1 and giant widths still agree with nested loop") {
    for (w <- Seq(1L, 3L, 100L)) {
      val got = RangeJoin.intervalJoin(points, col("t"), intervals,
          col("lo"), col("hi"), binWidth = w)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      val naive = points.join(intervals, $"t" >= $"lo" && $"t" <= $"hi")
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"binWidth=$w")
    }
  }

  test("2^60-domain values bin exactly (integral div, no double rounding)") {
    // doubles can't represent 2^60-scale longs exactly: the old
    // `/`-based binning misbinned up there and silently dropped
    // qualifying pairs
    val base = 1L << 60
    val pts = Seq((1L, base + 1L), (2L, base + 8L), (3L, base + 14L))
      .toDF("pid", "t")
    val ivs = Seq((1L, base, base + 2L), (2L, base + 7L, base + 15L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.intervalJoin(pts, col("t"), ivs,
        col("lo"), col("hi"), binWidth = 3)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naive = pts.join(ivs, $"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 1L), (2L, 2L), (3L, 2L)))
  }

  test("an interval spanning >= maxBins bins fails fast") {
    val huge = Seq((99L, 0L, 10000L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.intervalJoin(points, col("t"), huge,
        col("lo"), col("hi"), binWidth = 1, maxBins = 100).count()
    }
    assert(ex.getMessage != null)
  }

  test("timestamp variant joins clicks into purchase windows") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")))
      .toDF("iv_id", "lo", "hi")
    val pts = Seq(
      (10L, ts("2024-01-01 01:00:00")),
      (11L, ts("2024-01-01 02:00:00")), // inclusive hi
      (12L, ts("2024-01-01 02:00:01"))) // just outside
      .toDF("pid", "t")
    val got = RangeJoin.intervalJoinTs(pts, col("t"), iv,
        col("lo"), col("hi"), binWidthMicros = 3600L * 1000000)
      .select($"pid").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }
}
