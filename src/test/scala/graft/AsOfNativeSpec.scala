package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class AsOfNativeSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoinNative matches the union+window formulation") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:00:00")), // before any right row
      (3L, 10L, ts("2024-01-10 00:00:00")),
      (4L, 20L, ts("2024-01-07 00:00:00")),
      (5L, 30L, ts("2024-01-07 00:00:00")), // key with no right rows
      (6L, 10L, ts("2024-01-03 00:00:00"))) // exactly-equal time match
      .toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-03 00:00:00"), "a"),
      (10L, ts("2024-01-08 00:00:00"), "b"),
      (20L, ts("2024-01-02 00:00:00"), "c"),
      (40L, ts("2024-01-01 00:00:00"), "d")) // key with no left rows
      .toDF("rk", "rt", "payload")

    val native = TimeSeries.asofJoinNative(left, right, "k", "rk", "t", "rt")
      .select(col("event_id"), col("payload"))
      .as[(Long, Option[String])].collect().toMap
    val window = TimeSeries.asofJoinLast(left, right,
        col("k"), col("rk"), col("t"), col("rt"), Seq("payload"))
      .select(col("event_id"), col("asof_payload"))
      .as[(Long, Option[String])].collect().toMap
    assert(native == window)
    assert(native == Map(1L -> Some("a"), 2L -> None, 3L -> Some("b"),
      4L -> Some("c"), 5L -> None, 6L -> Some("a")))
  }

  test("null keys and null times never match") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(10L), Some(ts("2024-01-05 00:00:00"))),
      (2L, None, Some(ts("2024-01-05 00:00:00"))),
      (3L, Some(10L), None))
      .toDF("event_id", "k", "t")
    val right = Seq(
      (Some(10L), Some(ts("2024-01-01 00:00:00")), "a"),
      (None, Some(ts("2024-01-01 00:00:00")), "x"),
      (Some(10L), None, "y"))
      .toDF("rk", "rt", "payload")
    val got = TimeSeries.asofJoinNative(left, right, "k", "rk", "t", "rt")
      .select(col("event_id"), col("payload"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("a"), 2L -> None, 3L -> None))
  }

  test("physical plan uses AsOfJoinExec with sort-merge-shaped children") {
    import spark.implicits._
    val left = (0L until 100L).map(i => (i, i % 7,
      ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"))).toDF("event_id", "k", "t")
    val right = (0L until 50L).map(i => (i % 7,
      ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"), s"p$i"))
      .toDF("rk", "rt", "payload")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = TimeSeries.asofJoinNative(left, right, "k", "rk", "t", "rt")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), plan)
      // exactly two exchanges (one per side), none above the join
      assert("Exchange".r.findAllIn(plan).size == 2, plan)
      df.count() // executes without error under the custom exec
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("merge variant fuses into whole-stage codegen (SMJ-style boundary)") {
    import spark.implicits._
    val left = (0L until 200L).map(i => (i, i % 7,
      ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"))).toDF("event_id", "k", "t")
    val right = (0L until 100L).map(i => (i % 7,
      ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"), s"p$i"))
      .toDF("rk", "rt", "payload")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE prints isFinalPlan=false plans without `*` markers — assert
    // codegen with adaptive off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = TimeSeries.asofJoinNative(left, right, "k", "rk", "t", "rt")
      val p = df.queryExecution.executedPlan.toString
      assert(p.linesIterator.exists(l =>
        l.contains("AsOfJoin") && !l.contains("Broadcast") &&
          l.contains("*(")), p)
      // and the generated path agrees with the interpreted fallback
      val gen = df.select(col("event_id"), col("payload"))
        .as[(Long, Option[String])].collect().toMap
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = TimeSeries
        .asofJoinNative(left, right, "k", "rk", "t", "rt")
        .select(col("event_id"), col("payload"))
        .as[(Long, Option[String])].collect().toMap
      assert(gen == interp)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("string keys survive spilled sorts (buffer-backed key staleness)") {
    // Buffer-backed keys (strings) alias the sort iterator's reused row
    // AND the (key,time) projection's reused buffer — the retained
    // last-match key must be a copy or it silently corrupts once the
    // cursor advances. Force the merge variant, many keys interleaved so
    // the cursor advances past retained matches constantly, and tiny
    // sort-spill thresholds so rows come back through the spill reader.
    import spark.implicits._
    val left = (0L until 2000L).map { i =>
      (i, f"key_${i % 97}%03d", ts(f"2024-01-${i % 28 + 1}%02d 01:00:00"))
    }.toDF("event_id", "k", "t")
    val right = (0L until 1500L).map { i =>
      (f"key_${i % 97}%03d", ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
        s"p${i % 97}_${i % 28 + 1}")
    }.toDF("rk", "rt", "payload").distinct()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val envConf = org.apache.spark.SparkEnv.get.conf
    val prevSpill = envConf
      .get("spark.shuffle.spill.numElementsForceSpillThreshold", null)
    try {
      // SortExec reads this from the live SparkEnv conf when it creates
      // each task's UnsafeExternalSorter — the supported knob for
      // forcing spills in tests
      envConf.set("spark.shuffle.spill.numElementsForceSpillThreshold", "16")
      val native = TimeSeries.asofJoinNative(left, right, "k", "rk", "t", "rt")
        .select(col("event_id"), col("payload"))
        .as[(Long, Option[String])].collect().toMap
      val window = TimeSeries.asofJoinLast(left, right,
          col("k"), col("rk"), col("t"), col("rt"), Seq("payload"))
        .select(col("event_id"), col("asof_payload"))
        .as[(Long, Option[String])].collect().toMap
      assert(native == window)
      // sanity: matches exist and each left row at/after day 1 matched
      assert(native.values.count(_.isDefined) > 1500)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      if (prevSpill == null)
        envConf.remove("spark.shuffle.spill.numElementsForceSpillThreshold")
      else envConf
        .set("spark.shuffle.spill.numElementsForceSpillThreshold", prevSpill)
    }
  }

  test("double keys: -0.0 joins 0.0 and NaN joins NaN in both variants") {
    import spark.implicits._
    val left = Seq(
      (1L, 0.0, ts("2024-01-05 00:00:00")),
      (2L, -0.0, ts("2024-01-05 00:00:00")),
      (3L, Double.NaN, ts("2024-01-05 00:00:00")))
      .toDF("event_id", "k", "t")
    val right = Seq(
      (-0.0, ts("2024-01-01 00:00:00"), "zero"),
      (Double.NaN, ts("2024-01-01 00:00:00"), "nan"))
      .toDF("rk", "rt", "payload")
    def run(): Map[Long, Option[String]] =
      TimeSeries.asofJoinNative(left, right, "k", "rk", "t", "rt")
        .select(col("event_id"), col("payload"))
        .as[(Long, Option[String])].collect().toMap
    val expected = Map(1L -> Some("zero"), 2L -> Some("zero"),
      3L -> Some("nan"))
    assert(run() == expected) // broadcast variant
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(run() == expected) // merge variant
    finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("reused broadcast exchange with different asof keys: no index aliasing") {
    // ReuseExchange shares one IdentityBroadcastMode exchange between
    // as-of nodes whose right subtrees canonicalize equal, even when
    // the nodes extract DIFFERENT (key, time) columns. The executor
    // index memo must therefore key on the bound extraction exprs too —
    // on bc.id alone the second node probes the first node's index and
    // returns silently wrong matches.
    import spark.implicits._
    // one right table carrying TWO independent (key, time, payload)
    // regimes in different columns; values chosen so aliasing the
    // indexes produces observable wrong payloads
    val right = Seq(
      (10L, ts("2024-01-03 00:00:00"), 77L, ts("2024-01-06 00:00:00"), "k10-early", "x77-early"),
      (10L, ts("2024-01-08 00:00:00"), 77L, ts("2024-01-09 00:00:00"), "k10-late", "x77-late"),
      (20L, ts("2024-01-02 00:00:00"), 88L, ts("2024-01-01 00:00:00"), "k20", "x88"))
      .toDF("rk1", "rt1", "rk2", "rt2", "pay1", "pay2")
    val left = Seq(
      (1L, 10L, 77L, ts("2024-01-05 00:00:00")),
      (2L, 20L, 88L, ts("2024-01-07 00:00:00")),
      (3L, 10L, 77L, ts("2024-01-10 00:00:00")))
      .toDF("event_id", "k1", "k2", "t")
    val a = TimeSeries.asofJoinNative(left, right, "k1", "rk1", "t", "rt1")
      .select(col("event_id"), col("pay1").as("pay"), lit("a").as("side"))
    val b = TimeSeries.asofJoinNative(left, right, "k2", "rk2", "t", "rt2")
      .select(col("event_id"), col("pay2").as("pay"), lit("b").as("side"))
    val u = a.union(b)
    // both nodes plan broadcast variants; the exchange is reused so the
    // hazard regime (same bc.id, different keys) is actually exercised
    val plan = u.queryExecution.executedPlan.toString
    assert("BroadcastAsOfJoin".r.findAllIn(plan).size == 2, plan)
    // collect through u itself so u.queryExecution is the executed
    // (AQE-finalized) plan we assert reuse on
    val rows = u.collect()
      .map(r => (r.getString(2), r.getLong(0)) -> Option(r.getString(1)))
      .toMap
    val finalPlan = u.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange")
      || "BroadcastExchange".r.findAllIn(finalPlan).size == 1, finalPlan)
    assert(rows == Map(
      ("a", 1L) -> Some("k10-early"), ("a", 2L) -> Some("k20"),
      ("a", 3L) -> Some("k10-late"),
      ("b", 1L) -> None,              // x77 history starts 01-06
      ("b", 2L) -> Some("x88"), ("b", 3L) -> Some("x77-late")))
  }

  test("small right side plans the broadcast variant, same results") {
    import spark.implicits._
    val left = (0L until 100L).map(i => (i, i % 7,
      ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"))).toDF("event_id", "k", "t")
    val right = (0L until 50L).map(i => (i % 7,
      ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"), s"p$i"))
      .toDF("rk", "rt", "payload")
    val bc = TimeSeries.asofJoinNative(left, right, "k", "rk", "t", "rt")
    val bcPlan = bc.queryExecution.executedPlan.toString
    assert(bcPlan.contains("BroadcastAsOfJoin"), bcPlan)
    assert(bcPlan.contains("BroadcastExchange"), bcPlan)
    // no shuffle of the probe side
    assert(!bcPlan.contains("Exchange hashpartitioning"), bcPlan)
    // probe side fuses into whole-stage codegen (AQE prints the final
    // plan lazily, so assert on the non-adaptive plan string)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = TimeSeries.asofJoinNative(left, right, "k", "rk", "t", "rt")
        .queryExecution.executedPlan.toString
      assert(p.linesIterator.exists(l =>
        l.contains("BroadcastAsOfJoin") && l.trim.startsWith("+- *(")
          || l.contains("BroadcastAsOfJoin") && l.contains("*(")), p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val bcRows = bc.select(col("event_id"), col("payload"))
      .as[(Long, Option[String])].collect().toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sm = TimeSeries
        .asofJoinNative(left, right, "k", "rk", "t", "rt")
        .select(col("event_id"), col("payload"))
        .as[(Long, Option[String])].collect().toMap
      assert(bcRows == sm)
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
