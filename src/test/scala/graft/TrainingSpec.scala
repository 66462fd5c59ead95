package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Training

class TrainingSpec extends SparkSuite {

  test("withPrefixSum matches the single-partition global window") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, (i * 7 + 3) % 13)).toDF("id", "v")
    val got = Training.withPrefixSum(df, Seq(col("id")), col("v"), "cum",
        parts = 7)
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    val expect = df.withColumn("cum", coalesce(
        sum(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("id"), col("cum")).as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  test("packBins: bins are contiguous in order and cut every budget") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, 10L)).toDF("id", "toks")
    val got = Training.packBins(df, Seq(col("id")), col("toks"), 25L)
      .select(col("id"), col("bin")).as[(Long, Long)].collect().sorted
    // 10 tokens each, budget 25: bins of sizes ceil — exclusive prefix
    // sums 0,10,20,30,... → bin = cum div 25 → 0,0,0,1,1,2,2,(2?)...
    assert(got.take(6).map(_._2).toSeq == Seq(0L, 0L, 0L, 1L, 1L, 2L))
    // bin ids non-decreasing in order
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted)
  }

  test("shuffleOrder: a permutation, deterministic across runs") {
    import spark.implicits._
    val df = (0L until 64L).toDF("id")
    val a = Training.shuffleOrder(df, col("id"))
      .select(col("id"), col("pos")).as[(Long, Long)].collect().toMap
    val b = Training.shuffleOrder(df, col("id"))
      .select(col("id"), col("pos")).as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.toSeq.sorted == (0L until 64L))
    // hash order must differ from natural order (else it's not a shuffle)
    assert((0L until 64L).exists(i => a(i) != i))
  }

  test("stratifiedEveryK keeps ceil(n/k) per stratum incl. rare strata, " +
      "matches the window-ranked oracle, and the plan has NO window") {
    import spark.implicits._
    // includes a NULL stratum: rows that lost their label are a stratum
    // of their own (the window formulation partitions them as one — the
    // prefix-sum form must not silently drop them through a === join)
    val df = ((0L until 20L).map(i => (i, "big")) ++ Seq((100L, "rare"))
      ++ (200L until 203L).map(i => (i, null: String)))
      .toDF("id", "g")
    val out = Training.stratifiedEveryK(df, col("g"), col("id"), 5)
    // no WindowExec anywhere: the per-stratum rank must be the
    // range-partitioned prefix count, not a one-reducer-per-stratum
    // window (strata are few by the operator's premise)
    assert(!graft.pipeline.PlanLint.nodes(out).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "stratifiedEveryK must not rank strata through a window")
    val got = out
      .groupBy(col("g")).count().as[(Option[String], Long)]
      .collect().toMap
    assert(got == Map(Some("big") -> 4L, Some("rare") -> 1L,
      None -> 1L))
    // survivor SET (not just counts) matches the window-ranked oracle
    val w = Window.partitionBy(col("g"))
      .orderBy(md5(col("id").cast("string").cast("binary")), col("id"))
    val expect = df
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .where((col("rn") - 1) * 5 < col("n"))
      .select(col("id")).as[Long].collect().toSet
    assert(out.select(col("id")).as[Long].collect().toSet == expect)
  }

  test("mixToTarget: exact integer mixture, matches the window-ranked " +
      "oracle, and the plan has NO window over the data") {
    import spark.implicits._
    // 3 strata with skewed availability: web 60, books 25, code 8;
    // weights web:4 books:2 code:1 → N = min(60·7/4, 25·7/2, 8·7/1) = 56
    // → quotas web 32, books 16, code 8
    val df = ((0L until 60L).map(i => (i, "web")) ++
      (100L until 125L).map(i => (i, "books")) ++
      (200L until 208L).map(i => (i, "code"))).toDF("id", "g")
    val parts = when(col("g") === "web", 4L)
      .when(col("g") === "books", 2L).otherwise(1L)
    val out = Training.mixToTarget(df, col("g"), col("id"), parts)
    // no WindowExec anywhere: the per-stratum rank must be the
    // range-partitioned prefix count, not a single-reducer window
    assert(!graft.pipeline.PlanLint.nodes(out).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "mixToTarget must not rank strata through a window")
    val got = out.select(col("id"), col("g")).as[(Long, String)]
      .collect().toSet
    // oracle: the window-ranked formulation on the same order
    val w = Window.partitionBy(col("g"))
      .orderBy(md5(col("id").cast("string").cast("binary")), col("id"))
    val quotas = Map("web" -> 32, "books" -> 16, "code" -> 8)
    val expect = df.withColumn("rn", row_number().over(w))
      .as[(Long, String, Int)].collect()
      .filter { case (_, g, rn) => rn <= quotas(g) }
      .map { case (id, g, _) => (id, g) }.toSet
    assert(got == expect)
    assert(got.count(_._2 == "web") == 32 &&
      got.count(_._2 == "books") == 16 && got.count(_._2 == "code") == 8)
  }

  test("mixToTarget keeps a NULL stratum (null-safe quota/start joins)") {
    import spark.implicits._
    val df = ((0L until 8L).map(i => (i, "a")) ++
      (100L until 104L).map(i => (i, null: String))).toDF("id", "g")
    // equal weights: N = min(8·2/1, 4·2/1) = 8 → quota 4 per stratum,
    // INCLUDING the null one
    val got = Training.mixToTarget(df, col("g"), col("id"), lit(1L))
      .groupBy(col("g")).count().as[(Option[String], Long)]
      .collect().toMap
    assert(got == Map(Some("a") -> 4L, None -> 4L))
  }

  test("percentileGate keeps floor(n*pct/100) best per group with a " +
      "deterministic tiebreak") {
    import spark.implicits._
    // group a: scores 0..9 (10 rows); group b: all-tied scores (4 rows)
    val df = ((0L until 10L).map(i => (i, "a", i.toDouble)) ++
      (10L until 14L).map(i => (i, "b", 1.0))).toDF("id", "g", "sc")
    val got = Training.percentileGate(df, col("g"), col("sc"),
        col("id"), keepPct = 50)
      .select(col("id")).as[Long].collect().toSet
    // a: top 5 scores = ids 5..9; b: ties broken by id asc -> 10, 11
    assert(got == Set(5L, 6L, 7L, 8L, 9L, 10L, 11L))
    // keepPct 0 drops everything, 100 keeps everything
    assert(Training.percentileGate(df, col("g"), col("sc"),
      col("id"), 0).count() == 0)
    assert(Training.percentileGate(df, col("g"), col("sc"),
      col("id"), 100).count() == 14)
  }

  test("percentileGateApprox: threshold filter agrees with the exact " +
      "gate up to threshold ties, and the plan has no window") {
    import spark.implicits._
    val df = ((0L until 10L).map(i => (i, "a", i.toDouble)) ++
      (10L until 14L).map(i => (i, "b", 1.0))).toDF("id", "g", "sc")
    val out = Training.percentileGateApprox(df, col("g"), col("sc"),
      keepPct = 50)
    assert(!graft.pipeline.PlanLint.nodes(out).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]))
    val got = out.select(col("id")).as[Long].collect().toSet
    // group a (distinct scores): survivors = exact top-5 modulo one
    // boundary row; group b (all tied at the threshold VALUE): the
    // value test keeps all 4 — the documented tie semantics
    val aGot = got.filter(_ < 10L)
    assert(aGot.subsetOf(Set(4L, 5L, 6L, 7L, 8L, 9L)) &&
      Set(5L, 6L, 7L, 8L, 9L).subsetOf(aGot))
    assert(got.filter(_ >= 10L) == Set(10L, 11L, 12L, 13L))
  }

  test("curriculumOrder: positions ascend with score; bands are even; " +
      "window-free and deterministic") {
    import spark.implicits._
    val docs = (1 to 40).map(i => (i.toLong, (i % 10).toLong))
      .toDF("id", "difficulty")
    val out = Training.curriculumOrder(docs, col("id"),
      col("difficulty"), bands = 4)
    out.collect()
    // no WindowExec anywhere (the 100 TB point of the prefix-sum form)
    assert(!physicalNodes(out).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]))
    val rows = out.select("id", "difficulty", "pos", "band")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // pos is a 0..n-1 permutation, ordered by score first
    assert(rows.map(_._3).sorted.toSeq === (0L until 40L))
    val byPos = rows.sortBy(_._3).map(_._2)
    assert(byPos.zip(byPos.tail).forall { case (a, b) => a <= b })
    // 4 bands of exactly 10 on an evenly divisible corpus
    assert(rows.groupBy(_._4).view.mapValues(_.length).toMap ===
      Map(0L -> 10, 1L -> 10, 2L -> 10, 3L -> 10))
    // deterministic: same order on recompute
    val again = Training.curriculumOrder(docs, col("id"),
      col("difficulty"), bands = 4)
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toMap === rows.map(r => (r._1, r._3)).toMap)
  }

  test("encodeCategorical: sorted-vocab 1-based codes, null-safe, " +
      "order/partitioning independent") {
    import spark.implicits._
    val df = Seq(("b", 1L), ("a", 2L), ("c", 3L), ("a", 4L),
      (null, 5L)).toDF("v", "id")
    val got = graft.operators.Training
      .encodeCategorical(df, org.apache.spark.sql.functions.col("v"),
        "code")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 3L, 4L -> 1L,
      5L -> -1L))
    val skewed = graft.operators.Training
      .encodeCategorical(df.repartition(7),
        org.apache.spark.sql.functions.col("v"), "code")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(skewed == got)
  }

  test("encodeCategoricalIncremental: old codes never move, new " +
      "values extend densely after the max, refresh is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft-catinc-").toString + "/vocab"
    val enc = (vals: Seq[String]) => graft.operators.Training
      .encodeCategoricalIncremental(
        vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }
          .toDF("v", "id"), col("v"), "code", dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val first = enc(Seq("b", "a", "c"))
    assert(first == Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
    // batch 2: one old value + two new; old codes untouched, new
    // codes dense after 3, sorted among themselves ("aa" < "z")
    val second = enc(Seq("c", "z", "aa"))
    assert(second == Map("c" -> 3L, "aa" -> 4L, "z" -> 5L))
    // idempotent retry: same batch, same codes, store unchanged
    assert(enc(Seq("c", "z", "aa")) == second)
    val store = spark.read.parquet(dir).count()
    assert(store == 5L)
  }

  test("retractCategorical: the mapping vanishes, the code stays " +
      "RESERVED (max-code scan reads tombstoned rows), re-ingestion " +
      "re-enters with a fresh code, null values never bind to a " +
      "tombstoned row; unknown retractions are no-ops") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft-catdel-").toString + "/vocab"
    val enc = (vals: Seq[String]) => graft.operators.Training
      .encodeCategoricalIncremental(
        vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }
          .toDF("v", "id"), col("v"), "code", dir)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0))
        -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(enc(Seq("a", "b", "c")) ==
      Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
    // retract "c" — the MAX-coded value — plus an unknown (no-op)
    graft.operators.Training.retractCategorical(spark,
      Seq("c", "never-seen").toDF("v"), dir)
    // the string is gone from the store; the code row remains
    val rows = spark.read.parquet(dir)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0))
        -> r.getLong(1)).toMap
    assert(rows == Map("a" -> 1L, "b" -> 2L, (null: String) -> 3L))
    // a NULL batch value gets a null code, never tombstoned code 3;
    // re-ingested "c" re-enters FRESH at 4 (3 stays reserved — a
    // visible-max rebuild would have re-bound 3 here); "d" follows
    val got = enc(Seq("b", null, "c", "d"))
    assert(got == Map("b" -> 2L, (null: String) -> -1L, "c" -> 4L,
      "d" -> 5L), s"got $got")
  }

  test("encodeCategoricalIncremental: an all-null first batch writes an " +
      "empty store without wedging subsequent ingests") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files
      .createTempDirectory("graft-catinc0-").toString + "/vocab"
    val nulls = Seq((null.asInstanceOf[String], 1L), (null, 2L))
      .toDF("v", "id")
    val first = graft.operators.Training
      .encodeCategoricalIncremental(nulls, col("v"), "code", dir)
      .collect()
    assert(first.length == 2 && first.forall(_.isNullAt(2)))
    assert(spark.read.parquet(dir).count() == 0L)
    // the empty store must not NPE the next batch; codes start at 1
    val second = graft.operators.Training
      .encodeCategoricalIncremental(
        Seq(("b", 3L), ("a", 4L)).toDF("v", "id"), col("v"), "code", dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(second == Map("a" -> 1L, "b" -> 2L))
  }

  test("assembleConversations: hand-computed spans and assistant-only " +
      "mask; conversations independent; out-of-order input irrelevant") {
    import spark.implicits._
    // turns arrive SHUFFLED — assembly orders by turn index
    val turns = Seq(
      ("a", 3L, "user", "ok"), ("a", 1L, "user", "hi"),
      ("a", 2L, "assistant", "yo"),
      ("b", 1L, "assistant", "solo")).toDF("c", "t", "r", "x")
    val got = graft.operators.Training.assembleConversations(
        turns, col("c"), col("t"), col("r"), col("x"),
        trainRoles = Seq("assistant"))
      .orderBy(col("conv"), col("turn"))
      .as[(String, Long, String, Long, Long, Boolean)].collect().toSeq
    // <user>hi = 8, <assistant>yo = 13, <user>ok = 8
    assert(got == Seq(
      ("a", 1L, "user", 0L, 8L, true),
      ("a", 2L, "assistant", 8L, 21L, false),
      ("a", 3L, "user", 21L, 29L, true),
      ("b", 1L, "assistant", 0L, 15L, false)))
    // spans tile the rendered conversation exactly: contiguous,
    // gap-free, starting at 0 per conversation
    got.groupBy(_._1).values.foreach { turnsOf =>
      val sorted = turnsOf.sortBy(_._2)
      assert(sorted.head._4 == 0L)
      sorted.sliding(2).foreach {
        case Seq(p, n) => assert(p._5 == n._4)
        case _ =>
      }
    }
  }

  test("packConversations: conversations lay end-to-end in conv " +
      "order; bin = global start div budget; spans tile the stream") {
    import spark.implicits._
    val turns = Seq(
      ("a", 1L, "user", "hi"), ("a", 2L, "assistant", "yo"),
      ("b", 1L, "user", "xxxxx"), ("c", 1L, "assistant", "k"))
      .toDF("c", "t", "r", "x")
    val assembled = graft.operators.Training.assembleConversations(
      turns, col("c"), col("t"), col("r"), col("x"),
      trainRoles = Seq("assistant"))
    // conv lens: a = 8 + 13 = 21, b = 11, c = 12; budget 16
    val got = graft.operators.Training
      .packConversations(assembled, budget = 16L)
      .orderBy(col("conv"), col("turn"))
      .as[(String, Long, String, Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      // a starts at 0: <user>hi [0,8) bin 0, <assistant>yo [8,21) bin 0
      ("a", 1L, "user", 0L, 0L, 8L, true),
      ("a", 2L, "assistant", 0L, 8L, 21L, false),
      // b starts at 21: [21,32) bin 1 (straddles into window 2)
      ("b", 1L, "user", 1L, 21L, 32L, true),
      // c starts at 32: [32,44) bin 2
      ("c", 1L, "assistant", 2L, 32L, 44L, false)))
    // global spans tile the stream with no gaps in (conv, turn) order
    val ordered = got.sortBy(r => (r._1, r._2))
    assert(ordered.head._5 == 0L)
    ordered.sliding(2).foreach {
      case Seq(p, n) => assert(p._6 == n._5)
      case _ =>
    }
  }

  test("preferencePairs: best vs worst per prompt, struct tie-breaks, " +
      "margin and n>=2 gates") {
    import spark.implicits._
    val cands = Seq(
      ("p1", 1L, 2.0), ("p1", 2L, 5.0), ("p1", 3L, 5.0), // tie at top
      ("p2", 6L, 9.0),                  // single candidate: dropped
      ("p3", 7L, 1.0), ("p3", 8L, 1.2), // margin 0.2 < 0.5: dropped
      ("p4", 4L, 2.0), ("p4", 5L, 2.0)  // all tied: margin 0, dropped
    ).toDF("p", "c", "s")
    val got = graft.operators.Training.preferencePairs(
        cands, col("p"), col("c"), col("s"), margin = 0.5)
      .as[(String, Long, Double, Long, Double, Double)]
      .collect().toSeq
    // top tie (5.0 at c=2,3) breaks toward the LARGER id
    assert(got == Seq(("p1", 3L, 5.0, 1L, 2.0, 3.0)))
  }

  test("lengthBatches: sorted cut into fixed batches, per-batch " +
      "padding = n*max - sum; the tail batch may run short") {
    import spark.implicits._
    val seqs = Seq(("a", 1L), ("b", 2L), ("c", 2L), ("d", 5L),
      ("e", 9L)).toDF("id", "len")
    val got = graft.operators.Training.lengthBatches(seqs, col("id"),
        col("len"), batchSize = 2L)
      .orderBy(col("batch"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 2L, 3L, 1L), (1L, 2L, 5L, 7L, 3L),
      (2L, 1L, 9L, 9L, 0L)))
  }

  test("leakageSafeSplit: clusters are split-atomic on the min member " +
      "fingerprint, singletons reproduce the naive bucket, the audit " +
      "reads zero for safe and the planted crossing for naive") {
    import spark.implicits._
    import graft.operators.Training
    // keys ARE the fingerprints (mod-100 buckets in comments);
    // cluster {1,2,3} spans naive buckets train(10)/val(93)/test(97) —
    // chained pairs (1-2, 2-3): transitivity must pull 3 into the
    // cluster even though (1,3) was never a pair
    val docs = Seq((1L, 10L), (2L, 93L), (3L, 97L),
      (4L, 94L), (5L, 42L)).toDF("id", "k")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val asg = Training.leakageSafeSplit(docs, col("id"), col("k"),
        pairs, col("a"), col("b"))
      .as[(Long, String)].collect().toMap
    // cluster key = min(10, 93, 97) = 10 → train for all members
    assert(asg(1L) == "train" && asg(2L) == "train" &&
      asg(3L) == "train")
    // singletons: naive buckets (94 → val, 42 → train)
    assert(asg(4L) == "val" && asg(5L) == "train")
    // audit: the safe assignment has zero crossings...
    val safeAsg = Training.leakageSafeSplit(docs, col("id"), col("k"),
      pairs, col("a"), col("b"))
    assert(Training.splitLeakage(safeAsg, col("id"), col("split"),
      pairs, col("a"), col("b")).isEmpty)
    // ...while the naive per-doc split leaks both planted pairs
    val naive = docs.select(col("id"),
      when(pmod(col("k"), lit(100)) < 90, "train")
        .when(pmod(col("k"), lit(100)) < 95, "val")
        .otherwise("test").as("split"))
    val leaks = Training.splitLeakage(naive, col("id"), col("split"),
        pairs, col("a"), col("b"))
      .as[(String, String, Long)].collect().toSet
    assert(leaks == Set(("train", "val", 1L), ("test", "val", 1L)))
  }
}
