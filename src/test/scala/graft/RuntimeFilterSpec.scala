package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.RuntimeFilter

/** Bloom runtime-filter joins: exact equivalence to the naive twins
  * (the one-sided Bloom guarantee makes the pre-filter lossless), the
  * no-false-negative property itself, and the plan shape the operator
  * exists for — the probe predicate sitting UNDER the fact side's
  * exchange.
  */
class RuntimeFilterSpec extends SparkSuite {
  import spark.implicits._

  private def fact =
    spark.range(0, 2000).select(col("id").as("k"),
      (col("id") % 7).as("v"))
  private def dim =
    spark.range(0, 2000).where(col("id") % 13 === 0)
      .select(col("id").as("dk"), lit("d").as("tag"))

  test("bloomJoin ≡ naive inner join, long keys") {
    val got = RuntimeFilter.bloomJoin(fact, dim, col("k"), col("dk"),
      expectedItems = 1000L).orderBy("k").collect()
    val want = fact.join(dim, col("k") === col("dk"))
      .orderBy("k").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("bloomSemiJoin ≡ naive left semi, string keys") {
    val sf = fact.select(concat(lit("k"), col("k")).as("k"), col("v"))
    val sd = dim.select(concat(lit("k"), col("dk")).as("dk"))
    val got = RuntimeFilter.bloomSemiJoin(sf, sd, col("k"), col("dk"),
      expectedItems = 1000L).orderBy("k").collect()
    val want = sf.join(sd, col("k") === col("dk"), "left_semi")
      .orderBy("k").collect()
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("bloomAntiJoin ≡ naive left anti, including null fact keys") {
    val withNulls = fact
      .select(when(col("k") % 5 === 0, lit(null)).otherwise(col("k"))
        .as("k"), col("v"))
    val got = RuntimeFilter.bloomAntiJoin(withNulls, dim, col("k"),
        col("dk"), expectedItems = 1000L)
      .orderBy(col("k").asc_nulls_first, col("v")).collect()
    val want = withNulls.join(dim, col("k") === col("dk"), "left_anti")
      .orderBy(col("k").asc_nulls_first, col("v")).collect()
    assert(got.toSeq == want.toSeq)
    // null keys never match in an anti join → all survive
    assert(got.count(_.isNullAt(0)) == 400)
  }

  test("property: all three Bloom joins ≡ their naive twins on " +
      "seeded-random key sets (varied overlap, duplicates, tiny fpp " +
      "budgets)") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { round =>
      val factKeys = Seq.fill(300)(rnd.nextInt(120).toLong)
      val dimKeys = Seq.fill(40 * round)(rnd.nextInt(200).toLong)
      val f = factKeys.zipWithIndex
        .map { case (k, i) => (k, i.toLong) }.toDF("k", "row")
      val dm = dimKeys.distinct.map(k => (k, s"d$k")).toDF("dk", "tag")
      // deliberately undersized filter: raises fpp, never correctness
      val items = math.max(1L, dimKeys.length / (round * 2L))
      val j = RuntimeFilter.bloomJoin(f, dm, col("k"), col("dk"),
        items, fpp = 0.3).orderBy("row", "dk").collect()
      val jw = f.join(dm, col("k") === col("dk"))
        .orderBy("row", "dk").collect()
      assert(j.toSeq == jw.toSeq, s"join round $round")
      val sj = RuntimeFilter.bloomSemiJoin(f, dm, col("k"), col("dk"),
        items, fpp = 0.3).orderBy("row").collect()
      val sw = f.join(dm, col("k") === col("dk"), "left_semi")
        .orderBy("row").collect()
      assert(sj.toSeq == sw.toSeq, s"semi round $round")
      val aj = RuntimeFilter.bloomAntiJoin(f, dm, col("k"), col("dk"),
        items, fpp = 0.3).orderBy("row").collect()
      val aw = f.join(dm, col("k") === col("dk"), "left_anti")
        .orderBy("row").collect()
      assert(aj.toSeq == aw.toSeq, s"anti round $round")
    }
  }

  test("no false negatives: every dim key probes true") {
    val bytes = RuntimeFilter.bloomBytes(dim, col("dk"), 1000L)
    val misses = dim
      .where(!RuntimeFilter.mightContain(col("dk"), bytes)).count()
    assert(misses == 0)
  }

  test("probe filters map-side: the bloom predicate sits under the " +
      "fact-side exchange and drops non-candidates before it") {
    val joined = RuntimeFilter.bloomJoin(
      fact.repartition(4, col("v")), // force a shuffle join shape
      dim, col("k"), col("dk"), expectedItems = 1000L, fpp = 0.001)
    joined.collect()
    val nodes = physicalNodes(joined)
    val bloomFilters = nodes.collect {
      case f: FilterExec
          if f.condition.toString.contains("bloom_might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "bloom probe not in the plan")
    // the probe's output is candidate-sized, not fact-sized: 154
    // dim keys out of 2000 fact rows + fpp slack
    val probedRows = bloomFilters.map(f =>
      f.metrics("numOutputRows").value).min
    assert(probedRows < 400,
      s"probe passed $probedRows rows — not filtering map-side")
  }

  test("anti join shuffles only the maybe-contained sliver") {
    val res = RuntimeFilter.bloomAntiJoin(fact, dim, col("k"),
      col("dk"), expectedItems = 1000L, fpp = 0.001)
    res.collect()
    // definite-out arm bypasses every exchange: total rows crossing
    // shuffles must be far below |fact| + |result| (a naive anti join
    // shuffles all 2000 fact rows; here only ~154+fpp candidates do)
    val shuffled = physicalNodes(res).collect {
      case s: ShuffleExchangeExec => s.metrics("numOutputRows").value
    }
    assert(shuffled.forall(_ <= 400),
      s"an exchange carried ${shuffled.mkString(",")} rows — the " +
        "definite-out arm is being shuffled")
  }
}
