package graft

import org.apache.spark.sql.functions._
import graft.operators.Frequency

/** Count-Min sketch: probe hashing mirrors the aggregate, the one-sided
  * error guarantee holds, and the heavy-hitter path equals the naive
  * GROUP BY ... HAVING.
  */
class FrequencySpec extends SparkSuite {
  import spark.implicits._

  private def toks = {
    val words = Seq.tabulate(2000) { i =>
      if (i % 3 == 0) "alpha" else if (i % 7 == 0) "beta" else s"w$i"
    }
    words.toDF("tok")
  }

  test("estimate >= exact for every item (CMS one-sided error)") {
    val sk = Frequency.sketchBytes(toks, col("tok"))
    val bad = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
      .where(Frequency.estimate($"tok", sk) < $"n")
      .count()
    assert(bad == 0)
  }

  test("estimates stay within eps * N of exact on the fixture") {
    val n = toks.count()
    val eps = 0.001
    val sk = Frequency.sketchBytes(toks, col("tok"), eps = eps)
    val over = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
      .select(Frequency.estimate($"tok", sk).as("est"), $"n")
      .where($"est" > $"n" + lit(math.ceil(eps * n).toLong))
      .count()
    assert(over == 0, s"$over items overestimated past eps*N")
  }

  test("heavyHitters equals the naive GROUP BY HAVING") {
    // alpha ≈ 667 (every 3rd), beta ≈ 190 (every 7th not 3rd)
    val got = Frequency.heavyHitters(toks, $"tok", threshold = 150)
      .as[(String, Long)].collect().toMap
    val naive = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
      .where($"n" >= 150).as[(String, Long)].collect().toMap
    assert(got == naive)
    assert(got.contains("alpha") && got.contains("beta"))
    assert(!got.keys.exists(_.startsWith("w")))
  }

  test("threshold 1 (every item survives) stays exact with no broadcast") {
    // the regime that used to broadcast ~every distinct item to the
    // driver; now the sketch filter is map-side and the only shuffle is
    // the survivors' exact count
    val got = Frequency.heavyHitters(toks, $"tok", threshold = 1)
    got.collect()
    val naive = toks.groupBy($"tok").agg(count(lit(1)).as("n_occ"))
    assert(got.count() == naive.count())
    assert(!physicalNodes(got).exists(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]))
  }

  test("long items probe correctly too") {
    val ids = Seq.tabulate(1000)(i => (i % 10).toLong).toDF("id")
    val sk = Frequency.sketchBytes(ids, col("id"))
    val bad = ids.groupBy($"id").agg(count(lit(1)).as("n"))
      .where(Frequency.estimate($"id", sk) < $"n").count()
    assert(bad == 0)
  }
}
