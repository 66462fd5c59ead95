package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.{Overlap, TextAnalysis}

/** KMV distinct/overlap sketches: sketch content vs a direct min-k
  * computation, merge semigroup law, estimator exactness when
  * unsaturated, accuracy when saturated, and the bounded-buffer
  * aggregation plan shape.
  */
class OverlapSpec extends SparkSuite {
  import spark.implicits._

  // two groups over a shared value universe with a controlled overlap:
  // g1 holds 0..799, g2 holds 400..1199 (|∩| = 400, |∪| = 1200, J = 1/3)
  private lazy val items = ((0 until 800).map(v => ("g1", s"v$v"))
    ++ (400 until 1200).map(v => ("g2", s"v$v")))
    .toDF("src", "item")

  test("sketch holds exactly the k smallest distinct fingerprints") {
    val k = 32
    val sk = Overlap.kmvSketch(items, col("src"), col("item"), k)
      .as[(String, Array[Long])].collect().toMap
    val want = items
      .select(col("src"), Overlap.kmvHash(col("item")).as("fp"))
      .distinct().as[(String, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.take(k)).toMap
    assert(sk.keySet == Set("g1", "g2"))
    sk.foreach { case (g, arr) =>
      assert(arr.toSeq == want(g).toSeq, s"group $g")
    }
  }

  test("merge of split sketches ≡ sketch of the whole, bit for bit") {
    val k = 32
    val (l, r) = (items.where(length(col("item")) <= 4),
      items.where(length(col("item")) > 4))
    val merged = Overlap.kmvMerge(
        Overlap.kmvSketch(l, col("src"), col("item"), k),
        Overlap.kmvSketch(r, col("src"), col("item"), k), k)
      .as[(String, Array[Long])].collect().toMap
    val whole = Overlap.kmvSketch(items, col("src"), col("item"), k)
      .as[(String, Array[Long])].collect().toMap
    assert(merged.view.mapValues(_.toSeq).toMap ==
      whole.view.mapValues(_.toSeq).toMap)
  }

  test("unsaturated sketch estimates exactly; saturated within 30%") {
    // k far above the distinct count → dhat is the exact count
    val exactEst = Overlap.kmvDistinct(
        Overlap.kmvSketch(items.where(col("src") === "g1")
          .limit(50), col("src"), col("item"), k = 512), k = 512)
      .as[(String, Long, Long)].collect()
    assert(exactEst.forall { case (_, nSeen, dhat) => dhat == nSeen })
    // saturated: 800 distinct at k = 64 → ~12.7% stderr; assert 30%
    val est = Overlap.kmvDistinct(
        Overlap.kmvSketch(items.where(col("src") === "g1"),
          col("src"), col("item"), k = 64), k = 64)
      .select(col("dhat")).as[Long].head()
    assert(math.abs(est - 800.0) / 800.0 < 0.30, s"dhat=$est")
  }

  test("pairwise overlap estimates track truth (J = 1/3, |∩| = 400)") {
    val ov = Overlap.kmvOverlap(
        Overlap.kmvSketch(items, col("src"), col("item"), k = 64),
        k = 64)
      .as[(String, String, Long, Long, Long, Double, Long)].collect()
    assert(ov.length == 1)
    val (ga, gb, ku, matches, dhatU, jacEst, interEst) = ov.head
    assert((ga, gb) == ("g1", "g2"))
    assert(ku == 64L)
    // J = 1/3: k·J ± ~4σ (σ = √(k·J·(2/3)) ≈ 3.8)
    assert(matches >= 7 && matches <= 36, s"matches=$matches")
    assert(math.abs(jacEst - 1.0 / 3) < 0.25, s"jac_est=$jacEst")
    assert(math.abs(dhatU - 1200.0) / 1200.0 < 0.30, s"dhat_u=$dhatU")
    assert(math.abs(interEst - 400.0) / 400.0 < 0.80,
      s"inter_est=$interEst") // product of two estimators — loose
    assert(interEst == matches * dhatU / ku) // integer identity
  }

  test("containment/novelty track truth (|g1∩g2|/|g2| = 0.5)") {
    // history = g1's universe, batch = g2's, same group label: half of
    // g2 (400..799 of 400..1199) already exists in history
    val hist = Overlap.kmvSketch(
      items.where(col("src") === "g1").withColumn("src", lit("g")),
      col("src"), col("item"), 64)
    val batch = Overlap.kmvSketch(
      items.where(col("src") === "g2").withColumn("src", lit("g")),
      col("src"), col("item"), 64)
    val r = Overlap.kmvContainment(hist, batch, 64)
      .select(col("cont_est"), col("novelty")).as[(Double, Double)]
      .collect()
    assert(r.length == 1)
    val (cont, nov) = r.head
    assert(math.abs(cont - 0.5) < 0.35, s"cont_est=$cont")
    assert(math.abs(nov - 0.5) < 0.35 && nov == 1.0 - cont)
  }

  test("retractable unit store: fold ≡ from-scratch; delete ≡ " +
      "from-scratch over survivors pre- and post-OPTIMIZE; tombstones " +
      "clear; re-add after compaction; monotone guard") {
    val k = 32
    // give every item a unit (document) id: 20 items per unit
    val unitItems = items.withColumn("unit",
      (substring(col("item"), 2, 10).cast("long") / 20).cast("long"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kmvdel-").toString + "/store"
    Overlap.writeKmvUnitStore(unitItems.where(col("unit") % 2 === 0),
      col("src"), col("unit"), col("item"), k, dir)
    Overlap.appendKmvUnitSketches(unitItems.where(col("unit") % 2 === 1),
      col("src"), col("unit"), col("item"), k, dir, batchId = 1L)
    def folded = Overlap.kmvStoreSketches(spark, dir, k)
      .as[(String, Array[Long])].collect().toMap
      .view.mapValues(_.toSeq).toMap
    def scratch(df: org.apache.spark.sql.DataFrame) =
      Overlap.kmvSketch(df, col("src"), col("item"), k)
        .as[(String, Array[Long])].collect().toMap
        .view.mapValues(_.toSeq).toMap
    assert(folded == scratch(unitItems)) // semigroup fold ≡ whole
    // retract units 3 and 10 (spanning both batches)
    Overlap.deleteKmvUnits(Seq(3L, 10L).toDF("unit"), dir, 2L)
    val survivors = unitItems.where(!col("unit").isin(3L, 10L))
    assert(folded == scratch(survivors)) // zero-staleness read
    // re-streamed tombstone: a set, naturally idempotent
    Overlap.deleteKmvUnits(Seq(3L).toDF("unit"), dir, 3L)
    assert(folded == scratch(survivors))
    // OPTIMIZE: physical drop + tombstone clear, answers unchanged
    // (the fold token is the MAIN root's newest batch — tombstone
    // batches live under deleted/ and carry their own tokens)
    assert(Overlap.compactKmvUnitStore(spark, dir).contains(1L))
    assert(folded == scratch(survivors))
    assert(spark.read.parquet(
        graft.operators.Stats.committedViewDirs(spark,
          s"$dir/deleted"): _*).isEmpty)
    // nothing additive remembers a cleared unit — re-adding it after
    // the cycle is legitimate and restores the full-corpus sketch
    Overlap.appendKmvUnitSketches(
      unitItems.where(col("unit").isin(3L, 10L)),
      col("src"), col("unit"), col("item"), k, dir, batchId = 4L)
    assert(folded == scratch(unitItems))
    // monotone guard: an append at or below the fold token is loud
    intercept[IllegalArgumentException] {
      Overlap.appendKmvUnitSketches(unitItems, col("src"), col("unit"),
        col("item"), k, dir, batchId = 3L)
    }
  }

  test("null keys are ignored, not a runtime crash") {
    val withNulls = items.unionByName(
      Seq(("g1", null.asInstanceOf[String]),
        ("g2", null.asInstanceOf[String])).toDF("src", "item"))
    val a = Overlap.kmvSketch(withNulls, col("src"), col("item"), 32)
      .as[(String, Array[Long])].collect().toMap
    val b = Overlap.kmvSketch(items, col("src"), col("item"), 32)
      .as[(String, Array[Long])].collect().toMap
    assert(a.view.mapValues(_.toSeq).toMap ==
      b.view.mapValues(_.toSeq).toMap)
  }

  test("sketch aggregation is one bounded-buffer shuffle") {
    val sk = Overlap.kmvSketch(items, col("src"), col("item"), k = 64)
    sk.collect()
    val shuffles = physicalNodes(sk)
      .count(_.isInstanceOf[ShuffleExchangeExec])
    // fingerprint pass is narrow; the only exchange carries ≤ k-long
    // partial buffers per (partition, group)
    assert(shuffles == 1, s"expected 1 exchange, got $shuffles")
  }
}
