package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Hard-negative mining: label exclusion, ranking, null-label
  * strictness, and IVF-arm recall against the exact baseline.
  */
class HardNegativesSpec extends SparkSuite {
  import spark.implicits._

  // two tight clusters (labels 0/1) + a far-away outlier (label 2):
  // within-cluster neighbors are positives (excluded); the nearest
  // OTHER-label vectors are the hard negatives
  private def vec(base: Double, i: Int): Seq[Double] =
    Seq.tabulate(8)(j => base + (if (j == i % 8) 0.01 * i else 0.0))

  private lazy val embs = (
    (0 until 6).map(i => (i.toLong, vec(1.0, i), 0)) ++
    (6 until 12).map(i => (i.toLong, vec(-1.0, i), 1)) ++
    Seq((12L, Seq(5.0, -5.0, 5.0, -5.0, 5.0, -5.0, 5.0, -5.0), 2))
  ).toDF("id", "vec", "label")

  test("negatives never share the anchor's label; k bound holds") {
    val out = Similarity.hardNegatives(embs.where(col("id") < 3),
      embs, k = 4).collect()
    val labels = embs.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (qa, vb) = (r.getLong(0), r.getLong(1))
      assert(labels(qa) !== labels(vb))
    }
    assert(out.groupBy(_.getLong(0)).values.forall(_.length <= 4))
  }

  test("ranking is by cosine descending with vb tiebreak") {
    val rows = Similarity.hardNegatives(embs.where(col("id") === 0),
      embs, k = 5).orderBy(col("rank")).collect()
    val coss = rows.map(_.getDouble(2))
    assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
  }

  test("null-labeled anchors mine nothing (strict inequality)") {
    val withNull = embs.union(Seq(
      (99L, Seq.fill(8)(1.0), null.asInstanceOf[Integer])
    ).toDF("id", "vec", "label"))
    val out = Similarity.hardNegatives(
      withNull.where(col("id") === 99), withNull, k = 3)
    assert(out.count() === 0)
  }

  test("IVF arm recalls the exact negatives at full probe settings") {
    val exact = Similarity.hardNegatives(embs.where(col("id") < 6),
      embs, k = 3).select("qa", "vb").as[(Long, Long)].collect().toSet
    // full probe + generous overfetch ⇒ candidate set covers corpus
    val ivf = Similarity.hardNegativesIvf(embs.where(col("id") < 6),
      embs, k = 3, overfetch = 8, centroids = 4, nprobe = 4, dim = 8)
      .select("qa", "vb").as[(Long, Long)].collect().toSet
    assert(ivf === exact)
  }

  test("overfetch buys back slots eaten by same-label candidates") {
    // with overfetch = 1 the probed shortlist can be all same-label;
    // with overfetch high enough the true negatives surface
    val k = 2
    val low = Similarity.hardNegativesIvf(embs.where(col("id") === 0),
      embs, k, overfetch = 1, centroids = 2, nprobe = 2, dim = 8)
      .count()
    val high = Similarity.hardNegativesIvf(embs.where(col("id") === 0),
      embs, k, overfetch = 16, centroids = 2, nprobe = 2, dim = 8)
      .count()
    assert(high >= low)
    assert(high >= 1)
  }
}
