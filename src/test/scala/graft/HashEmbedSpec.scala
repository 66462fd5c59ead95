package graft

import org.apache.spark.sql.functions._
import graft.functions.PolyFp
import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.unsafe.types.UTF8String

/** Signed feature-hashing text embeddings and the model-free
  * text → vector → ANN composition.
  */
class HashEmbedSpec extends SparkSuite {
  import spark.implicits._

  private def refEmbed(text: String, dim: Int): Array[Long] = {
    val counts = new Array[Long](dim)
    text.split(" ", -1).filter(_.nonEmpty).foreach { tok =>
      val fp = PolyFp.mix(0L, UTF8String.fromString(tok))
      val f = (fp % dim).toInt
      if ((fp / dim) % 2 == 0L) counts(f) += 1 else counts(f) -= 1
    }
    counts
  }

  test("count embedding matches the reference fold; token multiplicity kept") {
    val txt = "spark window spark merge  spark"
    val got = Seq(txt).toDF("text")
      .select(TextAnalysis.hashEmbed(col("text"), 32, normalize = false))
      .as[Seq[Double]].collect().head
    assert(got === refEmbed(txt, 32).map(_.toDouble).toSeq)
    // 3x "spark" lands 3 units of signed mass in one bucket
    assert(got.map(math.abs).max >= 3.0 ||
      got.count(_ != 0.0) < 3) // unless buckets collide
  }

  test("normalized embedding has unit L2 norm; zero text stays zero") {
    val rows = Seq("merge window scan filter", "", "   ").toDF("text")
      .select(TextAnalysis.hashEmbed(col("text"), 64).as("v"))
      .as[Seq[Double]].collect()
    val n0 = math.sqrt(rows(0).map(x => x * x).sum)
    assert(math.abs(n0 - 1.0) < 1e-12)
    assert(rows(1).forall(_ == 0.0)) // no tokens → zero vector, no NaN
    assert(rows(2).forall(_ == 0.0))
  }

  test("similar texts score higher cosine than dissimilar ones") {
    val docs = Seq(
      (1L, "spark merge window aggregate shuffle partition"),
      (2L, "spark merge window aggregate shuffle join"),
      (3L, "goal team league match referee stadium crowd")
    ).toDF("id", "text")
      .select(col("id"),
        TextAnalysis.hashEmbed(col("text"), 64, normalize = false)
          .as("vec"))
    val top = Similarity.bruteForceTopK(
      docs.where(col("id") === 1), docs.where(col("id") =!= 1), 2)
      .orderBy(col("rank")).select("vb").as[Long].collect()
    assert(top.head === 2L)
  }

  test("count-vector cosines are exact integer arithmetic (order-free)") {
    // cos from bruteForceTopK equals the hand-computed sparse formula
    val a = refEmbed("spark merge window", 64)
    val b = refEmbed("spark merge filter scan", 64)
    val want = a.zip(b).map { case (x, y) => x * y }.sum.toDouble /
      (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    val docs = Seq((1L, "spark merge window"), (2L, "spark merge filter scan"))
      .toDF("id", "text")
      .select(col("id"),
        TextAnalysis.hashEmbed(col("text"), 64, normalize = false)
          .as("vec"))
    val got = Similarity.bruteForceTopK(
      docs.where(col("id") === 1), docs.where(col("id") === 2), 1)
      .select("cos").as[Double].collect().head
    assert(got === want) // bitwise — no tolerance
  }

  test("normalized embeddings compose with sign-LSH bucketing") {
    val docs = Seq((1L, "spark merge window scan"),
      (2L, "spark merge window scan"),
      (3L, "goal team league match")).toDF("id", "text")
      .select(col("id"), TextAnalysis.hashEmbed(col("text"), 64).as("vec"))
    val b = Similarity.signBuckets(docs, col("vec"), planes = 8)
    // identical texts share the bucket
    val byId = b.select("id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) === byId(2L))
  }
}
