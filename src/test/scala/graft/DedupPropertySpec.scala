package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Seeded-random property tests for the near-dup stack:
  *  - MinHash estimate correlates with true Jaccard (within tolerance on
  *    high-similarity pairs)
  *  - shingle counts round-trip (n_tokens - n + 1, floored at 0)
  *  - brute-force top-k is a superset benchmark for LSH candidates
  */
class DedupPropertySpec extends SparkSuite {
  import spark.implicits._

  val vocab: Array[String] =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa".split(" ")

  def randDoc(rnd: scala.util.Random, len: Int): String =
    Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")

  test("shingle count = max(0, tokens - n + 1) pre-distinct") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 50)
      .map(i => (i.toLong, randDoc(rnd, rnd.nextInt(12))))
      .toDF("doc_id", "text")
    val counts = Dedup.wordShingles(docs, col("doc_id"), col("text"), 3,
      dedup = false).groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      val want = math.max(0, text.split(" ", -1).length - 2)
      assert(counts.getOrElse(id, 0L) == want.toLong, s"doc $id")
    }
  }

  test("minhash estimate tracks true jaccard for near-dup pairs") {
    val rnd = new scala.util.Random(11)
    // pairs of docs sharing a controlled fraction of a base document
    val base = Seq.fill(200)(vocab(rnd.nextInt(vocab.length)))
    val docs = (0 until 10).flatMap { i =>
      val mutated = base.zipWithIndex.map { case (w, j) =>
        if (j % (i + 2) == 0) vocab(rnd.nextInt(vocab.length)) else w
      }
      Seq((i * 2L, base.mkString(" ")), (i * 2L + 1, mutated.mkString(" ")))
    }.toDF("doc_id", "text")
    val sh = Dedup.wordShingles(docs, col("doc_id"), col("text"), 3)
    val sigs = Dedup.minhashSignatures(sh, k = 64)
    val est = Dedup.minhashCandidates(sigs, rowsPerBand = 2)
      .where($"id_a" % 2 === 0 && $"id_b" === $"id_a" + 1)
      .select($"id_a", $"est_jaccard").as[(Long, Double)].collect().toMap
    val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      3, _ >= 0).where($"db" === $"da" + 1 && $"da" % 2 === 0)
      .select($"da", $"jac").as[(Long, Double)].collect().toMap
    // every truly-similar pair (jac >= 0.5) must surface as a candidate
    // with an estimate within 0.25 of truth (k = 64 → σ ≈ 0.06)
    exact.filter(_._2 >= 0.5).foreach { case (id, jac) =>
      assert(est.contains(id), s"pair ($id,${id + 1}) jac=$jac missed")
      assert(math.abs(est(id) - jac) < 0.25,
        s"pair $id est=${est(id)} true=$jac")
    }
  }

  test("LSH candidates are always a subset of the scored cross product") {
    val rnd = new scala.util.Random(13)
    val embs = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("id", "vec")
    val lsh = Similarity.lshTopK(embs.where($"id" < 5), embs, k = 10)
      .select($"qa", $"vb").as[(Long, Long)].collect()
    assert(lsh.forall { case (qa, vb) => qa < 5 && vb != qa })
    // ranks are 1..k dense per query
    val ranks = Similarity.lshTopK(embs.where($"id" < 5), embs, k = 10)
      .groupBy($"qa").agg(collect_list($"rank").as("rs"))
      .select($"rs").as[Seq[Int]].collect()
    ranks.foreach(rs => assert(rs.sorted == (1 to rs.length)))
  }
}
