package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Near-dup operators verified on constructed duplicates (the synthetic
  * corpus is near-unique, so recall is asserted here, not in the driver's
  * rows-only checks).
  */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog " * 10
  // ~1 word changed per copy → jaccard >> 0.8 vs base
  def docs = Seq(
    (0L, base),
    (1L, base.replace("lazy", "sleepy")),          // near-dup of 0
    (2L, base),                                    // exact dup of 0
    (3L, "completely different content about spark catalyst optimizer " * 8),
    (4L, "another unrelated document mentioning shuffles and joins " * 8)
  ).toDF("doc_id", "text")

  test("exactKeepFirst keeps lowest id per identical text") {
    val out = Dedup.exactKeepFirst(docs, col("text"), col("doc_id"))
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 1L, 3L, 4L)) // 2 deduped against 0
  }

  test("minhash LSH finds the constructed near-dup pair, skips unrelated") {
    val sh = Dedup.wordShingles(docs, col("doc_id"), col("text"), 3)
    val sigs = Dedup.minhashSignatures(sh, k = 32)
    val pairs = Dedup.minhashCandidates(sigs, rowsPerBand = 4,
      minEstJaccard = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((0L, 2L)))
    assert(pairs.contains((0L, 2L))) // exact dup always collides
    assert(!pairs.exists(p => p._2 == 3L || p._2 == 4L))
  }

  test("minhash estimated jaccard ≈ 1 for exact dups") {
    val sh = Dedup.wordShingles(docs, col("doc_id"), col("text"), 3)
    val sigs = Dedup.minhashSignatures(sh, k = 32)
    val est = Dedup.minhashCandidates(sigs)
      .where($"id_a" === 0 && $"id_b" === 2)
      .select($"est_jaccard").as[Double].head()
    assert(est == 1.0)
  }

  test("simhash: identical docs get identical hashes, near-dups are close") {
    val h = Dedup.simhash(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    assert(h(0L) == h(2L))
    assert(java.lang.Long.bitCount(h(0L) ^ h(1L)) <= 16)
    assert(java.lang.Long.bitCount(h(0L) ^ h(3L)) > 16)
  }

  test("simhashCandidates blocks by 16-bit windows and verifies hamming") {
    val h = Dedup.simhash(docs, col("doc_id"), col("text"))
    val pairs = Dedup.simhashCandidates(h, maxDist = 16)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("ngram jaccard: exact dup = 1.0, near-dup high, unrelated absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, leftFilter = _ < 100)
      .select($"da", $"db", $"jac").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // repeated base text → small DISTINCT shingle sets; one changed word
    // per cycle still leaves ~43% of distinct shingles shared
    assert(pairs((0L, 2L)) == 1.0)
    assert(pairs((0L, 1L)) > 0.4)
    assert(!pairs.contains((0L, 3L)))
  }

  test("wordShingles: doc shorter than n yields no shingles") {
    val tiny = Seq((9L, "only two")).toDF("doc_id", "text")
    assert(Dedup.wordShingles(tiny, col("doc_id"), col("text"), 3)
      .count() == 0)
  }

  test("embeddingNearDup finds duplicate vectors via LSH buckets") {
    val v1 = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val v2 = v1.clone(); v2(0) = v2(0) + 0.01f // near-dup
    val v3 = Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat)
    val embs = Seq((0L, v1), (1L, v2), (2L, v3))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(embs, col("vec_id"),
      col("embedding"), threshold = 0.99)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }
}
