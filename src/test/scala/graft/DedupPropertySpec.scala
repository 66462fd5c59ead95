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

  test("allPairsJaccard ≡ uncapped exact pairs at theta, random corpora") {
    // prefix filtering is an exactness-preserving PRUNING — across
    // seeds, sizes, and thresholds the result must equal the uncapped
    // quadratic-candidate path filtered at theta, tuple for tuple
    for ((seed, theta) <- Seq((3, 0.3), (17, 0.5), (29, 0.7))) {
      val rnd = new scala.util.Random(seed)
      // random docs PLUS planted mutated copies — guarantees pairs
      // above every tested threshold (non-vacuous fixture)
      val docs = ((0 until 40)
        .map(i => (i.toLong, randDoc(rnd, 3 + rnd.nextInt(15))))
        ++ (0 until 10).flatMap { i =>
          val words = randDoc(rnd, 12 + rnd.nextInt(8)).split(" ")
          // i ≡ 0 (mod 3): exact duplicate — non-vacuous at ANY θ;
          // otherwise progressively heavier mutation
          val mutated =
            if (i % 3 == 0) words
            else words.zipWithIndex.map { case (w, j) =>
              if (j % (3 + i % 4) == 0) vocab(rnd.nextInt(vocab.length))
              else w
            }
          Seq((100L + 2 * i, words.mkString(" ")),
            (101L + 2 * i, mutated.mkString(" ")))
        }).toDF("doc_id", "text")
      val got = Dedup.allPairsJaccard(docs, col("doc_id"), col("text"),
        n = 2, theta = theta)
        .select($"da", $"db", $"inter", $"na", $"nb")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = Dedup.ngramJaccardPairs(docs, col("doc_id"),
        col("text"), n = 2, leftFilter = _ >= 0)
        .where($"jac" >= theta)
        .select($"da", $"db", $"inter", $"na".cast("long"),
          $"nb".cast("long"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"seed=$seed theta=$theta")
      assert(want.nonEmpty, s"vacuous fixture at seed=$seed") // sanity
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

  test("minhashIncremental ≡ batch restriction over random corpora " +
      "with planted dup classes, across seeds and split points") {
    for (seed <- Seq(17, 23, 31)) {
      val rnd = new scala.util.Random(seed)
      // random corpus with planted exact dups, appended-tail near-dups,
      // and mutation-gradient pairs, shuffled across the split point
      val originals = (0 until 40)
        .map(i => (i.toLong, randDoc(rnd, 30 + rnd.nextInt(60))))
      val planted = originals.take(12).zipWithIndex.map {
        case ((_, text), j) =>
          val mutated = j % 3 match {
            case 0 => text // exact dup
            case 1 => text + " " + randDoc(rnd, 2) // appended tail
            case _ => // mutate ~1 in 6 tokens
              text.split(" ").map(w =>
                if (rnd.nextInt(6) == 0) vocab(rnd.nextInt(vocab.length))
                else w).mkString(" ")
          }
          ((100 + j).toLong, mutated)
      }
      val docs = (originals ++ planted).toDF("doc_id", "text")
      val split = 20 + rnd.nextInt(80)
      val hist = docs.where($"doc_id" < split)
      val batch = docs.where($"doc_id" >= split)
      val incr = Dedup.minhashIncremental(batch, col("doc_id"),
          col("text"),
          Dedup.minhashSigsNative(hist, col("doc_id"), col("text")))
        .select($"doc_id").as[Long].collect().toSet
      val removedFull = Dedup.minhashCandidates(
          Dedup.minhashSigsNative(docs, col("doc_id"), col("text")))
        .where($"est_jaccard" >= 0.8 && $"id_b" >= split)
        .select($"id_b").as[Long].collect().toSet
      val expect = batch.select($"doc_id").as[Long].collect().toSet --
        removedFull
      assert(incr == expect,
        s"seed=$seed split=$split diff=${(incr diff expect) ++
          (expect diff incr)}")
      // the manifest-pruned BANDED store path must agree with the flat
      // path on the same corpus/split — property-guards the file
      // pruning (a wrongly skipped store file would silently admit a
      // dup only on some random layout)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-prop-banded-$seed-").toString
      Dedup.writeBandedSigStore(
        Dedup.minhashSigsNative(hist, col("doc_id"), col("text")),
        s"$root/store", s"$root/manifest", filesOut = 16)
      val banded = Dedup.minhashIncrementalBanded(batch, col("doc_id"),
          col("text"), s"$root/store", s"$root/manifest")
        .select($"doc_id").as[Long].collect().toSet
      assert(banded == expect,
        s"banded seed=$seed split=$split diff=${(banded diff expect) ++
          (expect diff banded)}")
    }
  }
}
