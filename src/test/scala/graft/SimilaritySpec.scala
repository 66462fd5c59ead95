package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.queries.ParityQueries.t

/** ANN quality: LSH top-k recall measured against brute force on the real
  * embeddings table.
  */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  lazy val embs = t(spark, sf0001, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("brute force: k results per query, ranked by cosine desc") {
    val res = Similarity.bruteForceTopK(embs.where($"id" < 5), embs, 5)
      .select($"qa", $"rank", $"cos").collect()
    assert(res.length == 25)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("cosine of a vector with itself is 1") {
    val self = Similarity.bruteForceTopK(embs.where($"id" === 0),
      embs.withColumn("id", $"id" + 1000), 1)
      .where($"vb" === 1000).select($"cos").as[Double].collect()
    assert(self.length == 1 && math.abs(self(0) - 1.0) < 1e-9)
  }

  test("IVF ANN: k dense ranks per query, recall reported") {
    val q = embs.where($"id" < 20)
    val ivf = Similarity.ivfTopK(q, embs, 5, centroids = 16, nprobe = 6)
      .select($"qa", $"rank", $"vb").collect()
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.length))
    }
    val exact = Similarity.bruteForceTopK(q, embs, 5)
      .select($"qa", $"vb").as[(Long, Long)].collect().toSet
    val approx = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall")
    assert(recall >= 0.2) // random corpus, random centroids: weak cells
  }

  test("quantized IVF: with full probe and full shortlist the exact " +
      "float re-rank reproduces bruteForceTopK bit-for-bit") {
    val q = embs.where($"id" < 5)
    val n = embs.count().toInt
    val full = Similarity.ivfTopKQuantized(q, embs, k = 5,
        shortlist = n, centroids = 16, nprobe = 16)
      .select($"qa", $"rank", $"vb", $"cos")
      .as[(Long, Int, Long, Double)].collect().toSet
    val bf = Similarity.bruteForceTopK(q, embs, 5)
      .select($"qa", $"rank", $"vb", $"cos")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full == bf,
      "full-probe full-shortlist quantized IVF must equal brute force")
  }

  test("quantized IVF at production settings (fitted centroids): " +
      "recall@5 >= 0.8 vs brute force, and the int8 shortlist costs " +
      "almost nothing vs the float IVF path") {
    val q = embs.where($"id" < 20)
    val cents = Similarity.fitCentroids(embs, k = 16, iters = 3)
    val ivfq = Similarity.ivfTopKQuantized(q, embs, k = 5,
        shortlist = 20, nprobe = 6, fitted = Some(cents))
      .select($"qa", $"rank", $"vb").collect()
    ivfq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to ranks.length))
    }
    val got = ivfq.map(r => (r.getLong(0), r.getLong(2))).toSet
    val bf = Similarity.bruteForceTopK(q, embs, 5)
      .select($"qa", $"vb").as[(Long, Long)].collect().toSet
    val recall = bf.count(got.contains).toDouble / bf.size
    assert(recall >= 0.8, s"quantized-IVF recall $recall < 0.8")
    // isolate the quantization cost from probe misses: the int8
    // shortlist + exact re-rank must agree with the float IVF on >= 90%
    // of pairs at the same probe settings
    val ivf = Similarity.ivfTopK(q, embs, k = 5, nprobe = 6,
        fitted = Some(cents))
      .select($"qa", $"vb").as[(Long, Long)].collect().toSet
    val agree = ivf.count(got.contains).toDouble / ivf.size
    assert(agree >= 0.9, s"quantized vs float IVF agreement $agree < 0.9")
  }

  test("IVF-PQ: with full probe and full shortlist the exact re-rank " +
      "reproduces bruteForceTopK bit-for-bit") {
    val q = embs.where($"id" < 5)
    val n = embs.count().toInt
    val books = Similarity.fitPqCodebooks(embs, m = 8, ks = 16,
      iters = 2)
    val full = Similarity.ivfTopKPq(q, embs, k = 5, shortlist = n,
        centroids = 16, nprobe = 16, fittedPq = Some(books))
      .select($"qa", $"rank", $"vb", $"cos")
      .as[(Long, Int, Long, Double)].collect().toSet
    val bf = Similarity.bruteForceTopK(q, embs, 5)
      .select($"qa", $"rank", $"vb", $"cos")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full == bf,
      "full-probe full-shortlist IVF-PQ must equal brute force")
  }

  test("IVF-PQ at production settings (fitted coarse + codebooks): " +
      "recall@5 >= 0.7 vs brute force; codebooks round-trip parquet " +
      "bit-exactly") {
    val q = embs.where($"id" < 20)
    val cents = Similarity.fitCentroids(embs, k = 16, iters = 3)
    val books = Similarity.fitPqCodebooks(embs, m = 16, ks = 16,
      iters = 2)
    val got = Similarity.ivfTopKPq(q, embs, k = 5, shortlist = 40,
        nprobe = 6, m = 16, fittedCoarse = Some(cents),
        fittedPq = Some(books))
      .select($"qa", $"vb").as[(Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(q, embs, 5)
      .select($"qa", $"vb").as[(Long, Long)].collect().toSet
    val recall = bf.count(got.contains).toDouble / bf.size
    assert(recall >= 0.7, s"IVF-PQ recall $recall < 0.7")
    // fit-once artifact: save/load reproduces the codes (and so every
    // downstream score) exactly
    val p = java.nio.file.Files
      .createTempDirectory("graft-pqbooks-").toString + "/books"
    Similarity.savePqCodebooks(spark, books, p)
    val loaded = Similarity.loadPqCodebooks(spark, p)
    assert(loaded.length == books.length &&
      loaded.zip(books).forall { case (a, b) =>
        a.zip(b).forall { case (x, y) => x.sameElements(y) } })
  }

  test("pq code store: frozen-fit appends ≡ full re-encode " +
      "bit-exactly; retry-idempotent; newest batch wins a re-sent " +
      "id; compaction preserves the view; probes read the store") {
    val hist = embs.where(pmod($"id", lit(10)) =!= 3)
    val batch = embs.where(pmod($"id", lit(10)) === 3)
    val cents = Similarity.fitCentroids(hist, k = 16, iters = 3)
    val books = Similarity.fitPqCodebooks(hist, m = 16, ks = 16,
      iters = 2, coarse = Some(cents))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pqstore-").toString + "/pq"
    Similarity.writePqCodeStore(hist, cents, books, dir,
      residual = true)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"vb", $"cell", $"codes", $"rn")
      .as[(Long, Int, Seq[Int], Double)].collect().toSet
    Similarity.pqStoreAppend(batch, dir, batchId = 1L): Unit
    val want = rows(Similarity.pqEncode(embs, cents, books,
      residual = true))
    assert(rows(Similarity.pqStoreCodes(spark, dir)) == want)
    // retry of the same append overwrites identically
    Similarity.pqStoreAppend(batch, dir, batchId = 1L): Unit
    assert(rows(Similarity.pqStoreCodes(spark, dir)) == want)
    // the probe path reads the appended store bit-equally to a fresh
    // full encode
    val q = embs.where($"id" < 10)
    def ann(enc: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKPq(q, embs, k = 5, shortlist = 40,
          nprobe = 6, m = 16, fittedCoarse = Some(cents),
          fittedPq = Some(books),
          encoded = Some(enc), residual = true)
        .select($"qa", $"rank", $"vb", $"cos")
        .as[(Long, Int, Long, Double)].collect().toSet
    assert(ann(Similarity.pqStoreCodes(spark, dir)) ==
      ann(Similarity.pqEncode(embs, cents, books, residual = true)))
    // compaction folds to one generation, view unchanged
    assert(Similarity.compactPqCodeStore(spark, dir).isDefined)
    assert(rows(Similarity.pqStoreCodes(spark, dir)) == want)
    // a re-sent id is folded newest-wins: id 0 re-encoded with id 1's
    // vector takes id 1's codes
    val resent = embs.where($"id" === 1)
      .select(lit(0L).as("id"), $"vec")
    Similarity.pqStoreAppend(resent, dir, batchId = 2L): Unit
    val v = rows(Similarity.pqStoreCodes(spark, dir))
    val id1 = want.find(_._1 == 1L).get
    assert(v.contains((0L, id1._2, id1._3, id1._4)))
    assert(v.size == want.size)
    // tombstone deletes hide ids at read time: view == surviving set
    Similarity.pqStoreDelete(
      embs.select($"id").where(pmod($"id", lit(7)) === 0), dir,
      batchId = 3L)
    val afterDel = rows(Similarity.pqStoreCodes(spark, dir))
    assert(afterDel == v.filterNot(_._1 % 7 == 0))
    assert(afterDel.size < v.size)
    // the probe path never returns a deleted id
    val annDel = ann(Similarity.pqStoreCodes(spark, dir))
    assert(annDel.forall(_._3 % 7 != 0))
    // a re-add after the delete wins by batch id
    Similarity.pqStoreAppend(embs.where($"id" === 7L), dir,
      batchId = 4L): Unit
    assert(rows(Similarity.pqStoreCodes(spark, dir))
      .exists(_._1 == 7L))
    // compaction drops tombstoned ids PHYSICALLY: the folded
    // generation holds no cell = -1 rows and no deleted id
    assert(Similarity.compactPqCodeStore(spark, dir).isDefined)
    val gen = spark.read.parquet(s"$dir/gen=4")
    assert(gen.where($"cell" < 0).isEmpty)
    assert(gen.where($"vb" % 7 === 0 && $"vb" =!= 7L).isEmpty)
    assert(rows(Similarity.pqStoreCodes(spark, dir)) ==
      v.filterNot(r => r._1 % 7 == 0 && r._1 != 7L))
  }

  test("IVF-PQ residual mode (IVFADC proper): full probe ≡ brute " +
      "force bit-for-bit; production recall matches or beats raw " +
      "encoding") {
    val cents = Similarity.fitCentroids(embs, k = 16, iters = 3)
    val rbooks = Similarity.fitPqCodebooks(embs, m = 16, ks = 16,
      iters = 2, coarse = Some(cents))
    val q5 = embs.where($"id" < 5)
    val n = embs.count().toInt
    val full = Similarity.ivfTopKPq(q5, embs, k = 5, shortlist = n,
        nprobe = 16, m = 16, fittedCoarse = Some(cents),
        fittedPq = Some(rbooks), residual = true)
      .select($"qa", $"rank", $"vb", $"cos")
      .as[(Long, Int, Long, Double)].collect().toSet
    val bf5 = Similarity.bruteForceTopK(q5, embs, 5)
      .select($"qa", $"rank", $"vb", $"cos")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full == bf5,
      "full-probe full-shortlist residual IVF-PQ must equal brute force")
    val q = embs.where($"id" < 20)
    val bf = Similarity.bruteForceTopK(q, embs, 5)
      .select($"qa", $"vb").as[(Long, Long)].collect().toSet
    def recallOf(books: Array[Array[Array[Double]]],
                 res: Boolean): Double = {
      val got = Similarity.ivfTopKPq(q, embs, k = 5, shortlist = 40,
          nprobe = 6, m = 16, fittedCoarse = Some(cents),
          fittedPq = Some(books), residual = res)
        .select($"qa", $"vb").as[(Long, Long)].collect().toSet
      bf.count(got.contains).toDouble / bf.size
    }
    val rRes = recallOf(rbooks, res = true)
    val rRaw = recallOf(Similarity.fitPqCodebooks(embs, m = 16,
      ks = 16, iters = 2), res = false)
    info(s"PQ recall@5 residual=$rRes raw=$rRaw")
    assert(rRes >= 0.7, s"residual-PQ recall $rRes < 0.7")
    assert(rRes >= rRaw - 0.05,
      s"residual encoding lost recall: $rRes vs raw $rRaw")
  }

  test("IVF with fitted k-means centroids matches or beats random cells") {
    val q = embs.where($"id" < 20)
    val exact = Similarity.bruteForceTopK(q, embs, 5)
      .select($"qa", $"vb").as[(Long, Long)].collect().toSet
    def recallOf(fitted: Option[Array[Array[Double]]]): Double = {
      val approx = Similarity.ivfTopK(q, embs, 5, centroids = 16,
          nprobe = 6, fitted = fitted)
        .select($"qa", $"vb").as[(Long, Long)].collect().toSet
      (exact & approx).size.toDouble / exact.size
    }
    val cents = Similarity.fitCentroids(embs, k = 16, iters = 3)
    assert(cents.length == 16 && cents.forall(_.length == 64))
    // fit must be deterministic (stable init + exact per-cell means)
    assert(Similarity.fitCentroids(embs, k = 16, iters = 3)
      .map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    val rFit = recallOf(Some(cents))
    val rRandom = recallOf(None)
    info(s"IVF recall@5 fitted=$rFit random=$rRandom")
    assert(rFit >= rRandom - 0.05) // data-adaptive cells: never much worse
    assert(rFit >= 0.2)
    // the persisted artifact reproduces the fit bit-exactly, so a
    // loading session gets identical IVF assignments
    val cp = s"/tmp/graft-cents-${System.nanoTime()}"
    Similarity.saveCentroids(spark, cents, cp)
    val loaded = Similarity.loadCentroids(spark, cp)
    assert(loaded.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(recallOf(Some(loaded)) == rFit)
  }

  test("LSH ANN recall@5 ≥ 0.4 vs brute force on 500 vectors") {
    val q = embs.where($"id" < 20)
    val exact = Similarity.bruteForceTopK(q, embs, 5)
      .select($"qa", $"vb").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, embs, 5)
      .select($"qa", $"vb").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"recall@5 = $recall, candidates returned = ${approx.size}")
    assert(recall >= 0.4) // random gaussian corpus: buckets thin out fast
  }

  test("jacobiEigen: known 2x2 and 3x3 spectra to machine precision") {
    // [[2,1],[1,2]] -> eigenvalues 3, 1
    val (v2, _) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(v2.sorted.zip(Seq(1.0, 3.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
    // diag(5, 2, 7) permuted by a rotation keeps its spectrum
    val m = Array(
      Array(4.0, -2.0, 0.0),
      Array(-2.0, 4.0, 0.0),
      Array(0.0, 0.0, 7.0))
    val (v3, vecs) = Similarity.jacobiEigen(m)
    assert(v3.sorted.zip(Seq(2.0, 6.0, 7.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
    // eigen equation: M v = lambda v for each column
    for (c <- 0 until 3; r <- 0 until 3) {
      val mv = (0 until 3).map(k => m(r)(k) * vecs(k)(c)).sum
      assert(math.abs(mv - v3(c) * vecs(r)(c)) < 1e-10)
    }
  }

  test("fitPca: recovers the planted principal direction; basis " +
      "orthonormal; projection energy obeys Bessel; deterministic " +
      "under repartitioning") {
    // points along (3,4)/5 in 4-d space + tiny fixed jitter on axis 2
    val dir = Array(0.6, 0.8, 0.0, 0.0)
    val pts = (0 until 40).map { i =>
      val a = (i - 20).toDouble / 4.0
      (i.toLong, Array(
        (a * dir(0)).toFloat, (a * dir(1)).toFloat,
        (if (i % 2 == 0) 0.01f else -0.01f), 0.0f))
    }
    val df = pts.toDF("id", "vec")
    val (mean, basis, evals) = Similarity.fitPca(df, $"vec", k = 2)
    // top component is the planted direction (sign-fixed positive)
    assert(math.abs(math.abs(basis(0)(0)) - 0.6) < 1e-4 &&
      math.abs(math.abs(basis(0)(1)) - 0.8) < 1e-4)
    assert(basis(0)(1) > 0) // sign convention: largest |coord| positive
    assert(evals(0) > evals(1) && evals(1) >= -1e-12)
    // orthonormal rows
    for (a <- basis.indices; b <- basis.indices) {
      val d = basis(a).zip(basis(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(d - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
    // Bessel per point: projected energy <= centered energy
    val proj = Similarity.pcaProject(df, $"id", $"vec", mean, basis)
      .as[(Long, Seq[Double])].collect()
    val byId = pts.toMap
    proj.foreach { case (id, p) =>
      val v = byId(id).map(_.toDouble)
      val csq = v.zip(mean).map { case (x, m) =>
        (x - m) * (x - m) }.sum
      assert(p.map(x => x * x).sum <= csq + 1e-9)
    }
    // pure function of the input set: repartitioned fit bit-equal
    val (m2, b2, e2) = Similarity.fitPca(df.repartition(7), $"vec", 2)
    assert(m2.toSeq == mean.toSeq &&
      b2.map(_.toSeq).toSeq == basis.map(_.toSeq).toSeq &&
      e2.toSeq == evals.toSeq)
  }

  test("pca moment store: appends + retry + OPTIMIZE ≡ from-scratch " +
      "moments bit-for-bit; store-backed fit ≡ direct fit") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pcainc-").toString + "/store"
    val e = embs
    Similarity.appendPcaMoments(e.where($"id" % 3 === 0), $"vec",
      dir, 1L)
    Similarity.appendPcaMoments(e.where($"id" % 3 === 1), $"vec",
      dir, 2L)
    // retried batch overwrites, never double-counts
    Similarity.appendPcaMoments(e.where($"id" % 3 === 1), $"vec",
      dir, 2L)
    assert(Similarity.compactPcaMoments(spark, dir).contains(2L))
    Similarity.appendPcaMoments(e.where($"id" % 3 === 2), $"vec",
      dir, 3L)
    val stored = Similarity.pcaMomentsFromStore(spark, dir)
      .select($"i", $"j", $"v".cast("long"))
      .as[(Int, Int, Long)].collect().toSet
    val direct = Similarity.pcaMoments(e, $"vec")
      .select($"i", $"j", $"v".cast("long"))
      .as[(Int, Int, Long)].collect().toSet
    assert(stored == direct)
    val (m1, b1, v1) = Similarity.fitPcaFromMoments(
      Similarity.pcaMomentsFromStore(spark, dir), k = 4)
    val (m2, b2, v2) = Similarity.fitPca(e, $"vec", k = 4)
    assert(m1.toSeq == m2.toSeq && v1.toSeq == v2.toSeq &&
      b1.map(_.toSeq).toSeq == b2.map(_.toSeq).toSeq)
  }

  test("pca moment retraction: negative batch ≡ from-scratch over " +
      "survivors bit-for-bit, pre- and post-OPTIMIZE; double-delete " +
      "no-op; refit forgets; monotone guard rejects stale appends") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pcadel-").toString + "/store"
    val e = embs
    Similarity.appendPcaMoments(e.where($"id" % 3 =!= 2), $"vec",
      dir, 1L)
    Similarity.appendPcaMoments(e.where($"id" % 3 === 2), $"vec",
      dir, 2L)
    def storedSet = Similarity.pcaMomentsFromStore(spark, dir)
      .select($"i", $"j", $"v".cast("long"))
      .as[(Int, Int, Long)].collect().toSet
    val doomed = e.where($"id" % 5 === 1).select($"id", $"vec")
    val survivors = e.where($"id" % 5 =!= 1)
    val fromScratch = Similarity.pcaMoments(survivors, $"vec")
      .select($"i", $"j", $"v".cast("long"))
      .as[(Int, Int, Long)].collect().toSet
    Similarity.deletePcaMoments(doomed, $"id", $"vec", dir, 3L)
    assert(storedSet == fromScratch) // read-time additive fold
    // a re-streamed takedown must not double-subtract
    Similarity.deletePcaMoments(doomed, $"id", $"vec", dir, 4L)
    assert(storedSet == fromScratch)
    // OPTIMIZE folds the negative rows into the generation; the
    // tombstone set persists as the double-delete guard
    assert(Similarity.compactPcaMoments(spark, dir).contains(4L))
    assert(storedSet == fromScratch)
    Similarity.deletePcaMoments(doomed, $"id", $"vec", dir, 5L)
    assert(storedSet == fromScratch)
    // refit over the store ≡ from-scratch fit over survivors
    val (m1, b1, v1) = Similarity.fitPcaFromMoments(
      Similarity.pcaMomentsFromStore(spark, dir), k = 4)
    val (m2, b2, v2) = Similarity.fitPca(survivors, $"vec", k = 4)
    assert(m1.toSeq == m2.toSeq && v1.toSeq == v2.toSeq &&
      b1.map(_.toSeq).toSeq == b2.map(_.toSeq).toSeq)
    // monotone guard: an append at or below the fold token is loud,
    // not silently invisible
    intercept[IllegalArgumentException] {
      Similarity.appendPcaMoments(e, $"vec", dir, 4L)
    }
  }

  test("kCenterSelect: hand-computed greedy trace (farthest-first, " +
      "id tie-breaks); deterministic under repartitioning") {
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.1f, 0.0f)),
      (2L, Array(10.0f, 0.0f)), (3L, Array(0.0f, 6.0f)),
      (4L, Array(5.0f, 5.0f))).toDF("id", "vec")
    val got = Similarity.kCenterSelect(pts, $"id", $"vec", k = 4)
      .orderBy($"rank").as[(Int, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1, 2, 3, 4))
    // greedy: start 0, then 2 (d2 100), then 4 (d2 50), then 3 (26)
    assert(got.map(_._2) == Seq(0L, 2L, 4L, 3L))
    val radii = got.map(_._3)
    assert(math.abs(radii(0)) < 1e-9 &&
      math.abs(radii(1) - 100.0) < 1e-3 &&
      math.abs(radii(2) - 50.0) < 1e-3 &&
      math.abs(radii(3) - 26.0) < 1e-3)
    // coverage radius never grows along the greedy trace
    radii.drop(1).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b)
      case _ =>
    }
    val re = Similarity.kCenterSelect(pts.repartition(5), $"id",
      $"vec", k = 4).orderBy($"rank")
      .as[(Int, Long, Double)].collect().toSeq
    assert(re == got)
  }

  test("kCenterExtend: batch-only farthest-first picks seeded by the " +
      "stored coreset; ranks continue; retry idempotent; store view") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kcstore-").toString + "/kc"
    // history on a line: greedy picks 1 (min id, r 0) then 2 (r 16)
    val hist = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(4.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f))).toDF("id", "vec")
    Similarity.writeKCenterStore(hist, $"id", $"vec", k = 2, dir)
    // batch: 10 at x=10 (d2 36 to center 2) and 11 at x=2 (d2 4 to
    // both centers); extension must pick 10 (rank 3, r 36) then 11
    // (rank 4, r 4 — unchanged by center 10 at d2 64)
    val batch = Seq((10L, Array(10.0f, 0.0f)),
      (11L, Array(2.0f, 0.0f))).toDF("id", "vec")
    def run() = Similarity.kCenterExtend(batch, $"id", $"vec", dir,
        batchId = 1L, kNew = 2)
      .orderBy($"rank").as[(Int, Long, Double)].collect().toSeq
    val got = run()
    assert(got == Seq((1, 1L, 0.0), (2, 2L, 16.0), (3, 10L, 36.0),
      (4, 11L, 4.0)), s"got $got")
    // same-batch retry overwrites its own directory, bit-identically
    assert(run() == got)
    // the store view serves the extended coreset
    val view = Similarity.kCenterStoreCenters(spark, dir)
      .orderBy($"rank").as[(Int, Long, Double)].collect().toSeq
    assert(view == got)
  }

  test("rebuildKCenterStore: deleting a CENTER moves every later " +
      "pick — the store rebuilds the trace over survivors as a " +
      "superseding generation; deleting only non-centers is a trace " +
      "no-op; later extensions continue above the generation") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kcdelstore-").toString + "/kc"
    // on a line: greedy k=2 picks 1 (min id, r 0) then 2 at x=4
    // (r 16); 3 at x=1 and 4 at x=3 are never argmax picks
    val pts = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(4.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f)), (4L, Array(3.0f, 0.0f)))
      .toDF("id", "vec")
    Similarity.writeKCenterStore(pts, $"id", $"vec", k = 2, dir)
    // non-center deletion (id 3): the trace over survivors is
    // IDENTICAL — a non-center was never an argmax, so the stored
    // coreset already equals the from-scratch trace over survivors
    // (the exactness behind the rebuild-only-on-center-hit policy)
    val noCenter = Similarity.kCenterSelect(
        pts.where($"id" =!= 3L), $"id", $"vec", k = 2)
      .orderBy($"rank").as[(Int, Long, Double)].collect().toSeq
    val stored = Similarity.kCenterStoreCenters(spark, dir)
      .orderBy($"rank").as[(Int, Long, Double)].collect().toSeq
    assert(noCenter == stored && stored ==
      Seq((1, 1L, 0.0), (2, 2L, 16.0)))
    // CENTER deletion (id 1): picks restart from the new min id 2,
    // then chase the farthest survivor — every row changes
    val surv = pts.where($"id" =!= 1L)
    val tok = Similarity.rebuildKCenterStore(surv, $"id", $"vec",
      k = 2, dir)
    val got = Similarity.kCenterStoreCenters(spark, dir)
      .orderBy($"rank").as[(Int, Long, Double)].collect().toSeq
    assert(got == Seq((1, 2L, 0.0), (2, 3L, 9.0)), s"got $got")
    // a later extension continues above the generation
    val got2 = Similarity.kCenterExtend(
        Seq((10L, Array(10.0f, 0.0f))).toDF("id", "vec"), $"id",
        $"vec", dir, batchId = tok + 1L, kNew = 1)
      .orderBy($"rank").as[(Int, Long, Double)].collect().toSeq
    assert(got2 == Seq((1, 2L, 0.0), (2, 3L, 9.0), (3, 10L, 36.0)),
      s"got $got2")
    // a batch at or below the generation is rejected loudly
    intercept[IllegalArgumentException] {
      Similarity.kCenterExtend(
        Seq((11L, Array(2.0f, 0.0f))).toDF("id", "vec"), $"id",
        $"vec", dir, batchId = tok, kNew = 1)
    }
  }

  test("maxSimTopK: hand-computed late-interaction scores") {
    val q = Seq(
      (100L, 0L, Array(1.0f, 0.0f)),
      (100L, 1L, Array(0.0f, 1.0f)))
      .toDF("qa", "qpos", "vec")
    val c = Seq(
      (1L, Array(1.0f, 0.0f)), (1L, Array(0.0f, -1.0f)),
      (2L, Array(0.6f, 0.7f)))
      .toDF("id", "vec")
    val got = Similarity.maxSimTopK(q, c, k = 2)
      .orderBy($"qa", $"rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    // doc1: max(1,0) + max(0,-1) = 1.0; doc2: 0.6 + 0.7 (floats
    // widened exactly) = the double sum of 0.6f and 0.7f
    val d2 = 0.0 + 0.6f.toDouble + 0.7f.toDouble
    assert(got == Seq((100L, 1, 2L, d2), (100L, 2, 1L, 1.0)))
  }

  test("maxSimTopKIvf: recall ≥ 0.8 vs exact on entity corpus; " +
      "shared pairs score bit-identically") {
    val tok = t(spark, sf0001, "embeddings")
      .select((col("vec_id") % 50).as("ent"), col("vec_id"),
        col("embedding"))
    val q = tok.where($"ent" < 5)
      .select($"ent".as("qa"), $"vec_id".as("qpos"),
        $"embedding".as("vec"))
    val c = tok.where($"ent" >= 5)
      .select($"ent".as("id"), $"embedding".as("vec"))
    val cents = Similarity.fitCentroids(
      t(spark, sf0001, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec")),
      k = 16, iters = 3)
    val exact = Similarity.maxSimTopK(q, c, k = 5)
      .select($"qa", $"id", $"score")
      .as[(Long, Long, Double)].collect()
    val pruned = Similarity.maxSimTopKIvf(q, c, k = 5, cents,
        nprobe = 6)
      .select($"qa", $"id", $"score")
      .as[(Long, Long, Double)].collect()
    val ePairs = exact.map(r => (r._1, r._2)).toSet
    val pPairs = pruned.map(r => (r._1, r._2)).toSet
    val recall = (ePairs & pPairs).size.toDouble / ePairs.size
    info(s"maxsim ivf recall@5 = $recall")
    assert(recall >= 0.8)
    // identical scoring core: shared pairs agree bit-for-bit
    val eScore = exact.map(r => (r._1, r._2) -> r._3).toMap
    pruned.foreach { case (qa, id, s) =>
      eScore.get((qa, id)).foreach(es => assert(es == s))
    }
  }
}
