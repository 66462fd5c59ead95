package graft

import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, Stats, TextAnalysis}

/** The persisted BM25 inverted index: bit-identical answers to the
  * full-scan path, and the manifest actually prunes postings files.
  */
class Bm25IndexSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "merge sort beats bubble sort on large inputs"),
    (2L, "window functions rank rows within partitions"),
    (3L, "spark executes the merge join after the exchange"),
    (4L, "the window slides and the window tumbles"),
    (5L, "spark spark spark tuning notes"),
    (6L, "entirely unrelated prose about gardening"),
    (7L, "merge window spark all three terms appear here"),
    (8L, ""))
    .toDF("doc_id", "text")

  private def buildIndex(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25idx-").toString + "/idx"
    Retrieval.writeBm25Index(corpus, col("doc_id"), col("text"), dir,
      filesOut = 8)
    dir
  }

  test("bm25TopKIndexed ≡ bm25TopK bit for bit, both idf modes") {
    val dir = buildIndex()
    for (mode <- Seq("rational", "lucene")) {
      val want = TextAnalysis.bm25TopK(corpus, col("doc_id"),
          col("text"), Seq("merge", "window", "spark"), k = 10,
          idfMode = mode)
        .orderBy(col("score").desc, col("id")).collect()
      val got = Retrieval.bm25TopKIndexed(spark, dir,
          Seq("merge", "window", "spark"), k = 10, idfMode = mode)
        .orderBy(col("score").desc, col("id")).collect()
      assert(got.toSeq == want.toSeq, s"mode=$mode")
      assert(got.nonEmpty)
    }
  }

  test("a term matching no document returns the other terms' docs " +
      "with identical scores (df 0 contributes 0 tf everywhere)") {
    val dir = buildIndex()
    val want = TextAnalysis.bm25TopK(corpus, col("doc_id"), col("text"),
      Seq("merge", "zzz_absent"), k = 10).collect()
    val got = Retrieval.bm25TopKIndexed(spark, dir,
      Seq("merge", "zzz_absent"), k = 10).collect()
    assert(got.toSeq == want.toSeq)
  }

  test("appendBm25Index: incremental index ≡ from-scratch index over " +
      "the union corpus, stats fold additively") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25inc-").toString + "/idx"
    Retrieval.writeBm25Index(corpus.where(col("doc_id") < 5),
      col("doc_id"), col("text"), dir, filesOut = 4)
    Retrieval.appendBm25Index(corpus.where(col("doc_id") >= 5),
      col("doc_id"), col("text"), dir, batchId = 1L)
    val want = TextAnalysis.bm25TopK(corpus, col("doc_id"), col("text"),
      Seq("merge", "window", "spark"), k = 10).collect()
    val got = Retrieval.bm25TopKIndexed(spark, dir,
      Seq("merge", "window", "spark"), k = 10).collect()
    assert(got.toSeq == want.toSeq)
    val nDocs = spark.read.parquet(s"$dir/stats")
      .agg(sum(col("n_docs"))).head.getLong(0)
    assert(nDocs == 8)
  }

  test("appendBm25Index is overwrite-idempotent: retrying a batch " +
      "never double-appends postings or double-folds stats") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25rty-").toString + "/idx"
    Retrieval.writeBm25Index(corpus.where(col("doc_id") < 5),
      col("doc_id"), col("text"), dir, filesOut = 4)
    val batch = corpus.where(col("doc_id") >= 5)
    Retrieval.appendBm25Index(batch, col("doc_id"), col("text"), dir,
      batchId = 1L)
    // the crashed-then-retried batch: same id, same content, run again
    Retrieval.appendBm25Index(batch, col("doc_id"), col("text"), dir,
      batchId = 1L)
    val want = TextAnalysis.bm25TopK(corpus, col("doc_id"), col("text"),
      Seq("merge", "window", "spark"), k = 10).collect()
    val got = Retrieval.bm25TopKIndexed(spark, dir,
      Seq("merge", "window", "spark"), k = 10).collect()
    assert(got.toSeq == want.toSeq)
    val nDocs = spark.read.parquet(s"$dir/stats")
      .agg(sum(col("n_docs"))).head.getLong(0)
    assert(nDocs == 8, "retried batch must not double-count docs")
  }

  test("compactBm25Index: OPTIMIZE cycle folds appends into one " +
      "generation — fewer files, identical answers, pruning intact") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25cpt-").toString + "/idx"
    Retrieval.writeBm25Index(corpus.where(col("doc_id") < 4),
      col("doc_id"), col("text"), dir, filesOut = 4)
    Retrieval.appendBm25Index(corpus.where(col("doc_id") >= 4 &&
        col("doc_id") < 6),
      col("doc_id"), col("text"), dir, batchId = 1L, filesOut = 4)
    Retrieval.appendBm25Index(corpus.where(col("doc_id") >= 6),
      col("doc_id"), col("text"), dir, batchId = 2L, filesOut = 4)
    val filesBefore = Stats.committedViewDirs(spark, s"$dir/postings")
      .flatMap(p => spark.read.parquet(p).inputFiles).size
    val tok = Retrieval.compactBm25Index(spark, dir, filesOut = 4)
    assert(tok.contains(2L))
    val viewDirs = Stats.committedViewDirs(spark, s"$dir/postings")
    assert(viewDirs.size == 1 && viewDirs.head.endsWith("gen=2"),
      s"view must resolve the new generation only; got $viewDirs")
    val filesAfter = viewDirs
      .flatMap(p => spark.read.parquet(p).inputFiles).size
    assert(filesAfter < filesBefore,
      s"compaction must shrink the view: $filesBefore -> $filesAfter")
    // identical answers through the compacted store
    val want = TextAnalysis.bm25TopK(corpus, col("doc_id"), col("text"),
      Seq("merge", "window", "spark"), k = 10).collect()
    val got = Retrieval.bm25TopKIndexed(spark, dir,
      Seq("merge", "window", "spark"), k = 10).collect()
    assert(got.toSeq == want.toSeq)
    // the refreshed manifest still prunes single-term probes, and the
    // generation re-sharpened th-clustering: one term keeps < all
    val all = viewDirs.flatMap(p => spark.read.parquet(p).inputFiles)
    val kept = Stats.touchedKeysKeptFilesUnder(spark, viewDirs,
      s"$dir/postings_manifest", "th",
      Seq("merge").toDF("term").select(xxhash64(col("term")).as("th")))
    assert(kept.nonEmpty && kept.size < all.size,
      s"kept ${kept.size} of ${all.size}")
    // a second cycle with a fresh append vacuums the superseded dirs
    Retrieval.appendBm25Index(corpus.where(col("doc_id") === 8),
      col("doc_id"), col("text"), dir, batchId = 3L)
    Retrieval.compactBm25Index(spark, dir, filesOut = 4): Unit
    val names = new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).toSet
    assert(names.contains("gen=3"))
    assert(!names.contains("batch=0") && !names.contains("batch=1") &&
      !names.contains("batch=2"),
      s"one-cycle vacuum must drop dirs folded into gen=2; got $names")
  }

  test("postings manifest prunes: a single-term query opens fewer " +
      "files than the store holds") {
    val dir = buildIndex()
    val all = spark.read.parquet(s"$dir/postings").inputFiles.toSeq
    val kept = Stats.touchedKeysKeptFiles(spark, s"$dir/postings",
      s"$dir/postings_manifest", "th",
      Seq("merge").toDF("term").select(xxhash64(col("term")).as("th")))
    assert(kept.nonEmpty && kept.size < all.size,
      s"kept ${kept.size} of ${all.size}")
  }
}
