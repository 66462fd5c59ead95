package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Layout, Stats}

/** The banded/clustered signature-store layout: incremental near-dup
  * through the manifest-pruned store must (a) answer identically to the
  * flat-store path, and (b) OPEN strictly fewer store files than the
  * flat layout reads — the file accounting that makes "the batch reads
  * a slice of the store, not the store" a checked property instead of a
  * hope.
  */
class BandedStoreSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("minhash banded store: pruned-store gate ≡ flat-store gate, and " +
      "the batch's store scan opens strictly fewer files than the store " +
      "holds") {
    import spark.implicits._
    // 200 historical docs (distinct), new batch: one exact dup of doc 7
    // plus one genuinely new doc
    val hist = (0L until 200L)
      .map(i => (i, s"history document $i with unique content tail $i"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1000L, "history document 7 with unique content tail 7"), // dup
      (1001L, "a brand new document that matches nothing at all"))
      .toDF("doc_id", "text")
    val root = tmp("graft-bandedstore-")
    val store = s"$root/store"
    val manifest = s"$root/manifest"
    Dedup.writeBandedSigStore(
      Dedup.minhashSigsNative(hist, col("doc_id"), col("text")),
      store, manifest, filesOut = 64)

    val banded = Dedup.minhashIncrementalBanded(batch, col("doc_id"),
        col("text"), store, manifest)
      .select(col("doc_id")).as[Long].collect().toSet
    val flat = Dedup.minhashIncremental(batch, col("doc_id"), col("text"),
        Dedup.minhashSigsNative(hist, col("doc_id"), col("text")))
      .select(col("doc_id")).as[Long].collect().toSet
    assert(banded == flat && banded == Set(1001L),
      s"banded=$banded flat=$flat")

    // file accounting: the 2-doc batch touches 16 (band, bucket) pairs;
    // the store spans 64 range-clustered files — the pruned scan must
    // open strictly fewer than the flat scan's "all of them"
    val total = Layout.dataFileCount(spark, store)
    val batchSigs = Dedup.minhashSigsNative(batch, col("doc_id"),
      col("text"))
    val touched = Dedup.lshBuckets(batchSigs, 4)
      .select(col("band"), col("bucket"))
    val kept = Stats.touchedPairsKeptFiles(spark, store, manifest,
      "band", "bucket", touched)
    assert(total >= 32, s"store should be many files, got $total")
    assert(kept.size < total,
      s"pruning must drop files: kept ${kept.size} of $total")
  }

  test("multi-row-group store files: integral footer bounds merge " +
      "NUMERICALLY across row groups, so pruning stays sound (the " +
      "lexicographic string-merge trap: xxhash64 buckets render with " +
      "mixed signs and digit counts)") {
    import spark.implicits._
    val hist = (0L until 200L)
      .map(i => (i, s"row group test doc $i payload tail $i"))
      .toDF("doc_id", "text")
    val root = tmp("graft-bandedrg-")
    val store = s"$root/store"
    val manifest = s"$root/manifest"
    // few files, TINY row groups: every file spans many (band, bucket)
    // row groups whose string-rendered bounds merge lexicographically
    // wrong — only the exact min_int/max_int columns are sound
    Dedup.lshBuckets(
        Dedup.minhashSigsNative(hist, col("doc_id"), col("text")), 4)
      .select(col("band"), col("bucket"), col("id"), col("sig"))
      .repartitionByRange(4, col("band"), col("bucket"))
      .sortWithinPartitions(col("band"), col("bucket"))
      .write.option("parquet.block.size", "1024").parquet(store)
    Stats.writeManifest(spark, store, manifest)
    // the fixture must actually exercise multi-row-group files
    val conf = spark.sessionState.newHadoopConf()
    val aFile = new java.io.File(store).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(aFile.getAbsolutePath), conf))
    val nGroups = try rdr.getFooter.getBlocks.size() finally rdr.close()
    assert(nGroups > 1, s"fixture needs multi-row-group files, got $nGroups")
    // every one of 40 batch dups must be caught through the pruned scan
    val batch = (0L until 40L)
      .map(i => (1000L + i, s"row group test doc $i payload tail $i"))
      .toDF("doc_id", "text")
    val banded = Dedup.minhashIncrementalBanded(batch, col("doc_id"),
        col("text"), store, manifest)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(banded.isEmpty,
      s"unsound pruning admitted dups: survivors=$banded")
  }

  test("banded store: a data file the manifest does not cover is always " +
      "read (stale manifest loses pruning, never rows)") {
    import spark.implicits._
    val hist = (0L until 50L)
      .map(i => (i, s"covered doc $i tail $i tail $i tail"))
      .toDF("doc_id", "text")
    val root = tmp("graft-bandedstale-")
    val store = s"$root/store"
    val manifest = s"$root/manifest"
    Dedup.writeBandedSigStore(
      Dedup.minhashSigsNative(hist, col("doc_id"), col("text")),
      store, manifest, filesOut = 8)
    // append one store slice WITHOUT refreshing the manifest: a doc the
    // batch exactly duplicates — correctness now depends on the
    // uncovered file being read unconditionally
    val late = Seq((60L, "late uncovered doc nine hundred tail end"))
      .toDF("doc_id", "text")
    Dedup.lshBuckets(
        Dedup.minhashSigsNative(late, col("doc_id"), col("text")), 4)
      .select(col("band"), col("bucket"), col("id"), col("sig"))
      .write.mode("append").parquet(store)
    val batch = Seq(
      (1000L, "late uncovered doc nine hundred tail end"))
      .toDF("doc_id", "text")
    val survivors = Dedup.minhashIncrementalBanded(batch, col("doc_id"),
        col("text"), store, manifest)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(survivors.isEmpty,
      "the dup must be caught via the manifest-uncovered store file")
    // and the refresh path picks the new file up for future pruning
    Stats.refreshManifest(spark, store, manifest)
    val files = spark.read.parquet(manifest)
      .select(col("file")).distinct().count()
    assert(files.toInt == Layout.dataFileCount(spark, store))
  }

  test("appendBandedSigStore: appended batch gates later batches; " +
      "manifest covers the appended files") {
    import spark.implicits._
    val hist = (0L until 40L)
      .map(i => (i, s"base corpus doc $i body $i")).toDF("doc_id", "text")
    val root = tmp("graft-bandedappend-")
    val store = s"$root/store"
    val manifest = s"$root/manifest"
    Dedup.writeBandedSigStore(
      Dedup.minhashSigsNative(hist, col("doc_id"), col("text")),
      store, manifest, filesOut = 8)
    val b1 = Seq((100L, "first appended batch document body"))
      .toDF("doc_id", "text")
    Dedup.appendBandedSigStore(
      Dedup.minhashSigsNative(b1, col("doc_id"), col("text")),
      store, manifest, filesOut = 2)
    // a later batch duplicating the appended doc is dropped
    val b2 = Seq((200L, "first appended batch document body"),
      (201L, "completely different second batch doc"))
      .toDF("doc_id", "text")
    val survivors = Dedup.minhashIncrementalBanded(b2, col("doc_id"),
        col("text"), store, manifest)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(survivors == Set(201L))
    val covered = spark.read.parquet(manifest)
      .select(col("file")).distinct().count().toInt
    assert(covered == Layout.dataFileCount(spark, store),
      "refreshManifest must cover the appended files")
  }

  test("appendCodeStore: appended batch codes gate later batches; " +
      "manifest covers the appended files") {
    import spark.implicits._
    // seeded gaussians: distinct seeds give near-orthogonal vectors
    // (same-stride sinusoid families are just phase shifts — any two
    // can correlate arbitrarily)
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)(r.nextGaussian().toFloat)
    }
    val hist = (0 until 60).map(i => (i.toLong, vec(i))).toDF("id", "vec")
    val root = tmp("graft-codeappend-")
    val store = s"$root/store"
    val manifest = s"$root/manifest"
    Dedup.writeCodeStore(
      Dedup.embeddingCodes(hist, col("id"), col("vec"), planes = 8,
        tables = 4),
      store, manifest, filesOut = 8)
    val b1 = Seq((100L, vec(7777))).toDF("id", "vec")
    Dedup.appendCodeStore(
      Dedup.embeddingCodes(b1, col("id"), col("vec"), planes = 8,
        tables = 4),
      store, manifest, filesOut = 2)
    // a later batch duplicating the appended vector collides through
    // the pruned store read; an unrelated vector does not
    val b2 = Seq((200L, vec(7777)), (201L, vec(8888))).toDF("id", "vec")
    val vecs = hist.unionByName(b1)
    val pairs = Dedup.embeddingIncrementalStored(b2, col("id"),
        col("vec"), store, manifest, vecs, threshold = 0.99,
        planes = 8, tables = 4, multiprobe = 0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 200L)), s"got $pairs")
    assert(!pairs.exists(_._2 == 201L))
    val covered = spark.read.parquet(manifest)
      .select(col("file")).distinct().count().toInt
    assert(covered == Layout.dataFileCount(spark, store),
      "refreshManifest must cover the appended files")
  }

  test("embedding clustered code store: pruned-store gate ≡ flat-store " +
      "gate, with strictly fewer files opened") {
    import spark.implicits._
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(j => math.sin(seed * 97 + j * 13 + 1).toFloat)
    val hist = (0 until 200).map(i => (i.toLong, vec(i)))
      .toDF("id", "vec")
    val batch = Seq((1000L, vec(7)), (1001L, vec(9999)))
      .toDF("id", "vec")
    val root = tmp("graft-codestore-")
    val store = s"$root/store"
    val manifest = s"$root/manifest"
    val histCodes = Dedup.embeddingCodes(hist, col("id"), col("vec"),
      planes = 12, tables = 4)
    Dedup.writeCodeStore(histCodes, store, manifest, filesOut = 32)

    val stored = Dedup.embeddingIncrementalStored(batch, col("id"),
        col("vec"), store, manifest, hist, threshold = 0.99,
        planes = 12, tables = 4, multiprobe = 0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val flat = Dedup.embeddingIncremental(batch, col("id"), col("vec"),
        histCodes, hist, threshold = 0.99,
        planes = 12, tables = 4, multiprobe = 0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(stored == flat && stored.contains((7L, 1000L)),
      s"stored=$stored flat=$flat")

    val total = Layout.dataFileCount(spark, store)
    val probes = Dedup.embeddingCodes(batch, col("id"), col("vec"),
      planes = 12, tables = 4).select(col("table"), col("bucket"))
    val kept = Stats.touchedPairsKeptFiles(spark, store, manifest,
      "table", "bucket", probes)
    assert(total >= 16, s"store should be many files, got $total")
    assert(kept.size < total,
      s"pruning must drop files: kept ${kept.size} of $total")
  }
}
