package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats
import graft.functions.{BloomAggregator, BloomFilters}

/** The bloom file manifest: point probes over a HASH-distributed key
  * (where every file's [min, max] spans the id domain and range stats
  * prune nothing) must open strictly fewer files than the store holds,
  * rows stay exact, and a bloom can never lose a key (false negatives
  * impossible by construction — checked key by key).
  */
class BloomManifestSpec extends SparkSuite {
  import spark.implicits._

  private def fileCount(dir: String): Int =
    new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet") && f.length() > 0)

  test("point lookups through the bloom manifest prune files, keep " +
      "rows exact, and never miss a present key") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-bloom-").toString
    val dir = root + "/store"
    val man = root + "/manifest"
    // hash-distributed: consecutive ids land in different files, so
    // every file's id range spans ~the whole domain
    (0L until 400L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(8, col("id")).write.parquet(dir)
    val total = fileCount(dir)
    assert(total >= 8)
    Stats.writeKeyBloomManifest(spark, dir, "id", man)

    val probes = Seq(5L, 17L, 342L).toDF("id")
    val kept = Stats.pointLookupKeptFiles(spark, Seq(dir), man, "id",
      probes)
    assert(kept.size < total,
      s"bloom pruning must skip files: kept ${kept.size} of $total")
    val got = Stats.readPointLookup(spark, dir, man, "id", probes)
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(5L -> "v5", 17L -> "v17", 342L -> "v342"))

    // no false negatives: every present key found through the pruned
    // path, one probe at a time
    (0L until 400L by 37L).foreach { i =>
      val one = Stats.readPointLookup(spark, dir, man, "id",
        Seq(i).toDF("id")).collect()
      assert(one.length == 1 && one(0).getLong(0) == i,
        s"bloom lost present key $i")
    }

    // absent key: zero rows regardless of false-positive file opens
    assert(Stats.readPointLookup(spark, dir, man, "id",
      Seq(1000000L).toDF("id")).isEmpty)

    // the probe-collect guard fires BEFORE materializing a big set
    intercept[IllegalArgumentException] {
      Stats.pointLookupKeptFiles(spark, Seq(dir), man, "id",
        (0L until 10L).toDF("id"), maxProbes = 4)
    }

    // a file the manifest does not cover is always read (soundness
    // under stale manifests): append a new file, probe a key in it
    Seq((9999L, "fresh")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    val fresh = Stats.readPointLookup(spark, dir, man, "id",
      Seq(9999L).toDF("id")).collect()
    assert(fresh.length == 1 && fresh(0).getString(1) == "fresh")
  }

  test("bloom blobs are partitioning-independent and merge as set " +
      "union") {
    val hs = (1L to 64L).map(i => i * 0x9E3779B97F4A7C15L)
    val m = 1024
    val whole = new BloomAggregator(m, 6)
    val one = hs.foldLeft(whole.zero)(whole.reduce)
    val (l, r) = hs.splitAt(20)
    val merged = whole.merge(
      l.foldLeft(whole.zero)(whole.reduce),
      r.foldLeft(whole.zero)(whole.reduce))
    assert(java.util.Arrays.equals(one, merged))
    assert(hs.forall(h => BloomFilters.mightContain(one, m, 6, h)))
  }
}
