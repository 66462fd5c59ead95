package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.SwellPipeline

/** DataSource V2 source + SQL function registration. */
class SourceExtensionsSpec extends SparkSuite {

  test("swell-fixture DSv2 source: one partition per location, batch read") {
    val df = spark.read.format("swell-fixture")
      .option("ingestMillis", "1754956800000").load()
    assert(df.rdd.getNumPartitions == 3)
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(1)).toSet ==
      Set("Tamarack", "Turnarounds", "Oside_pier"))
    // payload flows through the standard staging path
    val staged = SwellPipeline.stage(df)
    assert(staged.count() == 72) // 3 locations × 24 hours
    val daily = SwellPipeline.full(df)
    assert(daily.count() == 3) // 1 day × 3 locations
    // synthetic series rises with hour → arg-max = hour 23
    assert(daily.select(min(hour(col("timestamp")))).head().getInt(0) == 23)
  }

  test("swell-fixture source reads payloadDir fixtures when provided") {
    val dir = java.nio.file.Files.createTempDirectory("swellfix")
    val payload =
      """{"hourly":{"time":["2026-08-10T00:00"],"wave_height":[1.0],
        |"wave_direction":[1.0],"wind_wave_direction":[1.0],
        |"swell_wave_height":[9.9],"swell_wave_direction":[1.0],
        |"swell_wave_period":[1.0]}}""".stripMargin.replace("\n", "")
    Seq("Tamarack", "Turnarounds", "Oside_pier").foreach { l =>
      java.nio.file.Files.writeString(dir.resolve(s"$l.json"), payload)
    }
    val df = spark.read.format("swell-fixture")
      .option("payloadDir", dir.toString).load()
    val staged = SwellPipeline.stage(df)
    assert(staged.count() == 3)
    assert(staged.select(max(col("swell_wave_height"))).head().getDouble(0)
      == 9.9)
  }

  test("GraftExtensions registers vec_dot/shingles/simhash64 for SQL") {
    spark // force suite session first (shared SparkContext)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = s2.sql(
        "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(dot == 11.0)
      val sh = s2.sql(
        "SELECT shingles('a b c d', 3) AS s").head().getSeq[String](0)
      assert(sh == Seq("a b c", "b c d"))
      val h = s2.sql("SELECT simhash64('hello world') AS h").head().getLong(0)
      val h2 = s2.sql("SELECT simhash64('hello world') AS h").head().getLong(0)
      assert(h == h2)
      val hf = s2.sql("SELECT simhash_fp('hello world') AS h")
        .head().getLong(0)
      assert(hf == s2.sql("SELECT simhash_fp('hello world') AS h")
        .head().getLong(0))
      val sig = s2.sql("SELECT minhash_sig('a b c d', 3, 4) AS s")
        .head().getSeq[Long](0)
      assert(sig.length == 4)
      // fewer tokens than the shingle size → NULL signature
      assert(s2.sql("SELECT minhash_sig('a b', 3, 4) AS s").head().isNullAt(0))
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
