package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import graft.model.Schemas
import graft.pipeline.SwellPipeline
import graft.ingest.{FixtureFetcher, Ingest}
import java.sql.Timestamp

/** Scratch driver: exercise the swell pipeline end-to-end from the public
  * API (ingest → layered materialization → contract table).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-demo-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val payload =
      """{"latitude":33.1505,"longitude":-117.3483,"timezone":"America/Los_Angeles",
        |"hourly":{"time":["2026-08-10T00:00","2026-08-10T01:00","2026-08-11T00:00"],
        |"wave_height":[1.2,1.4,0.9],"wave_direction":[270.0,275.0,180.0],
        |"wind_wave_direction":[260.0,265.0,170.0],"swell_wave_height":[1.1,1.1,0.8],
        |"swell_wave_direction":[250.0,255.0,160.0],"swell_wave_period":[14.0,15.0,9.0]}}"""
        .stripMargin.replace("\n", "")

    println("== ingest run 1 ==")
    println(Ingest.run(spark, new FixtureFetcher(_ => payload)))
    println("== ingest run 2 (appends; pipeline must stay idempotent) ==")
    println(Ingest.run(spark, new FixtureFetcher(_ => payload)))
    println("== raw table ==")
    spark.table("raw.swell_data").show(3, 60)

    // probe: corrupt payload appended directly to raw
    val corrupt = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Timestamp.valueOf("2026-08-12 01:00:00"), "Tamarack", "{broken")), 1),
      Schemas.raw)
    Ingest.append(spark, corrupt)

    println("== presentation.daily_max_swell ==")
    val pres = SwellPipeline.runAll(spark)
    pres.orderBy("dt", "location").show(20)
    println("== physical plan of the composed pipeline ==")
    SwellPipeline.full(spark.table("raw.swell_data")).explain("formatted")

    println("== bucketed layout: write, append, shuffle-free self-join ==")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    graft.operators.Layout.writeBucketed(
      docs.where(col("doc_id") % 2 === 0), "demo_docs_bkt",
      "/tmp/graft-demo-warehouse/demo_docs_bkt", buckets = 4,
      bucketCols = Seq("doc_id"), sortCols = Seq("doc_id"))
    graft.operators.Layout.appendBucketed(
      docs.where(col("doc_id") % 2 =!= 0), "demo_docs_bkt",
      buckets = 4, bucketCols = Seq("doc_id"), sortCols = Seq("doc_id"))
    val bkt = graft.operators.Layout.readBucketed(spark, "demo_docs_bkt")
    println(s"bucketed rows: ${bkt.count()} (source ${docs.count()})")

    println("== footer-stats manifest + skipping report ==")
    docs.orderBy("doc_id").write.mode("overwrite")
      .parquet("/tmp/graft-demo-warehouse/demo_docs_sorted")
    graft.operators.Stats.parquetFileStats(spark,
        "/tmp/graft-demo-warehouse/demo_docs_sorted")
      .where(col("column") === "doc_id").show(5, 80)

    println("== regime-auto as-of join (events vs tiny dim history) ==")
    // ParityQueries.t handles either events.ts encoding (the ns-long
    // legacy read or the current TIMESTAMP_NTZ testdata)
    val evTs = graft.queries.ParityQueries
      .t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val hist = evTs.groupBy((col("user_id") % 5).as("hk"))
      .agg(min(col("ts")).as("ht")).withColumn("rate", col("hk") * 10)
    graft.operators.TimeSeries.asofJoinAuto(
        evTs.withColumn("k5", col("user_id") % 5), hist,
        "k5", "hk", "ts", "ht")
      .select(col("event_id"), col("rate")).show(5)

    println("== streaming daily max over the raw table directory ==")
    val rawDir = "/tmp/graft-demo-warehouse/raw.db/swell_data"
    val q = graft.streaming.SwellStream
      .dailyMax(graft.streaming.SwellStream.readRaw(spark, rawDir))
      .writeStream.format("memory").queryName("sdaily")
      .outputMode("complete").start()
    q.processAllAvailable()
    spark.table("sdaily").orderBy("dt", "location").show(10)
    q.stop()
    spark.stop()
  }
}
