package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas
import graft.pipeline.SwellPipeline

/** Structured Streaming view of the pipeline (SURVEY.md §2.6/§7.3): the
  * reference simulates temporal progress with cron-scheduled batch appends
  * (`schedules.py:6`, `open_meteo.py:73-76`); this is the same computation
  * as an incremental stream over the raw table's directory.
  *
  * Semantics matched to the batch arg-max (`int...sql:10-30`):
  * per (1-day window, location) keep the hourly row with max swell, ties →
  * latest timestamp. `max_by` with a lexicographic (swell, timestamp)
  * struct reproduces exactly that tie-break, as a streaming-safe
  * aggregation (windowed state, bounded by the watermark — no unbounded
  * row_number state).
  *
  * Late/duplicate data: re-ingested hours fold into the same window
  * state idempotently (max is idempotent), mirroring how the batch
  * pipeline tolerates re-runs; rows later than the 2-day watermark are
  * dropped.
  */
object SwellStream {

  /** Incremental source over the raw table's parquet directory. */
  def readRaw(spark: SparkSession, rawPath: String): DataFrame =
    spark.readStream.schema(Schemas.raw).parquet(rawPath)

  /** Staging works unchanged on a streaming DataFrame — it is a narrow
    * projection/explode (reuses SwellPipeline.stage verbatim).
    */
  def dailyMax(raw: DataFrame): DataFrame = {
    val staged = SwellPipeline.stage(raw)
    val metricCols = Schemas.metricNames.map(col)
    staged
      .withWatermark("timestamp", "2 days")
      .groupBy(window(col("timestamp"), "1 day"), col("location"))
      .agg(max_by(
        struct(col("timestamp") +: metricCols: _*),
        struct(col("swell_wave_height"), col("timestamp"))).as("best"))
      .select(
        col("best.timestamp").as("timestamp") +:
          col("location") +:
          Schemas.metricNames.map(m => col(s"best.$m").as(m)) :+
          to_date(col("window.start")).as("dt"): _*)
  }
}
