package graft.model

import org.apache.spark.sql.types._
import java.sql.{Date, Timestamp}

/** Typed data model for the swell pipeline.
  *
  * Mirrors the reference's data shapes (not its storage engine):
  *  - raw append-only table: reference DDL at
  *    `src/dagster_pipeline/defs/open_meteo.py:63-71`
  *  - Open-Meteo payload: request params at `open_meteo.py:20-34`,
  *    consumed at `dbt/models/staging/stg_open_meteo__swell_data.sql:15-21`
  *  - staged hourly / daily schemas: `stg...sql:38-48`, `int...sql:19-29`
  *
  * The reference keeps (lat, lon) in a Python *set* literal
  * (`open_meteo.py:16`) which unpacks in hash order — a latent bug. We use
  * an ordered case class instead (SURVEY.md §1.2).
  */
final case class Location(name: String, lat: Double, lon: Double)

object Locations {
  /** The reference's three surf spots (`open_meteo.py:16`). */
  val all: Seq[Location] = Seq(
    Location("Tamarack", 33.1505, -117.3483),
    Location("Turnarounds", 33.0736, -117.3094),
    Location("Oside_pier", 33.1934, -117.3862)
  )
}

/** One staged hourly observation (`stg...sql:38-48`). */
final case class HourlySwell(
    timestamp: Timestamp,
    location: String,
    wave_height: Option[Double],
    wave_direction: Option[Double],
    wind_wave_direction: Option[Double],
    swell_wave_height: Option[Double],
    swell_wave_direction: Option[Double],
    swell_wave_period: Option[Double],
    dt: Date
)

object Schemas {
  /** `raw.swell_data` — append-only, one row per (ingestion run, location).
    * Reference DDL: `open_meteo.py:63-71`.
    */
  val raw: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("location", StringType, nullable = false),
    StructField("data", StringType, nullable = true)
  ))

  /** The six hourly metrics requested from the API (`open_meteo.py:23-32`). */
  val metricNames: Seq[String] = Seq(
    "wave_height", "wave_direction", "wind_wave_direction",
    "swell_wave_height", "swell_wave_direction", "swell_wave_period"
  )

  /** Explicit payload schema for `from_json` — no runtime inference.
    * `$.hourly.time` is an array of `YYYY-MM-DDTHH:MM` strings plus six
    * parallel double arrays (`stg...sql:15-21`). A trailing corrupt-record
    * column gives dead-letter behavior for malformed payloads.
    */
  val payload: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("timezone", StringType),
    StructField("hourly_units", MapType(StringType, StringType)),
    StructField("hourly", StructType(
      StructField("time", ArrayType(StringType)) +:
        metricNames.map(m => StructField(m, ArrayType(DoubleType)))
    )),
    StructField("_corrupt_record", StringType)
  ))

  /** Staged hourly schema (`stg...sql:38-48`): timestamp, location,
    * 6 double metrics, dt. Shared by the int + presentation layers.
    */
  val staged: StructType = StructType(
    StructField("timestamp", TimestampType) +:
      StructField("location", StringType) +:
      metricNames.map(m => StructField(m, DoubleType)) :+
      StructField("dt", DateType)
  )
}
