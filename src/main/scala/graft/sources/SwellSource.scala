package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.model.{Location, Locations, Schemas}

import scala.jdk.CollectionConverters._

/** DataSource V2 form of the reference's REST ingestion (SURVEY.md §2.1
  * S1/S2): one input partition per location, the fetch executed on
  * EXECUTORS — the scale path when the location fan-out is thousands of
  * endpoints rather than 3 (the driver-side loop in `Ingest` matches the
  * reference's actual scale).
  *
  * The HTTP call (`requests.get`, `open_meteo.py:36`) is stubbed for this
  * zero-egress environment: each partition reads its payload from
  * `payloadDir/<location>.json` when the option is set, else emits a
  * deterministic synthetic payload. Swapping in a real
  * `java.net.http.HttpClient` with the reference's 60 s timeout changes
  * only `SwellPartitionReader.fetch`.
  *
  * Usage:
  * {{{
  *   spark.read.format("swell-fixture")
  *     .option("payloadDir", "/path/to/payloads")  // optional
  *     .option("ingestMillis", "1754956800000")    // optional, default now
  *     .load()
  * }}}
  */
class SwellSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "swell-fixture"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.raw

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SwellTable(new CaseInsensitiveStringMap(properties))
}

class SwellTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "swell_fixture_source"
  override def schema(): StructType = Schemas.raw
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ o.asScala).asJava)
    () => new SwellScan(merged)
  }
}

class SwellScan(options: CaseInsensitiveStringMap) extends Scan with Batch {
  override def readSchema(): StructType = Schemas.raw
  override def description(): String = "swell-fixture REST-source stand-in"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val ingestMillis = Option(options.get("ingestMillis"))
      .map(_.toLong).getOrElse(System.currentTimeMillis())
    val payloadDir = Option(options.get("payloadDir"))
    Locations.all.map(l =>
      SwellInputPartition(l, ingestMillis, payloadDir): InputPartition
    ).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    SwellReaderFactory()
}

case class SwellInputPartition(location: Location, ingestMillis: Long,
                               payloadDir: Option[String]) extends InputPartition

case class SwellReaderFactory() extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SwellPartitionReader(p.asInstanceOf[SwellInputPartition])
}

/** Runs on an executor: one "fetch" per location partition. */
class SwellPartitionReader(p: SwellInputPartition)
    extends PartitionReader[InternalRow] {

  private var emitted = false

  /** The network boundary. Fixture file per location, or a deterministic
    * synthetic payload; a production impl issues the HTTP GET here.
    */
  private def fetch(l: Location): String = {
    p.payloadDir.map { dir =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/${l.name}.json")), "UTF-8")
    }.getOrElse {
      // synthetic 24-hour day keyed off the location's coordinates
      val day = "2026-08-10"
      val hours = (0 until 24)
        .map(h => f""""${day}T$h%02d:00"""").mkString("[", ",", "]")
      def series(base: Double) =
        (0 until 24).map(h => f"${base + 0.01 * h}%.3f")
          .mkString("[", ",", "]")
      s"""{"latitude":${l.lat},"longitude":${l.lon},
         |"hourly":{"time":$hours,
         |"wave_height":${series(1.0)},
         |"wave_direction":${series(180.0)},
         |"wind_wave_direction":${series(170.0)},
         |"swell_wave_height":${series(0.8)},
         |"swell_wave_direction":${series(160.0)},
         |"swell_wave_period":${series(10.0)}}}""".stripMargin
        .replace("\n", "")
    }
  }

  override def next(): Boolean = !emitted && { emitted = true; true }

  override def get(): InternalRow =
    InternalRow(p.ingestMillis * 1000L, // micros
      UTF8String.fromString(p.location.name),
      UTF8String.fromString(fetch(p.location)))

  override def close(): Unit = ()
}
