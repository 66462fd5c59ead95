package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.ingest.{Ingest, SwellFetcher}

/** Orchestration surface (SURVEY.md §2.4 O1–O8): env-var configuration,
  * explicit asset ordering, idempotent end-to-end runs.
  *
  * The reference drives this through Dagster definitions
  * (`definitions.py:7-18`, `schedules.py`, `dbt_defs.py`); here the DAG is
  * a plain call graph and any external scheduler (cron, Airflow, Dagster)
  * invokes `runAll` via spark-submit — the engine's contract is that
  * re-runs are idempotent (append raw, overwrite derived, `O6`).
  */
final case class PipelineConfig(
    warehouseDir: String,
    rawTable: String,
    presentationTable: String,
    nightlyCron: String,
    dbtCron: String)

object PipelineConfig {
  /** Same env-override pattern (and defaults standing in for) the
    * reference's `DUCKDB_PATH` / `NIGHTLY_CRON` / `DBT_NIGHTLY_CRON`
    * (`open_meteo.py:13-15`, `schedules.py:6-7`, `dbt_defs.py:8-11`).
    */
  def fromEnv(env: Map[String, String] = sys.env): PipelineConfig =
    PipelineConfig(
      warehouseDir = env.getOrElse("GRAFT_WAREHOUSE", "spark-warehouse"),
      rawTable = env.getOrElse("GRAFT_RAW_TABLE", "raw.swell_data"),
      presentationTable = env.getOrElse("GRAFT_PRES_TABLE",
        "presentation.daily_max_swell"),
      nightlyCron = env.getOrElse("NIGHTLY_CRON", "0 0 * * *"),
      dbtCron = env.getOrElse("DBT_NIGHTLY_CRON", "0 1 * * *"))
}

object Runner {
  /** One full asset run: ingest (per-location fetch + raw append), then
    * the layered transform DAG in topological order with contract checks
    * — the Spark analogue of `nightly_assets_job` + `dbt build`
    * (`schedules.py:10-14`, `dbt_defs.py:25-27`).
    */
  def runAll(spark: SparkSession, fetcher: SwellFetcher,
             config: PipelineConfig = PipelineConfig.fromEnv()): Long = {
    val results = Ingest.run(spark, fetcher)
    require(results.nonEmpty, "ingest produced no rows")
    SwellPipeline.runAll(spark).count()
  }

  /** Incremental asset run: ingest the batch, then refresh ONLY the
    * forecast-date partitions that batch touches
    * ([[SwellPipeline.runIncremental]]) instead of rebuilding the
    * presentation table from all of raw — the reference's
    * materialized='table' semantics made viable at 100 TB. Same
    * idempotence contract as [[runAll]].
    */
  def runIncremental(spark: SparkSession, fetcher: SwellFetcher,
                     config: PipelineConfig = PipelineConfig.fromEnv())
      : Long = {
    val batch = Ingest.fetchBatch(spark, fetcher)
    val results = Ingest.append(spark, batch, config.rawTable)
    require(results.nonEmpty, "ingest produced no rows")
    SwellPipeline.runIncremental(spark, batch, config.rawTable,
      config.presentationTable).count()
  }
}
