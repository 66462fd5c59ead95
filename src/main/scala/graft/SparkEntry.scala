package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CurationQueries, ExtensionQueries,
  LanguageModelQueries, OverlapQueries, ParityQueries, RelationalQueries,
  RelationalQueries2, ResolutionQueries, RetrievalQueries,
  ScaleOpsQueries, SelectionQueries, TokenizerQueries, TrainingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in graft.queries.ParityQueries (reference operator
  * inventory, SURVEY.md §2) and graft.queries.ExtensionQueries
  * (training-data pipeline: dedup / similarity / text / multimodal).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core shape (`int_open_meteo__max_swell_per_day.sql`):
    * per-group arg-max via ranking window, mapped onto the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_argmax_daily")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ RelationalQueries.queries ++
      RelationalQueries2.queries ++ ExtensionQueries.queries ++
      TrainingQueries.queries ++ CurationQueries.queries ++
      RetrievalQueries.queries ++ TokenizerQueries.queries ++
      SelectionQueries.queries ++ OverlapQueries.queries ++
      LanguageModelQueries.queries ++ ResolutionQueries.queries ++
      ScaleOpsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-based operators
    * (xxhash64 MinHash/SimHash/LSH, HLL sketches) → rows-only check;
    * those are correctness-tested in ScalaTest with constructed inputs. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ RelationalQueries.oracleSql ++
      RelationalQueries2.oracleSql ++ ExtensionQueries.oracleSql ++
      TrainingQueries.oracleSql ++ CurationQueries.oracleSql ++
      RetrievalQueries.oracleSql ++ TokenizerQueries.oracleSql ++
      SelectionQueries.oracleSql ++ OverlapQueries.oracleSql ++
      LanguageModelQueries.oracleSql ++ ResolutionQueries.oracleSql ++
      ScaleOpsQueries.oracleSql
}
