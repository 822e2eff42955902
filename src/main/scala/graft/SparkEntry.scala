package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.AnalyticsQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.AnalyticsQueries.all ++ vcr.VcrQueries.all ++
      dedup.DedupQueries.all ++ sim.SimQueries.all ++
      text.TextQueries.all ++ media.MediaQueries.all ++
      pipeline.PipelineQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    analytics.AnalyticsQueries.oracles ++ vcr.VcrQueries.oracles ++
      dedup.DedupQueries.oracles ++ sim.SimQueries.oracles ++
      text.TextQueries.oracles ++ media.MediaQueries.oracles ++
      pipeline.PipelineQueries.oracles
}
