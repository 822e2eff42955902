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

  /** Query name → family (the source module) — the grain the bench
    * artifact subtotals on: §8f established that sub-second per-query
    * medians are host-variance-dominated, so round-over-round diffs
    * should read six stable family numbers, not 200 noisy ones. */
  def families: Map[String, String] = Seq(
    analytics.AnalyticsQueries.all.keys.map(_ -> "analytics"),
    vcr.VcrQueries.all.keys.map(_ -> "vcr"),
    dedup.DedupQueries.all.keys.map(_ -> "dedup"),
    sim.SimQueries.all.keys.map(_ -> "sim"),
    text.TextQueries.all.keys.map(_ -> "text"),
    media.MediaQueries.all.keys.map(_ -> "media"),
    pipeline.PipelineQueries.all.keys.map(_ -> "pipeline"),
  ).flatten.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    analytics.AnalyticsQueries.oracles ++ vcr.VcrQueries.oracles ++
      dedup.DedupQueries.oracles ++ sim.SimQueries.oracles ++
      text.TextQueries.oracles ++ media.MediaQueries.oracles ++
      pipeline.PipelineQueries.oracles
}
