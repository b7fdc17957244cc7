package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticQueries, ContractQueries, CorpusQueries, CrawlerQueries, ExtraQueries, GraphQueries, PipelineQueries, SourceQueries, SqlDmlQueries, StreamingQueries, TemporalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ContractQueries.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (ContractQueries.all ++ PipelineQueries.all ++ CrawlerQueries.all ++
      StreamingQueries.all ++ ExtraQueries.all ++ SourceQueries.all ++
      TemporalQueries.all ++ AnalyticQueries.all ++ CorpusQueries.all ++
      GraphQueries.all ++ SqlDmlQueries.all).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ContractQueries.oracle ++ PipelineQueries.oracle ++ CrawlerQueries.oracle ++
      StreamingQueries.oracle ++ ExtraQueries.oracle ++ SourceQueries.oracle ++
      TemporalQueries.oracle ++ AnalyticQueries.oracle ++ CorpusQueries.oracle ++
      GraphQueries.oracle ++ SqlDmlQueries.oracle
}
