package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticQueries, CorpusQueries, DedupQueries, MppQueries, MultimodalQueries, OperatorQueries, SamplingQueries, SimilarityQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query inventories; each entry is one line of
  * SURVEY.md §2 (or a training-data pipeline operator) with, where
  * SQL-expressible, a DuckDB oracle statement over the same parquet tables.
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (AnalyticQueries.queries, AnalyticQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (SimilarityQueries.queries, SimilarityQueries.oracles),
      (MultimodalQueries.queries, MultimodalQueries.oracles),
      (CorpusQueries.queries, CorpusQueries.oracles),
      (OperatorQueries.queries, OperatorQueries.oracles),
      (SamplingQueries.queries, SamplingQueries.oracles),
      (MppQueries.queries, MppQueries.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticQueries.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
