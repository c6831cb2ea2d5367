package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q3Join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries ++ QueriesDeep.queries ++ EventsMore.queries ++ WebCorpus.queries ++ AnalyticsPlus.queries ++ PathMatching.queries ++ ContentTypes.queries ++
      HivePartitions.queries ++ TimePartitions.queries ++ ChangeDetection.queries ++ S3Utils.queries ++ Lifecycle.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++ Audio.queries ++ Video.queries ++ Corpus.queries ++ Sketches.queries ++
      Maintenance.queries ++ CorpusQuality.queries ++ Growth.queries ++ AnalyticsMore.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ QueriesDeep.oracles ++ EventsMore.oracles ++ WebCorpus.oracles ++ AnalyticsPlus.oracles ++ PathMatching.oracles ++ ContentTypes.oracles ++
      HivePartitions.oracles ++ TimePartitions.oracles ++ ChangeDetection.oracles ++ S3Utils.oracles ++ Lifecycle.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++ Audio.oracles ++ Video.oracles ++ Corpus.oracles ++ Sketches.oracles ++
      Maintenance.oracles ++ CorpusQuality.oracles ++ Growth.oracles ++ AnalyticsMore.oracles
}
