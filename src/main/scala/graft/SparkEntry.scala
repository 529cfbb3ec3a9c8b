package graft

import graft.ext.{DedupOps, MultimodalOps, Relational, SamplingOps, SimilarityOps, TextOps}
import graft.queries.ApolloQueries
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory = the reference's own operator surface (ApolloQueries,
  * SURVEY §2.1-2.4) + the extension/LLM-pipeline operators (ext.*, SURVEY
  * §2.6). Every query has a DuckDB oracle except `approx_distinct` (sketch
  * values are engine-specific → rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ApolloQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ApolloQueries.queries ++
      Relational.queries ++
      DedupOps.queries ++
      SimilarityOps.queries ++
      SamplingOps.queries ++
      TextOps.queries ++
      MultimodalOps.queries ++
      Streams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ApolloQueries.oracles ++
      Relational.oracles ++
      DedupOps.oracles ++
      SimilarityOps.oracles ++
      SamplingOps.oracles ++
      TextOps.oracles ++
      MultimodalOps.oracles ++
      Streams.oracles
}
