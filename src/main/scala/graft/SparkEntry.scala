package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, EventQueries, MultimodalQueries, PrivacyQueries, StreamQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (one entry per implemented operator
  * from SURVEY.md §2); `oracleSql` gives the DuckDB-equivalent SQL for every
  * query whose semantics ANSI SQL can express (the driver hash-compares
  * both); queries without an oracle get a weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5-style 6-table join: broadcast dims, shuffle facts. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q5JoinRegion(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ EventQueries.queries ++ PrivacyQueries.queries ++
      TextQueries.queries ++ VectorQueries.queries ++ MultimodalQueries.queries ++
      StreamQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ EventQueries.oracles ++ PrivacyQueries.oracles ++
      TextQueries.oracles ++ VectorQueries.oracles ++ MultimodalQueries.oracles ++
      StreamQueries.oracles
}
