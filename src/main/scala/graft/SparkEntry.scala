package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 expressed
  * Spark-first; [[oracleSql]] carries the equivalent DuckDB SQL the driver
  * runs on the same parquet tables for the t2 hash-match gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * raw events → canonical trades → tick-rule sides → 5-minute OHLCV bars.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("time_bars_5m")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TradeQueries.queries ++ FeatureQueries.queries ++
      ScanQueries.queries ++ LabelQueries.queries ++ FootprintQueries.queries ++
      DocQueries.queries ++ PipeQueries.queries ++ LmQueries.queries ++
      StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TradeQueries.oracles ++ FeatureQueries.oracles ++
      ScanQueries.oracles ++ LabelQueries.oracles ++ FootprintQueries.oracles ++
      DocQueries.oracles ++ PipeQueries.oracles ++ LmQueries.oracles ++
      StreamQueries.oracles
}
