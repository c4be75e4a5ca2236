package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Events, LwesQueries, Pipeline, Relational, Subqueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query packs: name -> (query fn, Option(oracle SQL)). */
  private def packs: Map[String, ((SparkSession, String) => DataFrame, String)] =
    Relational.all ++ Subqueries.all ++ Events.all ++ LwesQueries.all ++
      Pipeline.withOracle ++ Pipeline.withOracle2 ++ Pipeline.withOracle3 ++
      Pipeline.withOracle4 ++ Pipeline.withOracle5

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all("q1_pricing")._1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map { case (k, (fn, _)) => k -> fn } ++
      Pipeline.rowsOnly ++ Relational.rowsOnly

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Rows-only ops are omitted by design. */
  def oracleSql: Map[String, String] =
    packs.map { case (k, (_, sql)) => k -> sql }
}
