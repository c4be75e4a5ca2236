package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Events, LwesQueries, Pipeline, Relational, Subqueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query packs: name -> (query fn, Option(oracle SQL)). */
  private def packs: Map[String, ((SparkSession, String) => DataFrame, String)] =
    Relational.all ++ Subqueries.all ++ Events.all ++ LwesQueries.all ++
      Pipeline.withOracle ++ Pipeline.withOracle2 ++ Pipeline.withOracle3 ++
      Pipeline.withOracle4 ++ Pipeline.withOracle5 ++ Pipeline.withOracle6

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all("q1_pricing")._1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Every key is
    * oracle-gated since r15 (the raw ANN paths carry structural-contract
    * oracles; their neighbor-set quality is gated by the recall twins). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    packs.map { case (k, (_, sql)) => k -> sql }
}
