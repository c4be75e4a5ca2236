package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators (SURVEY.md §2 C) — filled in as
  * operators land. Oracle-matched entries in [[withOracle]]; ops whose
  * semantics aren't SQL-expressible in DuckDB register in [[rowsOnly]]
  * (driver records a weaker rows-only check for those).
  */
object Pipeline {
  val withOracle: Map[String, ((SparkSession, String) => DataFrame, String)] = Map()
  val rowsOnly: Map[String, (SparkSession, String) => DataFrame] = Map()
}
