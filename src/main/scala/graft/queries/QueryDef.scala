package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame program plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs through DuckDB as a differential
  * oracle. Column names/aliases MUST match between `run`'s output and the SQL
  * (the driver sorts columns by name and hashes values).
  *
  * Determinism contract (SURVEY.md §2.3): total ORDER BY on a unique key,
  * floating aggregates wrapped in ROUND(…,6), exact `median` only.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
