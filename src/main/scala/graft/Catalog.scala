package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface facade: registers the testdata tables as temp views so the
  * engine is queryable through `spark.sql(...)` with the same table names
  * the DuckDB oracle uses. The §2.3 core queries are ANSI-portable — the
  * same text runs verbatim on Spark SQL and DuckDB (SqlParitySpec proves
  * the Spark side).
  */
object Catalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table of `dir` as a temp view. `events` goes
    * through Tables.events (ns-timestamp normalization). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case n => Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }
}
