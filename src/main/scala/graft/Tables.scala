package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata (TESTDATA.md / FIXTURES.md §1).
  *
  * Explicit-path parquet scans: Catalyst gets filter pushdown + column pruning
  * for free on these (SURVEY.md §4). At cluster scale the same API reads a
  * partitioned directory tree; nothing here assumes local paths.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` has shipped as parquet timestamp[ns] (pre-round-9 testdata)
    * and as timestamp[us] (round-9 regeneration). Spark 4 rejects ns by
    * default, so read nanos as long (legacy conf) and convert; when the file
    * already carries a microsecond timestamp the conf is a no-op and the
    * column arrives as TimestampType — use it as-is. Either way the values
    * match DuckDB's read of the same file exactly (FIXTURES.md §1 note).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // ns file: nanos arrive as long under the legacy conf
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // us file written tz-naive: reinterpret in the
        // session zone (Verify/tests pin UTC) so downstream unix_micros/window
        // code keeps the loader's long-standing TIMESTAMP(LTZ) contract and
        // the values match DuckDB's naive read of the same file
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
