package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiler — the data-quality scan every ingest pipeline runs
  * before trusting a new drop: per column, null count, exact distinct
  * count, and min/max (as strings, for a uniform schema across types).
  *
  * ONE pass over the data: a single aggregate computes all 4 stats for
  * every column (Spark plans the distinct aggregates via one Expand — no
  * per-column rescans of a 100 TB table), and the single result row is
  * melted into per-column rows with a literal struct array + explode
  * (driver-free, though the frame at that point is one row). For a quick
  * look at petabyte scale, swap `countDistinct` for
  * `approx_count_distinct` via `exact = false`. */
object Profiler {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map { c =>
        struct(lit(c).as("column"),
          col(s"__nn_$c").as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"),
          col(s"__mn_$c").as("min_str"),
          col(s"__mx_$c").as("max_str"))
      }: _*)).as("p"))
      .select("p.column", "p.n_nulls", "p.n_distinct", "p.min_str", "p.max_str")
  }
}
