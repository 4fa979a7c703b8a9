package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe exact quantiles.
  *
  * Spark's builtin `median`/`percentile` aggregate buffers EVERY value of a
  * group inside one ObjectHashAggregate task — O(group size) memory in a
  * single JVM, the classic driver-of-OOM for billion-row groups. This plan
  * computes the identical exact result from per-(group, value) COUNTS:
  * a map-side-combinable groupBy, then a per-group cumulative window over
  * the distinct-value table, which Spark executes with its spillable
  * external sort — memory-bounded at any group size, and cheaper whenever
  * values repeat.
  *
  * Interpolation matches `percentile(v, 0.5)` exactly (0-based fractional
  * rank pos = (n−1)·p; result = lo + (hi − lo)·frac), so swapping it into
  * an oracle-checked query changes no results.
  */
object Quantiles {

  /** Exact per-group median of `valueCol` (nulls ignored, like the builtin).
    * Output: (groupCol, median DOUBLE). One delta from the builtin: a group
    * whose values are ALL null is omitted from the output (the builtin
    * would emit it with a null median). */
  def groupMedian(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val gv = df
      .filter(col(valueCol).isNotNull)
      .groupBy(groupCol, valueCol)
      .agg(count(lit(1)).as("cnt"))
    val ordered = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(groupCol)
    // 1-based rank interval [prev+1, cum] occupied by each distinct value;
    // pos = 1 + (n−1)·0.5 is the (fractional, 1-based) median rank.
    val pos = lit(1.0) + (col("n") - 1) * 0.5
    val t1 = floor(pos)
    val t2 = ceil(pos)
    val frac = pos - t1
    val v = col(valueCol).cast("double")
    gv
      .withColumn("cum", sum("cnt").over(ordered))
      .withColumn("n", sum("cnt").over(whole))
      .withColumn("prev", col("cum") - col("cnt"))
      .filter(col("cum") >= t1 && col("prev") < t2) // rows covering rank t1 or t2
      .groupBy(groupCol)
      .agg(
        min(when(col("prev") < t1 && col("cum") >= t1, v)).as("lo"),
        min(when(col("prev") < t2 && col("cum") >= t2, v)).as("hi"),
        max(frac).as("frac"))
      .select(col(groupCol),
        (col("lo") + (col("hi") - col("lo")) * col("frac")).as("median"))
  }
}
