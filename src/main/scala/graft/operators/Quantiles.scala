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
  * values repeat. All requested percentiles come out of ONE pass over the
  * cumulative table.
  *
  * Interpolation matches `percentile(v, p)` BIT-exactly — Spark's own
  * formula `(higher − pos)·lo + (pos − lower)·hi` with the lower==higher
  * short-circuit, not the algebraically-equal-but-FP-different
  * `lo + (hi − lo)·frac` — so swapping it into an oracle-checked query
  * changes no results.
  */
object Quantiles {

  /** Exact per-group percentiles of `valueCol` (nulls ignored, like the
    * builtin). Output: (groupCol, q0, q1, … qk) — one DOUBLE column per
    * requested p, in order. One delta from the builtin: a group whose
    * values are ALL null is omitted from the output (the builtin would
    * emit it with a null result). */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0, 1], got $ps")
    val gv = df
      .filter(col(valueCol).isNotNull)
      .groupBy(groupCol, valueCol)
      .agg(count(lit(1)).as("cnt"))
    val ordered = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(groupCol)
    val v = col(valueCol).cast("double")
    // 1-based rank interval [prev+1, cum] occupied by each distinct value;
    // pos_p = 1 + (n−1)·p is the (fractional, 1-based) target rank of p.
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      // 0-based fractional target (Spark's Percentile): pos0 = (n−1)·p;
      // ranks are 1-based, so the bracketing ranks are pos0+1 rounded down/up
      val pos0 = (col("n") - 1) * p
      val t1 = floor(pos0) + 1
      val t2 = ceil(pos0) + 1
      Seq(
        min(when(col("prev") < t1 && col("cum") >= t1, v)).as(s"lo_$i"),
        min(when(col("prev") < t2 && col("cum") >= t2, v)).as(s"hi_$i"),
        max(ceil(pos0) - pos0).as(s"wlo_$i"),
        max(pos0 - floor(pos0)).as(s"whi_$i"))
    }
    gv
      .withColumn("cum", sum("cnt").over(ordered))
      .withColumn("n", sum("cnt").over(whole))
      .withColumn("prev", col("cum") - col("cnt"))
      .groupBy(groupCol)
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: ps.indices.map { i =>
        // lower==higher → lo, else Spark's weighted interpolation
        when(col(s"whi_$i") === 0.0, col(s"lo_$i"))
          .otherwise(col(s"wlo_$i") * col(s"lo_$i") + col(s"whi_$i") * col(s"hi_$i"))
          .as(s"q$i")
      }: _*)
  }

  /** Exact per-group median (see groupQuantiles).
    * Output: (groupCol, median DOUBLE). */
  def groupMedian(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    groupQuantiles(df, groupCol, valueCol, Seq(0.5)).withColumnRenamed("q0", "median")
}
