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
  * (driver-free, though the frame at that point is one row).
  *
  * Exact-mode cost (PLANS.md "profiler Expand"): the one Expand that
  * de-duplicates N `countDistinct` columns emits N+1 projections of every
  * input row, so the shuffle carries ~(N+1)× the scan — measured 10× on
  * the 9-column orders table at sf0.1. Sound for a bounded ingest drop;
  * wrong as a petabyte quick-look. So `profile` auto-dispatches: above
  * [[exactMaxBytes]] (optimizer scan estimate) it swaps `countDistinct`
  * for `approx_count_distinct` (HLL++, fixed-size mergeable state, no
  * Expand). Pass `exactHint` to force either mode — `Some(true)` is the
  * oracle-checked x34 path. */
object Profiler {

  /** Optimizer-estimated input bytes above which un-hinted `profile` runs
    * approximate distincts. 16 GiB ≈ the point where the (N+1)-fold Expand
    * shuffle of exact mode stops being a wait-on-it ingest check; beyond
    * it HLL++ (±~2.3% on defaults) is the right quick-look. */
  val exactMaxBytes: Long = 16L << 30

  /** r20 OPTIMIZATION (guide §1.2 step 2 / §2.3): min/max carry a STRING
    * aggregation buffer, and one non-mutable buffer field forces the WHOLE
    * multi-distinct aggregate (its Expand ×(N+1) input included) out of
    * HashAggregate into Sort+SortAggregate — and Catalyst cannot prune the
    * min/max aggregates away when a caller drops them, because the melt
    * wraps every stat in one explode(array(struct(...))). Callers that
    * only need null/distinct counts (x34's oracle shape) pass
    * `withMinMax = false`: same output columns, min_str/max_str simply
    * absent, and the plan is Expand → HashAggregate (measured 3.6 s →
    * 0.8 s on orders at sf0.1 — two 1M-row sorts gone; at 100 TB the same
    * flip removes the sort of the (N+1)-fold expanded table). */
  def profile(df: DataFrame, exactHint: Option[Boolean] = None,
              withMinMax: Boolean = true): DataFrame = {
    val exact = exactHint.getOrElse {
      // sources without size statistics (RDD-backed frames, some JDBC/
      // views) report the defaultSizeInBytes SENTINEL (Long.MaxValue by
      // default), not a measurement — and any operator ABOVE an unmeasured
      // leaf (a filter's selectivity, a project's column ratio) SCALES the
      // sentinel, so the derived estimate is huge-but-meaningless without
      // equalling it. Estimates within a sentinel-derived band (≥
      // sentinel/1024 — three orders of magnitude of filter/project
      // scaling, still ~2^53 bytes, far beyond any measured input) are
      // treated as unmeasured and keep the pre-dispatch exact default.
      // Below the band, estimates derive from real leaf sizes: at or over
      // the cap they route to approx. Callers who know better pass
      // exactHint.
      val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val sentinel = BigInt(df.sparkSession.sessionState.conf.defaultSizeInBytes)
      size <= BigInt(exactMaxBytes) || size >= sentinel / 1024
    }
    val cols = df.columns.toSeq
    // resolve generated aliases with quoted identifiers — a raw col() parses
    // dots as struct access, breaking legal-but-unusual source column names
    def ref(prefix: String, c: String) =
      col("`" + (prefix + c).replace("`", "``") + "`")
    val aggs = cols.flatMap { c =>
      Seq(
        coalesce(sum(when(ref("", c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__nn_$c"),
        (if (exact) countDistinct(ref("", c))
         else approx_count_distinct(ref("", c))).as(s"__nd_$c")) ++
      (if (withMinMax)
        Seq(min(ref("", c)).cast("string").as(s"__mn_$c"),
          max(ref("", c)).cast("string").as(s"__mx_$c"))
       else Nil)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val mm = if (withMinMax) Seq("min_str" -> "__mn_", "max_str" -> "__mx_") else Nil
    one.select(explode(array(cols.map { c =>
        struct(Seq(lit(c).as("column"),
          ref("__nn_", c).as("n_nulls"),
          ref("__nd_", c).as("n_distinct")) ++
          mm.map { case (out, pfx) => ref(pfx, c).as(out) }: _*)
      }: _*)).as("p"))
      .select((Seq("column", "n_nulls", "n_distinct") ++ mm.map(_._1))
        .map(f => col(s"p.$f")): _*)
  }
}
