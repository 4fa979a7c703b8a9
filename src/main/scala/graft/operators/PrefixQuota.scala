package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed "take rows until the group's quota is spent" — the primitive
  * behind mixture sampling to a token budget (x53): each group (source,
  * language, domain) keeps its documents in a deterministic content-
  * independent hash order until the running token total reaches the group's
  * budget. The kept set is exactly `{row : sum of value over all
  * earlier-ordered rows of the group < quota(group)}` — the row that crosses
  * the boundary is kept (overshoot-by-one), everything after is dropped.
  *
  * The naive plan — one running-sum window per group — serializes each
  * group through a single task: at 100 TB a popular source is terabytes,
  * and `Window.partitionBy(source)` would sort and scan it on one core.
  * This operator runs the classic two-level distributed prefix sum instead:
  *
  *   1. BUCKET: rows bucket by a short PREFIX of the hex order key
  *      (`substring(orderKey, 1, bucketLen)`). Because the order key is a
  *      fixed-case hex string, prefix order IS total order, so buckets are
  *      contiguous runs of the group's order.
  *   2. BUCKET TOTALS: one map-side-combined `groupBy(group, bucket).sum` —
  *      the only full-data aggregate, shrinking 100 TB to
  *      |groups|·16^bucketLen rows.
  *   3. BUCKET PREFIX SUM: a running sum over that tiny table (per-group
  *      window — fine, it has 16^bucketLen rows per group) gives each
  *      bucket its starting offset `base`.
  *   4. PRUNE + LOCAL WINDOW: `base` broadcast-joins back onto the rows;
  *      buckets that start at or past the quota are dropped BEFORE any
  *      sort (at a tight budget that is almost all of the data), and the
  *      survivors run the running sum partitioned by (group, bucket) —
  *      16^bucketLen-way parallel per group instead of serialized.
  *
  * Exactly one full-width shuffle touches the kept-candidate rows (the
  * (group, bucket) window exchange); the aggregate shuffle moves map-side
  * partials only. `bucketLen` rises with scale (1 hex char = 16-way split
  * per group at test scale; 3-4 chars at cluster scale) — by default it is
  * DISPATCHED from the optimizer's size estimate (the
  * `Quantiles.singleGroupQuantiles` precedent: zero extra jobs, and
  * unmeasured sources report a sentinel-huge estimate that routes to the
  * deepest split, the safe direction — more parallelism, a still-tiny
  * totals table).
  *
  * Requirements: `orderKey` must be a deterministic LOWERCASE-hex string
  * (md5 here; any hash rendered as hex works) and `value` must be
  * non-negative. The hex contract is what makes "16^bucketLen roughly
  * even buckets" true — an arbitrary string key could silently collapse
  * into one bucket (e.g. every key sharing a prefix) and resurrect the
  * serialized plan this operator exists to avoid, so a per-row canary
  * raises on the first non-hex prefix instead of degrading quietly.
  * `tie` breaks order-key collisions so the order is total. Reserved
  * column names `__bkt/__base/__bcum` must not be in `df`.
  */
object PrefixQuota {

  /** Sentinel for `bucketLen`: dispatch the split depth from the
    * optimizer's byte estimate of `df`. */
  val AutoBucketLen: Int = 0

  /** Per-(group, bucket) byte budget for the dispatch: one bucket of the
    * worst case (the whole input in ONE group) must sort comfortably in a
    * single task. Reuses Quantiles' deliberately LOW 16 B/row convention
    * (2M rows × 16 B = 32 MB): the byte estimate over-counts rows, so the
    * dispatch flips to a deeper split early — the safe direction. */
  private[graft] val bucketTargetBytes: Long =
    Quantiles.builtinMaxRowsPerGroup * 16L

  /** Smallest depth in 1..4 whose worst-case bucket (estBytes/16^len)
    * fits [[bucketTargetBytes]]; capped at 4 (65536-way per group — past
    * that the totals table stops being "tiny" everywhere, and at that
    * scale real mixtures have many groups sharing the split). */
  private[graft] def dispatchBucketLen(estBytes: BigInt): Int =
    (1 to 4).find(len => estBytes <= BigInt(bucketTargetBytes) * BigInt(16).pow(len))
      .getOrElse(4)

  /** Shared front half of both public ops: bucket the rows by the hex-key
    * prefix (with the canary), compute per-bucket starting offsets via the
    * tiny bucket-cumsum window, and broadcast them back onto the rows.
    * Returns the input plus `__bkt` and `__base`. */
  private def withBucketBase(df: DataFrame, groupCol: String, orderKey: Column,
      value: Column, bucketLen: Int): DataFrame = {
    require(bucketLen == AutoBucketLen || (bucketLen >= 1 && bucketLen <= 8),
      s"bucketLen out of range: $bucketLen")
    Seq("__bkt", "__base", "__bcum").foreach { r =>
      require(!df.columns.contains(r), s"input must not contain reserved column $r")
    }
    val len =
      if (bucketLen == AutoBucketLen)
        dispatchBucketLen(df.queryExecution.optimizedPlan.stats.sizeInBytes)
      else bucketLen
    // Hex-contract canary: the scaling argument needs lowercase-hex keys
    // (≈ even 16-way fanout per char); a non-hex key fails loudly here
    // instead of silently collapsing the split.
    val pfx = substring(orderKey, 1, len)
    val rows = df.withColumn("__bkt",
      when(pfx.rlike("^[0-9a-f]+$"), pfx).otherwise(raise_error(concat(
        lit("PrefixQuota: orderKey must be a lowercase-hex string; got prefix '"),
        pfx, lit("'")))))
    val totals = rows.groupBy(col(groupCol), col("__bkt"))
      .agg(sum(value).as("__bsum"))
    val bucketCum = totals
      .withColumn("__bcum",
        sum("__bsum").over(Window.partitionBy(groupCol).orderBy("__bkt")))
      .select(col(groupCol), col("__bkt"), (col("__bcum") - col("__bsum")).as("__base"))
    rows.join(broadcast(bucketCum), Seq(groupCol, "__bkt"))
  }

  private def localWindow(groupCol: String, orderKey: Column, tie: Column) =
    Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(orderKey, tie)
      .rowsBetween(Window.unboundedPreceding, -1)

  /** Appends `beforeName` (the group's running value total strictly before
    * the row in (orderKey, tie) order) and keeps rows with before < quota.
    * `quota` may reference only `groupCol` (evaluated per row post-join). */
  def takeUntilQuota(df: DataFrame, groupCol: String, orderKey: Column, tie: Column,
      value: Column, quota: Column, bucketLen: Int = AutoBucketLen,
      beforeName: String = "cum_before"): DataFrame = {
    val win = localWindow(groupCol, orderKey, tie)
    withBucketBase(df, groupCol, orderKey, value, bucketLen)
      .filter(col("__base") < quota) // whole-bucket prune before the sort
      .withColumn(beforeName, col("__base") + coalesce(sum(value).over(win), lit(0L)))
      .filter(col(beforeName) < quota)
      .drop("__bkt", "__base")
  }

  /** Appends `beforeName` — the group's running `value` total strictly
    * before the row in (orderKey, tie) order — to EVERY row: the
    * distributed prefix sum without a cut (sequence packing's
    * concat-position, byte-offset assignment, …). Same plan skeleton as
    * [[takeUntilQuota]] minus the whole-bucket prune (every row is kept,
    * so there is nothing to prune); the win over a plain per-group
    * running-sum window is parallelism — the sort/scan runs
    * 16^bucketLen-way split per group instead of serializing each group
    * through one task. Same requirements as the header doc (lowercase-hex
    * `orderKey`, non-negative `value`, reserved columns absent). */
  def runningBefore(df: DataFrame, groupCol: String, orderKey: Column, tie: Column,
      value: Column, bucketLen: Int = AutoBucketLen,
      beforeName: String = "cum_before"): DataFrame = {
    val win = localWindow(groupCol, orderKey, tie)
    withBucketBase(df, groupCol, orderKey, value, bucketLen)
      .withColumn(beforeName, col("__base") + coalesce(sum(value).over(win), lit(0L)))
      .drop("__bkt", "__base")
  }
}
