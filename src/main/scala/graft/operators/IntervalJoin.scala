package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join — all pairs (l, r) whose [lo, hi] intervals
  * intersect: `l.lo <= r.hi AND r.lo <= l.hi`. The big×big sibling of
  * [[RangeJoin]] (point-in-interval, small side broadcastable): here BOTH
  * sides are fact-sized (concurrent sessions, overlapping spans, conflict
  * detection), so the naive inequality join's broadcast-nested-loop plan
  * is O(|L|·|R|) and the broadcast side may not even fit.
  *
  * Implemented as symmetric BUCKET EXPANSION over integer bounds: each
  * interval explodes into the fixed-width buckets it covers, the sides
  * meet in a plain shuffled EQUI-join on the bucket id, an exact overlap
  * predicate removes same-bucket misses, and the classic first-common-
  * bucket rule deduplicates WITHOUT a distinct: a surviving pair is kept
  * only where the join bucket equals `greatest(floor(l.lo/W),
  * floor(r.lo/W))`. Overlapping intervals both contain the instant
  * `max(l.lo, r.lo)`, hence both cover its bucket — which is exactly the
  * greatest of their start buckets, so every true pair survives exactly
  * once (row-local filter; no shuffle-the-output distinct). Bounds are
  * integers (e.g. epoch microseconds), so bucket math is exact — none of
  * RangeJoin's IEEE-monotonicity caveats.
  *
  * Scale shape: work ∝ interval-bucket replication + colliding pairs,
  * never |L|·|R|; the bucket key is hashable, so hash join, AQE and skew
  * splitting all apply. Choose `bucketWidth` near the typical interval
  * length: replication per row is ceil(len/W)+1, while a too-wide W puts
  * unrelated intervals in one bucket (more exact-filter misses). A
  * pathological bucket (everyone overlaps one hot hour) is an AQE
  * skew-join split; the per-pair exact filter still bounds output to true
  * overlaps.
  */
object IntervalJoin {

  /** Inner overlap join. The two frames must not share column names;
    * `loCol`/`hiCol` (same names on both sides) must be integral and
    * satisfy lo <= hi per row. Output carries all columns of both sides
    * (left's bounds as `loCol`/`hiCol`, right's suffixed `_r`). */
  def overlapJoin(left: DataFrame, right: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val reserved = Seq("__bucket", s"${loCol}_r", s"${hiCol}_r")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"inputs must not contain ${reserved.mkString("/")} (reserved)")
    val shared = (left.columns.toSet & right.columns.toSet) -- Set(loCol, hiCol)
    require(shared.isEmpty,
      s"non-bound columns shared by both sides would collide: $shared")

    def expand(df: DataFrame): DataFrame =
      df.withColumn("__bucket",
        explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
          floor(col(hiCol) / bucketWidth).cast("long"))))

    val l = expand(left)
    // right side expands on its renamed bounds
    val rExp = right
      .withColumnRenamed(loCol, s"${loCol}_r")
      .withColumnRenamed(hiCol, s"${hiCol}_r")
      .withColumn("__bucket",
        explode(sequence(floor(col(s"${loCol}_r") / bucketWidth).cast("long"),
          floor(col(s"${hiCol}_r") / bucketWidth).cast("long"))))

    val lo = col(loCol); val hi = col(hiCol)
    val loR = col(s"${loCol}_r"); val hiR = col(s"${hiCol}_r")
    l.join(rExp, Seq("__bucket"))
      .filter(lo <= hiR && loR <= hi) // exact overlap
      .filter(col("__bucket") === // first common bucket — dedup without distinct
        greatest(floor(lo / bucketWidth).cast("long"),
          floor(loR / bucketWidth).cast("long")))
      .drop("__bucket")
  }
}
