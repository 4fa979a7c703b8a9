package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — attach to each point row the interval
  * rows whose [lo, hi] contain its value. The second temporal/numeric join
  * Spark has no built-in for (beside [[AsOfJoin]]): the naive formulation
  * `p.v BETWEEN i.lo AND i.hi` is a non-equi join that Spark can only plan
  * as a broadcast-nested-loop or cartesian — O(points × intervals) however
  * selective the predicate.
  *
  * Implemented as BUCKET EXPANSION: intervals explode into the fixed-width
  * buckets they cover, points map to their single bucket, the two sides
  * meet in a plain shuffled EQUI-join on the bucket id, and an exact
  * BETWEEN filter removes same-bucket misses. Work is proportional to
  * points + interval-bucket pairs that actually share a bucket — never the
  * cross product — and both sides shuffle on a key Catalyst understands
  * (hash join, AQE, skew handling all apply).
  *
  * Completeness does not depend on float luck: IEEE division is monotonic,
  * so v ∈ [lo, hi] implies floor(v/W) ∈ [floor(lo/W), floor(hi/W)] even
  * under rounding — a containing interval always lands in the point's
  * bucket. Choose `bucketWidth` near the typical interval width: much
  * smaller multiplies interval replication (ceil(len/W)+1 rows each), much
  * larger puts unrelated intervals in every bucket.
  */
object RangeJoin {

  /** Inner point-in-interval join: every (point, containing-interval) pair,
    * with all columns from both sides. The two frames must not share column
    * names (Spark would make the exact-filter references ambiguous);
    * `valueCol`, `loCol`, `hiCol` must be numeric. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      valueCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // the internal bucket key must not collide with a payload column — a
    // pre-existing __bucket would be silently overwritten and then dropped
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "inputs must not contain a __bucket column (reserved by pointInInterval)")
    val pB = points.withColumn("__bucket",
      floor(col(valueCol).cast("double") / bucketWidth).cast("long"))
    val iB = intervals
      // inverted intervals (lo > hi) match nothing under BETWEEN — drop them
      // here, or sequence() would explode a DESCENDING bucket range for them
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(loCol).cast("double") / bucketWidth).cast("long"),
        floor(col(hiCol).cast("double") / bucketWidth).cast("long"))))
    pB.join(iB, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bucket")
  }
}
