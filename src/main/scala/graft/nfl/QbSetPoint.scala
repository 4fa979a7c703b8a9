package graft.nfl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational.naturalJoin

/** QB set-point detection (`Metric Building and Evaluation.R:34-58`): the
  * frame where the QB stops the dropback and sets to throw, found from the
  * speed curve — drop start (first moving frame after snap), peak velocity
  * (first sustained deceleration), set point (frame before re-acceleration,
  * or play end).
  *
  * Window semantics: the reference sorts the whole data.frame and lags over
  * global row order (MB:47-50) so a group's first frame sees the previous
  * group's last frame. We define the operator with clean per-group windows —
  * `LAG … OVER (PARTITION BY gameId, nflId, playId ORDER BY frameId)` —
  * which is the SQL-checkable semantics; the delta is documented in
  * SURVEY.md §2.1 F1 and is immaterial after MB:48's frame filter.
  *
  * Scale: one window shuffle keyed on (gameId, nflId, playId) over
  * QB-frames-of-traditional-dropbacks only (a ~1/22 slice of tracking,
  * pre-filtered before the shuffle); the three bounds joins are
  * broadcast-sized per-play tables.
  */
object QbSetPoint {

  private val grp = Seq("gameId", "nflId", "playId")
  private val w = Window.partitionBy(grp.map(col): _*).orderBy("frameId")

  /** MB:39: first frame after the snap where the QB is moving (s ≥ 0.10). */
  def dropStart(qbFrames: DataFrame): DataFrame =
    qbFrames
      .filter(col("officialPosition") === "QB" &&
        col("s") >= 0.10 && col("frameId") > col("play_start_frameId"))
      .groupBy(grp.map(col): _*)
      .agg(min("frameId").as("dropStartFrameId"))

  /** MB:34-58 → one row per (nflId_QB, playId, gameId) with the set-point
    * frame and coords. Input: `main_df` plus the two bounds tables. */
  def setPoints(mainDf: DataFrame, playStart: DataFrame, playEnd: DataFrame): DataFrame = {
    // MB:34,37: traditional-dropback QB frames, with the snap frame attached.
    val qb = mainDf
      .filter(col("pff_positionLinedUp") === "QB" && col("dropBackType") === "TRADITIONAL")
      .transform(naturalJoin(_, playStart))              // on (playId, gameId)

    // MB:40-42: attach drop-start and play-end bounds (inner joins — QBs
    // that never move, or plays with no end event, drop out here).
    val bounded = qb
      .transform(naturalJoin(_, dropStart(qb)))          // on (gameId, nflId, playId)
      .transform(naturalJoin(_, playEnd))                // on (playId, gameId)

    // MB:45 sentinel (kept for fidelity; the MB:48 filter already excludes
    // the snap frame, so it can only matter for a duplicated snap event) and
    // MB:48 frame filter, then the two lag passes (MB:49-50).
    val filtered = bounded
      .withColumn("s", when(col("event") === "ball_snap", -999.0).otherwise(col("s")))
      .filter(col("frameId") >= col("dropStartFrameId") &&
        col("frameId") > col("play_start_frameId"))

    // r18 width prune (r17 verdict item 4): only the lag math's columns
    // cross the window shuffle — the set-point coords are read back from
    // the SAME filtered rows by the MB:56-58 join below (already keyed on
    // (group, frameId), so the row domain and values are unchanged; the
    // only delta is that x/y no longer ride the window exchange).
    val curves = filtered
      .select("gameId", "nflId", "playId", "frameId", "s",
        "dropStartFrameId", "play_end_frameId")
      .withColumn("a_direction", col("s") - lag("s", 1).over(w))
      .withColumn("s_direction",
        col("a_direction") > lag("a_direction", 1).over(w) && col("a_direction") > 0)

    // MB:52: peak velocity = first sustained (≥3 frames in, |Δv| ≥ 0.10)
    // deceleration; set-point candidate is the frame before it.
    val peak = curves
      .filter(col("a_direction") < 0 &&
        (col("frameId") - col("dropStartFrameId")) >= 3 &&
        abs(col("a_direction")) >= 0.10)
      .groupBy(grp.map(col): _*)
      .agg((min("frameId") - 1).as("set_point_frameId"))

    val withPeak = curves.transform(naturalJoin(_, peak)) // inner: no peak → no set point

    // MB:54-55: the set point is the frame before the first re-acceleration
    // after the peak — or the play-end frame if the QB never re-accelerates.
    // NULL s_direction (first two frames of a group) cannot pass the first
    // disjunct: set_point_frameId ≥ dropStart+2 bounds it away (SQL 3VL and
    // the reference's NA-subsetting agree here, SURVEY.md §1.4).
    val setPointFrame = withPeak
      .filter((col("set_point_frameId") < col("frameId") && col("s_direction")) ||
        col("frameId") === col("play_end_frameId"))
      .groupBy("nflId", "playId", "gameId")
      .agg((min("frameId") - 1).as("frameId"))

    // MB:56-58: read the QB's coords at the set-point frame; rename to the
    // published schema. Coords come from the pre-window `filtered` rows —
    // identical row set and values to the pre-r18 withPeak read (withPeak
    // only further restricts to groups WITH a peak, which the inner join
    // against setPointFrame enforces by itself).
    filtered.select("nflId", "playId", "gameId", "frameId", "x", "y")
      .transform(naturalJoin(_, setPointFrame))          // on (nflId, playId, gameId, frameId)
      .toDF("nflId_QB", "playId", "gameId", "frameId", "x_set_point", "y_set_point")
  }
}
