package graft.nfl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Play boundary frames (`Metric Building and Evaluation.R:22-30`).
  *
  * Both outputs are tiny (one row per play) and are reused by 3+ downstream
  * branches — callers should `persist()` them via NflPipeline rather than
  * recompute (SURVEY.md §4, intermediate-reuse row).
  */
object PlayBounds {

  /** The five play-ending events (MB:22). */
  val endEvents: Seq[String] = Seq(
    "pass_forward", "qb_sack", "qb_strip_sack",
    "autoevent_passforward", "autoevent_passinterrupted")

  /** MB:22-26: latest end-event frame per play → `play_end_frameId`.
    * (The reference's descending sort at MB:23 is inert — the max() makes
    * it so; we keep just the agg.) */
  def playEnd(mainDf: DataFrame): DataFrame =
    mainDf
      .filter(col("event").isin(endEvents: _*))
      .select("playId", "gameId", "frameId").distinct()
      .groupBy("playId", "gameId")
      .agg(max("frameId").as("play_end_frameId"))

  /** MB:28-30: snap frame(s) per play → `play_start_frameId`. Kept as a
    * distinct projection, not an agg — the reference does NOT aggregate
    * here, so a play with two ball_snap frames would yield two rows
    * (faithful to the R shape). */
  def playStart(mainDf: DataFrame): DataFrame =
    mainDf
      .filter(col("event") === "ball_snap")
      .select("playId", "gameId", "frameId").distinct()
      .withColumnRenamed("frameId", "play_start_frameId")
}
