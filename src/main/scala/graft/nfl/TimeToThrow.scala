package graft.nfl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-to-throw (`WIP.R:73-77`): seconds between snap and throw for clean
  * traditional-pocket completions — the reference's minimum end-to-end
  * scan-filter-agg slice (SURVEY.md §7.2 step 2).
  */
object TimeToThrow {

  def compute(mainDf: DataFrame): DataFrame =
    mainDf
      .filter((col("event") === "ball_snap" || col("event") === "pass_forward") &&
        col("pff_positionLinedUp") === "QB" &&
        col("passResult") === "C" &&
        col("dropBackType") === "TRADITIONAL")
      .groupBy("playId", "gameId", "nflId")
      .agg(
        (min("frameId") * 0.1).as("snap"),
        (max("frameId") * 0.1).as("throw"),
        max("playResult").as("yards"))
      .withColumn("seconds_to_throw", col("throw") - col("snap"))
}
