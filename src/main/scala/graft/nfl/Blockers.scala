package graft.nfl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational.naturalJoin

/** Pass-blocker surface (`Metric Building and Evaluation.R:112-149`):
  * blocker dimension rows, blockers-per-rusher counts, the blocked-by-OL
  * gate, the play-action flag, and the rusher-metric attach.
  *
  * Scale: every input here is play-grain or (play, player)-grain — already
  * tiny relative to tracking. Counts are distinct-then-count (the
  * reference's two-step shape, E9) over broadcastable frames.
  */
object Blockers {

  /** The five offensive-line slots (MB:113-114). */
  val olPositions: Seq[String] = Seq("LT", "LG", "C", "RG", "RT")

  /** MB:18-19: plays with at least one play-action block. */
  def playAction(pff: DataFrame): DataFrame =
    pff.filter(col("pff_blockType") === "PA")
      .select("gameId", "playId").distinct()
      .withColumn("is_play_action", lit(1))

  /** MB:113-118: one row per OL blocker per play (dedup from frame grain). */
  def passBlockers(mainDf: DataFrame): DataFrame =
    mainDf
      .filter(col("pff_role") === "Pass Block" &&
        col("pff_positionLinedUp").isin(olPositions: _*))
      .select("nflId", "playId", "gameId", "playDirection", "jerseyNumber", "team",
        "pff_positionLinedUp", "pff_beatenByDefender", "pff_hitAllowed",
        "pff_hurryAllowed", "pff_sackAllowed", "pff_nflIdBlockedPlayer",
        "pff_blockType", "passResult", "dropBackType")
      .distinct()

  /** MB:122-132: blockers per blocked rusher — `olOnly = true` counts only
    * the five OL slots. Distinct (play, blocker, blocked) pairs then a
    * count per blocked player; NULL blocked-ids dropped (complete.cases). */
  def blockerCounts(mainDf: DataFrame, olOnly: Boolean): DataFrame = {
    val alias = if (olOnly) "Blockers_OL" else "Blockers_All"
    val blocks = if (olOnly)
      mainDf.filter(col("pff_role") === "Pass Block" &&
        col("pff_positionLinedUp").isin(olPositions: _*))
    else
      mainDf.filter(col("pff_role") === "Pass Block")
    blocks
      .select("gameId", "playId", "nflId", "pff_nflIdBlockedPlayer").distinct()
      .groupBy("gameId", "playId", "pff_nflIdBlockedPlayer")
      .agg(count(lit(1)).as(alias))
      .filter(col("pff_nflIdBlockedPlayer").isNotNull)
      .withColumnRenamed("pff_nflIdBlockedPlayer", "nflId")
  }

  /** MB:134-145: left-join both blocker counts onto the rusher metric with
    * NA→0 backfill, keep only rushers blocked by ≥1 OL (the inner join
    * against distinct blocker keys — a semi join), and attach the
    * play-action flag (left + fill 0). */
  def finalizeRushers(metric: DataFrame, mainDf: DataFrame, pff: DataFrame): DataFrame = {
    val blockedByOl = passBlockers(mainDf)
      .select(col("pff_nflIdBlockedPlayer").as("nflId"), col("gameId"), col("playId"))
      .distinct()
    metric
      .transform(naturalJoin(_, blockerCounts(mainDf, olOnly = true), "left"))
      .transform(naturalJoin(_, blockerCounts(mainDf, olOnly = false), "left"))
      .na.fill(0, Seq("Blockers_OL", "Blockers_All"))
      .join(blockedByOl, Seq("playId", "gameId", "nflId"), "left_semi")
      .transform(naturalJoin(_, playAction(pff), "left"))
      .na.fill(0, Seq("is_play_action"))
  }

  /** MB:148-149: attach each rusher's %PZ/s (and blocker counts) to the
    * blockers who blocked them — the by.x/by.y join on
    * nflId ↔ pff_nflIdBlockedPlayer (D5). */
  def attachMetric(blockers: DataFrame, rushersFinal: DataFrame): DataFrame = {
    val rusherSide = rushersFinal.select(
      col("playId"), col("gameId"), col("nflId").as("pff_nflIdBlockedPlayer"),
      col("Percent_to_Pressure_Zone_per_s"), col("Blockers_OL"), col("Blockers_All"))
    blockers.join(rusherSide, Seq("playId", "gameId", "pff_nflIdBlockedPlayer"))
  }
}
