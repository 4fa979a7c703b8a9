package graft.nfl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational.naturalJoin

/** EPA sanity-check pipeline (`Final_Scripts/EPA_Comparison.R`): join the
  * per-play mean %PZ/s against the external nflfastR play-by-play feed and
  * compare per-defense medians.
  */
object Epa {

  /** EPA:3-8: filter the pbp feed to regular-season pass plays and project/
    * rename to the join schema. `old_game_id` is STRING in nflfastR; the
    * reference's R `merge` coerces silently (EPA:11) — we cast explicitly
    * (SURVEY.md §1.2 D9). */
  def cleanPbp(pbp: DataFrame): DataFrame =
    pbp
      .filter(col("season_type") === "REG" && col("posteam").isNotNull && col("pass") === 1)
      .select(
        col("play_id").as("playId"),
        col("old_game_id").cast("long").as("gameId"),
        col("posteam"), col("defteam"),
        col("epa"), col("wpa"), col("air_epa"), col("yac_epa"))

  /** EPA:10-11: mean %PZ/s per play, joined to the EPA feed by natural key. */
  def pzPerPlay(rushersFinal: DataFrame, epaData: DataFrame): DataFrame =
    rushersFinal
      .groupBy("playId", "gameId")
      .agg(avg("Percent_to_Pressure_Zone_per_s").as("PZs"))
      .transform(naturalJoin(_, epaData))

  /** EPA:13: the scatter-plot feed (pressure plays only). */
  def scatterFeed(pzPerPlay: DataFrame): DataFrame =
    pzPerPlay.filter(col("PZs") > 0).select("PZs", "air_epa")

  /** EPA:15: per-defense medians of %PZ/s and EPA. */
  def teamPzEpa(pzPerPlay: DataFrame): DataFrame =
    pzPerPlay
      .groupBy("defteam")
      .agg(median(col("PZs")).as("PZs"), median(col("epa")).as("epa"))
      .orderBy("defteam")
}
