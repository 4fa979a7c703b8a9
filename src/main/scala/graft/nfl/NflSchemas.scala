package graft.nfl

import org.apache.spark.sql.types._

/** Explicit StructType schemas for the five reference source tables
  * (SURVEY.md §1.2). The reference sniffs types at load
  * (`Final_Scripts/Data Load and Cleaning.R:15-22`); we declare them so the
  * scan is a single pass with no inference job and so the differential
  * oracle agrees on types.
  *
  * Only the columns the reference ever touches are declared; Kaggle's extra
  * columns are dropped at scan time (column pruning starts at the reader).
  */
object NflSchemas {

  /** Tracking frames, grain (gameId, playId, nflId, frameId) at 10 Hz
    * (DL:20-22; the 0.1 s/frame clock at MB:99). `event` uses the literal
    * string "None" on non-event frames in the Kaggle CSVs — it is not NULL.
    */
  val tracking: StructType = StructType(Seq(
    StructField("gameId", LongType, nullable = false),
    StructField("playId", LongType, nullable = false),
    StructField("nflId", LongType, nullable = true),
    StructField("frameId", IntegerType, nullable = false),
    StructField("x", DoubleType, nullable = true),
    StructField("y", DoubleType, nullable = true),
    StructField("s", DoubleType, nullable = true),
    StructField("a", DoubleType, nullable = true),
    StructField("event", StringType, nullable = true),
    StructField("team", StringType, nullable = true),
    StructField("jerseyNumber", IntegerType, nullable = true),
    StructField("playDirection", StringType, nullable = true)))

  /** PFF scouting, grain (gameId, playId, nflId) (DL:16). */
  val pff: StructType = StructType(Seq(
    StructField("gameId", LongType, nullable = false),
    StructField("playId", LongType, nullable = false),
    StructField("nflId", LongType, nullable = false),
    StructField("pff_role", StringType, nullable = true),
    StructField("pff_positionLinedUp", StringType, nullable = true),
    StructField("pff_hit", IntegerType, nullable = true),
    StructField("pff_hurry", IntegerType, nullable = true),
    StructField("pff_sack", IntegerType, nullable = true),
    StructField("pff_beatenByDefender", IntegerType, nullable = true),
    StructField("pff_hitAllowed", IntegerType, nullable = true),
    StructField("pff_hurryAllowed", IntegerType, nullable = true),
    StructField("pff_sackAllowed", IntegerType, nullable = true),
    StructField("pff_nflIdBlockedPlayer", LongType, nullable = true),
    StructField("pff_blockType", StringType, nullable = true)))

  /** Play dimension, grain (gameId, playId) (DL:15). */
  val plays: StructType = StructType(Seq(
    StructField("gameId", LongType, nullable = false),
    StructField("playId", LongType, nullable = false),
    StructField("dropBackType", StringType, nullable = true),
    StructField("passResult", StringType, nullable = true),
    StructField("playResult", IntegerType, nullable = true),
    StructField("foulNFLId1", LongType, nullable = true),
    StructField("down", IntegerType, nullable = true),
    StructField("yardsToGo", IntegerType, nullable = true),
    StructField("playDescription", StringType, nullable = true)))

  /** Player dimension, grain nflId (DL:17). */
  val players: StructType = StructType(Seq(
    StructField("nflId", LongType, nullable = false),
    StructField("displayName", StringType, nullable = true),
    StructField("officialPosition", StringType, nullable = true)))

  /** nflfastR play-by-play feed (EPA_Comparison.R:3-8). `old_game_id` is
    * STRING in the feed — the numeric-vs-string join at EPA:11 needs an
    * explicit cast on our side (SURVEY.md §1.2 D9 fidelity point). */
  val pbp: StructType = StructType(Seq(
    StructField("play_id", LongType, nullable = false),
    StructField("old_game_id", StringType, nullable = false),
    StructField("posteam", StringType, nullable = true),
    StructField("defteam", StringType, nullable = true),
    StructField("epa", DoubleType, nullable = true),
    StructField("wpa", DoubleType, nullable = true),
    StructField("air_epa", DoubleType, nullable = true),
    StructField("yac_epa", DoubleType, nullable = true),
    StructField("season_type", StringType, nullable = true),
    StructField("pass", IntegerType, nullable = true)))
}
