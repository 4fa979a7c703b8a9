package graft.nfl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed synthetic tracking-data generator for scale-testing the
  * reference pipeline (the Kaggle CSVs are not shipped; FIXTURES.md §2).
  * Everything derives from `spark.range` + column expressions — generation
  * itself is distributed, deterministic (hash-jittered, no RNG state), and
  * scales to arbitrary play counts without touching the driver.
  *
  * Play geometry mirrors NflFixtures: snap at frame 3, end event at frame
  * 18, QB speed curve with drop start 4 / peak 8 / set point 12; rusher
  * start distance and closing speed jittered per (game, play, rusher) so a
  * hash-determined subset reaches the pressure zone.
  */
object NflSynth {

  private val frames = 20
  /** 1 QB + 4 rushers + 5 blockers tracked per play. */
  private val playersPerPlay = 10

  private def jitter(mod: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(mod)).cast("int")

  /** Roster: 10 QBs (1-10), 40 rushers (11-50), 50 blockers (51-100). */
  def players(spark: SparkSession): DataFrame =
    spark.range(1, 101).toDF("nflId")
      .withColumn("displayName", concat(lit("Player "), col("nflId")))
      .withColumn("officialPosition",
        when(col("nflId") <= 10, "QB")
          .when(col("nflId") <= 50, "DE")
          .otherwise("T"))

  def plays(spark: SparkSession, nGames: Int, playsPerGame: Int): DataFrame =
    spark.range(0, nGames.toLong * playsPerGame).toDF("seq")
      .select(
        (col("seq") / playsPerGame + 1).cast("long").as("gameId"),
        (pmod(col("seq"), lit(playsPerGame)) + 1).cast("long").as("playId"))
      .withColumn("dropBackType",
        when(jitter(10, col("gameId"), col("playId")) < 9, "TRADITIONAL")
          .otherwise("SCRAMBLE"))
      .withColumn("passResult",
        when(jitter(3, col("gameId"), col("playId"), lit(1)) === 0, "I").otherwise("C"))
      .withColumn("playResult", jitter(30, col("gameId"), col("playId"), lit(2)))
      .withColumn("foulNFLId1", lit(null).cast("long"))
      .withColumn("down", (jitter(4, col("gameId"), col("playId"), lit(3)) + 1))
      .withColumn("yardsToGo", (jitter(10, col("gameId"), col("playId"), lit(4)) + 1))
      .withColumn("playDescription", lit("synthetic"))

  /** One row per (play, tracked slot): slot 0 = QB, 1-4 rushers, 5-9
    * blockers; player ids hash-assigned from the roster band. */
  private def slots(spark: SparkSession, nGames: Int, playsPerGame: Int): DataFrame =
    spark.range(0, nGames.toLong * playsPerGame * playersPerPlay).toDF("seq")
      .select(
        (col("seq") / (playsPerGame * playersPerPlay) + 1).cast("long").as("gameId"),
        (pmod(col("seq") / playersPerPlay, lit(playsPerGame)) + 1).cast("long").as("playId"),
        pmod(col("seq"), lit(playersPerPlay)).cast("int").as("slot"))
      .withColumn("nflId",
        when(col("slot") === 0,
          (jitter(10, col("gameId")) + 1).cast("long"))
          .when(col("slot") <= 4,
            (lit(11) + jitter(10, col("gameId"), col("playId")) * 4 + col("slot") - 1)
              .cast("long"))
          .otherwise((lit(51) + jitter(10, col("gameId")) * 5 + col("slot") - 5).cast("long")))

  def pff(spark: SparkSession, nGames: Int, playsPerGame: Int): DataFrame =
    slots(spark, nGames, playsPerGame)
      .withColumn("pff_role",
        when(col("slot") === 0, "Pass").when(col("slot") <= 4, "Pass Rush")
          .otherwise("Pass Block"))
      .withColumn("pff_positionLinedUp",
        when(col("slot") === 0, "QB")
          .when(col("slot") <= 4, element_at(typedLit(Seq("RE", "DRT", "DLT", "LE")), col("slot")))
          .otherwise(element_at(typedLit(Seq("LT", "LG", "C", "RG", "RT")), col("slot") - 4)))
      .withColumn("pff_hit", when(col("slot") <= 4, jitter(2, col("gameId"), col("playId"), col("slot"))).otherwise(lit(null)))
      .withColumn("pff_hurry", lit(null).cast("int"))
      .withColumn("pff_sack", lit(null).cast("int"))
      .withColumn("pff_beatenByDefender", lit(null).cast("int"))
      .withColumn("pff_hitAllowed", lit(null).cast("int"))
      .withColumn("pff_hurryAllowed", lit(null).cast("int"))
      .withColumn("pff_sackAllowed", lit(null).cast("int"))
      // blocker slot 5+i blocks the rusher in slot 1+(i mod 4) of the SAME
      // play — recompute that rusher's nflId with the same hash formula.
      .withColumn("pff_nflIdBlockedPlayer",
        when(col("slot") >= 5,
          (lit(11) + jitter(10, col("gameId"), col("playId")) * 4 +
            pmod(col("slot") - 5, lit(4))).cast("long"))
          .otherwise(lit(null).cast("long")))
      .withColumn("pff_blockType",
        when(col("slot") >= 5,
          when(jitter(5, col("gameId"), col("playId"), lit(9)) === 0, "PA").otherwise("PP"))
          .otherwise(lit(null)))
      .drop("slot")

  def tracking(spark: SparkSession, nGames: Int, playsPerGame: Int): DataFrame = {
    val f = col("frameId")
    // QB speed curve of NflFixtures: 0 until snap, ramp 4-7, decay 8-12,
    // re-accel 13-15, flat 2.0 after.
    val qbSpeed =
      when(f <= 3, 0.0)
        .when(f <= 7, (f - lit(3)) * 0.5)
        .when(f <= 12, lit(2.0) - (f - lit(7)) * 0.2)
        .when(f <= 15, lit(1.0) + (f - lit(12)) * 0.3)
        .otherwise(2.0)
    val delta0 = lit(4.0) + jitter(12, col("gameId"), col("playId"), col("nflId")) * 0.5
    val step = lit(0.25) + jitter(4, col("gameId"), col("playId"), col("nflId"), lit(7)) * 0.25
    slots(spark, nGames, playsPerGame)
      .crossJoin(spark.range(1, frames + 1).toDF("frameId").withColumn("frameId", col("frameId").cast("int")))
      .withColumn("event",
        when(f === 3, "ball_snap").when(f === 18, "pass_forward").otherwise("None"))
      .withColumn("x",
        when(col("slot") === 0, lit(50.0) - greatest(f - lit(3), lit(0)) * 0.25)
          .when(col("slot") <= 4,
            lit(47.75) + delta0 - greatest(f - lit(3), lit(0)) * step)
          .otherwise(47.0))
      .withColumn("y", when(col("slot") === 0 || col("slot") <= 4, 26.5).otherwise(30.0))
      .withColumn("s", when(col("slot") === 0, qbSpeed).otherwise(1.0))
      .withColumn("a", lit(0.1))
      .withColumn("team", when(col("slot") >= 1 && col("slot") <= 4,
        concat(lit("DEF"), pmod(col("gameId"), lit(32))))
        .otherwise(concat(lit("OFF"), pmod(col("gameId"), lit(32)))))
      .withColumn("jerseyNumber", pmod(col("nflId"), lit(99)).cast("int"))
      .withColumn("playDirection", lit("right"))
      .drop("slot")
  }
}
