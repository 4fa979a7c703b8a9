package graft.nfl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest + clean stage (`Final_Scripts/Data Load and Cleaning.R`, whole
  * file) re-expressed as lazy DataFrame transforms.
  *
  * Scale notes: the tracking fact is the only big table (frame grain —
  * billions of rows at 100 TB). It is scanned once with an explicit schema
  * (no inference pass), joined to the three dimension tables with the dims
  * broadcast, and every filter is a Catalyst predicate that pushes to the
  * scan. The 8-file weekly union is a glob path, not 8 separate jobs
  * (DL:20-22's `list.files %>% lapply %>% bind_rows`).
  */
object NflIngest {

  def readTracking(spark: SparkSession, glob: String): DataFrame =
    spark.read.option("header", "true").schema(NflSchemas.tracking).csv(glob)

  def readPff(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(NflSchemas.pff).csv(path)

  def readPlays(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(NflSchemas.plays).csv(path)

  def readPlayers(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(NflSchemas.players).csv(path)

  /** The external nflfastR play-by-play feed (EPA:3) is distributed as
    * parquet — A3's curated-feed scan. */
  def readPbp(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(NflSchemas.pbp).parquet(path)

  /** The dropback types removed at DL:31-35. The `'NA'` entry is the literal
    * string — real NULLs are also dropped here (SQL 3VL; the reference's
    * base-R `!=` chain drops NA rows too, as each comparison yields NA which
    * base-R subsetting keeps only as all-NA junk rows that no later join can
    * match — net behavior identical, SURVEY.md §1.4). */
  private val droppedDropbacks =
    Seq("DESIGNED_RUN", "DESIGNED_ROLLOUT_RIGHT", "DESIGNED_ROLLOUT_LEFT", "NA", "UNKNOWN")

  /** DL:25-54: star join + play-type cleanup → `main_df` at tracking grain.
    *
    * Join order/strategy: tracking is the fact; pff is fact-grain per
    * (game,play,player) — a real shuffle join on the composite key; plays
    * and players are dimensions → broadcast (no shuffle of the fact). At
    * cluster scale the tracking⋈pff join is the one exchange, keyed on
    * (playId, nflId, gameId); everything downstream that groups by
    * (gameId, playId[, nflId]) reuses that clustering.
    */
  def buildMainDf(
      tracking: DataFrame,
      pff: DataFrame,
      plays: DataFrame,
      players: DataFrame): DataFrame = {

    val joined = tracking
      .join(pff, Seq("playId", "nflId", "gameId"))               // DL:25
      .join(broadcast(plays), Seq("playId", "gameId"))           // DL:26
      .join(broadcast(players), Seq("nflId"))                    // DL:27

    // DL:31-35 play-type filters.
    val typed = joined.filter(!col("dropBackType").isin(droppedDropbacks: _*))

    // DL:40-47: remove QB runs and play-action scrambles (anti join on the
    // play key). The exclusion set is tiny relative to the fact → Catalyst
    // picks a broadcast anti join; no fact shuffle.
    val excludePlays = typed
      .filter(col("pff_positionLinedUp") === "QB" &&
        (col("event") === "run" ||
          (col("event") === "play_action" &&
            col("dropBackType").isin("SCRAMBLE", "SCRAMBLE_ROLLOUT_RIGHT", "SCRAMBLE_ROLLOUT_LEFT"))))
      .select("playId", "gameId")
      .distinct()
    val noRuns = typed.join(excludePlays, Seq("playId", "gameId"), "left_anti")

    // DL:50 penalties; DL:53-54 outlier removal — replicated AS WRITTEN: the
    // reference's `playId != 2699 & gameId != 2021091204` drops play 2699 in
    // EVERY game and every play of that game (broader than the comment
    // intends, SURVEY.md §2.1 C10); same for the second pair.
    noRuns
      .filter(col("foulNFLId1").isNull)
      .filter(col("playId") =!= 2699L && col("gameId") =!= 2021091204L)
      .filter(col("playId") =!= 1191L && col("gameId") =!= 2021102400L)
    // DL:37's global sort is semantically inert before joins/aggs (SQL has
    // no row order); the one real order dependency (the lag at MB:47-50) is
    // expressed as a window ORDER BY in QbSetPoint.
  }
}
