package graft.nfl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation + ranking queries (`Metric Building and Evaluation.R:152-167`,
  * `Final_Scripts/Model Outputs.R:14-34`). All are small-output groupBy/agg
  * pipelines over the play-grain metric table; `median` is Spark's exact
  * median (MO uses R's `median`, which is exact — `percentile_approx` would
  * break oracle fidelity, SURVEY.md §2.1 E5).
  */
object Rankings {

  /** MB:161-167: median %PZ/s + n split by a label column (the reference's
    * six discriminant-validity checks: pff_hurry/hit/sack, passResult,
    * positions). */
  def medianBy(df: DataFrame, flag: String,
      metricCol: String = "Percent_to_Pressure_Zone_per_s"): DataFrame =
    df.groupBy(flag)
      .agg(median(col(metricCol)).as(s"median_$metricCol"), count(lit(1)).as("n"))
      .orderBy(flag)

  /** MO:17-21: per-player rusher rankings on the model residual, ≥50 rushes
    * (the reference threshold; parameterized for small inputs), best (most
    * positive median dPZs) first. */
  def rusherRankings(rushersScored: DataFrame, minAttempts: Long = 50L): DataFrame =
    rushersScored
      .groupBy("displayName", "team")
      .agg(sum("dPZs").as("sum_dPZs"), count(lit(1)).as("rush_attempts"),
        median(col("dPZs")).as("median_dPZs"))
      .filter(col("rush_attempts") >= minAttempts)
      .withColumn("sum_dPZs", round(col("sum_dPZs"), 3))
      .withColumn("median_dPZs", round(col("median_dPZs"), 3))
      .orderBy(desc("median_dPZs"), col("displayName"))

  /** MO:23-24: team-level rusher rankings. */
  def teamRushRankings(rushersScored: DataFrame): DataFrame =
    rushersScored
      .groupBy("team")
      .agg(sum("dPZs").as("sum_dPZs"), count(lit(1)).as("rush_attempts"),
        median(col("dPZs")).as("median_dPZs"))
      .orderBy(desc("sum_dPZs"), col("team"))

  /** MO:27-30: per-blocker rankings, >50 snaps (reference threshold,
    * parameterized), worst (lowest median) first. */
  def blockerRankings(blockersScored: DataFrame, minSnapsExclusive: Long = 50L): DataFrame =
    blockersScored
      .groupBy("displayName", "team", "pff_positionLinedUp")
      .agg(sum("dPZs").as("sum_dPZs"), count(lit(1)).as("snaps"),
        median(col("dPZs")).as("median_dPZs"))
      .filter(col("snaps") > minSnapsExclusive)
      .withColumn("sum_dPZs", round(col("sum_dPZs"), 3))
      .withColumn("median_dPZs", round(col("median_dPZs"), 3))
      .orderBy(col("median_dPZs"), col("displayName"))

  /** MO:33-34: team-level blocker rankings, worst first. */
  def teamBlockerRankings(blockersScored: DataFrame): DataFrame =
    blockersScored
      .groupBy("team")
      .agg(sum("dPZs").as("sum_dPZs"), count(lit(1)).as("snaps"),
        median(col("dPZs")).as("median_dPZs"))
      .orderBy(col("sum_dPZs"), col("team"))

  /** MB:153-156: histogram plot-input table — fixed-width binning of a
    * metric column; the client draws, the engine aggregates (K13). */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double): DataFrame =
    df.groupBy(floor(col(valueCol) / binWidth).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_start", col("bucket") * binWidth)
      .orderBy("bucket")

  /** MO:37-38: the animated-plot feed — one play's rusher frames, first 157
    * rows in frame order (the reference's `[1:157,]` slice made
    * deterministic with an explicit sort, SURVEY.md §2.1 C9). Since the r18
    * width prune the team/jersey labels re-attach by natural key from
    * [[graft.nfl.PressureZone.rusherLabels]] (the play filter lands on both
    * sides before the join, so this stays a two-tiny-frames join). */
  def samplePlay(rusherFrames: DataFrame, labels: DataFrame,
      gameId: Long, playId: Long, team: String): DataFrame =
    rusherFrames
      .filter(col("gameId") === gameId && col("playId") === playId)
      .join(labels.filter(col("gameId") === gameId && col("playId") === playId)
          // frame-grain dedup keeps the slice at ONE row per frame even if
          // a tracking row arrived duplicated (r18 self-review; the slice
          // is one play — the exchange is trivial)
          .dropDuplicates("playId", "gameId", "nflId", "frameId"),
        Seq("playId", "gameId", "nflId", "frameId"))
      .filter(col("team") === team)
      .orderBy("nflId", "frameId")
      .limit(157)
}
