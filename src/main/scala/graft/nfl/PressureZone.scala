package graft.nfl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational.naturalJoin

/** The %-to-Pressure-Zone metric (`Metric Building and Evaluation.R:61-108`):
  * for every pass rusher on every play, how far toward the QB's set point
  * (within `yardsToSetPoint` Chebyshev yards) did they get, per second.
  *
  * Scale: rusher frames are a pre-filtered slice of tracking (role +
  * 16-position IN-list pushed to the scan). Per-play tables (set point,
  * bounds) are broadcast. The only fact shuffles are the per-rusher-play
  * groupBys, all on the same (playId, gameId, nflId) key — AQE coalesces
  * them into one exchange reuse.
  */
object PressureZone {

  /** The 16 pass-rusher alignment slots (MB:63-64). */
  val rusherPositions: Seq[String] = Seq(
    "DRT", "DLT", "LE", "LILB", "LEO", "REO", "ROLB", "MLB",
    "RE", "LOLB", "RILB", "RLB", "NLT", "NT", "LLB", "NRT")

  /** Chebyshev radius of the pressure zone in yards (MB:62). */
  val yardsToSetPoint = 2.0

  /** MB:63-64's role/position slice of the fact (shared by the frame table
    * and the label projection — one predicate, pushed to the scan). */
  private def rusherSlice(mainDf: DataFrame): DataFrame =
    mainDf.filter(col("pff_role") === "Pass Rush" &&
      col("pff_positionLinedUp").isin(rusherPositions: _*))

  /** The rusher-play-CONSTANT half of MB:63-66's 19-column projection,
    * still at frame grain and keyed (playId, gameId, nflId, frameId) so
    * [[metric]]'s MB:106-108 attach reads the label values from the exact
    * snap ROW the pre-r18 carried columns came from (no first()/distinct
    * guesswork if odd data ever had a mid-play label change). */
  def rusherLabels(mainDf: DataFrame): DataFrame =
    rusherSlice(mainDf).select("playId", "gameId", "nflId", "frameId",
      "jerseyNumber", "team", "playDirection", "pff_positionLinedUp",
      "pff_hit", "pff_hurry", "pff_sack", "passResult", "dropBackType", "playResult")

  /** MB:63-91: frame-grain rusher table with Chebyshev distance to the set
    * point, frame triggers, and pressure-start status. Shared by the metric
    * (`metric`) and by the sample-play plot feed (MO:37-43).
    *
    * r18 width prune (r17 verdict item 4): of MB:63-66's 19 columns only
    * this frame-grain set (keys, coords, speed/accel for the plot feed,
    * event) rides the per-frame math — the 10 rusher-play-constant labels
    * used to ride EVERY frame through the pressure-start join's shuffle
    * and the persisted frame table (~40% of the row bytes at 1000×, where
    * the NFL rung was disk-bound). They re-attach at MB:106-108
    * ([[metric]]) and at the plot feed ([[graft.nfl.Rankings.samplePlay]])
    * from [[rusherLabels]] by natural key. */
  def rusherFrames(mainDf: DataFrame, setPoints: DataFrame,
      playStart: DataFrame, playEnd: DataFrame): DataFrame = {

    val rushers = rusherSlice(mainDf)
      .select("nflId", "playId", "gameId", "frameId", "x", "y", "s", "a", "event")

    // MB:68-75: attach set point (natural join on playId, gameId — the
    // QB's nflId is carried as nflId_QB so it can't collide) and clamp
    // frames to [snap, play end].
    val clamped = rushers
      .transform(naturalJoin(_,
        setPoints.select("nflId_QB", "playId", "gameId", "x_set_point", "y_set_point")))
      .join(playEnd, Seq("playId", "gameId"))
      .join(playStart, Seq("playId", "gameId"))
      .filter(col("frameId") <= col("play_end_frameId") &&
        col("frameId") >= col("play_start_frameId"))

    // MB:77 Chebyshev distance; MB:81-82 nested frame trigger.
    val triggered = clamped
      .withColumn("Set_Point_Max_Delta",
        greatest(abs(col("x") - col("x_set_point")), abs(col("y") - col("y_set_point"))))
      .withColumn("frame_trigger",
        when(col("frameId") === col("play_start_frameId"), "snap")
          .when(col("frameId") === col("play_end_frameId"), "playEnd")
          .when(col("Set_Point_Max_Delta") <= yardsToSetPoint, "pressure")
          .otherwise(""))

    // MB:85-91: first pressure frame per rusher-play, left-joined back;
    // snap/playEnd triggers override.
    val pressureStart = triggered
      .filter(col("frame_trigger") === "pressure")
      .groupBy("playId", "gameId", "nflId")
      .agg(min("frameId").as("frameId"))
      .withColumn("Frame_Status", lit("Pressure_Start"))

    triggered
      .join(pressureStart, Seq("playId", "gameId", "nflId", "frameId"), "left")
      .withColumn("Frame_Status",
        when(col("frame_trigger") === "playEnd", "playEnd")
          .when(col("frame_trigger") === "snap", "snap")
          .otherwise(col("Frame_Status")))
  }

  /** MB:93-108: per-rusher-play metric — pivot the status-frame distances
    * wide (absent → 0, exactly `reshape::cast`'s `sum(∅)=0`), derive
    * Seconds / Distance / %PZ (capped at 1) / %PZ/s, and re-attach the
    * snap-frame labels (from [[rusherLabels]] since the r18 width prune —
    * same snap rows, keyed attach). Output grain: (playId, gameId, nflId). */
  def metric(rusherFrames: DataFrame, labels: DataFrame): DataFrame = {
    val summary = rusherFrames.filter(col("Frame_Status").isNotNull)

    // MB:94-96 melt→cast. groupBy().pivot() with explicit values: one
    // partial-agg shuffle, no value-discovery job.
    val wide = summary
      .select(col("playId"), col("gameId"), col("nflId"),
        col("Set_Point_Max_Delta").as("value"), col("Frame_Status").as("variable"))
      .groupBy("playId", "gameId", "nflId")
      .pivot("variable", Seq("snap", "playEnd", "Pressure_Start"))
      .sum("value")
      .na.fill(0.0, Seq("snap", "playEnd", "Pressure_Start"))

    // MB:97-98: first non-snap status frame bounds the rush duration.
    val deltaEnd = summary
      .filter(col("Frame_Status") =!= "snap")
      .groupBy("playId", "gameId", "nflId", "play_start_frameId")
      .agg(min("frameId").as("Delta_End"))

    // MB:99-104: the metric. Distance is measured from the snap distance to
    // the pressure-entry distance (if ever in the zone) else the play-end
    // distance; %PZ normalizes by (snap − zone radius) and caps at 1; the
    // 10 Hz clock converts frames to seconds.
    val scored = wide
      .transform(naturalJoin(_, deltaEnd))
      .withColumn("Seconds", (col("Delta_End") - col("play_start_frameId")) * 0.1)
      .withColumn("Distance",
        when(col("Pressure_Start") > 0, col("snap") - col("Pressure_Start"))
          .otherwise(col("snap") - col("playEnd")))
      .withColumn("Percent_to_Pressure_Zone",
        when(col("Pressure_Start") > 0, lit(1.0))
          .otherwise(col("Distance") / (col("snap") - yardsToSetPoint)))
      .withColumn("Percent_to_Pressure_Zone",
        when(col("Percent_to_Pressure_Zone") > 1, 1.0)
          .otherwise(col("Percent_to_Pressure_Zone")))
      .withColumn("Percent_to_Pressure_Zone_per_s",
        col("Percent_to_Pressure_Zone") / col("Seconds"))

    // MB:106-108: snap-frame labels (position, jersey, team, PFF outcome
    // flags, play context) re-attached by natural key. The label VALUES
    // come from the summary's own snap rows — summary supplies the
    // (keys, frameId) row set, the label projection supplies the columns
    // the frame table no longer carries. The snap row is picked
    // DETERMINISTICALLY as min(frameId) per rusher-play (r18 advice: a
    // play carrying two distinct ball_snap frames — the duplicated-snap
    // case QbSetPoint documents — would otherwise hand dropDuplicates an
    // arbitrary row if label values ever differed across those frames);
    // the trailing dropDuplicates only ENFORCES the (playId, gameId,
    // nflId) output grain against a tracking row duplicated at the SAME
    // (keys, frameId), where the collapsed values are identical.
    scored.transform(naturalJoin(_,
      summary.filter(col("event") === "ball_snap")
        .groupBy("playId", "gameId", "nflId")
        .agg(min("frameId").as("frameId"))
        .join(labels, Seq("playId", "gameId", "nflId", "frameId"))
        .select("playId", "gameId", "nflId", "pff_positionLinedUp", "jerseyNumber",
          "team", "pff_hurry", "pff_sack", "pff_hit", "passResult", "playResult")
        .dropDuplicates("playId", "gameId", "nflId")))
  }
}
