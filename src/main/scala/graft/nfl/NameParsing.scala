package graft.nfl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Receiver-name parsing (`WIP.R:24-33` — commented-out but demonstrated
  * surface, SURVEY.md §2.1 J13): build a "F.Lastname" reference key for
  * every player and extract the pass-catcher token after " to " from the
  * play description, so the two can be equi-joined.
  *
  * All string work is codegen'd built-ins (`substring`/`locate`/`trim`);
  * row-local, no shuffle.
  */
object NameParsing {

  /** WIP:25-27: `paste(str_sub(name,0,1), str_sub(name, locate(' ')+1), '.')`
    * → first initial + "." + surname ("Aaron Donald" → "A.Donald"). */
  def withRefName(players: DataFrame): DataFrame =
    players.withColumn("RefName",
      concat_ws(".",
        substring(col("displayName"), 1, 1),
        substring(col("displayName"), instr(col("displayName"), " ") + 1, lit(1000))))

  /** WIP:29-31: the token following the first " to " in the play
    * description, trimmed at the next space ("... pass to A.Donald deep
    * left" → "A.Donald"). NULL when the description has no " to ". */
  def withReceiverRef(plays: DataFrame): DataFrame = {
    val afterTo = when(instr(col("playDescription"), " to ") > 0,
      substring_index(
        substring(col("playDescription"),
          instr(col("playDescription"), " to ") + 4, lit(10000)), " ", 1))
    plays.withColumn("ReceiverRef", trim(afterTo))
  }

  /** Join plays to the receiving player via the parsed key (the analysis
    * WIP.R was building toward). Left join: unparseable descriptions keep
    * their play row. */
  def attachReceiver(plays: DataFrame, players: DataFrame): DataFrame =
    withReceiverRef(plays)
      .join(broadcast(withRefName(players)
        .select(col("RefName").as("ReceiverRef"), col("nflId").as("receiverNflId"),
          col("displayName").as("receiverName"))),
        Seq("ReceiverRef"), "left")
}
