package graft.nfl

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets

/** Deterministic synthetic NFL-tracking fixtures (FIXTURES.md §2). The real
  * Kaggle CSVs aren't shipped with the reference, so golden end-to-end tests
  * run on these hand-designed plays where every pipeline intermediate is
  * computable by hand.
  *
  * Layout (all in game 1001 = week1 file, game 1002 = week2 file):
  *   - play 101: TRADITIONAL completion. QB speed ramps 0.5→2.0 over frames
  *     4-7, decays 0.2/frame over 8-12, re-accelerates at 13 → drop start 4,
  *     peak-velocity frame 8, set point frame 12 at (47.75, 26.5).
  *     Rusher 20 starts 10 Chebyshev yd out closing 0.75 yd/frame →
  *     enters the 2 yd zone at frame 14 (delta 1.75). Rusher 21 starts
  *     8 yd out closing 0.25 yd/frame → never enters (play-end delta 4.25).
  *     Blockers: LT 30 blocks 20; RG 31 and TE 32 both block 21.
  *   - play 102: identical geometry; ends in qb_sack; LT's block type is
  *     'PA' → is_play_action = 1.
  *   - play 103: SCRAMBLE with a play_action event → anti-join excluded.
  *   - play 104: DESIGNED_RUN → dropBackType filter.
  *   - play 105: foulNFLId1 set → penalty filter.
  *   - play 106: dropBackType literal string "NA" → filter.
  *   - play 107: dropBackType truly NULL (empty CSV field) → dropped under
  *     SQL 3VL; base-R keeps it only as an unjoinable all-NA row, so the
  *     net result matches (SURVEY.md §1.4 delta note).
  *   - play 2699: dropped by the as-written outlier filter (any game).
  *   - play 201 (game 1002): TRADITIONAL completion, rusher 20 on the slow
  *     curve (no pressure); rusher 22 blocked ONLY by TE 32 → OL gate drops
  *     it from the final table but it stays in the metric table.
  *
  * Events sit at frame 3 (ball_snap) and frame 18 (end event) on every
  * player's row; non-event frames carry the literal "None" like the Kaggle
  * files. All coordinates are multiples of 0.25 → exact in binary floating
  * point, so goldens compare exactly (modulo the documented *0.1 clock).
  */
object NflFixtures {

  private val qbSpeed: Map[Int, Double] = Map(
    1 -> 0.0, 2 -> 0.0, 3 -> 0.0, 4 -> 0.5, 5 -> 1.0, 6 -> 1.5, 7 -> 2.0,
    8 -> 1.8, 9 -> 1.6, 10 -> 1.4, 11 -> 1.2, 12 -> 1.0, 13 -> 1.3,
    14 -> 1.6, 15 -> 1.9, 16 -> 2.0, 17 -> 2.0, 18 -> 2.0, 19 -> 2.0, 20 -> 2.0)

  private def event(f: Int, endEvent: String): String =
    if (f == 3) "ball_snap" else if (f == 18) endEvent else "None"

  private def qbRows(gameId: Long, playId: Long, team: String, endEvent: String): Seq[String] =
    (1 to 20).map { f =>
      val x = if (f < 3) 50.0 else 50.0 - 0.25 * (f - 3)
      s"$gameId,$playId,10,$f,$x,26.5,${qbSpeed(f)},0.1,${event(f, endEvent)},$team,7,right"
    }

  private def rusherRows(gameId: Long, playId: Long, nflId: Long, jersey: Int,
      team: String, delta0: Double, step: Double, endEvent: String): Seq[String] =
    (1 to 20).map { f =>
      val x = if (f < 3) 47.75 + delta0 else 47.75 + delta0 - step * (f - 3)
      s"$gameId,$playId,$nflId,$f,$x,26.5,1.0,0.1,${event(f, endEvent)},$team,$jersey,right"
    }

  private def blockerRows(gameId: Long, playId: Long, nflId: Long, jersey: Int,
      team: String, endEvent: String): Seq[String] =
    (1 to 20).map { f =>
      s"$gameId,$playId,$nflId,$f,47.0,30.0,0.0,0.0,${event(f, endEvent)},$team,$jersey,right"
    }

  /** Minimal QB-only rows for plays that the cleaning stage must drop. */
  private def stubPlayRows(gameId: Long, playId: Long, team: String): Seq[String] =
    (1 to 3).map { f =>
      s"$gameId,$playId,10,$f,50.0,26.5,0.0,0.0,${event(f, "None")},$team,7,right"
    }

  private val trackingHeader =
    "gameId,playId,nflId,frameId,x,y,s,a,event,team,jerseyNumber,playDirection"

  def trackingWeek1: String = (trackingHeader +: (
    qbRows(1001, 101, "OFF1", "pass_forward") ++
    rusherRows(1001, 101, 20, 91, "DEF1", 10.0, 0.75, "pass_forward") ++
    rusherRows(1001, 101, 21, 95, "DEF1", 8.0, 0.25, "pass_forward") ++
    blockerRows(1001, 101, 30, 71, "OFF1", "pass_forward") ++
    blockerRows(1001, 101, 31, 66, "OFF1", "pass_forward") ++
    blockerRows(1001, 101, 32, 87, "OFF1", "pass_forward") ++
    qbRows(1001, 102, "OFF1", "qb_sack") ++
    rusherRows(1001, 102, 20, 91, "DEF1", 10.0, 0.75, "qb_sack") ++
    rusherRows(1001, 102, 21, 95, "DEF1", 8.0, 0.25, "qb_sack") ++
    blockerRows(1001, 102, 30, 71, "OFF1", "qb_sack") ++
    blockerRows(1001, 102, 31, 66, "OFF1", "qb_sack") ++
    blockerRows(1001, 102, 32, 87, "OFF1", "qb_sack") ++
    // play 103: scramble + play_action event → excluded by the anti join.
    (1 to 8).map { f =>
      val ev = if (f == 3) "ball_snap" else if (f == 5) "play_action" else "None"
      s"1001,103,10,$f,50.0,26.5,0.5,0.1,$ev,OFF1,7,right"
    } ++
    (1 to 8).map { f =>
      val ev = if (f == 3) "ball_snap" else if (f == 5) "play_action" else "None"
      s"1001,103,20,$f,55.0,26.5,1.0,0.1,$ev,DEF1,91,right"
    } ++
    stubPlayRows(1001, 104, "OFF1") ++
    stubPlayRows(1001, 105, "OFF1") ++
    stubPlayRows(1001, 106, "OFF1") ++
    stubPlayRows(1001, 107, "OFF1") ++
    stubPlayRows(1001, 2699, "OFF1"))).mkString("\n") + "\n"

  def trackingWeek2: String = (trackingHeader +: (
    qbRows(1002, 201, "OFF2", "pass_forward") ++
    rusherRows(1002, 201, 20, 91, "DEF2", 8.0, 0.25, "pass_forward") ++
    rusherRows(1002, 201, 22, 99, "DEF2", 8.0, 0.25, "pass_forward") ++
    blockerRows(1002, 201, 30, 71, "OFF2", "pass_forward") ++
    blockerRows(1002, 201, 32, 87, "OFF2", "pass_forward"))).mkString("\n") + "\n"

  def playsCsv: String =
    """gameId,playId,dropBackType,passResult,playResult,foulNFLId1,down,yardsToGo,playDescription
      |1001,101,TRADITIONAL,C,12,,1,10,fixture play 101
      |1001,102,TRADITIONAL,S,-7,,2,8,fixture play 102
      |1001,103,SCRAMBLE,C,5,,3,4,fixture play 103
      |1001,104,DESIGNED_RUN,C,3,,1,10,fixture play 104
      |1001,105,TRADITIONAL,C,9,999,1,10,fixture play 105
      |1001,106,NA,C,2,,2,5,fixture play 106
      |1001,107,,C,6,,1,10,fixture play 107 null dropback
      |1001,2699,TRADITIONAL,C,4,,1,10,fixture outlier
      |1002,201,TRADITIONAL,C,5,,1,10,fixture play 201
      |""".stripMargin

  def pffCsv: String = {
    val h = "gameId,playId,nflId,pff_role,pff_positionLinedUp,pff_hit,pff_hurry,pff_sack," +
      "pff_beatenByDefender,pff_hitAllowed,pff_hurryAllowed,pff_sackAllowed," +
      "pff_nflIdBlockedPlayer,pff_blockType"
    def qb(g: Long, p: Long) = s"$g,$p,10,Pass,QB,,,,,,,,,"
    def rush(g: Long, p: Long, id: Long, pos: String, hit: Int, hurry: Int, sack: Int) =
      s"$g,$p,$id,Pass Rush,$pos,$hit,$hurry,$sack,,,,,,"
    def block(g: Long, p: Long, id: Long, pos: String, blocked: Long, bt: String) =
      s"$g,$p,$id,Pass Block,$pos,,,,0,0,0,0,$blocked,$bt"
    (Seq(h,
      qb(1001, 101),
      rush(1001, 101, 20, "RE", 0, 1, 0),
      rush(1001, 101, 21, "DLT", 0, 0, 0),
      block(1001, 101, 30, "LT", 20, "PP"),
      block(1001, 101, 31, "RG", 21, "PP"),
      block(1001, 101, 32, "TE", 21, "PP"),
      qb(1001, 102),
      rush(1001, 102, 20, "RE", 0, 0, 1),
      rush(1001, 102, 21, "DLT", 0, 0, 0),
      block(1001, 102, 30, "LT", 20, "PA"), // play action
      block(1001, 102, 31, "RG", 21, "PP"),
      block(1001, 102, 32, "TE", 21, "PP"),
      qb(1001, 103),
      rush(1001, 103, 20, "RE", 0, 0, 0),
      qb(1001, 104), qb(1001, 105), qb(1001, 106), qb(1001, 107), qb(1001, 2699),
      qb(1002, 201),
      rush(1002, 201, 20, "RE", 0, 0, 0),
      rush(1002, 201, 22, "DRT", 0, 0, 0),
      block(1002, 201, 30, "LT", 20, "PP"),
      block(1002, 201, 32, "TE", 22, "PP"))).mkString("\n") + "\n"
  }

  def playersCsv: String =
    """nflId,displayName,officialPosition
      |10,Quin Back,QB
      |20,Rush One,DE
      |21,Rush Two,DT
      |22,Rush Three,DE
      |30,Block Left,T
      |31,Block Right,G
      |32,Tight End,TE
      |""".stripMargin

  /** Write all fixture CSVs into `dir`; returns the dir. */
  def writeTo(dir: Path): Path = {
    Files.createDirectories(dir)
    def put(name: String, content: String): Unit =
      Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    put("tracking_week1.csv", trackingWeek1)
    put("tracking_week2.csv", trackingWeek2)
    put("plays.csv", playsCsv)
    put("pffScoutingData.csv", pffCsv)
    put("players.csv", playersCsv)
    dir
  }
}
