package graft.nfl

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** WIP.R:24-33 receiver-name parsing goldens. */
class NameParsingSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("RefName = first initial + surname (WIP:25-27)") {
    import spark.implicits._
    val players = Seq((1L, "Aaron Donald"), (2L, "T.J. Watt")).toDF("nflId", "displayName")
    val refs = NameParsing.withRefName(players).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    refs("Aaron Donald") shouldBe "A.Donald"
    refs("T.J. Watt") shouldBe "T.Watt" // splits at the FIRST space, like str_locate
  }

  test("ReceiverRef parses the token after ' to ' (WIP:29-31)") {
    import spark.implicits._
    val plays = Seq(
      (101L, "(12:34) P.Mahomes pass short right to T.Kelce for 11 yards"),
      (102L, "(2:01) J.Hurts sacked at PHI 30 for -8 yards"))
      .toDF("playId", "playDescription")
    val parsed = NameParsing.withReceiverRef(plays).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    parsed(101L) shouldBe Some("T.Kelce")
    parsed(102L) shouldBe None // no " to " → null
  }

  test("attachReceiver joins plays to players on the parsed key") {
    import spark.implicits._
    val players = Seq((87L, "Travis Kelce"), (15L, "Patrick Mahomes"))
      .toDF("nflId", "displayName")
    val plays = Seq((101L, "deep pass to T.Kelce for 25 yards"))
      .toDF("playId", "playDescription")
    val row = NameParsing.attachReceiver(plays, players).collect()(0)
    row.getAs[Long]("receiverNflId") shouldBe 87L
    row.getAs[String]("receiverName") shouldBe "Travis Kelce"
  }
}
