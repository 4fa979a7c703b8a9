package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class ProfilerSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def fixture = {
    import spark.implicits._
    Seq(
      (Some(1), Some("b"), Some(2.5)),
      (Some(1), None, Some(-0.5)),
      (Some(3), Some("a"), None),
      (None, Some("a"), Some(2.5))
    ).toDF("i", "s", "d")
  }

  test("nulls, exact distincts, min/max across mixed types") {
    val got = Profiler.profile(fixture).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    got("i") shouldBe ((1L, 2L, "1", "3"))
    got("s") shouldBe ((1L, 2L, "a", "b"))
    got("d") shouldBe ((1L, 2L, "-0.5", "2.5")) // nulls excluded from distinct and bounds
  }

  test("approx mode keeps nulls/bounds exact and distincts near-exact") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 97).toLong).toDF("k")
    val row = Profiler.profile(df, exactHint = Some(false)).collect().head
    row.getLong(1) shouldBe 0L
    row.getLong(2).toDouble shouldBe 97.0 +- 5.0 // HLL++ default rsd 5%
    (row.getString(3), row.getString(4)) shouldBe (("0", "96"))
  }

  test("profile is a single pass: one scan leaf despite 4 stats x N columns") {
    val plan = Profiler.profile(fixture).queryExecution.executedPlan
    plan.collectLeaves() should have size 1 // Expand fans out distincts, no rescans
  }

  test("empty input still yields one row per column with null bounds") {
    val rows = Profiler.profile(fixture.limit(0)).collect()
    rows should have size 3
    rows.foreach { r =>
      (r.getLong(1), r.getLong(2)) shouldBe ((0L, 0L))
      r.getAs[String]("min_str") shouldBe null
    }
  }

  test("column names with dots and backticks resolve") {
    import spark.implicits._
    val df = Seq((1, "x"), (2, "x")).toDF("a.b", "w`ird")
    val got = Profiler.profile(df).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    got("a.b") shouldBe 2L
    got("w`ird") shouldBe 1L
  }

  test("auto-dispatch: small input runs exact, huge size estimate runs approx") {
    // exact ⇒ an Expand node dedups the countDistinct columns; approx ⇒ none
    def hasExpand(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString.contains("Expand")
    hasExpand(Profiler.profile(fixture)) shouldBe true // tiny ⇒ exact
    // inflate the optimizer's size estimate past exactMaxBytes without
    // materializing anything: a join the stats multiply through
    val big = fixture.crossJoin(
      spark.range(1L << 40).toDF("n")) // estimate ≫ 16 GiB, never executed
    big.queryExecution.optimizedPlan.stats.sizeInBytes should be >
      BigInt(Profiler.exactMaxBytes)
    hasExpand(Profiler.profile(big)) shouldBe false // auto-routed to approx
    hasExpand(Profiler.profile(big, exactHint = Some(true))) shouldBe true
  }
}
