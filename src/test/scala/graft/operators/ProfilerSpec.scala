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
    val row = Profiler.profile(df, exact = false).collect().head
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
}
