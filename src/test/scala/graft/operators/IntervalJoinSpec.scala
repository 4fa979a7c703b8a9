package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class IntervalJoinSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def naive(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    l.join(r.withColumnRenamed("lo", "lo_r").withColumnRenamed("hi", "hi_r"),
        col("lo") <= col("hi_r") && col("lo_r") <= col("hi"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted

  private def bucketed(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame, w: Long) =
    IntervalJoin.overlapJoin(l, r, "lo", "hi", w)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted

  test("≡ naive overlap join on randomized intervals, several bucket widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(13L)
    def mk(n: Int, tag: String) = (1 to n).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, lo, lo + rnd.nextInt(300).toLong)
    }.toDF(s"${tag}id", "lo", "hi")
    val l = mk(300, "l")
    val r = mk(300, "r")
    val expected = naive(l, r)
    expected.length should be > 0
    for (w <- Seq(1L, 7L, 100L, 1000L, 100000L))
      bucketed(l, r, w) shouldBe expected
  }

  test("each overlapping pair appears exactly once (first-common-bucket dedup)") {
    import spark.implicits._
    // long intervals spanning MANY buckets — the worst case for duplicate joins
    val l = Seq((1L, 0L, 999L), (2L, 500L, 1500L)).toDF("lid", "lo", "hi")
    val r = Seq((10L, 100L, 1200L)).toDF("rid", "lo", "hi")
    val out = bucketed(l, r, 10L) // 100+ shared buckets per pair
    out shouldBe Array((1L, 10L), (2L, 10L))
  }

  test("touching endpoints overlap; disjoint intervals don't") {
    import spark.implicits._
    val l = Seq((1L, 0L, 100L)).toDF("lid", "lo", "hi")
    val r = Seq((10L, 100L, 200L), (11L, 101L, 200L)).toDF("rid", "lo", "hi")
    bucketed(l, r, 50L) shouldBe Array((1L, 10L)) // [0,100]∩[100,200] = {100}
  }

  test("plans as a shuffled equi-join — no nested-loop, no cartesian") {
    import spark.implicits._
    val l = (1 to 100).map(i => (i.toLong, i * 10L, i * 10L + 5)).toDF("lid", "lo", "hi")
    val r = (1 to 100).map(i => (i.toLong, i * 10L + 3, i * 10L + 8)).toDF("rid", "lo", "hi")
    val plan = IntervalJoin.overlapJoin(l, r, "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // and no distinct-style re-aggregation of the output
    plan should include("__bucket")
  }

  test("colliding payload columns fail loudly") {
    import spark.implicits._
    val l = Seq((1L, 0L, 1L)).toDF("same", "lo", "hi")
    val r = Seq((2L, 0L, 1L)).toDF("same", "lo", "hi")
    an[IllegalArgumentException] should be thrownBy
      IntervalJoin.overlapJoin(l, r, "lo", "hi", 10L)
  }
}
