package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class RangeJoinSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("containment semantics: inclusive bounds, gaps drop, overlaps multiply") {
    import spark.implicits._
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 15.0), (4L, 99.0), (5L, 25.0))
      .toDF("id", "v")
    // "z" is inverted (lo > hi): BETWEEN matches nothing — must not explode
    // a descending bucket range and must not match point 25.0
    val ivals = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0), ("z", 30.0, 20.0))
      .toDF("name", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, ivals, "v", "lo", "hi", bucketWidth = 7.0)
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    out shouldBe Array(
      (1L, "a"),             // plain containment
      (2L, "a"), (2L, "b"),  // boundary 10.0 is inclusive on BOTH intervals
      (3L, "b"))             // 99.0 is in no interval → dropped
  }

  test("bucketed equi-join ≡ naive cross-filter on randomized data") {
    import spark.implicits._
    val rnd = new scala.util.Random(61L)
    val points = (1 to 400).map(i => (i.toLong, rnd.nextDouble() * 100)).toDF("id", "v")
    val ivals = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 90
      (i.toLong, lo, lo + rnd.nextDouble() * 15) // widths 0..15 vs bucketWidth 8
    }.toDF("iid", "lo", "hi")
    val bucketed = RangeJoin.pointInInterval(points, ivals, "v", "lo", "hi", bucketWidth = 8.0)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val naive = points.crossJoin(ivals)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    bucketed shouldBe naive // completeness + no phantom pairs, any float values
  }

  test("interval spanning many buckets still matches every inside point once") {
    import spark.implicits._
    val points = Seq((1L, 0.5), (2L, 500.0), (3L, 999.5)).toDF("id", "v")
    val ivals = Seq((7L, 0.0, 1000.0)).toDF("iid", "lo", "hi") // 1 interval, ~101 buckets
    val out = RangeJoin.pointInInterval(points, ivals, "v", "lo", "hi", bucketWidth = 10.0)
      .select("id").collect().map(_.getLong(0)).sorted
    out shouldBe Array(1L, 2L, 3L) // exactly once each — explode doesn't duplicate matches
  }

  test("inputs carrying a __bucket column are rejected, not silently clobbered") {
    import spark.implicits._
    val points = Seq((1L, 0.5, 9L)).toDF("id", "v", "__bucket")
    val ivals = Seq((7L, 0.0, 1.0)).toDF("iid", "lo", "hi")
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(points, ivals, "v", "lo", "hi", bucketWidth = 1.0)
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(Seq((1L, 0.5)).toDF("id", "v"),
        Seq((7L, 0.0, 1.0, 9L)).toDF("iid", "lo", "hi", "__bucket"),
        "v", "lo", "hi", bucketWidth = 1.0)
  }
}
