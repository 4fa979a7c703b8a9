package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class SnapshotDiffSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def statusOf(rows: Array[org.apache.spark.sql.Row]): Map[Long, String] =
    rows.map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap

  test("added / removed / changed / same are all classified") {
    import spark.implicits._
    val old = Seq((1L, "a", 1), (2L, "b", 2), (3L, "c", 3)).toDF("id", "v", "n")
    val nw  = Seq((2L, "b", 2), (3L, "c-edit", 3), (4L, "d", 4)).toDF("id", "v", "n")
    val out = SnapshotDiff.diff(old, nw, "id", Seq("v", "n")).collect()
    statusOf(out) shouldBe Map(
      1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added")
  }

  test("null-safe comparison: null==null is same, null-vs-value is changed") {
    import spark.implicits._
    val old = Seq((1L, Option.empty[String]), (2L, Option("x")), (3L, Option.empty[String]))
      .toDF("id", "v")
    val nw = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Option("y")))
      .toDF("id", "v")
    val out = SnapshotDiff.diff(old, nw, "id", Seq("v")).collect()
    statusOf(out) shouldBe Map(1L -> "same", 2L -> "changed", 3L -> "changed")
  }

  test("row accounting: every key of either side appears exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val old = (1 to 200).filter(_ => rnd.nextBoolean())
      .map(i => (i.toLong, rnd.nextInt(3))).toDF("id", "v")
    val nw = (1 to 200).filter(_ => rnd.nextBoolean())
      .map(i => (i.toLong, rnd.nextInt(3))).toDF("id", "v")
    val out = SnapshotDiff.diff(old, nw, "id", Seq("v"))
    val keys = out.select("id").collect().map(_.getLong(0))
    keys.length shouldBe keys.distinct.length
    val expected = (old.select("id").collect().map(_.getLong(0)) ++
      nw.select("id").collect().map(_.getLong(0))).distinct.sorted
    keys.sorted shouldBe expected
    // status partition is consistent with side membership
    val oldKeys = old.select("id").collect().map(_.getLong(0)).toSet
    val nwKeys = nw.select("id").collect().map(_.getLong(0)).toSet
    out.collect().foreach { r =>
      val (k, st) = (r.getLong(0), r.getString(r.length - 1))
      st match {
        case "added"   => assert(!oldKeys(k) && nwKeys(k))
        case "removed" => assert(oldKeys(k) && !nwKeys(k))
        case _         => assert(oldKeys(k) && nwKeys(k))
      }
    }
  }

  test("empty sides degrade to all-added / all-removed") {
    import spark.implicits._
    val some = Seq((1L, "a")).toDF("id", "v")
    val none = Seq.empty[(Long, String)].toDF("id", "v")
    statusOf(SnapshotDiff.diff(none, some, "id", Seq("v")).collect()) shouldBe
      Map(1L -> "added")
    statusOf(SnapshotDiff.diff(some, none, "id", Seq("v")).collect()) shouldBe
      Map(1L -> "removed")
    require(SnapshotDiff.diff(none, none, "id", Seq("v")).count() == 0L)
  }

  test("no compare columns is rejected loudly") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "v")
    an[IllegalArgumentException] should be thrownBy
      SnapshotDiff.diff(df, df, "id", Seq.empty)
  }
}
