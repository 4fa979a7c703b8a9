package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class MergeIntoSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def snap(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"v$i", i * 10)).toDF("id", "text", "score")
  }

  test("upsert + delete + insert against a snapshot") {
    import spark.implicits._
    val changes = Seq(
      (2L, "v2-new", 99, "U", 1),  // update existing
      (3L, "v3", 30, "D", 1),      // delete existing
      (10L, "v10", 100, "I", 1)    // insert new key
    ).toDF("id", "text", "score", "op", "seq")
    val out = MergeInto.applyChangeset(snap(5), changes, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    out shouldBe Array(
      (1L, "v1", 10), (2L, "v2-new", 99), (4L, "v4", 40), (5L, "v5", 50),
      (10L, "v10", 100))
  }

  test("last-writer-wins: the highest seq per key decides") {
    import spark.implicits._
    val changes = Seq(
      (2L, "first", 1, "U", 1),
      (2L, "second", 2, "U", 5),   // wins
      (2L, "middle", 3, "U", 3),
      (4L, "doomed", 4, "U", 1),
      (4L, "doomed", 4, "D", 2)    // delete after update: key 4 gone
    ).toDF("id", "text", "score", "op", "seq")
    val out = MergeInto.applyChangeset(snap(5), changes, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    out shouldBe Array((1L, "v1"), (2L, "second"), (3L, "v3"), (5L, "v5"))
  }

  test("graceful degenerate ops: delete of absent key no-ops, update of absent key inserts") {
    import spark.implicits._
    val changes = Seq(
      (100L, "ghost", 0, "D", 1),   // absent delete: nothing happens
      (200L, "adopt", 7, "U", 1)    // absent update: upsert semantics insert it
    ).toDF("id", "text", "score", "op", "seq")
    val out = MergeInto.applyChangeset(snap(3), changes, Seq("id"))
      .orderBy("id").collect().map(_.getLong(0))
    out shouldBe Array(1L, 2L, 3L, 200L)
  }

  test("row accounting on a randomized changeset") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val n = 500
    val base = snap(n)
    // ~120 random ops over keys 1..600 (some absent), unique seq per (key, i)
    val ops = (1 to 120).map { i =>
      val k = rnd.nextInt(600) + 1L
      val op = if (rnd.nextBoolean()) "U" else "D"
      (k, s"c$i", i, op, i)
    }
    val changes = ops.toDF("id", "text", "score", "op", "seq")
    val out = MergeInto.applyChangeset(base, changes, Seq("id"))
    // expected: survivors + latest non-deletes
    val latest = ops.groupBy(_._1).map { case (_, g) => g.maxBy(_._5) }.toSeq
    val touched = latest.map(_._1).toSet
    val expected = (1 to n).count(k => !touched.contains(k.toLong)) +
      latest.count(_._4 != "D")
    out.count() shouldBe expected
    // keys deleted latest are gone; keys updated latest carry the new text
    val byId = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    latest.foreach { case (k, text, _, op, _) =>
      if (op == "D") byId.contains(k) shouldBe false
      else byId(k) shouldBe text
    }
  }

  test("snapshot side neither shuffles nor sorts (broadcast anti join)") {
    import spark.implicits._
    val changes = Seq((2L, "x", 0, "U", 1)).toDF("id", "text", "score", "op", "seq")
    val plan = MergeInto.applyChangeset(snap(50), changes, Seq("id"))
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should include("LeftAnti")
  }

  test("changeset missing a snapshot column fails loudly") {
    import spark.implicits._
    val changes = Seq((2L, "x", "U", 1)).toDF("id", "text", "op", "seq")
    an[IllegalArgumentException] should be thrownBy
      MergeInto.applyChangeset(snap(3), changes, Seq("id"))
  }
}
