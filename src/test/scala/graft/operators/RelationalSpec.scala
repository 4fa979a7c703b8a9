package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase
import graft.operators.Relational._

/** Unit + property tests for the relational vocabulary (SURVEY.md §5 items
  * 1 and 4). Properties run through raw scalacheck (the scalatest bridge
  * isn't in the offline cache) with a reduced case count — each case is a
  * full Spark job. */
class RelationalSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def check(prop: Prop, cases: Int = 10): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    withClue(result.status.toString) { result.passed shouldBe true }
  }

  private def left = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (3L, "c2", 31.0))
      .toDF("k", "name", "v")
  }

  private def right = {
    import spark.implicits._
    Seq((1L, 100), (3L, 300), (3L, 301), (4L, 400)).toDF("k", "r")
  }

  test("naturalJoin joins on the column-name intersection (D2)") {
    val j = naturalJoin(left, right)
    j.columns.count(_ == "k") shouldBe 1
    // k=3 on both sides: 2 left rows × 2 right rows = 4, plus k=1 → 5 rows.
    j.count() shouldBe 5
  }

  test("naturalJoin refuses disjoint schemas") {
    import spark.implicits._
    val other = Seq((1, 2)).toDF("x", "y")
    an[IllegalArgumentException] should be thrownBy naturalJoin(left, other)
  }

  test("semiJoin keeps matching keys without duplication (D7)") {
    val s = semiJoin(left, right, Seq("k"))
    // right has k=3 twice but semi join must not duplicate the two k=3 rows
    s.collect().map(_.getLong(0)).sorted shouldBe Seq(1L, 3L, 3L)
    s.columns.toSeq shouldBe left.columns.toSeq
  }

  test("antiJoin keeps non-matching keys (D6)") {
    antiJoin(left, right, Seq("k")).collect().map(_.getLong(0)) shouldBe Seq(2L)
  }

  test("property: semi ⊎ anti partitions the left input (D6/D7)") {
    import spark.implicits._
    val keys = Gen.listOfN(30, Gen.chooseNum(0L, 9L))
    check(Prop.forAll(keys, keys) { (ls: List[Long], rs: List[Long]) =>
      val l = ls.zipWithIndex.toDF("k", "idx")
      val r = rs.toDF("k")
      val semi = semiJoin(l, r, Seq("k"))
      val anti = antiJoin(l, r, Seq("k"))
      semi.count() + anti.count() == l.count() &&
        semi.join(anti, Seq("idx"), "inner").count() == 0L
    })
  }

  test("property: pivot with fill-0 preserves group totals (G2)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1, 5), Gen.oneOf("a", "b", "c"), Gen.chooseNum(1L, 100L)))
    check(Prop.forAll(rows) { (data: List[(Int, String, Long)]) =>
      val df = data.toDF("key", "cat", "v")
      val wide = df.groupBy("key").pivot("cat", Seq("a", "b", "c")).sum("v")
        .na.fill(0L, Seq("a", "b", "c"))
      val totalWide = wide.select(sum(col("a") + col("b") + col("c")))
        .collect()(0).getLong(0)
      val totalLong = df.select(sum("v")).collect()(0).getLong(0)
      totalWide == totalLong
    })
  }

  test("property: salted join ≡ plain inner join on skewed keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c, sum => ssum}
    // 90% of big-side rows hit one hot key
    val gen = Gen.listOfN(60, Gen.frequency(9 -> Gen.const(1L), 1 -> Gen.chooseNum(2L, 5L)))
    check(Prop.forAll(gen) { (ks: List[Long]) =>
      val big = ks.zipWithIndex.toDF("k", "idx")
      val small = (1L to 5L).map(k => (k, k * 10)).toDF("k", "dim")
      val plain = big.join(small, Seq("k"))
      val salted = saltedJoin(big, small, Seq("k"), factor = 4)
      salted.count() == plain.count() &&
        salted.agg(ssum(c("idx") + c("dim"))).collect()(0).getLong(0) ==
          plain.agg(ssum(c("idx") + c("dim"))).collect()(0).getLong(0)
    }, cases = 5)
  }

  test("property: lag of a constant column is constant after the first row (F1)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    check(Prop.forAll(Gen.chooseNum(2, 20)) { (n: Int) =>
      val df = (1 to n).map(i => (1, i, 7.0)).toDF("g", "seq", "v")
      val w = Window.partitionBy("g").orderBy("seq")
      val lagged = df.withColumn("d", col("v") - lag("v", 1).over(w))
      lagged.filter(col("d").isNotNull && col("d") =!= 0.0).count() == 0L &&
        lagged.filter(col("d").isNull).count() == 1L
    }, cases = 5)
  }
}
