package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

// registry: x41_ev_skew_join (the salted hot-key join demo rides this
// operator; value gate = DuckDB oracle + the equivalence properties below)
class SkewJoinSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "payload").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).sorted

  test("salted inner join ≡ plain join on hot-keyed data (no dup, no loss)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    // 5000 rows on one hot key + a uniform tail; dim has 0..2 rows per key
    val left = ((1 to 5000).map(i => (i.toLong, "hot")) ++
      (1 to 500).map(i => (5000L + i, s"k${rnd.nextInt(50)}"))).toDF("id", "k")
    val right = (Seq(("hot", "H")) ++ (0 until 50).flatMap { i =>
      (0 until rnd.nextInt(3)).map(c => (s"k$i", s"p$i-$c"))
    }).toDF("k", "payload")
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), salts = 16)
    pairs(salted) shouldBe pairs(left.join(right, Seq("k"), "inner"))
    salted.columns should not contain "__salt"
  }

  test("left_outer keeps unmatched left rows exactly once") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b"), (3L, "miss")).toDF("id", "k")
    val right = Seq(("a", "pa"), ("b", "pb1"), ("b", "pb2")).toDF("k", "payload")
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), salts = 8,
      joinType = "left_outer")
    pairs(salted) shouldBe pairs(left.join(right, Seq("k"), "left_outer"))
  }

  test("join key carries the salt (hot key spreads across partitions)") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong, "hot")).toDF("id", "k")
    val right = Seq(("hot", "H")).toDF("k", "payload")
    val plan = SkewJoin.saltedJoin(left, right, Seq("k"), salts = 4)
      .queryExecution.executedPlan.toString
    plan should include("__salt") // the equi-join key includes the salt
  }

  test("stream-static: salted enrichment runs inside a micro-batch (no AQE there)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dim = Seq(("hot", "H"), ("cold", "C")).toDF("k", "payload")
    val input = MemoryStream[(Long, String)]
    val q = SkewJoin.saltedJoin(input.toDF.toDF("id", "k"), dim, Seq("k"),
        salts = 4, joinType = "left_outer")
      .writeStream.format("memory").queryName("skewstream").outputMode("append").start()
    try {
      input.addData((1L, "hot"), (2L, "hot"), (3L, "miss"))
      q.processAllAvailable()
      input.addData((4L, "cold"))
      q.processAllAvailable()
      spark.table("skewstream").collect()
        .map(r => (r.getLong(1), if (r.isNullAt(2)) "<none>" else r.getString(2)))
        .sorted.toSeq shouldBe Seq((1L, "H"), (2L, "H"), (3L, "<none>"), (4L, "C"))
    } finally q.stop()
  }

  test("misuse fails fast: bad type, reserved column, clashing payload") {
    import spark.implicits._
    val l = Seq((1L, "a")).toDF("id", "k")
    val r = Seq(("a", "p")).toDF("k", "payload")
    an[IllegalArgumentException] should be thrownBy
      SkewJoin.saltedJoin(l, r, Seq("k"), 4, joinType = "full_outer")
    an[IllegalArgumentException] should be thrownBy
      SkewJoin.saltedJoin(l.withColumn("__salt", lit(1)), r, Seq("k"), 4)
    an[IllegalArgumentException] should be thrownBy // payload name collision
      SkewJoin.saltedJoin(l.withColumn("payload", lit("x")), r, Seq("k"), 4)
  }
}
