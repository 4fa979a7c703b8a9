package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

// registry: x42_text_topk_tokens (the top-k token sketch query rides this
// aggregator; value gate = exact-regime DuckDB oracle + the bounds below)
class HeavyHittersSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def topk(df: org.apache.spark.sql.DataFrame, m: Int, k: Int) = {
    spark.udf.register(s"hh_${m}_$k", udaf(new HeavyHitters(m, k)))
    df.groupBy("g").agg(expr(s"hh_${m}_$k(tok)").as("tk"))
      .select(col("g"), explode(col("tk")).as("e"))
      .select(col("g"), col("e._1").as("tok"), col("e._2").as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  test("exact regime: summary under capacity reproduces exact counts, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val data = (1 to 5000).map(_ => ("g1", s"t${rnd.nextInt(40)}")) // 40 distinct < m
    val want = data.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(10)
      .map { case (t, c) => ("g1", t, c) }
    topk(data.toDF("g", "tok"), m = 64, k = 10).toSeq shouldBe want
    // partition layout must not change the answer in the exact regime
    topk(data.toDF("g", "tok").repartition(13), m = 64, k = 10).toSeq shouldBe want
  }

  test("lossy regime: classical n/(m+1) guarantee holds under merge") {
    import spark.implicits._
    val rnd = new scala.util.Random(23L)
    // 2 genuinely heavy tokens + a long uniform tail of 500 distinct
    val data = ((1 to 4000).map(_ => "heavy1") ++ (1 to 3000).map(_ => "heavy2") ++
      (1 to 5000).map(_ => s"tail${rnd.nextInt(500)}")).map(t => ("g1", t))
    val n = data.size
    val m = 8
    val got = topk(data.toDF("g", "tok").repartition(7), m = m, k = m)
      .map { case (_, t, c) => t -> c }.toMap
    val err = n / (m + 1)
    // every token with true count > n/(m+1) must survive...
    got.keySet should contain allOf ("heavy1", "heavy2")
    // ...and reported counts undercount by at most n/(m+1)
    got("heavy1") should (be <= 4000L and be >= (4000L - err))
    got("heavy2") should (be <= 3000L and be >= (3000L - err))
  }

  test("capacity arguments are validated") {
    an[IllegalArgumentException] should be thrownBy new HeavyHitters(0, 1)
    an[IllegalArgumentException] should be thrownBy new HeavyHitters(4, 5)
  }
}
