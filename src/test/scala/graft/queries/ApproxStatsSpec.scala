package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkTestBase, Tables}

/** Accuracy gates for the sketch aggregates (x22): no cross-engine oracle
  * exists for engine-specific sketch internals, so the check is against the
  * EXACT answers on the same data — HLL++ within its configured relative
  * standard deviation, quantile sketch within its rank-error bound. */
class ApproxStatsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("x22: HLL++ distinct counts within 3×rsd of exact; quantiles within rank error") {
    val approx = EventsQueries.approxStats.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("users"),
        percentile(col("value"), lit(0.49)).as("p48"),
        percentile(col("value"), lit(0.51)).as("p52"),
        percentile(col("value"), lit(0.94)).as("p94"),
        percentile(col("value"), lit(0.96)).as("p96"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    exact.keySet shouldBe approx.keySet
    exact.foreach { case (et, (users, p48, p52, p94, p96)) =>
      val (aUsers, aP50, aP95) = approx(et)
      withClue(s"$et distinct: ") {
        math.abs(aUsers - users).toDouble / users should be <= 0.15 // 3× the 5% rsd
      }
      // percentile_approx(…, 10000) guarantees rank error ≤ 1/10000; the
      // exact 49th/51st (94th/96th) percentiles bracket it generously.
      withClue(s"$et p50: ") { aP50 should (be >= p48 and be <= p52) }
      withClue(s"$et p95: ") { aP95 should (be >= p94 and be <= p96) }
    }
  }
}
