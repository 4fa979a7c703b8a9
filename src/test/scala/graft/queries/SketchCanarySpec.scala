package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Pinned golden outputs for the sketch aggregates behind x22
  * (HashKernelCanarySpec precedent): x22 is `no_oracle` by nature — sketch
  * internals are engine-specific — and its accuracy gates
  * (ApproxStatsSpec) tolerate a few percent, so an upstream Spark change
  * that degrades HLL++ or the quantile sketch WITHIN the gate would ship
  * silently. This canary pins exact sketch outputs on a fixed
  * single-partition fixture (one partition ⇒ one deterministic insertion
  * order ⇒ no merge-order variance), so any change to sketch constants,
  * hashing, or compression fails the build immediately. */
class SketchCanarySpec extends AnyFunSuite with Matchers with SparkTestBase {

  // deterministic fixture: 1000 rows, 3 groups, 97 users, value a fixed
  // Weyl sequence — no RNG, no time, no environment dependence
  private def fixture = {
    import spark.implicits._
    (0 until 1000).map { i =>
      (s"t${i % 3}", (i * 2654435761L % 100000L).toDouble / 100.0, s"u${i % 97}")
    }.toDF("event_type", "value", "user_id").coalesce(1)
  }

  test("x22 sketch outputs pinned on the canary fixture") {
    val got = fixture.groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.05).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_value"),
        percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95_value"))
      .orderBy("event_type")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    // exact distincts are 97 per group, exact p50/p95 ≈ 500/950: the pins
    // also witness the gates (rsd 5%: 92 vs 97; rank error ≤ 1%)
    got shouldBe Seq(
      ("t0", 92L, 493.17, 949.77),
      ("t1", 92L, 497.93, 948.88),
      ("t2", 92L, 505.36, 947.99))
  }
}
