package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkTestBase, Tables}

/** Accuracy gates for the FREE-RANGE sketch aggregates (raw user_id
  * cardinality, raw value-stream quantiles — the genuinely-approximate
  * regime): the check is against the EXACT answers on the same data —
  * HLL++ within its configured relative standard deviation, quantile
  * sketch within its rank-error bound. (x22 itself now runs the sketches
  * in their constructed EXACT regimes and is hash-checked by the DuckDB
  * gate; this spec keeps gating the approximate regime the registry query
  * no longer exercises, alongside SketchCanarySpec's pinned outputs.) */
class ApproxStatsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("free-range sketches: HLL++ distinct counts within 3×rsd of exact; quantiles within rank error") {
    val approx = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.05).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_value"),
        percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95_value"))
      .orderBy("event_type").collect()
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

  test("x22 exact regime: sketch outputs EQUAL the exact answers (the DuckDB-oracle premise)") {
    // the claim the oracle rests on, asserted in-engine: HLL++ on the
    // 16-value modded domain returns the exact distinct count, and the
    // uncompressed GK summary returns the element at 1-based rank ceil(q*n)
    // of the <=256 bucket maxima
    // registry: x22_ev_approx_stats
    val got = EventsQueries.approxStats.run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val bm = Tables.events(spark, dir)
      .groupBy(col("event_type"), pmod(col("user_id"), lit(256)).as("bucket"))
      .agg(max("value").as("bucket_max"))
      .collect().map(r => (r.getString(0), r.getDouble(2)))
      .groupBy(_._1).map { case (et, a) => et -> a.map(_._2).sorted.toVector }
    val exactDistinct = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct(pmod(col("user_id"), lit(16))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.keySet shouldBe bm.keySet
    got.foreach { case (et, (cohorts, p50, p95)) =>
      withClue(s"$et HLL must be exact: ") { cohorts shouldBe exactDistinct(et) }
      val v = bm(et); val n = v.length
      n should be <= 256
      withClue(s"$et p50 rank rule: ") { p50 shouldBe v(math.ceil(0.5 * n).toInt - 1) }
      withClue(s"$et p95 rank rule: ") { p95 shouldBe v(math.ceil(0.95 * n).toInt - 1) }
    }
  }

  test("red path: OUTSIDE the constructed regime the premise checks fail loudly (the oracle is load-bearing)") {
    // The exact-regime oracle's value rests on the claim that a stale or
    // broken regime would hash-mismatch, not silently pass. Perturb each
    // regime the way a careless edit of x22 would (deterministic inputs,
    // so these are stable assertions, not flaky near-misses):
    //
    // (1) HLL++: domain k = 64 > the probed exact range (<= 32 at rsd
    //     0.05). Linear counting's k²/2m error no longer rounds to zero,
    //     so the estimate must NOT equal the exact distinct count — the
    //     x22 premise check (`cohorts shouldBe exactDistinct`) would go
    //     red if `% 16` drifted to `% 64`.
    val hllPerturbed = Tables.events(spark, dir)
      .agg(approx_count_distinct(pmod(col("user_id"), lit(64)), rsd = 0.05).as("a"),
        countDistinct(pmod(col("user_id"), lit(64))).as("e"))
      .head()
    withClue("HLL++ at domain 64 must diverge from exact, or the regime bound is meaningless: ") {
      hllPerturbed.getLong(0) should not be hllPerturbed.getLong(1)
    }
    // (2) GK quantiles: n >> accuracy forces compression, so the summary
    //     can no longer honor the uncompressed rank rule ⌈q·n⌉ for every
    //     q — the x22 premise check (`p shouldBe v(ceil(q*n)-1)`) would go
    //     red if the bucket count outgrew the accuracy parameter.
    val vals = spark.range(1, 30001).select(col("id").cast("double").as("v"))
    val ps = vals
      .agg(percentile_approx(col("v"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(1000)).as("p"))
      .head().getSeq[Double](0)
    val exactRank = Seq(0.5, 0.95, 0.99).map(q => math.ceil(q * 30000))
    withClue(s"GK at n=30000 > accuracy=1000 must miss the exact rank rule somewhere (got $ps): ") {
      ps should not be exactRank
    }
    // and the divergence is bounded: still within the n/accuracy=30-rank
    // guarantee, which is exactly why the APPROXIMATE regime needs the
    // bracket gate above, not a hash match
    ps.zip(exactRank).foreach { case (got, want) =>
      math.abs(got - want) should be <= 30.0 * 2 // 2x slack on the bound
    }
  }
}
