package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class FeatureBinsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def trainDf = {
    import spark.implicits._
    // group "a": values 1..100 → quartile edges 25.75, 50.5, 75.25
    // group "b": constant 5 → degenerate edges (5, 5, 5)
    ((1 to 100).map(i => ("a", i.toDouble)) ++ (1 to 8).map(_ => ("b", 5.0)))
      .toDF("g", "v")
  }

  test("fit learns PERCENTILE_CONT-interpolated ascending edges per group") {
    val bins = FeatureBins.fitBins(trainDf, "g", "v", nBins = 4).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    bins("a") shouldBe Seq(25.75, 50.5, 75.25)
    bins("b") shouldBe Seq(5.0, 5.0, 5.0)
  }

  test("apply buckets 1..nBins with strict-greater edges; unseen groups stay null") {
    import spark.implicits._
    val bins = FeatureBins.fitBins(trainDf, "g", "v", nBins = 4)
    val fact = Seq(("a", 10.0), ("a", 25.75), ("a", 26.0), ("a", 99.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0), ("zzz", 1.0)).toDF("g", "v")
    val out = FeatureBins.applyBins(fact, bins, "g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
    out.toSet shouldBe Set(
      ("a", 10.0, 1), ("a", 25.75, 1), // boundary value stays in the lower bin
      ("a", 26.0, 2), ("a", 99.0, 4),
      ("b", 4.0, 1), ("b", 5.0, 1), ("b", 6.0, 4), // degenerate edges jump 1→4
      ("zzz", 1.0, -1)) // unseen group surfaces as null, never a guess
  }

  test("durable artifact: apply from disk needs no refit and edges round-trip exactly") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("bins").toString + "/edges"
    val fresh = FeatureBins.fitBins(trainDf, "g", "v", nBins = 4)
    FeatureBins.saveBins(fresh, path)
    val loaded = FeatureBins.loadBins(spark, path)
    loaded.collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap shouldBe
      fresh.collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // the serve path touches ONLY the artifact: binning a new fact with the
    // training data gone (a different, tiny fact) must work and must not
    // re-derive edges (the loaded plan has no aggregate)
    val serveFact = Seq(("a", 60.0)).toDF("g", "v")
    val served = FeatureBins.applyBins(serveFact, loaded, "g", "v")
    served.queryExecution.optimizedPlan.toString should not include "Aggregate"
    served.collect().map(r => r.getInt(2)).toSeq shouldBe Seq(3)
  }

  test("misuse fails loudly") {
    an[IllegalArgumentException] should be thrownBy
      FeatureBins.fitBins(trainDf, "g", "v", nBins = 1)
  }
}
