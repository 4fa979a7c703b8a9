package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Durable index artifacts: the IVF centroids and the MinHash signature
  * table must round-trip through parquet so later sessions probe without
  * re-paying the build. The no-retrain guarantees are asserted the hard
  * way: the probe calls get a BOGUS corpus directory (or none at all) — if
  * they touched the corpus instead of the artifact, they would throw. */
class IndexDurabilitySpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("IVF centroids round-trip exactly and probe without retraining") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString + "/ivf"
    val trained = SimilarityQueries.ivfCentroids(spark, sf)
    SimilarityQueries.saveIvfIndex(spark, sf, dir)
    SimilarityQueries.clearIvfCache() // simulate a fresh session (memo gone)
    // artifact exists → the durable path must load it and never read the
    // corpus: a nonexistent data dir proves no retraining happened
    val loaded = SimilarityQueries.ivfCentroidsDurable(
      spark, "/nonexistent/corpus/dir", dir)
    loaded shouldBe trained // exact doubles — same index, not a re-train
  }

  test("ivfCentroidsDurable trains+writes on first call, loads thereafter") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-index2").toString + "/ivf"
    val first = SimilarityQueries.ivfCentroidsDurable(spark, sf, dir)
    SimilarityQueries.clearIvfCache()
    val second = SimilarityQueries.ivfCentroidsDurable(
      spark, "/nonexistent/corpus/dir", dir) // must come from the artifact
    second shouldBe first
    first.length shouldBe 16
  }

  test("MinHash signature table round-trips; probe matches the full query") {
    val dir = java.nio.file.Files.createTempDirectory("mh-index").toString + "/sigs"
    TextQueries.saveMinhashIndex(spark, sf, dir)
    // probe-only path: reads ONLY the artifact (no corpus dir argument)
    val fromIndex = TextQueries.dedupMinhashFromIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val direct = TextQueries.dedupMinhash.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    fromIndex should not be empty // 25 pairs at sf0.01
    fromIndex shouldBe direct
  }
}
