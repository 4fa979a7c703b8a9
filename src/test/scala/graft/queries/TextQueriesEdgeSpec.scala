package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Edge cases the sf testdata never hits: the x09 fingerprint path on docs
  * shorter than the shingle width (the `size(toks) >= 3` guard — without it
  * Spark's `sequence(1, n-2)` would COUNT DOWN for n<3 and fabricate
  * shingles). */
class TextQueriesEdgeSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("x09 fingerprints: sub-shingle-width docs get null min/max, md5 still set") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docs-edge").toString
    Seq((1L, "solo"), (2L, "two tokens"), (3L, "now three tokens"), (4L, "a b c d"))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextQueries.textFingerprint.run(spark, dir).collect()
    rows.length shouldBe 4
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // every doc gets the exact-dup key
    byId(1).getString(1) should fullyMatch regex "[0-9a-f]{32}"
    // <3 tokens → no shingles → null sketch columns (not fabricated values)
    byId(1).isNullAt(2) shouldBe true
    byId(2).isNullAt(3) shouldBe true
    // ≥3 tokens → both present; 3-token doc has exactly one shingle
    byId(3).getString(2) shouldBe byId(3).getString(3)
    byId(4).getString(2) should not be null
    byId(4).getString(3) should not be null
  }
}
