package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Pinned golden outputs for the native hash kernels. The DuckDB oracles of
  * x03/x04/x05/x24 replicate these bit chains constant-for-constant
  * (HashOracles) — an innocent-looking "improvement" to a kernel constant
  * or loop would keep every property test green and only explode later as
  * a cross-engine hash mismatch in the driver's correctness gate. This
  * canary fails the build immediately instead. Values independently
  * derived from the published algorithm definitions (FNV-1a offset/prime,
  * splitmix64 finalizer, Rabin base-257 rolling hash). */
class HashKernelCanarySpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val doc = "the quick brown fox jumps over the lazy dog"

  private def one(exprStr: String) = {
    import spark.implicits._
    Seq(doc).toDF("text").select(expr(exprStr)).head()
  }

  test("graft_shingles(text, 3) pinned (signed ascending, distinct)") {
    one("graft_shingles(text, 3)").getSeq[Long](0) shouldBe Seq(
      -2239780057692302350L, -1899447074177846979L, -1257410091630597075L,
      1612076328985098511L, 4112001438119236192L, 4299295911820325910L,
      4544217557237960819L)
  }

  test("graft_minhash(graft_shingles(text, 3), 4) pinned (per-seed order)") {
    one("graft_minhash(graft_shingles(text, 3), 4)").getSeq[Long](0) shouldBe Seq(
      -4422547655819523860L, -8584152188204987431L,
      -2002612220531182447L, -8558950361317328368L)
  }

  test("graft_simhash(graft_shingles(text, 1)) pinned") {
    one("graft_simhash(graft_shingles(text, 1))").getLong(0) shouldBe
      -5610275374370315974L
  }

  test("graft_chunks(text, 5, 16) pinned") {
    one("graft_chunks(text, 5, 16)").getSeq[Long](0) shouldBe
      Seq(6621440988695079923L)
  }
}
