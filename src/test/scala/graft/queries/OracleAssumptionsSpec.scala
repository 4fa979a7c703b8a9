package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Guards the preconditions the DuckDB differential oracles rely on.
  *
  * The hash oracles (HashOracles.scala) replicate the engine's UTF-16
  * code-unit walk with DuckDB's codepoint-wise string functions — exact
  * only on BMP text (see the CHARACTER-SET ASSUMPTION note there). This
  * spec asserts the assumption actually holds on every shipped documents
  * corpus the driver verifies against, turning a silent-divergence risk
  * into a loud test failure if the testdata ever grows astral characters.
  */
class OracleAssumptionsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d).isDirectory)

  test("documents corpora are BMP-only (hash-oracle bit-exactness scope)") {
    dirs should not be empty
    dirs.foreach { d =>
      // Java regex matches CODEPOINTS, so test the astral range directly
      // (a surrogate-range char class would never match a well-formed pair)
      val astral = graft.Tables.documents(spark, d)
        .filter(col("text").rlike("[\\x{10000}-\\x{10FFFF}]"))
        .count()
      withClue(s"$d/documents has astral (non-BMP) text; the x03/x04/x05/x24 " +
        "DuckDB oracles are only bit-exact on BMP input: ") {
        astral shouldBe 0L
      }
    }
  }
}
