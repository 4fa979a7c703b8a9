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

  test("documents corpora are \\x0B-free (Java vs RE2 whitespace-split parity)") {
    // Java-regex \s (Spark's split, the BpeEncode kernel's isWs) includes
    // \x0B (vertical tab); DuckDB/RE2's \s does not. The x99/x103/x105
    // hash gates therefore assume the corpora carry no \x0B — assert it,
    // so a corpus regeneration that introduces one fails HERE with the
    // reason instead of as an opaque cross-engine hash mismatch.
    dirs should not be empty
    dirs.foreach { d =>
      val vt = graft.Tables.documents(spark, d)
        .filter(col("text").contains("\u000B"))
        .count()
      withClue(s"$d/documents contains \\x0B (vertical tab); Java and RE2 " +
        "\\s+ split such text differently, breaking the x99/x103/x105 " +
        "oracle equality: ") {
        vt shouldBe 0L
      }
    }
  }

  test("per-lang token vocabularies fit the x42 Misra-Gries capacity (m=1024)") {
    // x42's hash-oracle equality holds only while every per-lang vocabulary
    // stays under the HeavyHitters capacity: within capacity no lossy
    // decrement ever fires, so the sketch IS the exact GROUP BY the DuckDB
    // oracle runs. If corpus growth ever crosses the capacity, this canary
    // fails with a pointed message instead of x42 surfacing as an opaque
    // verify-round hash mismatch (the lossy regime itself stays correct per
    // HeavyHittersSpec's n/(m+1) bound — only ORACLE EQUALITY is scoped).
    dirs should not be empty
    dirs.foreach { d =>
      val maxVocab = graft.Tables.documents(spark, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang").agg(countDistinct("tok").as("v"))
        .agg(max("v")).head().getLong(0)
      withClue(s"$d/documents: a per-lang vocabulary ($maxVocab tokens) " +
        "exceeds x42's HeavyHitters capacity m=1024 — the sketch would go " +
        "lossy and diverge from the exact GROUP BY oracle; raise m in x42 " +
        "or re-scope the oracle: ") {
        maxVocab should be <= 1024L
      }
    }
  }

  test("x115 decay magnitudes stay inside DECIMAL(38,0) and the exact-floor regime") {
    // x115's order-free exactness rests on two magnitude premises:
    // (1) value·10⁶ < 2⁵³, so the double multiply + FLOOR is the same
    //     integer in both engines for every shipped row;
    // (2) Σ |v6|·2³⁰ per user < 10³⁸, so the DECIMAL(38,0)/HUGEINT sum
    //     can never overflow (Spark would NULL, DuckDB would error —
    //     either way an opaque mismatch; this canary names the cause).
    val dirsE = dirs.filter(d => new java.io.File(s"$d/events.parquet").isFile)
    dirsE should not be empty
    dirsE.foreach { d =>
      val r = graft.Tables.events(spark, d)
        .select(col("user_id"), abs(col("value")).as("av"))
        .agg(max("av").as("mx"),
          sum(expr("CAST(floor(av * 1000000) AS DECIMAL(38,0))")).as("tot"))
        .head()
      withClue(s"$d/events: max |value| breaks the exact-floor premise: ") {
        r.getDouble(0) * 1000000d should be < math.pow(2, 53)
      }
      // sum over ALL users bounds any single user's sum from above
      val headroom = BigDecimal(10).pow(38) / BigDecimal(2).pow(30)
      withClue(s"$d/events: total decayed mass too close to DECIMAL(38,0): ") {
        BigDecimal(r.getDecimal(1)) should be < headroom / 100 // 100× margin
      }
    }
  }
}
