package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The x142 normalization kernel (`graft_norm_text`) must be EXACTLY the
  * HOF column it replaced (r17 verdict item 3) — the oracle SQL is
  * unchanged, so any divergence is a silent hash mismatch at the gate.
  * The reference formulation is re-created here verbatim and both run
  * through Spark on the same rows (the HOF interpreted, the kernel
  * codegen'd), pinning the pair on every adversarial class plus a
  * scalacheck sweep over whitespace-heavy alphabets. */
class NormTextSpec extends AnyFunSuite with Matchers with SparkTestBase {

  /** The ORIGINAL x142 HOF chain, verbatim (TextQueries.normTextCol
    * pre-r18): split(trim(lower)), keep i=0 or t != ts[i-1], join " ". */
  private def hofNorm(src: org.apache.spark.sql.Column) = {
    val ts = split(trim(lower(src)), "\\s+")
    array_join(filter(ts, (t, i) => i === 0 || t =!= element_at(ts, i)), " ")
  }

  private def bothWays(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.toDF("text")
      .withColumn("hof", hofNorm(col("text")))
      .withColumn("ker", call_function("graft_norm_text", col("text")))
    val bad = df.filter(col("hof") =!= col("ker")).collect()
    withClue(s"kernel diverges from the HOF on: ${bad.mkString("; ")}") {
      bad shouldBe empty
    }
  }

  test("kernel ≡ HOF on the adversarial classes") {
    bothWays(Seq(
      "",                          // split("") = [""]
      "   ",                       // all spaces → trim eats everything
      "\t\t",                      // all non-space ws → ["",""] → ""
      "\thello",                   // leading tab survives trim → empty first token
      "hello\t",                   // trailing tab → trailing empty token (limit -1)
      "Hello WORLD",               // lowering
      "a  b\t\nc",                 // mixed multi-char separator runs
      "table table table menu",    // the stutter the rule exists for
      "a a",                       // stutter at both ends
      "x X x",                     // stutter only AFTER lowering
      "a b a",                     // non-consecutive repeat is KEPT
      "a aa a",                    // prefix-equal but different length
      "ÉCOLE école Straße STRASSE",// unicode lowering (ß/SS is lower-only)
      "naïve naïve café",          // multi-byte stutter
      "🦀 🦀 ok",                  // supplementary plane stutter
      " a  a  ",                   // spaces everywhere
      "one",                       // single token
      "a a"))                 // NBSP is NOT Java \s — one token
  }

  test("kernel ≡ HOF under a scalacheck sweep of whitespace-heavy strings") {
    val piece = Gen.oneOf("a", "b", "AB", "aa", " ", "  ", "\t", "\n", "é", "É", "🦀")
    val strGen = Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, piece)).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(40, strGen)) { texts =>
      bothWays(texts); true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    withClue(res.status.toString) { res.passed shouldBe true }
  }

  test("kernel hand-pins, including the instability class x142's n_unstable exists to count") {
    def k(t: String): String = NormText.norm(UTF8String.fromString(t)).toString
    k("") shouldBe ""
    k("Table TABLE  menu") shouldBe "table menu"
    k("a b a") shouldBe "a b a"
    // NON-idempotent case (the x142 audit measures this, never assumes it
    // away): a leading tab survives the space-only trim as an empty first
    // token, which joins back as a LEADING SPACE — and the second pass
    // then trims it. The kernel must reproduce the HOF's instability, not
    // "fix" it.
    k("\tx\tx ") shouldBe " x"
    k(k("\tx\tx ")) shouldBe "x"
    // stable on already-normal text
    k("a b") shouldBe "a b"
    k(k("a b")) shouldBe "a b"
  }

  test("x142_normalize_fixpoint plan: the normalization runs inside WholeStageCodegen, no CodegenFallback") {
    // the point of the port: the kernel must participate in codegen (the
    // HOF ran interpreted). A literal frame constant-folds to a
    // LocalTableScan, so drive it from a non-foldable range source and
    // assert the Project carrying the expression sits INSIDE a
    // WholeStageCodegen span (its plan line is starred).
    import spark.implicits._
    val df = spark.range(3)
      .withColumn("text", concat(lit("A a b "), col("id").cast("string")))
      .withColumn("norm", call_function("graft_norm_text", col("text")))
    val plan = df.queryExecution.executedPlan.toString
    val exprLines = plan.linesIterator.filter(_.contains("graft_norm_text")).toSeq
    exprLines should not be empty
    withClue(s"expression not codegen'd:\n$plan") {
      all(exprLines.map(_.trim)) should startWith("*(")
    }
    df.select("norm").as[String].collect().head shouldBe "a b 0"
  }
}
