package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The two Bloom guarantees x70 leans on: NO false negative, ever (a set
  * bit is never cleared; merge is bitwise OR — associative, commutative,
  * idempotent), and a false-positive rate near the (1-e^(-kn/m))^k theory
  * when the bitmap is deliberately undersized. */
class BloomBitsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("reduce sets exactly the addressed bit; merge is bitwise OR") {
    val agg = new BloomBits(128)
    val a = agg.reduce(agg.reduce(agg.zero, 0L), 65L)
    a(0) shouldBe 1L
    a(1) shouldBe 2L
    val b = agg.reduce(agg.zero, 65L)
    val m = agg.merge(a.clone(), b)
    m(0) shouldBe 1L
    m(1) shouldBe 2L // idempotent: 65 twice is still one bit
    an[IllegalArgumentException] should be thrownBy agg.reduce(agg.zero, 128L)
    an[IllegalArgumentException] should be thrownBy agg.reduce(agg.zero, -1L)
    an[IllegalArgumentException] should be thrownBy new BloomBits(100) // not /64
  }

  test("no false negatives; FP rate of an undersized bitmap near theory") {
    import spark.implicits._
    // deliberately tiny bitmap: m=256 bits, k=4, n=100 members
    // → fill 1-e^(-400/256) ≈ 0.79, FPR ≈ 0.79^4 ≈ 0.39
    val m = 256L
    spark.udf.register("graft_bloom_bits_t", udaf(new BloomBits(m.toInt)))
    val members = (0 until 100).map(i => s"member-$i")
    val nonMembers = (0 until 500).map(i => s"other-$i")
    def positions(c: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(3)), j => pmod(xxhash64(c, j), lit(m)))
    val bits = members.toDF("k")
      .select(explode(positions(col("k"))).as("pos"))
      .agg(expr("graft_bloom_bits_t(pos)").as("bits"))
    val probe = (members ++ nonMembers).toDF("k")
      .join(broadcast(bits))
      .withColumn("hit", expr(
        """forall(transform(sequence(0, 3), j -> pmod(xxhash64(k, j), 256)),
          |  p -> (shiftright(element_at(bits, CAST(p div 64 AS INT) + 1),
          |                   CAST(p % 64 AS INT)) & 1L) = 1L)""".stripMargin))
      .select("k", "hit").as[(String, Boolean)].collect().toMap
    members.foreach { k => withClue(s"false negative on $k: ") { probe(k) shouldBe true } }
    val fpr = nonMembers.count(probe) / 500.0
    // deterministic given the fixed keys; brackets around the 0.39 theory
    fpr should be > 0.15
    fpr should be < 0.6
  }
}
