package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The defining MinHash property: element-wise-min merge of signatures ==
  * signature of the union of the underlying sets. */
class MinHashUnionSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("group merge of signatures equals signature of concatenated docs") {
    import spark.implicits._
    spark.udf.register("graft_minhash_union", udaf(new MinHashUnion(16)))

    val docs = Seq(
      (1, "the quick brown fox jumps over the lazy dog"),
      (1, "pack my box with five dozen liquor jugs"),
      (2, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
      .toDF("grp", "text")

    val merged = docs
      .selectExpr("grp", "graft_minhash(graft_shingles(text, 3), 16) AS sig")
      .groupBy("grp")
      .agg(expr("graft_minhash_union(sig)").as("sig"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap

    // signature of the union = minhash of the concatenated shingle sets;
    // 1-gram-safe because the two docs of group 1 share no 3-gram boundary
    val unionSig = Seq(
      (1, "the quick brown fox jumps over the lazy dog"),
      (1, "pack my box with five dozen liquor jugs"))
      .toDF("grp", "text")
      .selectExpr("grp", "graft_shingles(text, 3) AS sh")
      .groupBy("grp").agg(flatten(collect_list("sh")).as("sh"))
      .selectExpr("graft_minhash(sh, 16) AS sig")
      .collect()(0).getSeq[Long](0).toList

    merged(1) shouldBe unionSig
    merged(2).length shouldBe 16
  }
}
