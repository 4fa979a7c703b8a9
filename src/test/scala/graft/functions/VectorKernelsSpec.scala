package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Unit tests for the native dot-product kernel registered by
  * GraftExtensions: value equivalence with the HOF formulation it replaces
  * (bit-identical fold), codegen/interpreted agreement, mixed float/double
  * operands, and null propagation. */
class VectorKernelsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("id", "a", "b")
  }

  test("graft_dot ≡ aggregate(zip_with(...)) bit-for-bit (float arrays)") {
    val rows = vecs.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    rows.foreach(r => r.getDouble(0) shouldBe r.getDouble(1)) // exact, not +-
  }

  test("graft_dot against a double-array literal (mixed widths, plane dots)") {
    val plane = Seq.fill(64)(1.0)
    val rows = vecs.select(
      call_function("graft_dot", col("a"), typedLit(plane)).as("native"),
      aggregate(zip_with(col("a"), typedLit(plane), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    rows.foreach(r => r.getDouble(0) shouldBe r.getDouble(1))
  }

  test("interpreted eval and codegen agree") {
    val expr = call_function("graft_dot", col("a"), col("b"))
    val withCodegen = vecs.select(expr).collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = vecs.select(expr).collect().map(_.getDouble(0))
      interpreted.toSeq shouldBe withCodegen.toSeq
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null operand yields null") {
    import spark.implicits._
    val r = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b"))).collect()(0)
    r.isNullAt(0) shouldBe true
  }

  test("ragged lengths and null elements yield null (HOF SQL semantics)") {
    // zip_with pads the shorter array with nulls and null poisons the sum —
    // graft_dot must agree, not silently truncate or zero-fill
    val df = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(1.0D)) AS ragged,
        |       graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS nullelem,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS ok""".stripMargin)
    val r = df.collect()(0)
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
    r.getDouble(2) shouldBe 11.0
  }
}
