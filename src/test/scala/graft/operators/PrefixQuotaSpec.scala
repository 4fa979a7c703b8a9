package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

// registry: x36_text_quota_sample (the quota sampler rides this operator;
// its value gate is the DuckDB oracle + the exactness properties below)
/** PrefixQuota (take-until-quota via two-level distributed prefix sum):
  * exactness against the naive per-group running-sum window it replaces,
  * boundary semantics, and the plan shape that makes it scale. */
class PrefixQuotaSpec extends AnyFunSuite with Matchers with SparkTestBase {

  /** The semantics spec: one window per group, before = running sum over
    * all earlier rows, keep while before < quota. */
  private def naive(df: DataFrame, quota: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("ord"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before", coalesce(sum(col("v")).over(w), lit(0L)))
      .filter(col("cum_before") < quota)
  }

  private def synth(rows: Seq[(String, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("g", "tie", "v").withColumn("ord", md5(col("tie").cast("string")))
  }

  private def sortedRows(df: DataFrame): Seq[(String, Long, Long, Long)] = {
    import spark.implicits._
    df.select(col("g"), col("tie"), col("v"), col("cum_before"))
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
  }

  test("matches the naive single-window formulation on a random mixed corpus") {
    val rng = new scala.util.Random(7)
    val rows = for (g <- Seq("a", "b", "c"); i <- 0 until 200)
      yield (g, (i + g.hashCode.abs.toLong * 1000) % 100000, rng.nextInt(40).toLong)
    val df = synth(rows.distinct)
    val quota = when(col("g") === "a", 900L).when(col("g") === "b", 0L).otherwise(2500L)
    for (bucketLen <- Seq(1, 2)) {
      val got = PrefixQuota.takeUntilQuota(df, "g", col("ord"), col("tie"),
        col("v"), quota, bucketLen = bucketLen)
      withClue(s"bucketLen=$bucketLen: ") {
        sortedRows(got) shouldBe sortedRows(naive(df, quota))
      }
    }
  }

  test("boundary: the doc that crosses the budget is kept; before==quota is dropped") {
    // one group, hand-ordered by tie (ord is md5(tie) but we derive the
    // expected set from the naive spec, then assert the two hand cases)
    val df = synth(Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 10L), ("g", 4L, 10L)))
    val got = PrefixQuota.takeUntilQuota(df, "g", col("ord"), col("tie"),
      col("v"), lit(25L))
    // kept docs: running-before < 25 → exactly the first three in md5 order
    got.count() shouldBe 3
    got.agg(max("cum_before")).first().getLong(0) shouldBe 20L
    // quota exactly at a row boundary: before == quota is NOT kept
    val exact = PrefixQuota.takeUntilQuota(df, "g", col("ord"), col("tie"),
      col("v"), lit(20L))
    exact.count() shouldBe 2
  }

  test("zero-value rows at the cut: before==quota drops them (rowwise rule, not bucket rule)") {
    val df = synth(Seq(("g", 1L, 5L), ("g", 2L, 0L), ("g", 3L, 5L), ("g", 4L, 0L)))
    val got = PrefixQuota.takeUntilQuota(df, "g", col("ord"), col("tie"), col("v"), lit(10L))
    sortedRows(got) shouldBe sortedRows(naive(df, lit(10L)))
  }

  test("size dispatch: deeper split as the estimate grows, capped at 4") {
    val target = BigInt(PrefixQuota.bucketTargetBytes)
    // one bucket of the worst case (whole input one group) must fit target
    PrefixQuota.dispatchBucketLen(BigInt(0)) shouldBe 1
    PrefixQuota.dispatchBucketLen(target * 16) shouldBe 1
    PrefixQuota.dispatchBucketLen(target * 16 + 1) shouldBe 2
    PrefixQuota.dispatchBucketLen(target * 256) shouldBe 2
    PrefixQuota.dispatchBucketLen(target * 256 + 1) shouldBe 3
    PrefixQuota.dispatchBucketLen(target * 4096 + 1) shouldBe 4
    // sentinel-huge estimates (unmeasured sources) route to the deepest
    // split — safe direction: more parallelism, still-tiny totals table
    PrefixQuota.dispatchBucketLen(BigInt(Long.MaxValue) * 1024) shouldBe 4
  }

  test("auto dispatch (default bucketLen) matches the naive formulation") {
    val rng = new scala.util.Random(11)
    val rows = for (g <- Seq("a", "b"); i <- 0 until 150)
      yield (g, i.toLong, rng.nextInt(30).toLong)
    val df = synth(rows)
    val quota = when(col("g") === "a", 700L).otherwise(1300L)
    val got = PrefixQuota.takeUntilQuota(df, "g", col("ord"), col("tie"),
      col("v"), quota) // bucketLen omitted → size-dispatched
    sortedRows(got) shouldBe sortedRows(naive(df, quota))
  }

  test("runningBefore: the uncut prefix sum matches the naive window on every row") {
    val rng = new scala.util.Random(13)
    val rows = for (g <- Seq("a", "b", "c"); i <- 0 until 150)
      yield (g, i.toLong, rng.nextInt(50).toLong)
    val df = synth(rows)
    val w = Window.partitionBy("g").orderBy(col("ord"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = df.withColumn("cum_before", coalesce(sum(col("v")).over(w), lit(0L)))
    for (bucketLen <- Seq(PrefixQuota.AutoBucketLen, 2)) {
      val got = PrefixQuota.runningBefore(df, "g", col("ord"), col("tie"),
        col("v"), bucketLen = bucketLen)
      withClue(s"bucketLen=$bucketLen: ") {
        got.count() shouldBe df.count() // no cut: every row keeps its offset
        sortedRows(got) shouldBe sortedRows(expect)
      }
    }
  }

  test("hex canary: a non-hex order key fails loudly, not silently serial") {
    import spark.implicits._
    // upper-case hex breaks the fixed-case contract (mixed-case keys would
    // bucket 'A…' apart from 'a…' and skew the fanout); 'Z…' isn't hex at all
    for (badKey <- Seq(upper(md5(col("tie").cast("string"))), concat(lit("Z"), lit("00")))) {
      val df = Seq(("g", 1L, 5L), ("g", 2L, 5L)).toDF("g", "tie", "v")
      val ex = intercept[Exception] {
        PrefixQuota.takeUntilQuota(df, "g", badKey, col("tie"), col("v"), lit(100L))
          .collect()
      }
      // raise_error surfaces wrapped (task → job → user exception): scan the chain
      val messages = Iterator.iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString("|")
      messages should include("lowercase-hex")
    }
  }

  test("reserved-column collision fails fast") {
    val df = synth(Seq(("g", 1L, 1L))).withColumn("__bkt", lit(1))
    an[IllegalArgumentException] should be thrownBy
      PrefixQuota.takeUntilQuota(df, "g", col("ord"), col("tie"), col("v"), lit(1L))
  }

  test("plan: row-level window partitions by (group, bucket), never by the group alone") {
    val df = synth((0 until 500).map(i => ("g", i.toLong, 3L)))
    val got = PrefixQuota.takeUntilQuota(df, "g", col("ord"), col("tie"), col("v"), lit(600L))
    val plan = got.queryExecution.executedPlan.toString
    // the full-width exchange carries the bucket key — a per-group-only
    // hash partitioning of the raw rows would serialize each group
    val parts = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    parts.filter(_.contains("__bkt")) should not be empty
    // the only group-only partitioning allowed is the tiny bucket-cumsum
    // window, which sits above the partial/final aggregate pair
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
  }
}
