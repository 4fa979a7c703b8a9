package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The counted broadcast guard (r18 verdict item 4 + the x155 advice):
  * TextQueries.guardedBroadcast broadcasts a bounded side only while its
  * COUNTED row count is at or under spark.graft.broadcastMaxRows, and falls
  * back to the planner's shuffled strategies above it — because "bounded by
  * type count" (the x62-family ctx tables) and "bounded by construction"
  * (x155's corpus-derived test split: actually ~12.5% OF THE CORPUS) are
  * claims a 100 TB web corpus breaks. Both regimes must be value-identical;
  * these tests pin that on real sf0.001 data.
  *
  * Plan-flip pin subtlety: at fixture scale Catalyst AUTO-broadcasts the
  * small checkpointed ctx even without the hint (the materialized
  * LogicalRDD carries real stats), so "guard off ⇒ no BHJ" is false as
  * stated. The regimes are separated by ALSO setting
  * autoBroadcastJoinThreshold=-1: then a BroadcastHashJoin can only come
  * from our explicit hint — present with the guard under threshold, gone
  * with the guard forced over it. */
class BroadcastGuardSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def rows(q: QueryDef): Seq[String] =
    q.run(spark, dir).collect().map(_.toString).sorted.toSeq

  /** (defaultRows, hintRows, hintPlan, shuffledRows, shuffledPlan) — the
    * hint/shuffled pair both run with auto-broadcast OFF so the hint is
    * the only possible BroadcastHashJoin source. Confs always restored. */
  private def threeRegimes(q: QueryDef)
      : (Seq[String], Seq[String], String, Seq[String], String) = {
    val default = rows(q)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hintDf = q.run(spark, dir)
      val hintPlan = hintDf.queryExecution.executedPlan.toString
      val hint = hintDf.collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.graft.broadcastMaxRows", "0")
      try {
        val shDf = q.run(spark, dir)
        val shPlan = shDf.queryExecution.executedPlan.toString
        (default, hint, hintPlan, shDf.collect().map(_.toString).sorted.toSeq, shPlan)
      } finally spark.conf.unset("spark.graft.broadcastMaxRows")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("x62: lm scores identical across regimes; the guard's hint is what broadcasts the ctx side") {
    // registry: x62_text_lm_score
    val (default, hint, hintPlan, shuffled, shPlan) = threeRegimes(TextQueries.textLmScore)
    default should not be empty
    hint shouldBe default
    shuffled shouldBe default
    hintPlan should include("BroadcastHashJoin")  // our hint, auto-bc is off
    shPlan should not include "BroadcastHashJoin" // guard over threshold ⇒ shuffled
    shPlan should include("ExistingRDD")          // the checkpointed pair table stays
  }

  test("x153: divergence identical across regimes (the guarded corpus-ctx attach)") {
    // registry: x153_source_lm_divergence
    val (default, hint, hintPlan, shuffled, shPlan) = threeRegimes(TextQueries.sourceLmDivergence)
    default should not be empty
    hint shouldBe default
    shuffled shouldBe default
    hintPlan should include("BroadcastHashJoin")
    shPlan should not include "BroadcastHashJoin"
  }

  test("x155: per-suite contamination identical across regimes (the guarded test-gram side)") {
    // registry: x155_contamination_by_suite
    val (default, hint, hintPlan, shuffled, shPlan) = threeRegimes(TextQueries.contaminationBySuite)
    default should not be empty
    hint shouldBe default
    shuffled shouldBe default
    hintPlan should include("BroadcastHashJoin")
    shPlan should not include "BroadcastHashJoin"
    // the sources×suites cross is a LITERAL 3-row frame with its own
    // unconditional hint — it must stay a broadcast nested loop in BOTH
    // regimes (the guard only governs the corpus-derived gram side)
    hintPlan should include("BroadcastNestedLoopJoin")
    shPlan should include("BroadcastNestedLoopJoin")
  }

  test("x149: importance gap identical across regimes (the merged two-model ctx attach)") {
    // registry: x149_dsir_importance
    val (default, hint, hintPlan, shuffled, shPlan) = threeRegimes(TextQueries.dsirImportance)
    default should not be empty
    hint shouldBe default
    shuffled shouldBe default
    hintPlan should include("BroadcastHashJoin")
    shPlan should not include "BroadcastHashJoin"
  }
}
