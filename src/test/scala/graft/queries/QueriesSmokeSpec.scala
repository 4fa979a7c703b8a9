package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, SparkTestBase}

/** Smoke: every registered query runs on the sf0.001 testdata and produces a
  * well-formed result (value correctness is the driver's DuckDB gate; this
  * catches plan-breaking regressions at test time). */
class QueriesSmokeSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // Queries whose result can legitimately be small/empty at tiny scale.
  private val mayBeEmpty = Set("x03_dedup_minhash", "x04_dedup_simhash", "x05_dedup_ngram_jaccard",
    "x21_dedup_emb_lsh", // LSH recall on sub-threshold "near"-dups can be 0 at tiny SF
    "x24_dedup_chunks")  // sf0.001 documents have no duplicated texts at all

  SparkEntry.defs.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(q.name)) {
        withClue(s"${q.name} returned no rows: ") { n should be > 0L }
      }
      df.columns.distinct.length shouldBe df.columns.length // no dup column names
    }
  }

  test("entry() flagship returns rows (driver t1 smoke contract)") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.subsetOf(qs) shouldBe true
  }
}
