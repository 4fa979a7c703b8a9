package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** The sketch queries materialize intermediates (lineage boundaries against
  * Catalyst's projection re-inlining) — but those blocks must not outlive
  * the query: they're GC-scoped `localCheckpoint`s, not session-lifetime
  * `persist`s, so a long-lived session (Bench runs all queries back to
  * back) doesn't accumulate cached tables until eviction. */
class CacheHygieneSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("sketch queries register nothing in the SQL cache (no persist calls)") {
    // persist() creates an InMemoryRelation that lives in the session's
    // CacheManager until unpersist; localCheckpoint does not. Deterministic
    // guard: no sketch-query plan may contain an in-memory cache scan.
    Seq(TextQueries.dedupMinhash, TextQueries.dedupSimhash, TextQueries.dedupNgram,
      TextQueries.dedupChunks, SimilarityQueries.dedupEmbLsh).foreach { q =>
      val plan = q.run(spark, dir).queryExecution.executedPlan.toString
      withClue(s"${q.name}: ") { plan should not include "InMemoryTableScan" }
    }
  }

  test("sketch queries leave no session-lifetime cached blocks behind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // run the three sketch queries to completion, dropping all references
    Seq(TextQueries.dedupMinhash, TextQueries.dedupSimhash, TextQueries.dedupNgram)
      .foreach(q => q.run(spark, dir).count())
    // localCheckpoint blocks are released by the ContextCleaner once the
    // query's DataFrames are unreachable — force GC and wait for the drain.
    var tries = 0
    def leftover = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leftover.nonEmpty && tries < 150) {
      System.gc()
      Thread.sleep(200)
      tries += 1
    }
    leftover shouldBe empty
  }
}
