package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class SinksSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("bucketed tables join with zero exchanges (co-located join)") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, i, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 50L).map(i => (i, s"name_$i")).toDF("k", "name")

    Sinks.bucketedTable(facts, "facts_b", Seq("k"), 8)
    Sinks.bucketedTable(dims, "dims_b", Seq("k"), 8)
    try {
      // joining on the bucket key must need no shuffle on either side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("facts_b").join(spark.table("dims_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange"
      joined.count() shouldBe 1000
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }
}
