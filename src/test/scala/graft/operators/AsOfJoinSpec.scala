package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

class AsOfJoinSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("asOf picks the latest at-or-before right row per key; misses are null") {
    import spark.implicits._
    val left = Seq( // (id, key, t)
      (100L, 1L, ts(10)), // matches r2 (t=9, latest <= 10)
      (101L, 1L, ts(5)),  // matches r1 exactly at t=5 (at-or-before tie)
      (102L, 1L, ts(2)),  // before every right row → null
      (103L, 2L, ts(30)), // other key: matches r3
      (104L, 3L, ts(30))  // key with no right rows → null
    ).toDF("id", "k", "t")
    val right = Seq( // (rid, key, t)
      (1L, 1L, ts(5)), (2L, 1L, ts(9)), (9L, 1L, ts(11)), // r at 11 is AFTER left 10
      (3L, 2L, ts(7))
    ).toDF("rid", "k", "t")

    val out = AsOfJoin.asOf(left, right, key = "k", time = "t",
      rightPayload = Seq("rid", "t"), tiebreak = "rid")
      .select(col("id"), col("asof.rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    out shouldBe Map(100L -> 2L, 101L -> 1L, 102L -> -1L, 103L -> 3L, 104L -> -1L)
  }

  test("equal-time right rows resolve to the greatest tiebreak (deterministic)") {
    import spark.implicits._
    val left = Seq((100L, 1L, ts(10))).toDF("id", "k", "t")
    val right = Seq((1L, 1L, ts(10)), (2L, 1L, ts(10)), (3L, 1L, ts(10)))
      .toDF("rid", "k", "t")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"), tiebreak = "rid")
      .select(col("asof.rid")).collect().map(_.getLong(0))
    out shouldBe Array(3L) // max rid among the t-ties
  }

  test("one hot key with 220k rows: no pair blowup, every match exact") {
    // the case the inequality-join formulation explodes on (200k × 20k
    // per-key pairs); the union+window plan is a single partition-local
    // sort. Closed-form expectation: left at time t matches right at
    // floor(t/10)*10.
    import spark.implicits._
    val left = spark.range(200000)
      .select(col("id"), lit(1L).as("k"),
        timestamp_micros(col("id") * 1000000L).as("t"))
    val right = spark.range(20000)
      .select((col("id") * 10).as("rid"), lit(1L).as("k"),
        timestamp_micros(col("id") * 10000000L).as("t"))
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"), tiebreak = "rid")
      .select(col("id"), col("asof.rid"))
    out.filter(col("rid") =!= (col("id") / 10).cast("long") * 10).count() shouldBe 0L
    out.count() shouldBe 200000L
  }

  test("asOfLookup ≡ asOf on randomized data (same semantics, lookup shape)") {
    import spark.implicits._
    val rnd = new scala.util.Random(83L)
    val left = (1 to 500).map(i => (i.toLong, (rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(50))))
      .toDF("id", "k", "t")
    val right = (1 to 80).map(i => (i.toLong, (rnd.nextInt(6) + 1).toLong, ts(rnd.nextInt(50))))
      .toDF("rid", "k", "t") // key 6 exists only on the right; some left keys unmatched
    def res(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("asof.rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    res(AsOfJoin.asOfLookup(left, right, "k", "t", Seq("rid"), "rid")) shouldBe
      res(AsOfJoin.asOf(left, right, "k", "t", Seq("rid"), "rid"))
  }

  test("asOfLookup enriches a STREAM against a static dimension (stateless)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dims = Seq((10L, 1L, ts(0)), (11L, 1L, ts(20))).toDF("rid", "k", "t")
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val stream = input.toDF.toDF("id", "k", "t")
    val q = AsOfJoin.asOfLookup(stream, dims, "k", "t", Seq("rid"), "rid")
      .select(col("id"), col("asof.rid").as("rid"))
      .writeStream.format("memory").queryName("asoflk").outputMode("append").start()
    try {
      input.addData((1L, 1L, ts(10)), (2L, 1L, ts(25)), (3L, 2L, ts(30)))
      q.processAllAvailable()
      spark.table("asoflk").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap shouldBe
        Map(1L -> 10L, 2L -> 11L, 3L -> -1L) // version-at-time; unknown key → null
    } finally q.stop()
  }

  test("asOfLookup fails fast on a fact-sized right side (broadcast guard)") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts(10))).toDF("id", "k", "t")
    val right = spark.range(100)
      .select(col("id").as("rid"), lit(1L).as("k"), timestamp_micros(col("id")).as("t"))
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asOfLookup(left, right, "k", "t", Seq("rid"), "rid",
        maxRightRows = 50L)
    }
    ex.getMessage should include("asOf") // points misuse at the scalable variant
    // at-or-under the bound still runs
    AsOfJoin.asOfLookup(left, right, "k", "t", Seq("rid"), "rid",
      maxRightRows = 100L).count() shouldBe 1L
  }

  test("left payload columns all survive the union round-trip") {
    import spark.implicits._
    val left = Seq((100L, 1L, ts(10), "payload-x", 3.5)).toDF("id", "k", "t", "tag", "v")
    val right = Seq((7L, 1L, ts(1))).toDF("rid", "k", "t")
    val row = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"), "rid").collect().head
    (row.getLong(0), row.getString(3), row.getDouble(4)) shouldBe ((100L, "payload-x", 3.5))
  }
}
