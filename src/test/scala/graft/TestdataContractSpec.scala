package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Schema-drift canary for the driver-shipped testdata (TESTDATA.md).
  *
  * The round-9 regeneration changed `events.ts` from parquet timestamp[ns]
  * to tz-naive timestamp[us] and nothing failed NAMING the drift — 22
  * queries just vanished from the correctness report. This spec pins what
  * every `Tables` loader yields, so the next regeneration fails HERE with
  * the changed table and column in the message, not downstream in whatever
  * query happens to touch the changed column first.
  *
  * Deliberately tolerant where the engine is: timestamp columns that ship
  * tz-naive may arrive as TIMESTAMP_NTZ or TIMESTAMP (both layouts are
  * handled and oracle-verified); everything else is exact.
  */
class TestdataContractSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Accept both session-zone and ntz arrivals for shipped-naive columns. */
  private val AnyTimestamp: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private def assertSchema(table: String, df: org.apache.spark.sql.DataFrame,
                           expected: Seq[(String, AnyRef)]): Unit = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType)
    withClue(s"$table column names drifted (got ${actual.map(_._1).mkString(",")}): ") {
      actual.map(_._1) shouldBe expected.map(_._1)
    }
    expected.zip(actual).foreach {
      case ((name, want: DataType), (_, got)) =>
        withClue(s"$table.$name type drifted: ") { got shouldBe want }
      case ((name, want: Set[_]), (_, got)) =>
        withClue(s"$table.$name type drifted (got $got): ") {
          want.asInstanceOf[Set[DataType]] should contain(got)
        }
    }
  }

  test("region/nation dimension schemas") {
    assertSchema("region", Tables.region(spark, dir),
      Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertSchema("nation", Tables.nation(spark, dir),
      Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType))
  }

  test("customer/supplier/part schemas") {
    assertSchema("customer", Tables.customer(spark, dir),
      Seq("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType))
    assertSchema("supplier", Tables.supplier(spark, dir),
      Seq("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assertSchema("part", Tables.part(spark, dir),
      Seq("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("orders/lineitem fact schemas") {
    assertSchema("orders", Tables.orders(spark, dir),
      Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> AnyTimestamp, "o_orderpriority" -> StringType))
    assertSchema("lineitem", Tables.lineitem(spark, dir),
      Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> AnyTimestamp))
  }

  test("events schema — ts is ALWAYS session-zone TIMESTAMP after the loader") {
    assertSchema("events", Tables.events(spark, dir),
      Seq("event_id" -> LongType, "ts" -> TimestampType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType))
  }

  test("documents/embeddings schemas") {
    assertSchema("documents", Tables.documents(spark, dir),
      Seq("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
        "source" -> StringType, "n_chars" -> LongType))
    assertSchema("embeddings", Tables.embeddings(spark, dir),
      Seq("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true),
        "label" -> IntegerType))
  }

  test("all three scale factors agree on the events layout") {
    // a partial regeneration (one sf dir changed, others stale) would make
    // sf0.01 correctness and sf0.1 bench disagree — catch it here
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { d =>
        withClue(s"$d: ") {
          Tables.events(spark, d).schema("ts").dataType shouldBe TimestampType
        }
      }
  }
}
