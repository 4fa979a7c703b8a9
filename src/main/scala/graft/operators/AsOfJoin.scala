package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the LATEST right row with the same key
  * and right time ≤ left time (the temporal-enrichment join Spark has no
  * built-in for: trades-vs-quotes, event-vs-latest-state, click-vs-view).
  *
  * Implemented JOIN-FREE as tag → union → running last-non-null window:
  *
  *   1. both sides are tagged and unioned on a common schema (left payload
  *      and right payload ride in nullable structs);
  *   2. one window partitioned by the key, ordered by (time, side,
  *      tiebreak) with side putting right rows BEFORE left rows at equal
  *      times (ties are at-or-before, like DuckDB's ASOF JOIN);
  *   3. `last(rightStruct, ignoreNulls)` over the running frame attaches
  *      the newest preceding right payload to every left row.
  *
  * Scale rationale: the naive formulation is an inequality join
  * (`r.key = l.key AND r.t <= l.t`) — a per-key cross product that
  * explodes on hot keys — or a per-row subquery. This plan costs exactly
  * ONE shuffle (the window partition), then a linear partition-local scan;
  * a hot key is one partition's spillable sort, never a pair blowup.
  * AsOfJoinSpec checks semantics (ties, misses, interleavings) and
  * PlanQualitySpec asserts the executed plan contains no join node at all.
  *
  * Determinism: among right rows sharing the greatest qualifying time, the
  * one with the largest `tiebreak` wins — pass a unique column (an id) for
  * reproducible output.
  */
object AsOfJoin {

  /** Left rows enriched with `asOfCol`: a struct of `rightPayload` columns
    * from the matched right row, or null when no right row precedes. */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
      rightPayload: Seq[String], tiebreak: String,
      asOfCol: String = "asof"): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(rightPayload.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val tbType = right.schema(tiebreak).dataType

    val lTagged = left.select(
      col(key).as("__k"), col(time).as("__t"),
      lit(1).as("__side"), lit(null).cast(tbType).as("__tb"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rTagged = right.select(
      col(key).as("__k"), col(time).as("__t"),
      lit(0).as("__side"), col(tiebreak).as("__tb"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__m", last("__r", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: Seq(col("__m").as(asOfCol)): _*)
  }

  /** As-of LOOKUP — same semantics as [[asOf]] (latest right row at-or-
    * before, greatest-tiebreak ties), different shape: the right side is
    * pre-aggregated into one sorted array per key and joined in (broadcast
    * when small), and the match is picked ROW-LOCALLY by codegen'd
    * `filter` + `element_at(…, -1)` over the array.
    *
    * Use when the right side is dimension-sized (slowly-changing-dimension
    * version lookup: enrich each fact with the dim state valid at its
    * time). Two properties [[asOf]] lacks: the left side never shuffles at
    * all (broadcast join), and the whole plan is STATELESS — so it runs
    * unchanged over a STREAMING left side (stream-static join), where the
    * union+window plan cannot (a global window over an unbounded stream).
    * The cost: each key's full right history must fit in one array — the
    * per-key state bound the dimension-table shape guarantees. Left rows
    * with no key match or no preceding version get a null `asOfCol`.
    *
    * The dimension-sized contract is ENFORCED, not just documented: the
    * right side is probed with `limit(maxRightRows + 1).count()` — a scan
    * that stops as soon as the bound is exceeded — so a fact-sized right
    * side fails fast with a pointer to [[asOf]] instead of slowly OOMing
    * the driver inside the unconditional broadcast.
    *
    * The probe is an EAGER Spark action at call time: it runs the right
    * side's lineage once before the join does (a lazily-constructed right
    * frame is computed twice — probe + broadcast), which also means this
    * method is not lazy the way a plain join is. Hot-path callers who have
    * already sized the dimension can opt out by passing
    * `maxRightRows >= Int.MaxValue`, which disables the probe entirely;
    * raise it short of that only if executor/driver memory genuinely fits
    * the bigger lookup. */
  def asOfLookup(left: DataFrame, right: DataFrame, key: String, time: String,
      rightPayload: Seq[String], tiebreak: String,
      asOfCol: String = "asof", maxRightRows: Long = 5000000L): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    require(maxRightRows > 0, s"maxRightRows must be positive, got $maxRightRows")
    if (maxRightRows < Int.MaxValue) { // a bound ≥ 2^31 disables the probe
      val probed = right.limit(maxRightRows.toInt + 1).count()
      require(probed <= maxRightRows,
        s"asOfLookup right side exceeds maxRightRows=$maxRightRows — it is " +
          "broadcast whole (dimension-sized contract); use AsOfJoin.asOf for " +
          "fact-sized right sides, or raise maxRightRows if it truly fits")
    }
    import org.apache.spark.sql.functions.broadcast
    val rAgg = right.groupBy(col(key).as("__k"))
      .agg(sort_array(collect_list(struct(
        col(time).as("__t"), col(tiebreak).as("__tb"),
        struct(rightPayload.map(col): _*).as("__p")))).as("__lookup"))
    left.join(broadcast(rAgg), col(key) === col("__k"), "left")
      .withColumn(asOfCol, // try_: ANSI element_at throws on an empty filter result
        try_element_at(filter(col("__lookup"), s => s("__t") <= col(time)), lit(-1))("__p"))
      .drop("__k", "__lookup")
  }

  /** Column-friendly accessor for the matched payload. */
  def matched(asOfCol: String, field: String): Column = col(s"$asOfCol.$field")
}
