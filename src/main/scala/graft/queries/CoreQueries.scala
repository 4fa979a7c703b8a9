package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Relational.{naturalJoin, antiJoin, semiJoin}

/** The 24 declared oracle queries of SURVEY.md §2.3 (Q01-Q24), each mapped to
  * the reference operator rows it covers (§2.1). Every query is a lazy
  * DataFrame program — Catalyst handles pushdown/pruning/join-strategy; we add
  * `broadcast` hints on dimension tables only where the small side is known by
  * construction (region/nation/customer-class inputs stay broadcast-sized even
  * at 100 TB fact scale).
  *
  * Determinism: total ORDER BY on a unique key, ROUND(float aggs, 6), exact
  * median — so DuckDB and Spark hash-match at sf0.01.
  */
object CoreQueries {
  import QueryDef.sql

  // Q01 — A1/A4, B1, C1: project + literal filter (reference shape: event
  // filters in Metric Building and Evaluation.R:28,34).
  val q01 = sql(
    "q01_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // Q02 — C2, C3: IN-list + compound predicate (MB:22,63-64 %in% filters).
  val q02 = sql(
    "q02_inlist_compound",
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE o_orderstatus IN ('F','P') AND o_totalprice > 150000.0
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("F", "P") && col("o_totalprice") > 150000.0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  // Q03 — D1, D8: 3-way star join (Data Load and Cleaning.R:25-27 chain).
  // nation/region are broadcast dims at any scale.
  val q03 = sql(
    "q03_star_join",
    """SELECT c_custkey, c_name, n_name, r_name FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "c_name", "n_name", "r_name")
      .orderBy("c_custkey")
  }

  // Q04 — D3, D4, J10: left join + NA→0 backfill (MB:134-137,144-145 idiom).
  val q04 = sql(
    "q04_left_join_fill",
    """SELECT c_custkey, ROUND(COALESCE(SUM(o_totalprice), 0.0), 6) AS total_spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(round(coalesce(sum("o_totalprice"), lit(0.0)), 6).as("total_spend"))
      .orderBy("c_custkey")
  }

  // Q05 — D6: anti join (DL:47 exclude_plays removal). The excluded set is
  // restricted (status 'P') so the result is non-empty at every sf — an
  // all-rows-removed anti join would be a vacuous check.
  val q05 = sql(
    "q05_anti_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    antiJoin(
      Tables.customer(s, d).withColumnRenamed("c_custkey", "o_custkey"),
      Tables.orders(s, d).filter(col("o_orderstatus") === "P"), Seq("o_custkey"))
      .withColumnRenamed("o_custkey", "c_custkey")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // Q06 — D7, E8: semi join against distinct keys (MB:140-141 blocked-by-OL).
  val q06 = sql(
    "q06_semi_join",
    """SELECT p_partkey, p_name FROM part p
      |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    semiJoin(
      Tables.part(s, d).withColumnRenamed("p_partkey", "l_partkey"),
      Tables.lineitem(s, d), Seq("l_partkey"))
      .withColumnRenamed("l_partkey", "p_partkey")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  // Q07 — D5, D9: join on differently-named keys with explicit CAST
  // (EPA_Comparison.R:7-11 numeric-vs-string gameId join).
  val q07 = sql(
    "q07_cast_join",
    """SELECT s_suppkey, s_name, n_name FROM supplier
      |JOIN nation ON CAST(s_nationkey AS BIGINT) = CAST(n_nationkey AS BIGINT)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey").cast("long") === col("n_nationkey").cast("long"))
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  // Q08 — E1-E4, E7: TPC-H-Q1-style multi-aggregate in one pass
  // (Model Outputs.R:17-18 sum+n+median shape).
  val q08 = sql(
    "q08_multi_agg",
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 6) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 6) AS sum_price,
      |  ROUND(AVG(l_discount), 6) AS avg_disc,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 6).as("sum_qty"),
        round(sum("l_extendedprice"), 6).as("sum_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // Q09 — E8, E9: count-distinct (MB:122-132 blockers-per-rusher two-step).
  val q09 = sql(
    "q09_count_distinct",
    """SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_supp
      |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_partkey")
      .agg(countDistinct("l_suppkey").as("n_supp"))
      .orderBy("l_partkey")
  }

  // Q10 — E5: exact per-group median (MB:161-167, MO:18,24,28,34).
  val q10 = sql(
    "q10_median",
    """SELECT l_returnflag, ROUND(MEDIAN(l_extendedprice), 6) AS med_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    // scale-safe exact median (spillable counts+window plan, identical
    // interpolation — see operators.Quantiles) instead of the builtin's
    // buffer-the-whole-group ObjectHashAggregate
    // the rows-per-group crossover picks the plan: builtin percentile at
    // bench scale (200k rows/group), the range-partitioned parallel plan
    // once a return-flag group outgrows a task's buffer (the 100 TB case)
    graft.operators.Quantiles.groupMedian(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice")
      .select(col("l_returnflag"), round(col("median"), 6).as("med_price"))
      .orderBy("l_returnflag")
  }

  // Q11 — C7, E3: HAVING on a count (MO:18 rush_attempts >= 50).
  val q11 = sql(
    "q11_having",
    """SELECT o_custkey, COUNT(*) AS n_orders FROM orders
      |GROUP BY o_custkey HAVING COUNT(*) >= 3 ORDER BY o_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 3)
      .orderBy("o_custkey")
  }

  // Q12 — G1, G2: pivot as conditional aggregation (reshape::cast at MB:96;
  // absent combos sum to 0 exactly like cast's fun.aggregate=sum over ∅).
  val q12 = sql(
    "q12_pivot",
    """SELECT user_id,
      |  ROUND(SUM(CASE WHEN event_type = 'click'    THEN value ELSE 0.0 END), 6) AS click_value,
      |  ROUND(SUM(CASE WHEN event_type = 'view'     THEN value ELSE 0.0 END), 6) AS view_value,
      |  ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 6) AS purchase_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    def piv(t: String) =
      round(sum(when(col("event_type") === t, col("value")).otherwise(lit(0.0))), 6)
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        piv("click").as("click_value"),
        piv("view").as("view_value"),
        piv("purchase").as("purchase_value"))
      .orderBy("user_id")
  }

  private val userFrameOrder = Window.partitionBy("user_id").orderBy("ts", "event_id")

  // Q13 — F1, H1: per-group lag first difference (MB:49 a_direction; clean
  // partitioned-window semantics per the F1 fidelity note).
  val q13 = sql(
    "q13_lag_diff",
    """SELECT event_id, user_id,
      |  ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS dvalue
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("dvalue", round(col("value") - lag("value", 1).over(userFrameOrder), 6))
      .select("event_id", "user_id", "dvalue")
      .orderBy("event_id")
  }

  // Q14 — F2, J1, J8: second-order lag + boolean flag (MB:50 s_direction).
  val q14 = sql(
    "q14_second_diff",
    """WITH d AS (
      |  SELECT event_id, user_id, ts,
      |    value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d1
      |  FROM events)
      |SELECT event_id, user_id, ROUND(d1, 6) AS d1,
      |  CASE WHEN d1 > LAG(d1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |         AND d1 > 0 THEN 1 ELSE 0 END AS accel_flag
      |FROM d ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("d1_raw", col("value") - lag("value", 1).over(userFrameOrder))
      .withColumn("accel_flag",
        when(col("d1_raw") > lag("d1_raw", 1).over(userFrameOrder) && col("d1_raw") > 0, 1)
          .otherwise(0))
      .withColumn("d1", round(col("d1_raw"), 6))
      .select("event_id", "user_id", "d1", "accel_flag")
      .orderBy("event_id")
  }

  // Q15 — F3, E2: earliest qualifying event per group, joined back
  // (MB:39,52,54-55,85-86 filter→min(frameId) shape).
  val q15 = sql(
    "q15_first_qualifying",
    """SELECT e.event_id, e.user_id, f.first_ts
      |FROM events e
      |JOIN (SELECT user_id, MIN(ts) AS first_ts FROM events
      |      WHERE value > 50.0 GROUP BY user_id) f
      |  ON e.user_id = f.user_id
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val firsts = ev.filter(col("value") > 50.0)
      .groupBy("user_id").agg(min("ts").as("first_ts"))
    ev.join(firsts, Seq("user_id"))
      .select("event_id", "user_id", "first_ts")
      .orderBy("event_id")
  }

  // Q16 — F5, H2, H4: top-k by aggregate with deterministic tie-break
  // (MO:17-19 rankings).
  val q16 = sql(
    "q16_topk",
    """SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 6) AS total
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY total DESC, c_custkey LIMIT 10""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(round(sum("o_totalprice"), 6).as("total"))
      .orderBy(desc("total"), col("c_custkey"))
      .limit(10)
  }

  // Q17 — I1: UNION ALL of disjoint slices, re-aggregated (DL:22 bind_rows).
  val q17 = sql(
    "q17_union_all",
    """SELECT l_returnflag, ROUND(SUM(l_quantity), 6) AS sum_qty, COUNT(*) AS cnt
      |FROM (
      |  SELECT l_returnflag, l_quantity FROM lineitem WHERE l_linenumber <= 3
      |  UNION ALL
      |  SELECT l_returnflag, l_quantity FROM lineitem WHERE l_linenumber > 3
      |) u GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d).select("l_returnflag", "l_quantity", "l_linenumber")
    val lo = li.filter(col("l_linenumber") <= 3).drop("l_linenumber")
    val hi = li.filter(col("l_linenumber") > 3).drop("l_linenumber")
    lo.unionByName(hi)
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 6).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
  }

  // Q18 — J1-J12: scalar expression pipeline — Chebyshev greatest/abs (MB:77),
  // cap-at-1 least (MB:103), nested CASE (MB:81-82), round(3) (MO:20-21).
  val q18 = sql(
    "q18_scalar_pipeline",
    """SELECT l_orderkey, l_linenumber,
      |  ROUND(GREATEST(ABS(l_quantity - 25.0), ABS(l_discount * 100.0 - 5.0)), 3) AS cheb,
      |  ROUND(LEAST(l_quantity / 50.0, 1.0), 3) AS capped,
      |  CASE WHEN l_quantity > 40.0 THEN 'high'
      |       WHEN l_quantity > 20.0 THEN 'mid'
      |       ELSE 'low' END AS bucket
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("cheb",
        round(greatest(abs(col("l_quantity") - 25.0), abs(col("l_discount") * 100.0 - 5.0)), 3))
      .withColumn("capped", round(least(col("l_quantity") / 50.0, lit(1.0)), 3))
      .withColumn("bucket",
        when(col("l_quantity") > 40.0, "high")
          .when(col("l_quantity") > 20.0, "mid")
          .otherwise("low"))
      .select("l_orderkey", "l_linenumber", "cheb", "capped", "bucket")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // Q19 — C8, E11: frequency-based subset then per-category median
  // (WIP.R:278-279,291-293 keep-categories-with-count>k).
  val q19 = sql(
    "q19_freq_subset",
    """SELECT event_type, ROUND(MEDIAN(value), 6) AS med_value, COUNT(*) AS n
      |FROM events
      |WHERE event_type IN (SELECT event_type FROM events
      |                     GROUP BY event_type HAVING COUNT(*) >= 100)
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val frequent = ev.groupBy("event_type").count().filter(col("count") >= 100)
    semiJoin(ev, frequent, Seq("event_type"))
      .groupBy("event_type")
      .agg(round(median(col("value")), 6).as("med_value"), count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  // Q20 — F4, C5: per-group bounds clamp — join bounds, BETWEEN filter, count
  // (MB:72-75 snap/play-end frame clamp).
  val q20 = sql(
    "q20_bounds_clamp",
    """WITH b AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS t0,
      |    MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS t1
      |  FROM events GROUP BY user_id)
      |SELECT e.user_id, COUNT(*) AS n_in_window
      |FROM events e JOIN b ON e.user_id = b.user_id
      |WHERE b.t0 IS NOT NULL AND b.t1 IS NOT NULL AND e.ts BETWEEN b.t0 AND b.t1
      |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val bounds = ev.groupBy("user_id").agg(
      min(when(col("event_type") === "signup", col("ts"))).as("t0"),
      max(when(col("event_type") === "purchase", col("ts"))).as("t1"))
    ev.join(bounds, Seq("user_id"))
      .filter(col("t0").isNotNull && col("t1").isNotNull && col("ts").between(col("t0"), col("t1")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_in_window"))
      .orderBy("user_id")
  }

  // Q21 — E10: full five-number summary (summary() at MB:153): min/Q1/mean/
  // median-adjacent quartiles/max. Exact interpolated percentiles (Spark
  // `percentile` ≡ DuckDB `quantile_cont`, both R type-7).
  val q21 = sql(
    "q21_summary_stats",
    """SELECT COUNT(*) AS n,
      |  ROUND(AVG(o_totalprice), 6) AS avg_price,
      |  ROUND(STDDEV_SAMP(o_totalprice), 6) AS sd_price,
      |  ROUND(MIN(o_totalprice), 6) AS min_price,
      |  ROUND(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY o_totalprice), 6) AS q1_price,
      |  ROUND(PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY o_totalprice), 6) AS q3_price,
      |  ROUND(MAX(o_totalprice), 6) AS max_price
      |FROM orders""".stripMargin) { (s, d) =>
    val orders = Tables.orders(s, d)
    // quartiles via operators.Quantiles: the caller constructed the
    // single-group shape itself, so the probe-free singleGroupQuantiles
    // dispatch applies — builtin percentile while the plan-stats estimate
    // says the one group fits a task buffer, the spillable range-
    // partitioned plan beyond; interpolation is bit-identical either way,
    // so the oracle is unaffected.
    val quartiles = graft.operators.Quantiles
      .singleGroupQuantiles(orders.withColumn("__g", lit(1)), "__g", "o_totalprice",
        Seq(0.25, 0.75))
      .select(round(col("q0"), 6).as("q1_price"), round(col("q1"), 6).as("q3_price"))
    // LEFT join, not crossJoin: on an empty input groupQuantiles emits no
    // __g group at all, and a crossJoin would drop the aggregate row — SQL
    // (and the oracle) still returns one row with n=0 and null quantiles.
    orders.agg(
      count(lit(1)).as("n"),
      round(avg("o_totalprice"), 6).as("avg_price"),
      round(stddev_samp("o_totalprice"), 6).as("sd_price"),
      round(min("o_totalprice"), 6).as("min_price"),
      round(max("o_totalprice"), 6).as("max_price"))
      .withColumn("__g", lit(1))
      .join(quartiles.withColumn("__g", lit(1)), Seq("__g"), "left")
      .select("n", "avg_price", "sd_price", "min_price", "q1_price", "q3_price", "max_price")
  }

  // Q22 — J13: string functions (WIP.R:25-33 paste/str_sub/str_locate/str_trim).
  val q22 = sql(
    "q22_string_funcs",
    """SELECT c_custkey,
      |  CONCAT(SUBSTRING(c_name, 1, 1), '.', TRIM(c_name)) AS abbrev,
      |  CAST(POSITION('#' IN c_name) AS INTEGER) AS hash_pos
      |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .withColumn("abbrev", concat(substring(col("c_name"), 1, 1), lit("."), trim(col("c_name"))))
      .withColumn("hash_pos", instr(col("c_name"), "#"))
      .select("c_custkey", "abbrev", "hash_pos")
      .orderBy("c_custkey")
  }

  // Q23 — C9/H4: deterministic ordered slice (MO:38 df[1:157,]).
  val q23 = sql(
    "q23_ordered_slice",
    """SELECT event_id, user_id, event_type, value FROM events
      |ORDER BY event_id LIMIT 157""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id")
      .limit(157)
  }

  // Q24 — E6, D2: per-group mean joined back by natural key
  // (EPA_Comparison.R:10-11 mean %PZ/s per play ⋈ epa).
  val q24 = sql(
    "q24_mean_join_back",
    """SELECT e.event_id, e.user_id,
      |  ROUND(m.avg_value, 6) AS avg_value,
      |  ROUND(e.value - ROUND(m.avg_value, 6), 6) AS dev
      |FROM events e
      |JOIN (SELECT user_id, AVG(value) AS avg_value FROM events GROUP BY user_id) m
      |  ON e.user_id = m.user_id
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val means = ev.groupBy("user_id").agg(avg("value").as("avg_value_raw"))
    // Round the mean BEFORE differencing: value − round(avg,6) is then the
    // same float op on the same inputs in Spark and DuckDB, so the outer
    // round can't straddle an ulp-divergent boundary (SURVEY.md §7.3).
    naturalJoin(ev, means)
      .withColumn("avg_value", round(col("avg_value_raw"), 6))
      .withColumn("dev", round(col("value") - col("avg_value"), 6))
      .select("event_id", "user_id", "avg_value", "dev")
      .orderBy("event_id")
  }

  // Q25 — K13: histogram plot-input table (MB:154's hist(breaks) emitted as
  // the binned aggregate a plotting client consumes; the engine never draws).
  val q25 = sql(
    "q25_histogram",
    """SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 50000.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Column profiling over orders (operators.Profiler): per-column null
    * and exact-distinct counts in ONE pass (single aggregate, one Expand
    * for the distincts — no per-column rescans). The oracle checks the
    * portable stats; min/max strings stay engine-side (double/timestamp
    * rendering differs across engines, the numbers do not). */
  val x34 = sql(
    "x34_profile_orders",
    """SELECT 'o_custkey' AS col_name, CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, COUNT(DISTINCT o_custkey) AS n_distinct FROM orders
      |UNION ALL SELECT 'o_orderdate', CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(DISTINCT o_orderdate) FROM orders
      |UNION ALL SELECT 'o_orderkey', CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(DISTINCT o_orderkey) FROM orders
      |UNION ALL SELECT 'o_orderpriority', CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(DISTINCT o_orderpriority) FROM orders
      |UNION ALL SELECT 'o_orderstatus', CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(DISTINCT o_orderstatus) FROM orders
      |UNION ALL SELECT 'o_totalprice', CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(DISTINCT o_totalprice) FROM orders
      |ORDER BY col_name""".stripMargin) { (s, d) =>
    // exact pinned: the oracle's COUNT(DISTINCT) is exact, so the query
    // must not ride the profiler's size-based exact→approx auto-dispatch.
    // withMinMax = false (r20): this query drops min/max anyway, and their
    // string buffers forced the whole Expand aggregate into SortAggregate
    graft.operators.Profiler.profile(Tables.orders(s, d), exactHint = Some(true),
        withMinMax = false)
      .select(col("column").as("col_name"), col("n_nulls"), col("n_distinct"))
      .orderBy("col_name")
  }

  /** x49: referential-integrity audit — orphan-row counts for every
    * foreign-key edge of the star schema in one result (the data-quality
    * gate an ingest pipeline runs before publishing a snapshot; the
    * multi-table complement of the single-table Profiler). Each edge is an
    * anti-join: at scale the dimension sides broadcast (customer/supplier/
    * part vs the fact tables) and the fact-fact edge (lineitem→orders)
    * shuffles once on the key — exactly the join shapes q03-q07 already
    * plan-verify. Row counts are integer-exact. */
  val x49 = sql(
    "x49_ri_audit",
    """SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
      |  CAST((SELECT COUNT(*) FROM lineitem l
      |        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_orphans
      |UNION ALL SELECT 'orders.o_custkey->customer',
      |  CAST((SELECT COUNT(*) FROM orders o
      |        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
      |UNION ALL SELECT 'lineitem.l_partkey->part',
      |  CAST((SELECT COUNT(*) FROM lineitem l
      |        WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
      |UNION ALL SELECT 'lineitem.l_suppkey->supplier',
      |  CAST((SELECT COUNT(*) FROM lineitem l
      |        WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
      |UNION ALL SELECT 'customer.c_nationkey->nation',
      |  CAST((SELECT COUNT(*) FROM customer c
      |        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
      |ORDER BY fk_edge""".stripMargin) { (s, d) =>
    // one lazy plan: each edge is an anti-join folded to a single count
    // row (agg on empty input still yields the 0 row), unioned — no
    // driver-side actions before the sink
    def orphans(name: String, fact: DataFrame, fk: String,
        dim: DataFrame, pk: String): DataFrame =
      fact.join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("fk_edge"), col("n_orphans"))
    orphans("lineitem.l_orderkey->orders",
        Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d).select(col("o_orderkey")), "o_orderkey")
      .unionByName(orphans("orders.o_custkey->customer",
        Tables.orders(s, d), "o_custkey", Tables.customer(s, d), "c_custkey"))
      .unionByName(orphans("lineitem.l_partkey->part",
        Tables.lineitem(s, d), "l_partkey", Tables.part(s, d), "p_partkey"))
      .unionByName(orphans("lineitem.l_suppkey->supplier",
        Tables.lineitem(s, d), "l_suppkey", Tables.supplier(s, d), "s_suppkey"))
      .unionByName(orphans("customer.c_nationkey->nation",
        Tables.customer(s, d), "c_nationkey", Tables.nation(s, d), "n_nationkey"))
      .orderBy("fk_edge")
  }

  /** x50: equi-DEPTH histogram (deciles of o_totalprice) — the complement
    * of q25's equi-width binning. The naive plan is `NTILE(10) OVER
    * (ORDER BY …)`: one unpartitioned window = one task sorting the world,
    * the exact shape this repo's plan rules forbid. The scalable plan
    * computes the 9 interior boundaries with the exact quantile operator
    * (one aggregate, skew-safe dispatch), broadcasts them as a 9-element
    * array, and buckets rows with a row-local `filter` HOF — no global
    * sort anywhere. Boundary interpolation is bit-identical to
    * PERCENTILE_CONT (q21 precedent), so strict `>` comparisons agree and
    * the oracle hash-matches. (Ties at a boundary go to the lower bucket
    * in BOTH engines — value-based bucketing, not NTILE's row-splitting.) */
  val x50 = sql(
    "x50_deciles",
    {
      // ANSI-portable form (SqlParitySpec runs every core oracle through
      // Spark SQL too): nine scalar boundaries + a CASE-sum bucket
      val bCols = (1 to 9).map(i =>
        s"    PERCENTILE_CONT(0.$i) WITHIN GROUP (ORDER BY o_totalprice) AS b$i").mkString(",\n")
      val caseSum = (1 to 9).map(i =>
        s"(CASE WHEN o.o_totalprice > b.b$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH b AS (SELECT
$bCols
  FROM orders),
t AS (SELECT o.o_totalprice,
    CAST(1 + $caseSum AS INTEGER) AS decile
  FROM orders o CROSS JOIN b)
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
  ROUND(MIN(o_totalprice), 6) AS lo, ROUND(MAX(o_totalprice), 6) AS hi
FROM t GROUP BY decile ORDER BY decile"""
    }) { (s, d) =>
    val orders = Tables.orders(s, d)
    // singleGroupQuantiles: the caller built the one-group shape, so the
    // dispatch reads the plan-stats estimate instead of paying the scalar
    // probe pass (drops a whole aggregate job from this query)
    val bounds = graft.operators.Quantiles
      .singleGroupQuantiles(orders.withColumn("__g", lit(1)), "__g", "o_totalprice",
        (1 to 9).map(_ / 10.0))
      .select(lit(1).as("__g"), array((0 until 9).map(i => col(s"q$i")): _*).as("bs"))
    // LEFT join + empty-array fallback, not crossJoin: on an all-NULL value
    // column groupQuantiles emits no group, and a crossJoin would drop every
    // row where the oracle's aggregate CTE still yields its one (all-NULL
    // boundaries) row — the q21 trap, avoided the same way
    orders.withColumn("__g", lit(1))
      .join(broadcast(bounds), Seq("__g"), "left")
      .select(col("o_totalprice"),
        (size(filter(coalesce(col("bs"), array()),
          x => col("o_totalprice") > x)) + 1).as("decile"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        round(min("o_totalprice"), 6).as("lo"),
        round(max("o_totalprice"), 6).as("hi"))
      .orderBy("decile")
  }

  /** x87: K-fold leakage-safe target encoding (the m-estimate / Micci-
    * Barreca form) — each (customer, fold) cell gets the customer's mean
    * order value computed EXCLUDING that fold's own rows, blended toward
    * the global mean with weight m=10: the high-cardinality categorical
    * feature a tabular model consumes, with the train-fold leak removed
    * by construction (a cell never sees its own target values) and rare
    * customers shrunk toward the prior instead of memorizing noise.
    *
    * Determinism contract: target sums ride as exact BIGINT cents
    * (`ROUND(price·100)` — the fixed-point pattern the streaming rolling
    * sum uses), so partial aggregation order can't perturb them; doubles
    * appear only in the final per-cell expression, with both engines
    * evaluating the identical operand chain (ROUND 6).
    *
    * Plan: ONE partial-final groupBy over the fact on (custkey, fold);
    * per-customer totals and the global prior derive from the CELLS table
    * (customers×K rows), the prior broadcasts as a single row — the fact
    * is scanned and exchanged exactly once at any scale. */
  val x87 = sql(
    "x87_target_encode",
    """WITH cells AS (
      |  SELECT o_custkey, o_orderkey % 5 AS fold, COUNT(*) AS n,
      |    SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1, 2),
      |tot AS (SELECT o_custkey, SUM(n) AS nn, SUM(cents) AS cc FROM cells GROUP BY 1),
      |g AS (SELECT SUM(n) AS gn, SUM(cents) AS gc FROM cells)
      |SELECT c.o_custkey AS o_custkey, CAST(c.fold AS BIGINT) AS fold,
      |  CAST(c.n AS BIGINT) AS n_in_fold,
      |  ROUND((CAST(t.cc - c.cents AS DOUBLE) / 100.0
      |          + 10.0 * (CAST(g.gc AS DOUBLE) / 100.0 / g.gn))
      |        / (CAST(t.nn - c.n AS DOUBLE) + 10.0), 6) AS enc
      |FROM cells c JOIN tot t ON c.o_custkey = t.o_custkey CROSS JOIN g
      |ORDER BY c.o_custkey, fold""".stripMargin) { (s, d) =>
    val cells = Tables.orders(s, d)
      .groupBy(col("o_custkey"), (col("o_orderkey") % 5).as("fold"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .localCheckpoint(eager = false) // three consumers: totals, prior, join —
      // without this the FACT would be re-scanned per consumer
    val tot = cells.groupBy("o_custkey")
      .agg(sum("n").as("nn"), sum("cents").as("cc"))
    val g = cells.agg(sum("n").as("gn"), sum("cents").as("gc"))
    cells.join(tot, Seq("o_custkey"))
      .crossJoin(broadcast(g))
      .select(col("o_custkey"), col("fold").cast("long").as("fold"),
        col("n").as("n_in_fold"),
        round(((col("cc") - col("cents")).cast("double") / 100.0
            + lit(10.0) * (col("gc").cast("double") / 100.0 / col("gn")))
          / ((col("nn") - col("n")).cast("double") + 10.0), 6).as("enc"))
      .orderBy("o_custkey", "fold")
  }

  val all: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12,
    q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25, x34,
    x49, x50, x87)
}
