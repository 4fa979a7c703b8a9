package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Relational vocabulary the reference leans on but Spark does not name
  * directly (SURVEY.md §2.1 D).
  *
  * The reference's R `merge` with no `by` joins on the intersection of column
  * names (natural join) — e.g. `Final_Scripts/Metric Building and
  * Evaluation.R:37,40,42,53,57,68` — and uses `anti_join` / inner-join-against-
  * distinct-keys for set-membership (`Data Load and Cleaning.R:47`, MB:140-141).
  *
  * All helpers stay declarative (plain `Dataset.join` with a join type), so
  * Catalyst is free to pick broadcast-hash vs sort-merge, reorder, and push
  * predicates through them — important at cluster scale.
  */
object Relational {

  /** Inner/left/... join on the intersection of column names (R `merge` default). */
  def naturalJoin(a: DataFrame, b: DataFrame, how: String = "inner"): DataFrame = {
    val keys = a.columns.toSeq.intersect(b.columns.toSeq)
    require(keys.nonEmpty, "naturalJoin: no common columns")
    a.join(b, keys, how)
  }

  /** Keep rows of `a` whose key appears in `b` (R inner-join-against-unique idiom). */
  def semiJoin(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.join(b.select(keys.map(col): _*).distinct(), keys, "left_semi")

  /** Keep rows of `a` whose key does NOT appear in `b` (dplyr `anti_join`). */
  def antiJoin(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.join(b.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Inner equi-join with key salting for heavy hitters: the skewed (big)
    * side gets a deterministic salt in [0, factor); the small side is
    * replicated across all salts; the join key becomes (keys, salt), so one
    * hot key spreads over `factor` shuffle partitions.
    *
    * Result-equivalent to `big.join(small, keys)` (inner). Use when AQE's
    * skew-join splitting isn't available (e.g., the skewed side feeds an
    * aggregation that pins the partitioning) — otherwise prefer AQE.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    import org.apache.spark.sql.functions.{explode, lit, pmod, sequence, spark_partition_id,
      monotonically_increasing_id, xxhash64}
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(factor))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
