package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-wise diff of two dataset release snapshots — the regression report a
  * curation pipeline runs between consecutive releases ("what changed since
  * the last crawl?"): every key is classified `added` (new side only),
  * `removed` (old side only), `changed` (present in both, any compared
  * column differs), or `same`.
  *
  * Scale shape: ONE full-outer equi-join on the key. Both snapshots are
  * release-manifest-sized (one row per surviving document), so neither side
  * broadcasts — Spark plans a sort-merge join with one exchange per side,
  * which is exactly the right plan at 100 TB, and every status decision is
  * a row-local null-safe comparison after the join (no second pass, no
  * driver-side state). Comparison uses `<=>` so a NULL-vs-NULL compared
  * column counts as equal and NULL-vs-value as changed, matching SQL
  * `IS NOT DISTINCT FROM`.
  */
object SnapshotDiff {

  /** Diff `newSnap` against `oldSnap` on `key`; `compare` columns decide
    * `changed` vs `same`. Output: the key (coalesced across sides), the
    * compared columns from both sides prefixed `old_`/`new_`, and `status`.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String, compare: Seq[String]): DataFrame = {
    require(compare.nonEmpty, "SnapshotDiff.diff: need at least one compare column")
    val a = oldSnap.select(col(key).as("__ka") +: compare.map(c => col(c).as(s"old_$c")): _*)
    val b = newSnap.select(col(key).as("__kb") +: compare.map(c => col(c).as(s"new_$c")): _*)
    val joined = a.join(b, col("__ka") === col("__kb"), "full_outer")
    val anyDiff = compare
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("status",
        when(col("__ka").isNull, "added")
          .when(col("__kb").isNull, "removed")
          .when(anyDiff, "changed")
          .otherwise("same"))
      .select(coalesce(col("__ka"), col("__kb")).as(key) +:
        compare.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))) :+ col("status"): _*)
  }
}
