package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE-style snapshot maintenance — apply a CDC changeset (inserts,
  * updates, deletes) to a corpus snapshot and produce the next snapshot.
  * The table-format engines (Delta/Iceberg/Hudi) ship this as `MERGE
  * INTO`; plain-parquet pipelines need the same semantics as a relational
  * plan, and that plan is what a 100 TB corpus refresh actually executes:
  *
  *   1. collapse the changeset to its LATEST change per key
  *      (last-writer-wins on a monotone sequence column — a changeset
  *      batch may carry several ops for one key, e.g. an update followed
  *      by a delete);
  *   2. survivors = snapshot LEFT ANTI JOIN changed-keys — rows the batch
  *      never touched pass through untouched;
  *   3. append the latest upserts (ops other than delete), aligned by
  *      column name.
  *
  * Scale shape: the changeset is batch-sized (a day's crawl delta) while
  * the snapshot is corpus-sized, so the anti join BROADCASTs the changed
  * keys and the snapshot side NEVER shuffles — the whole merge is one
  * corpus scan plus a batch-sized window. Output row count =
  * |snapshot| − |touched keys ∩ snapshot| + |latest non-delete ops|,
  * which MergeIntoSpec asserts on randomized changesets. Deletes of
  * absent keys and updates of absent keys both degrade gracefully
  * (no-op / insert), i.e. ops are upsert/delete, not strict SQL MERGE
  * WHEN MATCHED arms — the idempotent form an at-least-once ingest
  * pipeline wants.
  *
  * Determinism: ties on (key, seq) break on the op column descending
  * ('U' > 'I' > 'D' lexically is NOT assumed — callers must supply unique
  * seqs per key; the tiebreak only pins plan determinism for malformed
  * batches, and the spec documents it).
  */
object MergeInto {

  /** @param snapshot  current corpus snapshot
    * @param changes   changeset carrying the snapshot's columns plus
    *                  `opCol` ('I'/'U' upsert, 'D' delete) and `seqCol`
    *                  (monotone change sequence within the batch)
    * @param keys      snapshot primary-key columns
    */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame,
      keys: Seq[String], opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val payload = snapshot.columns.toSeq
    require(payload.forall(changes.columns.contains),
      s"changeset must carry every snapshot column; missing " +
        (payload.toSet -- changes.columns).mkString(", "))
    require(changes.columns.contains(opCol) && changes.columns.contains(seqCol),
      s"changeset must carry $opCol and $seqCol")

    // 1. last-writer-wins: the window runs over the batch-sized changeset
    // only — the corpus never sees it
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    // 2. untouched corpus rows: anti join against the (tiny) touched-key
    // set — broadcast so the snapshot side neither shuffles nor sorts
    val touched = latest.select(keys.map(col): _*)
    val survivors = snapshot.join(broadcast(touched), keys, "left_anti")

    // 3. apply upserts; deletes simply don't come back
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(payload.map(col): _*)
    survivors.unionByName(upserts)
  }
}
