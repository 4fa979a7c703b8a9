package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the explicit form of skew handling
  * for the cases AQE's OptimizeSkewedJoin cannot reach: stream-static
  * joins (no AQE re-planning inside a micro-batch), sessions running with
  * AQE disabled, and pipelines that want the skew split *before* the first
  * lopsided sort/spill rather than after runtime stats observe it.
  *
  * Plan shape: the left (fact) side gets a uniform salt in [0, salts); the
  * right side is replicated once per salt value (explode of a
  * `sequence`, row-local). The join key becomes (keys…, __salt), so a hot
  * key's rows spread across `salts` shuffle partitions instead of one.
  * Result is EXACTLY the unsalted join — every left row meets every
  * matching right row exactly once because the right side carries all
  * salt values — which SkewJoinSpec asserts on randomized data and the
  * x41 oracle checks cross-engine.
  *
  * Cost model: right-side shuffle volume × salts. Size `salts` to the hot
  * key's row count / target partition size; it deliberately stays an
  * explicit argument (the caller knows the skew; a wrong guess only costs
  * replication, never correctness).
  *
  * Supported join types: inner and left_outer (the right side is the
  * replicated one, so right/full outer would need null-matching against
  * every salt — use the mirrored call instead).
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(keys.nonEmpty, "at least one join key required")
    require(salts > 0, s"salts must be positive, got $salts")
    val jt = joinType.replace("_outer", "")
    require(Seq("inner", "left").contains(jt),
      s"joinType must be inner or left_outer, got $joinType (mirror the call for right)")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs must not contain a __salt column (reserved by saltedJoin)")
    val shared = (left.columns.toSet & right.columns.toSet) -- keys.toSet
    require(shared.isEmpty,
      s"non-key columns shared by both sides would collide in the output: $shared")
    // uniform salt per left row; rand(seed) is reproducible per run AND the
    // result is salt-independent by construction (any value meets the
    // replicated right side), so reproducibility is a debugging nicety,
    // not a correctness requirement
    val l = left.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
