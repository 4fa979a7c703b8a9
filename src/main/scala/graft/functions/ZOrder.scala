package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve value for two dimensions — the data-layout
  * primitive behind multi-dimensional file clustering (Delta/Iceberg
  * OPTIMIZE ZORDER): sorting by the interleaved-bit value keeps rows that
  * are close in BOTH dimensions close on disk, so parquet row-group
  * min/max stats prune scans filtered on either dimension (a plain sort
  * prunes only its leading column).
  *
  * `zValue` interleaves the low 21 bits of two non-negative integral
  * columns (bit j of `a` → bit 2j, bit j of `b` → bit 2j+1; values are
  * masked to 21 bits first, so out-of-range inputs wrap rather than
  * collide across dimensions). The spread uses the constant-time
  * mask-and-shift construction (5 shift/and steps per dimension — one
  * codegen'd expression, no loop, no UDF); callers bucket real-valued or
  * signed dimensions into non-negative integers first. All arithmetic
  * stays below bit 62, so the result is an exact BIGINT in any engine —
  * the x43 oracle replicates it in DuckDB operator-for-operator. */
object ZOrder {

  private[graft] val masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 21 bits of `x` to even bit positions (0,2,4,…,40). */
  private[graft] def spread(x: Column): Column =
    masks.foldLeft(x.bitwiseAND(lit(0x1FFFFFL))) { case (acc, (s, m)) =>
      (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(lit(m))
    }

  /** Morton value of (a, b): a's bits land on even positions, b's on odd. */
  def zValue(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))

  /** The identical spread as ANSI SQL text (generated from the SAME mask
    * table the engine folds over, so engine and oracle cannot drift) —
    * used by the x43 DuckDB oracle. */
  private[graft] def spreadSql(c: String): String =
    masks.foldLeft(s"($c & 2097151)") { case (acc, (s, m)) =>
      s"(($acc | ($acc << $s)) & $m)"
    }
}
