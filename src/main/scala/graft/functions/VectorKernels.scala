package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop vector kernel for the similarity operators (same rationale as
  * TextHashes: `zip_with`+`aggregate` walk 2·d interpreted lambda frames and
  * allocate an intermediate array per evaluation; this is one JVM loop,
  * inlined as a single static call inside whole-stage codegen).
  *
  * The fold is the SAME sequential left-to-right `acc + a(i)*b(i)` (elements
  * widened to double) as the HOF formulation and as DuckDB's
  * `list_sum(list_transform(...))` — bit-identical doubles, so swapping it
  * into oracle-checked queries changes no results. `norm(a)` callers use
  * `sqrt(graft_dot(a, a))`, which performs the identical cast/multiply/add
  * sequence as the `transform`-then-fold it replaces.
  */
object VectorKernels {
  /** Null result (boxed) mirrors the HOF's SQL semantics exactly: length
    * mismatch → NULL (zip_with pads with null, null poisons the sum) and a
    * null element in either operand → NULL. The null-slot probes are bitset
    * lookups on UnsafeArrayData — negligible next to the multiply-adds. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** `graft_dot(a, b)` → DOUBLE sequential-fold dot product over ARRAY<FLOAT>
  * or ARRAY<DOUBLE> operands (mixed widths allowed — embeddings are float,
  * literal hyperplanes/centroids are double). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOf(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOf(left), elemOf(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs ARRAY<FLOAT|DOUBLE> operands, got ${left.dataType} / ${right.dataType}")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true // ragged / null-element inputs → NULL

  private lazy val aFloat = elemOf(left).contains(FloatType)
  private lazy val bFloat = elemOf(right).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aFloat, bFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) => s"""
      java.lang.Double ${ev.value}_r =
        graft.functions.VectorKernels.dot($c1, $c2, $aFloat, $bFloat);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
