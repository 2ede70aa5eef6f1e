package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two array<double> columns — the hot inner loop
  * of every embedding operator (cosine scoring, LSH plane projections, IVF
  * centroid scores). The built-in spelling
  * `aggregate(zip_with(u, v, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`
  * materializes a 64-element intermediate array and walks two lambda
  * closures per element; this expression is a primitive-double loop with
  * zero allocation, inside whole-stage codegen.
  *
  * Summation order is the same strict left-to-right fold as the built-in
  * spelling and DuckDB's list_inner_product, so results are bit-identical
  * and oracle parity is unaffected.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression
    with ColumnBridge.DoubleArrayPairInputs {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorDot.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.VectorDot.compute($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {

  /** Column-level entry point. */
  def apply(u: Column, v: Column): Column =
    ColumnBridge.column(VectorDot(ColumnBridge.expression(u), ColumnBridge.expression(v)))

  /** Static so generated code dispatches with one monomorphic call.
    * Strict sequential fold; length = min(|u|, |v|) matches zip_with's
    * null-free case for equal-length embeddings.
    */
  def compute(u: ArrayData, v: ArrayData): Double = {
    val n = math.min(u.numElements(), v.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += u.getDouble(i) * v.getDouble(i)
      i += 1
    }
    acc
  }
}
