package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Symmetric per-vector int8 quantization as one native pass:
  * scale = max(max_i |v_i|, 1e-9) / 127, out_i = halfUpRound(v_i / scale)
  * (returned as array<double> — the integer-valued doubles feed
  * `VectorDot` directly, so the quantized scoring path never leaves
  * whole-stage codegen).
  *
  * Replaces the three-HOF spelling in `Similarity.withQuantized`
  * (`array_max(transform(v, abs))` + `transform(v, round(x/scale))` +
  * `cast(array<double>)`): Spark evaluates higher-order functions in the
  * interpreter with a closure call and a boxed element per step, and at
  * 100x sf0.1 those passes were ~45 s of the ann_quantized_topk bench —
  * the corpus side pays them once per row before the candidate join.
  * This expression is two primitive-double loops and one allocation per
  * row.
  *
  * Bit-parity contract (oracle-critical): the built-in spelling rounds
  * via Spark's `round` = BigDecimal.valueOf(x).setScale(0, HALF_UP).
  * For |x| <= 127.5 (guaranteed here: |v_i/scale| <= 127 by
  * construction) every tie point k+0.5 is exactly representable as a
  * double, so the shortest-decimal-repr detour of BigDecimal.valueOf
  * agrees with rounding the exact binary value, and
  * `signum(x) * Math.round(|x|)` (Math.round is exact in Java 7+,
  * ties toward +inf = ties away from zero on the |x| fold) reproduces
  * HALF_UP bit-for-bit. OperatorsSpec holds the differential against
  * the built-in spelling.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    QuantizeInt8.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantizeInt8.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {

  /** Column-level entry point; expects array<double>. */
  def apply(v: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(v)))

  /** Static so generated code dispatches with one monomorphic call. */
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i))
      if (a > mx) mx = a
      i += 1
    }
    val scale = math.max(mx, 1e-9) / 127.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = v.getDouble(i) / scale
      out(i) = if (x >= 0) Math.round(x).toDouble else -Math.round(-x).toDouble
      i += 1
    }
    new GenericArrayData(out)
  }
}
