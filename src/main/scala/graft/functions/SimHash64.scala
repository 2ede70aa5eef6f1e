package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** 64-bit SimHash over a token array as ONE per-row kernel: md5 per token
  * (one digest object reused across tokens), the first 64 digest bits
  * split into four 16-bit parts, each bit contributing +1/-1 to its sign
  * counter, signs packed into four 16-bit fingerprint parts.
  *
  * This replaces the explode + 64-column aggregation spelling
  * (`Dedup.simhashBuiltins`): semantically identical, but per-row — the
  * token explosion and the doc_id hash-partitioned aggregation SHUFFLE
  * disappear from the plan entirely, which at 100 TB removes a full
  * n_tokens-row exchange. Byte-for-byte equal to
  * `conv(substring(md5(tok), 1+4p, 4), 16, 10)` per part, so the DuckDB
  * oracle is unchanged.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  def apply(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  /** One digest per task thread, not per row: getInstance does a JCA
    * provider lookup and allocates; at corpus scale that is a per-document
    * cost in the hot loop for an object reset() makes reusable.
    */
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static so generated code dispatches with one monomorphic call. */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    val md = digest.get()
    var t = 0
    while (t < n) {
      md.reset()
      val dig = md.digest(tokens.getUTF8String(t).getBytes)
      var p = 0
      while (p < 4) {
        val part = ((dig(2 * p) & 0xff) << 8) | (dig(2 * p + 1) & 0xff)
        var b = 0
        while (b < 16) {
          if (((part >> b) & 1) == 1) counts(16 * p + b) += 1
          else counts(16 * p + b) -= 1
          b += 1
        }
        p += 1
      }
      t += 1
    }
    val out = new Array[Int](4)
    var p = 0
    while (p < 4) {
      var sim = 0
      var b = 0
      while (b < 16) {
        if (counts(16 * p + b) > 0) sim |= 1 << b
        b += 1
      }
      out(p) = sim
      p += 1
    }
    new GenericArrayData(out)
  }
}
