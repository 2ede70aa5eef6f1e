package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the winnowing-style document fingerprint —
  * the 100 TB hot path (SURVEY §2.6 allows exactly this: a custom
  * `Expression` only where built-ins genuinely fall short).
  *
  * Semantics are identical to `TextAnalysis.fingerprintRolling` (and its
  * DuckDB oracle): the 4 smallest 8-gram polynomial hashes
  * (base-31 over code points), sorted ascending, joined with '|'.
  * Implementation is a true Karp–Rabin rolling hash:
  * h_{i+1} = (h_i - c_i * 31^7) * 31 + c_{i+8} — O(1) per position, one
  * pass, a fixed 8-slot ring buffer and a 4-slot min-heap per row, zero
  * per-row allocation beyond the output. The built-ins variant materializes
  * a codepoint array plus an all-positions hash array per document; this
  * one stays inside whole-stage codegen with a single static call.
  *
  * Inputs shorter than 8 code points fingerprint to the empty string
  * (query surfaces filter them out before this expression runs).
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {

  /** 31^7 — the weight the outgoing code point carries in the window hash. */
  private final val TopPow: Long = 31L * 31 * 31 * 31 * 31 * 31 * 31

  /** Column-level entry point for the DataFrame API. */
  def apply(c: Column): Column =
    ColumnBridge.column(RollingFingerprint(ColumnBridge.expression(c)))

  /** Static so generated code dispatches with one monomorphic call. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    val len = str.length
    // 4 smallest hashes seen, ascending; Long.MaxValue = empty slot
    var m0, m1, m2, m3 = Long.MaxValue
    val ring = new Array[Long](8) // last 8 code points, circular
    var h = 0L                    // hash of the current 8-codepoint window
    var seen = 0                  // code points consumed
    var i = 0                     // char (UTF-16) index
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val slot = seen % 8
      if (seen >= 8) h -= ring(slot) * TopPow
      ring(slot) = cp
      h = h * 31 + cp
      seen += 1
      if (seen >= 8) {
        // h currently holds sum(c_j * 31^(7-j)) over the last 8 code points
        if (h < m3) {
          if (h < m0)      { m3 = m2; m2 = m1; m1 = m0; m0 = h }
          else if (h < m1) { m3 = m2; m2 = m1; m1 = h }
          else if (h < m2) { m3 = m2; m2 = h }
          else             { m3 = h }
        }
      }
    }
    if (seen < 8) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(80)
    sb.append(m0)
    if (m1 != Long.MaxValue) sb.append('|').append(m1)
    if (m2 != Long.MaxValue) sb.append('|').append(m2)
    if (m3 != Long.MaxValue) sb.append('|').append(m3)
    UTF8String.fromString(sb.toString)
  }
}
