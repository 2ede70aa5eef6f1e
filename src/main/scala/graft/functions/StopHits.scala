package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of tokens contained in a fixed word set, in one native pass —
  * the language-ID / stop-ratio primitive behind `withLangSignals` and
  * `withQualitySignals`.
  *
  * Replaces `size(filter(tokens, t -> array_contains(array(...), t)))`,
  * which evaluates an interpreted lambda per token and scans the literal
  * array linearly per call (×4 languages on the language-ID scan). Here
  * the set is hashed once at construction and each token costs one
  * UTF8String hash lookup (guide §1.2 step 2). Counting membership is
  * identical to the filter+size spelling, so every downstream signal and
  * the DuckDB oracle are unchanged.
  */
// `words` is a Seq, not an Array (r15 ADVICE): Array equality is
// reference identity, which made two semantically identical StopHits
// expressions never compare equal — defeating Catalyst canonicalization
// and common-subexpression elimination across repeated stopHits columns.
case class StopHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  @transient private lazy val set = StopHits.buildSet(words)

  override protected def nullSafeEval(input: Any): Any =
    StopHits.compute(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("stopSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.StopHits.compute($c, $sRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopHits =
    copy(child = newChild)
}

object StopHits {

  def apply(tokens: Column, words: Seq[String]): Column =
    ColumnBridge.column(StopHits(ColumnBridge.expression(tokens), words.toList))

  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Static so generated code dispatches with one monomorphic call. */
  def compute(tokens: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = tokens.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (set.contains(tokens.getUTF8String(i))) c += 1L
      i += 1
    }
    c
  }
}
