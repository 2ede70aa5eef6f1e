package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One fused regex pass: replace every match of `pattern` with `repl` AND
  * count the replacements, in a single automaton sweep.
  *
  * [[graft.operators.Scrub]] needs both the scrubbed text and the audit
  * count per pattern; the built-in spelling (`regexp_replace` +
  * `size(regexp_extract_all(...))`) runs the same automaton over the same
  * bytes twice and materializes a throwaway array of matches for the
  * count (guide §1.2 step 2). One `Matcher` loop produces both outputs.
  *
  * Exact equivalence: both built-ins walk non-overlapping matches
  * left-to-right with `java.util.regex` under default flags — the same
  * loop as here — and `repl` contains no `$`/`\` metacharacters, so
  * `appendReplacement` inserts it literally, exactly as `regexp_replace`
  * does. The compiled pattern rides along as a codegen reference object.
  */
case class ScrubPass(child: Expression, pattern: String, repl: String)
    extends UnaryExpression {

  // Literal-replacement precondition, enforced rather than assumed (r15
  // ADVICE): appendReplacement interprets '$'/'\' as group references —
  // a caller passing one would silently diverge from regexp_replace's
  // literal contract (or throw on a dangling '$').
  require(!repl.contains('$') && !repl.contains('\\'),
    s"ScrubPass repl must be literal (no '$$' or '\\'): $repl")

  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n", LongType, nullable = false)))

  @transient private lazy val compiled = Pattern.compile(pattern)

  override protected def nullSafeEval(input: Any): Any =
    ScrubPass.compute(input.asInstanceOf[UTF8String], compiled, repl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("scrubPattern", compiled,
      "java.util.regex.Pattern")
    val rRef = ctx.addReferenceObj("scrubRepl", repl, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.ScrubPass.compute($c, $pRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): ScrubPass =
    copy(child = newChild)
}

object ScrubPass {

  def apply(c: Column, pattern: String, repl: String): Column =
    ColumnBridge.column(ScrubPass(ColumnBridge.expression(c), pattern, repl))

  /** Static so generated code dispatches with one monomorphic call. */
  def compute(s: UTF8String, p: Pattern, repl: String): InternalRow = {
    val m = p.matcher(s.toString)
    var n = 0L
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      n += 1L
      m.appendReplacement(sb, repl)
    }
    m.appendTail(sb)
    new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString), n))
  }
}
