package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE winnowing fingerprint selection (Schleimer–Wilkerson–Aiken,
  * SIGMOD 2003 — the MOSS rule): over the document's 8-gram polynomial
  * hash sequence (the same base-31 codepoint hash as
  * [[RollingFingerprint]] and its oracle), slide a window of `w`
  * consecutive hashes and select the LEFTMOST minimum of each window;
  * emit the distinct selected (pos, hash) fingerprints in position order.
  *
  * The winnowing guarantee: any substring match of at least w+7 code
  * points between two documents shares at least one selected
  * fingerprint, while expected density is ~2/(w+1) — the property that
  * makes fingerprint INDEXES work for partial-overlap detection, which
  * the 4-global-minima digest (`fingerprint`/`fingerprintRolling`)
  * cannot provide (it only witnesses whole-document near-identity).
  * Leftmost tie-breaking is a deterministic variant of the paper's
  * rightmost rule chosen because both engines express it directly
  * (`array_position`/`list_position` = first occurrence); the guarantee
  * is tie-rule-independent.
  *
  * Implementation is a single pass: Karp–Rabin rolling hash (identical
  * recurrence to [[RollingFingerprint]]) into a per-document hash array,
  * then a monotone deque — pop-while-strictly-greater keeps the earliest
  * of equal minima at the front, giving the leftmost-min selection in
  * O(1) amortized per window. Selected positions are non-decreasing, so
  * distinctness is a skip-if-same-as-last check and the output is
  * emitted already position-sorted. Documents with fewer than w hashes
  * (len < w+7 code points) return an empty array; query surfaces filter
  * them out exactly as the oracle's `len(hs) >= w` guard does.
  *
  * 100 TB shape: per-row work is O(code points), per-row state is one
  * long[] of hash-sequence length — a map-phase expression like
  * [[ShingleHashes]], no plan change. Positions are 1-based into the
  * hash sequence, matching the oracle's `generate_series(1, ...)`.
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 2, s"winnow window w=$w must be >= 2")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WinnowSelect.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowSelect.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {

  /** 31^7 — the weight the outgoing code point carries in the window hash. */
  private final val TopPow: Long = 31L * 31 * 31 * 31 * 31 * 31 * 31

  def apply(c: Column, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(c), w))

  /** Static so generated code dispatches with one monomorphic call. */
  def compute(s: UTF8String, w: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    // pass 1: 8-gram rolling hashes over code points (RollingFingerprint's
    // exact recurrence); nh = #codepoints - 7
    val hashes = new Array[Long](math.max(len - 7, 0))
    val ring = new Array[Long](8)
    var h = 0L
    var seen = 0
    var nh = 0
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val slot = seen % 8
      if (seen >= 8) h -= ring(slot) * TopPow
      ring(slot) = cp
      h = h * 31 + cp
      seen += 1
      if (seen >= 8) { hashes(nh) = h; nh += 1 }
    }
    if (nh < w) return new GenericArrayData(Array.empty[Any])
    // pass 2: leftmost-min per w-window via monotone deque (indices with
    // non-decreasing hash values; strictly-greater pops keep the earliest
    // of equal minima at the front)
    val dq = new Array[Int](nh)
    var head = 0
    var tail = 0 // exclusive
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var lastPos = -1
    var j = 0
    while (j < nh) {
      while (tail > head && hashes(dq(tail - 1)) > hashes(j)) tail -= 1
      dq(tail) = j; tail += 1
      if (dq(head) <= j - w) head += 1
      if (j >= w - 1) {
        val sel = dq(head)
        if (sel != lastPos) {
          out += new GenericInternalRow(Array[Any]((sel + 1).toLong, hashes(sel)))
          lastPos = sel
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
