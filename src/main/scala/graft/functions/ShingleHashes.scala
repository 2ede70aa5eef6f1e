package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-n-gram shingle hashing: token array in, one PolyHash per
  * shingle out, where each value equals
  * `PolyHash(concat_ws(" ", slice(tokens, i, n)))` — the spelling every
  * shingle consumer (MinHash, set-similarity, boilerplate density) uses
  * and every DuckDB oracle replicates via `list_reduce` over codepoints.
  * The built-ins spelling materializes one concatenated STRING per
  * shingle before hashing it; with ~w shingles per w-token document that
  * is w string allocations per document of ~n tokens each — pure churn,
  * since the hash is a running fold that never needs the bytes
  * contiguously. Here the fold runs straight over the token array with a
  * synthetic `' '` (codepoint 32) between tokens: zero intermediate
  * allocation, and bitwise-identical results.
  *
  * Scale note (100 TB): this sits in the map phase of every dedup
  * pipeline — each document is hashed exactly once per pass, so the win
  * is a constant factor on the single most-executed expression in the
  * engine, not a plan change. Parity is covered by a differential spec
  * against the transform/concat_ws lambda spelling.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle width n=$n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n))

  /** Static so generated code dispatches with one monomorphic call.
    * Returns an EMPTY array when the document has fewer than n tokens
    * (callers guard with `size(tokens) >= n` exactly as the string
    * spelling does, so the empty case never reaches a consumer).
    *
    * Each token is decoded and codepoint-folded EXACTLY ONCE: the fold
    * `h*31 + cp (mod M)` is linear in h, so a token contributes to any
    * window through just its own hash h_t and length power p_t = 31^len
    * — appending token t to running state h is `h*p_t + h_t (mod M)`.
    * The n windows containing a token then combine per-token (h_t, p_t)
    * pairs arithmetically, with the implicit `' '` (32) folded between
    * tokens. The first spelling re-decoded every token in every window —
    * O(windows × n) String allocations on the engine's most-executed
    * expression (ADVICE r8); this one allocates O(tokens) and is
    * bitwise-identical (differential spec vs the concat_ws lambda
    * spelling). Products stay in range: M = 2^31−1, so h·p < 2^62.
    */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val sz = tokens.numElements()
    if (sz < n) return new GenericArrayData(Array.emptyLongArray)
    val M = PolyHash.Mod
    val th = new Array[Long](sz) // per-token codepoint fold from 0
    val tp = new Array[Long](sz) // 31^(codepoint count) mod M
    var j = 0
    while (j < sz) {
      val str = tokens.getUTF8String(j).toString
      val len = str.length
      var h = 0L
      var p = 1L
      var i = 0
      while (i < len) {
        val cp = str.codePointAt(i)
        i += Character.charCount(cp)
        h = (h * 31 + cp) % M
        p = (p * 31) % M
      }
      th(j) = h
      tp(j) = p
      j += 1
    }
    val out = new Array[Long](sz - n + 1)
    var i = 0
    while (i <= sz - n) {
      var h = th(i)
      var t = 1
      while (t < n) {
        h = (h * 31 + 32) % M            // the separator space
        h = (h * tp(i + t) + th(i + t)) % M // append token i+t in O(1)
        t += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** UTF8String-level twin of the per-window fold, for tests. */
  def hashJoined(parts: Seq[String]): Long =
    PolyHash.compute(UTF8String.fromString(parts.mkString(" ")))
}
