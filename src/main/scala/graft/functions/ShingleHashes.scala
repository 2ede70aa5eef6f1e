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

  /** Hash of tokens[from..from+n) joined by single spaces, as one fold:
    * h advances over each token's codepoints with `h*31 + cp mod M`, and
    * over an implicit 32 (' ') between consecutive tokens.
    */
  private def hashWindow(tokens: ArrayData, from: Int, n: Int): Long = {
    val M = PolyHash.Mod
    var h = 0L
    var t = 0
    while (t < n) {
      if (t > 0) h = (h * 31 + 32) % M
      val str = tokens.getUTF8String(from + t).toString
      val len = str.length
      var i = 0
      while (i < len) {
        val cp = str.codePointAt(i)
        i += Character.charCount(cp)
        h = (h * 31 + cp) % M
      }
      t += 1
    }
    h
  }

  /** Static so generated code dispatches with one monomorphic call.
    * Returns an EMPTY array when the document has fewer than n tokens
    * (callers guard with `size(tokens) >= n` exactly as the string
    * spelling does, so the empty case never reaches a consumer).
    */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val sz = tokens.numElements()
    if (sz < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](sz - n + 1)
    var i = 0
    while (i <= sz - n) {
      out(i) = hashWindow(tokens, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** UTF8String-level twin of the per-window fold, for tests. */
  def hashJoined(parts: Seq[String]): Long =
    PolyHash.compute(UTF8String.fromString(parts.mkString(" ")))
}
