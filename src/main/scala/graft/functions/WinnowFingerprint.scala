package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint with md5 window hashes — semantically
  * identical to `TextAnalysis.fingerprint`'s built-ins spelling (and its
  * DuckDB oracle): md5-hex over the '|'-join of the 4 lexicographically
  * smallest md5-hex values of all 8-character windows.
  *
  * The built-ins spelling pays O(len) `substring` scans per position
  * (O(n^2) total) plus a fresh digest and a 32-char hex string per window;
  * this kernel walks the text once, reuses ONE MessageDigest across all
  * windows, compares digests as unsigned byte arrays (hex order == byte
  * order), and materializes hex only for the 4 winners. Windows are 8
  * CODE POINTS (matching `substring(text, i, 8)`), hashed over their UTF-8
  * bytes, so non-ASCII inputs agree with the built-ins spelling too.
  */
case class WinnowFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {

  /** One digest per task thread (reset() per window), not per row — same
    * rationale as SimHash64: getInstance is a provider lookup + allocation
    * in the per-document hot path.
    */
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(c)))

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned lexicographic compare (== hex-string ordering). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Static so generated code dispatches with one monomorphic call.
    * Inputs shorter than 8 code points fingerprint to the empty string
    * (query surfaces filter them out first, same as `fingerprint`).
    */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    val len = str.length
    // char index of each code point start, so window i..i+8 is O(1)
    val starts = new Array[Int](len + 1)
    var nCp = 0
    var ci = 0
    while (ci < len) {
      starts(nCp) = ci
      ci += Character.charCount(str.codePointAt(ci))
      nCp += 1
    }
    starts(nCp) = len
    if (nCp < 8) return UTF8String.EMPTY_UTF8

    val md = digest.get()
    // 4 smallest digests, ascending
    val mins = new Array[Array[Byte]](4)
    var i = 0
    while (i + 8 <= nCp) {
      md.reset()
      val window = str.substring(starts(i), starts(i + 8))
      val d = md.digest(window.getBytes("UTF-8"))
      // insertion into the sorted 4-slot array
      if (mins(3) == null || less(d, mins(3))) {
        var j = 3
        while (j > 0 && (mins(j - 1) == null || less(d, mins(j - 1)))) {
          mins(j) = mins(j - 1); j -= 1
        }
        mins(j) = d
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(135)
    var k = 0
    while (k < 4 && mins(k) != null) {
      if (k > 0) sb.append('|')
      sb.append(toHex(mins(k)))
      k += 1
    }
    md.reset()
    UTF8String.fromString(toHex(md.digest(sb.toString.getBytes("UTF-8"))))
  }
}
