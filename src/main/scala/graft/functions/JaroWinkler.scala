package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity over two string columns — the scoring
  * kernel of the record-linkage operator (`text_fuzzy_jw`). Spark ships
  * `levenshtein` but no Jaro–Winkler; the alternative spellings (a Scala
  * UDF, or a higher-order-function encoding of the matching window) are
  * either codegen-opaque or quadratic in allocated intermediates. This is
  * the classic algorithm (Winkler 1990) as one primitive loop pair, inside
  * whole-stage codegen via a static monomorphic call.
  *
  * Exact semantics, chosen to be BIT-IDENTICAL to DuckDB's
  * `jaro_winkler_similarity` (differentially verified on 4000 random
  * pairs, zero ULP mismatches — FunctionsSpec):
  *   - match window = max(max(|a|,|b|)/2 - 1, 0); transpositions counted
  *     over matched sequences, halved by integer division;
  *   - jaro = (m/|a| + m/|b| + (m-t)/m) / 3 evaluated in exactly that
  *     double-arithmetic order;
  *   - Winkler prefix bonus j + L*0.1*(1-j) applied only when j > 0.7
  *     (strict), common-prefix length L capped at 4;
  *   - EITHER side empty -> 0.0, including both empty (DuckDB's
  *     convention; the textbook 1.0 for two empties differs).
  * Comparison is per UTF-8 BYTE, directly on the unsafe string — that is
  * DuckDB's kernel's unit (measured: jaro_winkler_similarity('排a','排b')
  * = 0.8833..., the 3-byte CJK prefix counting as 3 matches, where a
  * per-character walk gives 0.6667 — a divergence the first, decoded
  * per-UTF-16-char cut of this expression hit on the zh corpus at the
  * 10x oracle gate; note DuckDB's levenshtein/damerau_levenshtein are
  * per-CHARACTER, so the two kernels in this file intentionally use
  * different units, each matching its oracle twin). Byte-level also
  * means zero decode: the loops read UTF8String bytes in place.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.JaroWinkler.compute($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  private final val PrefixWeight = 0.1
  private final val BoostThreshold = 0.7
  private final val MaxPrefix = 4

  /** Static so generated code dispatches with one monomorphic call. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val l1 = a.numBytes
    val l2 = b.numBytes
    val j = jaro(a, b, l1, l2)
    if (j > BoostThreshold) {
      var pl = 0
      val cap = math.min(MaxPrefix, math.min(l1, l2))
      while (pl < cap && a.getByte(pl) == b.getByte(pl)) pl += 1
      j + pl * PrefixWeight * (1.0 - j)
    } else j
  }

  private def jaro(s1: UTF8String, s2: UTF8String, l1: Int, l2: Int): Double = {
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.getByte(i) == s2.getByte(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.getByte(i) != s2.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }
}
