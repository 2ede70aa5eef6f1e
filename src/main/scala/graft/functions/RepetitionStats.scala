package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics over a token array, in ONE native
  * pass: token count, distinct-token count, and the multiplicity of the
  * most frequent word bigram.
  *
  * Replaces the interpreted higher-order spelling in
  * [[TextAnalysis.repetition]] — `array_distinct` + `array_sort(transform
  * (...concat...))` + an `aggregate` fold of `named_struct`s — which paid,
  * per token: a bigram string concat allocation, O(n log n) interpreted
  * string comparisons, and a boxed struct per fold step. Here distinct
  * tokens go through one hash set over the existing UTF8String slices and
  * the top-bigram count comes from sorting bigram START INDICES with a
  * two-token comparator — no byte copying, no concatenation, no boxing of
  * fold state (guide §1.2 step 2 / §4.1: native beats interpreted HOFs on
  * the hot scan).
  *
  * Exact equivalence (differential-tested in OperatorsSpec): distinct
  * count under UTF8String equality IS `array_distinct`'s count; the
  * longest equal run of the SORTED `concat(w_i, ' ', w_{i+1})` list is the
  * max multiset multiplicity of the (w_i, w_{i+1}) pair — whitespace
  * tokens cannot contain ' ', so the concatenation is injective on pairs,
  * and max multiplicity is order-free (any total order groups equal pairs
  * together). All three outputs are exact integers.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_uniq", LongType, nullable = false),
    StructField("top_c", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  def apply(tokens: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(tokens)))

  /** Static so generated code dispatches with one monomorphic call. */
  def compute(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val ws = new Array[UTF8String](n)
    var i = 0
    while (i < n) { ws(i) = tokens.getUTF8String(i); i += 1 }
    val seen = new java.util.HashSet[UTF8String](math.max(4, n * 2))
    i = 0
    while (i < n) { seen.add(ws(i)); i += 1 }
    val m = n - 1
    var top = 0L
    if (m > 0) {
      // sort bigram start indices by (w_i, w_{i+1}); equal pairs become
      // adjacent, and the longest run is the max pair multiplicity
      val idx = new Array[Integer](m)
      i = 0
      while (i < m) { idx(i) = Integer.valueOf(i); i += 1 }
      java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
        override def compare(a: Integer, b: Integer): Int = {
          val c1 = ws(a.intValue).compareTo(ws(b.intValue))
          if (c1 != 0) c1 else ws(a.intValue + 1).compareTo(ws(b.intValue + 1))
        }
      })
      var j = 0
      while (j < m) {
        val a = idx(j).intValue
        var k = j + 1
        while (k < m && {
          val b = idx(k).intValue
          ws(a).equals(ws(b)) && ws(a + 1).equals(ws(b + 1))
        }) k += 1
        if ((k - j).toLong > top) top = (k - j).toLong
        j = k
      }
    }
    new GenericInternalRow(Array[Any](n.toLong, seen.size.toLong, top))
  }
}
