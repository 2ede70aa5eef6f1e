package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Per-document DSIR scoring fold against a COLLECTED bucket-ratio table
  * (the ln p_target − ln q_raw doubles of `Curation.dsirModel`, held as a
  * dense `double[]` indexed by bucket, `NaN` = bucket absent from the
  * model): hashes every unigram and bigram of the token array through the
  * [[PolyHash]] fold mod `ratios.length`, counts occurrences per DISTINCT
  * bucket, and folds `cnt * ratio[b]` over the buckets in ASCENDING
  * bucket order — bit-for-bit the join spelling's
  * `aggregate(array_sort(collect_list(struct(b, term))), 0.0, …)`,
  * because the values ARE the join path's doubles (the caller collects
  * the Spark-computed model) and a sorted run-length walk adds the same
  * single-multiply terms in the same order. Absent buckets are skipped
  * from count and sum, mirroring the inner join's drop semantics.
  *
  * Why this exists: the join spelling drags every (doc, bucket) count
  * through TWO exchanges and a per-doc collect_list+array_sort — when the
  * model is ≤ nBuckets rows BY CONSTRUCTION (the whole point of DSIR's
  * hashing). With the table as a reference object, scoring is one
  * shuffle-free scan: the bigram hash CONTINUES the unigram fold through
  * the separator codepoint instead of materializing the concatenated
  * string (PolyHash's fold is sequential over codepoints, so
  * `continueHash(continueHash(h(w1), " "), w2) == h(w1 + " " + w2)`
  * exactly), and the per-doc scratch is one primitive long[] sort — no
  * boxing, no per-bucket map.
  *
  * The model rides along as a constructor field (reference object in
  * codegen, not a Literal child), exactly like `CellScores`' codebook.
  */
case class DsirFold(child: Expression, ratios: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("logw", DoubleType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    DsirFold.compute(input.asInstanceOf[ArrayData], ratios)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("dsirRatios", ratios, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.DsirFold.compute($c, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirFold =
    copy(child = newChild)
}

object DsirFold {

  def apply(tokens: Column, ratios: Array[Double]): Column =
    ColumnBridge.column(DsirFold(ColumnBridge.expression(tokens), ratios))

  /** Continue the PolyHash fold over `s`'s codepoints from accumulator
    * `h` — composing folds over concatenated sequences is exactly the
    * fold over the concatenation.
    */
  private def continueHash(h0: Long, s: String): Long = {
    val len = s.length
    var h = h0
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31 + cp) % PolyHash.Mod
    }
    h
  }

  /** Static so generated code dispatches with one monomorphic call. */
  def compute(tokens: ArrayData, ratios: Array[Double]): InternalRow = {
    val n = tokens.numElements()
    val nBuckets = ratios.length
    if (n == 0) return new GenericInternalRow(Array[Any](0L, 0.0))
    // bucket ids of all unigrams then bigrams; 2n-1 slots when n >= 2
    val m = if (n >= 2) 2 * n - 1 else n
    val bs = new Array[Long](m)
    var prevHash = 0L
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i).toString
      val h = continueHash(0L, w)
      bs(i) = h % nBuckets
      if (i >= 1) {
        // bigram (prev, w): continue prev's fold through ' ' then w —
        // identical to PolyHash(concat(prev, " ", w))
        val bh = continueHash((prevHash * 31 + 32L) % PolyHash.Mod, w)
        bs(n + i - 1) = bh % nBuckets
      }
      prevHash = h
      i += 1
    }
    java.util.Arrays.sort(bs)
    // run-length walk in ascending bucket order: cnt * ratio[b] per
    // distinct bucket, absent (NaN) buckets skipped from count and sum
    var acc = 0.0
    var matched = 0L
    var j = 0
    while (j < m) {
      val b = bs(j)
      var k = j + 1
      while (k < m && bs(k) == b) k += 1
      val r = ratios(b.toInt)
      if (!java.lang.Double.isNaN(r)) {
        val cnt = (k - j).toLong
        acc += cnt.toDouble * r
        matched += cnt
      }
      j = k
    }
    new GenericInternalRow(Array[Any](matched, acc))
  }
}
