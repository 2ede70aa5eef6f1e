package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Dense hashed-n-gram bucket counts per document — the fastText/CCNet
  * hashing-trick featurizer (Joulin et al. '16 §2.1; the same
  * unigram+bigram bucket space as Xie et al. '23's DSIR importance
  * features): every unigram and bigram of the token array is hashed
  * through the [[PolyHash]] fold mod `nBuckets`, and the result is the
  * COUNT VECTOR `long[nBuckets]` rather than [[DsirFold]]'s folded score —
  * the input a downstream linear model (QualityModel's hashed-n-gram
  * logistic fit) consumes as its feature vector.
  *
  * One O(len + nBuckets) pass per row, zero shuffle, codegen-friendly:
  * the join spelling (explode -> hash -> groupBy(doc, bucket) -> pivot)
  * costs two exchanges and a per-doc pivot for a vector that is bounded
  * (nBuckets ~ tens) BY CONSTRUCTION. Bigram hashes continue the unigram
  * fold through the separator codepoint (`continueHash` composition law,
  * see DsirFold), so `hash(w1 + " " + w2)` is computed without
  * materializing the concatenation — and the identical value is
  * oracle-expressible in DuckDB as the `list_reduce` PolyHash fold over
  * the concatenated string's codepoints.
  */
case class NgramBuckets(child: Expression, nBuckets: Int)
    extends UnaryExpression {

  require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    NgramBuckets.compute(input.asInstanceOf[ArrayData], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramBuckets.compute($c, $nBuckets)")

  override protected def withNewChildInternal(newChild: Expression): NgramBuckets =
    copy(child = newChild)
}

object NgramBuckets {

  def apply(tokens: Column, nBuckets: Int): Column =
    ColumnBridge.column(NgramBuckets(ColumnBridge.expression(tokens), nBuckets))

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
  def compute(tokens: ArrayData, nBuckets: Int): ArrayData = {
    val n = tokens.numElements()
    val counts = new Array[Long](nBuckets)
    var prevHash = 0L
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i).toString
      val h = continueHash(0L, w)
      counts((h % nBuckets).toInt) += 1
      if (i >= 1) {
        // bigram (prev, w): continue prev's fold through ' ' then w —
        // identical to PolyHash(concat(prev, " ", w))
        val bh = continueHash((prevHash * 31 + 32L) % PolyHash.Mod, w)
        counts((bh % nBuckets).toInt) += 1
      }
      prevHash = h
      i += 1
    }
    new GenericArrayData(counts)
  }
}
