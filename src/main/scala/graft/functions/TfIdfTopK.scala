package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document TF-IDF top-k against a COLLECTED idf table: counts term
  * frequencies inside the token array, scores tf * idf through the same
  * HALF_UP round(., 6) as Spark's `round`, and keeps the top `k` terms
  * under the join+window spelling's exact total order (rounded score
  * desc, term asc in UTF8-binary order) — one corpus scan instead of the
  * (doc, term) exchange + per-doc window the join spelling needs. Terms
  * absent from the idf table are skipped (inner-join semantics; when
  * scoring the corpus the table was built from, every token matches).
  * The caller gates on the MEASURED vocabulary size and falls back to
  * the join spelling (kept as the bit-exactness twin) above the cap.
  *
  * Emits array<struct<rnk, term, tf, tfidf>> for the caller to explode.
  */
case class TfIdfTopK(child: Expression,
    keys: Array[String], vals: Array[Double], k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"k=$k must be >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rnk", IntegerType, nullable = false),
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("tfidf", DoubleType, nullable = false))), containsNull = false)

  @transient private lazy val model: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double]()
    var i = 0
    while (i < keys.length) { m.put(UTF8String.fromString(keys(i)), vals(i)); i += 1 }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    TfIdfTopK.compute(input.asInstanceOf[ArrayData], model, k)

  override protected def withNewChildInternal(newChild: Expression): TfIdfTopK =
    copy(child = newChild)
}

object TfIdfTopK {

  def apply(tokens: Column, keys: Array[String], vals: Array[Double], k: Int): Column =
    ColumnBridge.column(TfIdfTopK(ColumnBridge.expression(tokens), keys, vals, k))

  /** (score desc, term asc) strict total order on the ROUNDED score. */
  private def better(s1: Double, t1: UTF8String, s2: Double, t2: UTF8String): Boolean =
    s1 > s2 || (s1 == s2 && t1.compareTo(t2) < 0)

  def compute(tokens: ArrayData,
      model: java.util.HashMap[UTF8String, java.lang.Double], k: Int): ArrayData = {
    val n = tokens.numElements()
    // in-doc term frequencies (matched terms only)
    val tf = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      if (model.containsKey(w)) {
        val c = tf.get(w)
        if (c == null) tf.put(w.clone(), Array(1L)) else c(0) += 1L
      }
      i += 1
    }
    // insertion-sorted top-k under (rounded score desc, term asc)
    val topT = new Array[UTF8String](k)
    val topN = new Array[Long](k)
    val topS = new Array[Double](k)
    var len = 0
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val t = e.getKey
      val c = e.getValue()(0)
      val s = CellPairs.round6(c.toDouble * model.get(t).doubleValue())
      if (len < k || better(s, t, topS(len - 1), topT(len - 1))) {
        var pos = if (len == k) k - 1 else { len += 1; len - 1 }
        while (pos > 0 && better(s, t, topS(pos - 1), topT(pos - 1))) {
          topT(pos) = topT(pos - 1); topN(pos) = topN(pos - 1); topS(pos) = topS(pos - 1)
          pos -= 1
        }
        topT(pos) = t; topN(pos) = c; topS(pos) = s
      }
    }
    val out = new Array[Any](len)
    i = 0
    while (i < len) {
      out(i) = new GenericInternalRow(Array[Any](i + 1, topT(i), topN(i), topS(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
