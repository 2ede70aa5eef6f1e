package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document fuzzy-correction apply against a COLLECTED rare→canon
  * table: walks the token array in position order, substitutes each
  * matched rare token with its canonical form, counts substitutions, and
  * reassembles the document with single-space joins — exactly the join
  * spelling's `array_join(transform(array_sort(collect_list(struct(pos,
  * out_tok))), c -> c.out_tok), " ")` (same position-ascending order,
  * same separator) plus its `sum(corrected)` count. Values are strings,
  * so there is no accumulation-order question at all; parity with the
  * join path is by construction and spec-asserted (FunctionsSpec).
  *
  * Why this exists (verdict r11 item 5): the join spelling drags every
  * TOKEN INSTANCE of the corpus through a posexplode, a left join, and a
  * per-doc collect_list+array_sort exchange — while the correction table
  * itself is vocabulary-bounded (rare words adjacent to a ≥10x-more-
  * frequent canon; 0 rows on clean corpora). With the table held as a
  * reference object the apply is ONE shuffle-free corpus scan: one hash
  * probe per token, zero allocation on the miss path. The caller gates
  * on the MEASURED correction-table size (same `limit(cap+1).collect()`
  * discipline as the LM folds) and falls back to the join spelling when
  * the table outgrows a single executor's memory.
  *
  * The model rides along as constructor fields (codegen reference
  * objects, not Literal children), exactly like [[LmBigramFold]].
  */
case class FuzzyApplyFold(child: Expression,
    rares: Array[String], canons: Array[String]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_corrected", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  // rare -> canon, keyed by UTF8String so the per-token probe uses the
  // array's own slices (zero allocation on the miss path). Built once per
  // deserialized expression instance (per executor), not per row.
  @transient private lazy val model: java.util.HashMap[UTF8String, UTF8String] =
    FuzzyApplyFold.buildModel(rares, canons)

  override protected def nullSafeEval(input: Any): Any =
    FuzzyApplyFold.compute(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("fuzzyModel", model,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FuzzyApplyFold.compute($c, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): FuzzyApplyFold =
    copy(child = newChild)
}

object FuzzyApplyFold {

  /** Column-level entry point; `rares(i)` corrects to `canons(i)`. */
  def apply(tokens: Column, rares: Array[String], canons: Array[String]): Column =
    ColumnBridge.column(FuzzyApplyFold(ColumnBridge.expression(tokens), rares, canons))

  def buildModel(rares: Array[String], canons: Array[String])
      : java.util.HashMap[UTF8String, UTF8String] = {
    val m = new java.util.HashMap[UTF8String, UTF8String]()
    var i = 0
    while (i < rares.length) {
      m.put(UTF8String.fromString(rares(i)), UTF8String.fromString(canons(i)))
      i += 1
    }
    m
  }

  /** Static so generated code dispatches with one monomorphic call.
    * Position-ascending walk; matched tokens substituted, the rest pass
    * through as the array's own slices.
    */
  def compute(tokens: ArrayData,
      model: java.util.HashMap[UTF8String, UTF8String]): InternalRow = {
    val n = tokens.numElements()
    val out = new Array[UTF8String](n)
    var corrected = 0L
    var i = 0
    while (i < n) {
      val cur = tokens.getUTF8String(i)
      val canon = model.get(cur)
      if (canon != null) { out(i) = canon; corrected += 1L }
      else out(i) = cur
      i += 1
    }
    new GenericInternalRow(Array[Any](corrected,
      UTF8String.concatWs(FuzzyApplyFold.Space, out: _*)))
  }

  private val Space = UTF8String.fromString(" ")
}
