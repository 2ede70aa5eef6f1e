package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Distance scores from one vector to EVERY centroid of a fitted/lattice
  * codebook, as a single native expression: score_j = |c_j|^2 - 2<v, c_j>
  * (the |v|^2 term is constant per row and drops out of any argmin/rank
  * over the scores).
  *
  * Why not the composed spelling `array(lit(n2_0) - 2*VectorDot(v, c_0),
  * ...)`? That CreateArray of nCells independent literal-dot trees inlines
  * nCells × dim literal doubles into ONE generated method; past a few dozen
  * cells the method blows HotSpot's huge-method JIT limit and the whole
  * projection — scan, norm, scores, shuffle write — runs in the bytecode
  * interpreter. Measured at sf0.1 (34 cells × 64 dims): the cell-assignment
  * map stage of dedup_semantic burned 1.31 s of pure CPU for 2,000 rows
  * (~650 µs/row for ~4,400 flops); swapping in this expression collapses
  * the generated code to one monomorphic static call over a reference-held
  * double[][], which always JITs. It also removes the nCells-literal plan
  * bloat that motivated capping `cellsFor` at 4096.
  *
  * Bit-parity contract (oracle-critical): the score arithmetic reproduces
  * the composed spelling exactly — norms are the same
  * `foldLeft(0.0)(acc + x*x)` as `Similarity.norm2`, the dot is the same
  * strict sequential fold as `VectorDot.compute`, and the combination
  * `norm - 2.0 * dot` is evaluated in the same order, so every score is
  * the identical IEEE double and downstream argmin/tie-break semantics
  * (`array_position(scores, array_min(scores))`, first-min wins) are
  * unchanged.
  *
  * The codebook rides along as a plain constructor field (a reference
  * object in codegen, not a Literal child): nCells × dim doubles are
  * driver-bounded by the `cellsFor` cap, exactly like the literal arrays
  * they replace.
  */
case class CellScores(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val norms: Array[Double] =
    centroids.map(_.foldLeft(0.0)((acc, x) => acc + x * x))

  override protected def nullSafeEval(input: Any): Any =
    CellScores.compute(input.asInstanceOf[ArrayData], centroids, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("norms", norms, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CellScores.compute($c, $cRef, $nRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CellScores =
    copy(child = newChild)
}

/** `CellScores` against the idx-th of SEVERAL codebooks — the two-level
  * IVF's fine-assignment kernel. The first spelling of that assignment
  * was a CASE over the coarse cell with one `CellScores` branch per
  * codebook; CaseWhen branches are conditionally evaluated, which makes
  * their subtrees ineligible for codegen common-subexpression
  * elimination — every downstream reference (fine argmin, flat cell id,
  * probe list) re-evaluated the whole coarse-scores-and-argmin tree, and
  * the 100× assignment burned ~20 s of pure re-computation (measured:
  * 26.4 s vs 0.6 s for the single-level twin). As one unconditional
  * binary expression the subtree is CSE-eligible again and the table
  * lookup is an O(1) array index inside one static call.
  *
  * Same bit-parity contract as `CellScores`: identical norm/dot folds,
  * identical score combination, per selected table.
  */
case class CellScoresAt(left: Expression, right: Expression,
    tables: Array[Array[Array[Double]]]) extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val norms: Array[Array[Double]] =
    tables.map(_.map(_.foldLeft(0.0)((acc, x) => acc + x * x)))

  override protected def nullSafeEval(v: Any, idx: Any): Any =
    CellScores.computeAt(v.asInstanceOf[ArrayData],
      idx.asInstanceOf[Int], tables, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("tables", tables, "double[][][]")
    val nRef = ctx.addReferenceObj("norms", norms, "double[][]")
    defineCodeGen(ctx, ev,
      (v, idx) => s"graft.functions.CellScores.computeAt($v, $idx, $tRef, $nRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellScoresAt =
    copy(left = newLeft, right = newRight)
}

object CellScoresAt {
  /** Column-level entry point; `idx` is the 0-based codebook selector. */
  def apply(v: Column, idx: Column, tables: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(CellScoresAt(
      ColumnBridge.expression(v), ColumnBridge.expression(idx), tables))
}

object CellScores {

  /** Column-level entry point. */
  def apply(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(CellScores(ColumnBridge.expression(v), centroids))

  /** `CellScoresAt` kernel: score against tables(idx). */
  def computeAt(v: ArrayData, idx: Int, tables: Array[Array[Array[Double]]],
      norms: Array[Array[Double]]): ArrayData =
    compute(v, tables(idx), norms(idx))

  /** Static so generated code dispatches with one monomorphic call. Inner
    * loop mirrors `VectorDot.compute` (strict sequential fold, length =
    * min of the two lengths).
    */
  def compute(v: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double]): ArrayData = {
    val out = new Array[Double](cents.length)
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getDouble(i) * c(i)
        i += 1
      }
      out(j) = norms(j) - 2.0 * acc
      j += 1
    }
    new GenericArrayData(out)
  }
}
