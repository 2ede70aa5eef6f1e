package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash band computation: given the shingle strings, computes
  * the PolyHash base hash per shingle, all k affine minima
  * h_i = min((2i+1)*h + i*1000003 mod 2^31-1), and the fold into `bands`
  * LSH band keys — in ONE pass with zero intermediate allocation. The
  * built-ins spelling (`Dedup.minhashSignaturesBuiltins`) materializes
  * the base-hash array plus k separate `transform` result arrays per
  * row, for values that only feed a running minimum; at 100 TB that is
  * k+1 array materializations per document. Arithmetic is identical to
  * the affine family in the SQL oracle, so parity holds.
  */
case class MinHashBands(child: Expression, k: Int, bands: Int,
    preHashed: Boolean = false)
    extends UnaryExpression {

  require(k % bands == 0, s"k=$k must divide evenly into bands=$bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // compute() returns null for an empty shingle array even when the child
  // is non-nullable; without this override nullSafeCodeGen would emit
  // `false = true;` for a non-nullable child (Janino error -> fallback)
  // and the interpreted path would break the non-null schema promise.
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], k, bands, preHashed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val result = ctx.freshName("mhb")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $result =
         |  graft.functions.MinHashBands.compute($c, $k, $bands, $preHashed);
         |if ($result == null) { ${ev.isNull} = true; } else { ${ev.value} = $result; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {

  def apply(c: Column, k: Int, bands: Int): Column =
    ColumnBridge.column(MinHashBands(ColumnBridge.expression(c), k, bands))

  /** Over ALREADY-HASHED shingles (ARRAY<BIGINT>, e.g. `ShingleHashes`
    * output): skips the per-shingle PolyHash and runs only the affine
    * minima + band fold — the zero-string-churn pairing used by the
    * signature pipeline.
    */
  def overHashes(c: Column, k: Int, bands: Int): Column =
    ColumnBridge.column(
      MinHashBands(ColumnBridge.expression(c), k, bands, preHashed = true))

  /** Static so generated code dispatches with one monomorphic call.
    * Returns null for an empty shingle array (mirrors array_min's null on
    * empty input in the built-ins spelling); callers filter those out
    * upstream via the >= n-token shingle guard. `preHashed` selects
    * whether elements are shingle STRINGS (PolyHash applied here) or
    * 64-bit base hashes (applied upstream by `ShingleHashes`).
    */
  def compute(shingles: ArrayData, k: Int, bands: Int,
      preHashed: Boolean = false): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val M = PolyHash.Mod
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = if (preHashed) shingles.getLong(j)
        else PolyHash.compute(shingles.getUTF8String(j))
      var i = 0
      while (i < k) {
        val v = ((2L * i + 1) * h + (i.toLong * 1000003L) % M) % M
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var i = b * rows
      while (i < (b + 1) * rows) {
        acc = (acc * 31 + mins(i)) % M
        i += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}
