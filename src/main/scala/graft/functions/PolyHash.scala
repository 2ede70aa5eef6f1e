package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial string hash h = fold(h * 31 + codepoint mod 2^31-1) as a
  * native codegen expression — the cheap, engine-portable base hash for the
  * MinHash family (Dedup.minhashSignatures): one pass over the string,
  * no allocation, and the identical fold is expressible in ANSI-ish SQL
  * (`list_reduce` over codepoints), so results stay oracle-verifiable —
  * unlike xxhash64/murmur whose cross-engine values differ. Registered as
  * SQL function `graft_poly_hash` so it composes inside higher-order
  * function lambdas (`transform(shingles, s -> graft_poly_hash(s))`).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {

  /** 2^31 - 1 (prime): keeps every intermediate inside exact BIGINT range
    * in any engine (max step value ~2^36).
    */
  final val Mod = 2147483647L

  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))

  /** Idempotent session registration of `graft_poly_hash` for use inside
    * SQL strings and lambda bodies.
    */
  def register(spark: SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "graft_poly_hash",
      exprs => PolyHash(exprs.head))

  /** Static so generated code dispatches with one monomorphic call. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    val len = str.length
    var h = 0L
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * 31 + cp) % Mod
    }
    h
  }
}
