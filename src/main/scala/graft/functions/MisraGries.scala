package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst
  * `TypedImperativeAggregate` — the mergeable-summary answer to "which
  * words dominate a 100 TB corpus" when an exact word count (a full
  * shuffle keyed by word) is not worth its cost. Each task keeps at most
  * `k` counters regardless of input size; partial buffers merge
  * associatively (Agarwal et al., "Mergeable Summaries", PODS'12), so the
  * plan is one partial aggregate per partition + one k-sized buffer per
  * task into a final merge — no per-word shuffle at all.
  *
  * Guarantees (asserted in OperatorsSpec): with true count c(w) over n
  * total items, every w with c(w) > n/(k+1) is present, and each reported
  * estimate e(w) satisfies c(w) - n/(k+1) <= e(w) <= c(w). Estimates
  * depend on merge order (like any MG merge), so the query carrying this
  * aggregate is declared rows-only for the oracle — the bounds above, not
  * row equality, are its contract.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries: k must be >= 1, got $k")

  override def dataType: DataType = MisraGries.ResultType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    MisraGries.stepIn(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (w, c) => buf.update(w, buf.getOrElse(w, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from all, drop the non-positive
      val m = buf.values.toArray.sortInPlace()(Ordering.Long.reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - m
        if (c <= 0) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (w, c) => (-c, w) }
      .map { case (w, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(w), c))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  // length-prefixed raw UTF-8, not writeUTF: modified-UTF-8 caps a string
  // at 65535 encoded bytes and would throw at partial-buffer shuffle time
  // on a corpus with a pathological unbroken token
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) =>
      val b = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {

  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  /** One classic MG arrival step over a k-counter buffer — shared by the
    * Catalyst aggregate's update and the streaming twin
    * (streaming.StreamHeavyHitters), so both paths carry identical
    * sketch semantics.
    */
  def stepIn(buf: mutable.HashMap[String, Long], w: String, k: Int): Unit =
    buf.get(w) match {
      case Some(c) => buf.update(w, c + 1)
      case None if buf.size < k => buf.update(w, 1L)
      case None =>
        // a non-resident arrival decrements every counter
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { key =>
          val c = buf(key) - 1
          if (c == 0) dead += key else buf.update(key, c)
        }
        dead.foreach(buf.remove)
    }

  /** Column-level entry point: `MisraGries(col("word"), 32)`. */
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Idempotent session registration of `graft_misra_gries(col, k)`. The
    * builder returns the bare AggregateFunction — the analyzer wraps it in
    * an AggregateExpression, as with built-in aggregates.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "graft_misra_gries",
      exprs => MisraGries(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))
}
