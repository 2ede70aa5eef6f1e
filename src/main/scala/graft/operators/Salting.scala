package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle equi-joins — the explicit fallback when one
  * join key is hot enough that a single shuffle partition exceeds an
  * executor (AQE's skew-join split handles moderate skew automatically,
  * but it can only split what fits through the shuffle write in the first
  * place; salting bounds the partition at the source).
  *
  * The large side gets a uniform salt in [0, factor); the small side is
  * replicated across all `factor` salt values; the join key becomes
  * (key, salt), so a hot key's rows spread over `factor` tasks. The join
  * RESULT is independent of the salt assignment — only task balance
  * changes — which the spec asserts by comparing against the plain join.
  */
object Salting {

  /** Per-row salt in [0, factor): xxhash64 over (key, row id), NOT the raw
    * id — `pmod(monotonically_increasing_id(), factor)` is layout-
    * dependent (any strided id layout, e.g. rows surviving an every-Nth
    * filter, collapses it to one salt value per partition), whereas
    * hashing the id spreads a hot key uniformly no matter how its rows
    * are laid out across partitions.
    */
  def saltCol(key: String, factor: Int): Column =
    pmod(xxhash64(col(key), monotonically_increasing_id()), lit(factor.toLong)).cast("int")

  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      factor: Int = 16): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val salted = large.withColumn("__salt", saltCol(key, factor))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
