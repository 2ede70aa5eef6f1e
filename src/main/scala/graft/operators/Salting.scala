package graft.operators

import org.apache.spark.sql.DataFrame
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

  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      factor: Int = 16): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
