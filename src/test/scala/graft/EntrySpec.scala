package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression net over the driver contract: every registered query runs on
  * sf0.001 and the oracle map stays aligned with the query map.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query (and vice versa)") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs on sf0.001 with a non-degenerate schema") {
      val df = fn(spark, dir)
      assert(df.schema.fields.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
